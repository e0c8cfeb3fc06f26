"""Measure the CAUSAL resize_from_m_to_t gather vs a blocked one-hot matmul.

Round 5 replaced the NON-causal resize gather with a one-hot column-selection
matmul (100x device time on the LRA KD step) because the non-causal index map
is row-invariant: one tiny (N, T_M+1, T2) selector is reused across H*T1 rows,
so the matmul has huge arithmetic intensity.

The CAUSAL map (`token_index_x[r, c]`, reference resize_m_to_t.py:36-71) is
row-VARYING: with no padding it is a static (T1, T2) integer matrix, but a
matmul formulation needs a (T1, T_M+1, T2) one-hot selector — T_M+1 x more
HBM traffic than the gather's index map, with zero cross-row reuse. This
script measures both forms (fwd and fwd+bwd) on the chip so the decision is
a number, not a guess. See docs/kernel_design.md "Causal resize".

Run: python scripts/causal_resize_probe.py --t 1024 2048 --reps 3
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:  # env var alone is overridden by the axon sitecustomize
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sea_tpu.ops.masks import resize_from_m_to_t, fp_min_for


def static_causal_index(T1: int, T2: int, T_M: int) -> np.ndarray:
    """The no-padding causal token_index_x, computed host-side (static)."""
    r = np.arange(T1, dtype=np.float64)[:, None]
    c = np.arange(T2, dtype=np.float64)[None, :]
    alive = c <= r
    mask_cs = np.minimum(c + 1, r + 1)  # cumsum of the causal row
    token_length = r + 1
    idx = np.floor((mask_cs - 1 + 0.5) / token_length * T_M - 1e-4).astype(np.int32)
    idx = idx + np.where(alive, 0, T_M).astype(np.int32)
    return np.clip(idx, 0, T_M)


def resize_causal_matmul(x, masked_fill_value, idx_static, block_rows: int):
    """Blocked one-hot matmul form: exact same semantics as the no-padding
    causal gather. idx_static: (T1, T2) int32 in [0, T_M]."""
    N, H, T1, T_M = x.shape
    T2 = idx_static.shape[1]
    grid = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)), constant_values=masked_fill_value)
    nb = T1 // block_rows
    idx_blocks = idx_static.reshape(nb, block_rows, T2)
    grid_blocks = grid.reshape(N, H, nb, block_rows, T_M + 1)

    def one_block(b):
        sel = (
            idx_blocks[b][:, None, :] == jnp.arange(T_M + 1, dtype=jnp.int32)[None, :, None]
        ).astype(grid.dtype)  # (BR, T_M+1, T2)
        # batched over r: (N,H,BR,TM+1) x (BR,TM+1,T2) -> (N,H,BR,T2)
        return jnp.einsum(
            "nhrp,rpc->nhrc", grid_blocks[:, :, b], sel,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = jax.lax.map(one_block, jnp.arange(nb))  # (nb, N, H, BR, T2)
    return jnp.transpose(out, (1, 2, 0, 3, 4)).reshape(N, H, T1, T2)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: np.asarray(t).ravel()[:1], out)  # force
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda t: np.asarray(t).ravel()[:1], out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, nargs="+", default=[1024, 2048])
    p.add_argument("--n", type=int, default=2)
    p.add_argument("--h", type=int, default=12)
    p.add_argument("--t-m", type=int, default=256)
    p.add_argument("--block-rows", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip-exact", action="store_true")
    args = p.parse_args()

    FP_MIN = fp_min_for(jnp.float32)
    for T in args.t:
        N, H, T_M = args.n, args.h, args.t_m
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((N, H, T, T_M)), jnp.float32)
        causal = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, FP_MIN
        )[None, None].astype(jnp.float32)
        causal = jnp.broadcast_to(causal, (N, 1, T, T))
        idx_static = jnp.asarray(static_causal_index(T, T, T_M))

        gather_full = lambda x: resize_from_m_to_t(
            x, 0.0, causal, target_width=T, is_causal=True
        )
        matmul_full = functools.partial(
            resize_causal_matmul, masked_fill_value=0.0,
            idx_static=idx_static, block_rows=args.block_rows,
        )
        # time scalar-reduced forms: the (N,H,T,T) output is ~400 MB and a
        # device->host pull through the relay swamps the op being measured
        gather = jax.jit(lambda x: jnp.sum(gather_full(x)))
        matmul = jax.jit(lambda x: jnp.sum(matmul_full(x)))
        tg, _ = timeit(gather, x, reps=args.reps)
        tm, _ = timeit(matmul, x, reps=args.reps)
        exact = None
        if not args.skip_exact:
            exact = bool(jnp.all(jax.jit(
                lambda x: jnp.all(gather_full(x) == matmul_full(x))
            )(x)))
        # fwd+bwd (the LRA win was mostly the backward scatter); grads are
        # (N,H,T,T_M) — reduce those too
        gather_vjp = jax.jit(
            lambda x: jnp.sum(jax.vjp(gather_full, x)[1](
                jnp.ones((N, H, T, T), jnp.float32))[0])
        )
        matmul_vjp = jax.jit(
            lambda x: jnp.sum(jax.vjp(matmul_full, x)[1](
                jnp.ones((N, H, T, T), jnp.float32))[0])
        )
        tgb, _ = timeit(gather_vjp, x, reps=args.reps)
        tmb, _ = timeit(matmul_vjp, x, reps=args.reps)
        grad_exact = None
        if not args.skip_exact:
            grad_exact = bool(jnp.all(jax.jit(
                lambda x: jnp.all(
                    jax.vjp(gather_full, x)[1](jnp.ones((N, H, T, T), jnp.float32))[0]
                    == jax.vjp(matmul_full, x)[1](jnp.ones((N, H, T, T), jnp.float32))[0]
                )
            )(x)))
        print(json.dumps({
            "T": T, "N": N, "H": H, "T_M": T_M, "block_rows": args.block_rows,
            "gather_fwd_s": round(tg, 4), "matmul_fwd_s": round(tm, 4),
            "gather_bwd_s": round(tgb, 4), "matmul_bwd_s": round(tmb, 4),
            "bit_exact_fwd": exact, "bit_exact_grad": grad_exact,
        }), flush=True)


if __name__ == "__main__":
    main()
