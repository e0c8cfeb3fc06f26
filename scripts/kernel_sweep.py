"""On-chip sweep of the fused kernel across block configs and mask styles.

Run AFTER bench.py (remote compile serializes). Prints one JSON line per
variant. Timing: jitted fori_loop with data dependency + device-to-host
read (the only reliable timing through the axon relay)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ITERS = 10


def host_topk_mask(N, H, T, T_M, K, seed=0, corr_len=None):
    rng = np.random.default_rng(seed)
    if corr_len:
        scores = np.zeros((N, T, H * T_M), np.float32)
        x = rng.standard_normal((N, H * T_M)).astype(np.float32)
        rho = np.exp(-1.0 / corr_len)
        nse = np.sqrt(1 - rho * rho)
        for r in range(T):
            x = rho * x + nse * rng.standard_normal((N, H * T_M)).astype(np.float32)
            scores[:, r] = x
    else:
        scores = rng.standard_normal((N, T, H * T_M)).astype(np.float32)
    flat = np.zeros_like(scores)
    for r in range(T):
        budget = min(max(round(H * K * T_M / (r + 1)), 1), H * T_M)
        idx = np.argpartition(-scores[:, r], budget - 1, axis=-1)[:, :budget]
        for n in range(N):
            flat[n, r, idx[n]] = 1.0
    return np.transpose(flat.reshape(N, T, H, T_M), (0, 2, 1, 3)).copy()


def main():
    from sea_tpu.ops.kernels.block_sparse import (
        mask_nnz,
        sea_block_sparse_attention,
    )

    N, H, T, D, T_M, K = 1, 12, 4096, 64, 256, 64
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32)).astype(dt)
    scaler = jnp.asarray(rng.uniform(0.1, 1.0, (N, H, T)).astype(np.float32)).astype(dt)

    def repeat(fn):
        def wrapped(q, *args):
            def body(i, c):
                return c + 1e-30 * fn(c, *args)

            return jax.lax.fori_loop(0, ITERS, body, q)

        return jax.jit(wrapped)

    def timeit(fn, *args, reps=3):
        np.asarray(fn(*args)[0, 0, 0, 0])  # warmup/compile
        best = float("inf")
        for _ in range(reps):  # min-of-reps beats relay jitter
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    noop = repeat(lambda q, *a: q)
    t0 = timeit(noop, q)

    fpmin = float(np.finfo(np.float32).min) / 2
    causal = jnp.where(jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin)[None, None]
    dense1 = repeat(
        lambda q, k, v: jnp.einsum(
            "nhts,nhsd->nhtd",
            jax.nn.softmax(
                jnp.einsum("nhtd,nhsd->nhts", q, k).astype(jnp.float32) + causal,
                -1,
            ).astype(q.dtype),
            v,
        )
    )
    t_dense = max((timeit(dense1, q, k, v) - t0) / ITERS, 1e-9)
    print(json.dumps({"variant": "dense_xla", "ms": t_dense * 1e3}), flush=True)

    variants = [
        ("flat", 512, 512),
        ("flat", 1024, 512),
        ("flat", 256, 512),
        ("flat_wr", 512, 512),
        ("flat_fori", 512, 512),
        ("flat_fori", 1024, 512),
        ("flat_fori", 256, 512),
    ]
    for mask_name, corr in (("random", None), ("predictor_c256", 256)):
        mask = jnp.asarray(host_topk_mask(N, H, T, T_M, K, corr_len=corr))
        nnz = int(mask_nnz(mask, T, True))
        for impl, bq, bk in variants:
            fn = repeat(
                lambda q, k, v, m, s, impl=impl, bq=bq, bk=bk:
                sea_block_sparse_attention(
                    q, k, v, m, s, is_causal=True, block_q=bq, block_k=bk,
                    impl=impl,
                )
            )
            try:
                t = max((timeit(fn, q, k, v, mask, scaler) - t0) / ITERS, 1e-9)
            except Exception as e:  # keep sweeping on a failed variant
                print(json.dumps({"variant": f"{impl} bq{bq} bk{bk} {mask_name}",
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(
                json.dumps(
                    {
                        "variant": f"{impl} bq{bq} bk{bk} {mask_name}",
                        "ms": round(t * 1e3, 3),
                        "nnz_per_s": float(f"{nnz / t:.4g}"),
                        "vs_dense": round(t_dense / t, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
