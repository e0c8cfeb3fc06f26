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


def attention_method_sweep(
    methods: Optional[List[str]] = None,
    seq_lens: Optional[List[int]] = None,
    num_heads: int = 12,
    head_dim: int = 64,
    t_m: int = 256,
    k: int = 64,
) -> List[Dict]:
    """Latency per attention operator across sequence lengths."""
    from sea_tpu.ops.kernels.block_sparse import sea_block_sparse_attention
    from sea_tpu.ops.performer import (
        fast_attention,
        gaussian_orthogonal_random_matrix,
    )

    methods = methods or ["dense", "performer", "sea_fused"]
    seq_lens = seq_lens or [1024, 2048, 4096]
    H, D = num_heads, head_dim
    proj = gaussian_orthogonal_random_matrix(jax.random.key(0), 266, D)
    results = []
    for T in seq_lens:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32) * 0.2)
        kk = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32) * 0.2)
        v = jnp.asarray(rng.standard_normal((1, H, T, D)).astype(np.float32))
        mask_m = jnp.asarray(
            (rng.uniform(size=(1, H, T, t_m)) < min(k * t_m / T, 1.0)).astype(
                np.float32
            )
        )
        fpmin = float(np.finfo(np.float32).min) / 2
        causal = jnp.where(jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin)[None, None]

        fns = {
            "dense": jax.jit(
                lambda q, kk, v: jnp.einsum(
                    "nhts,nhsd->nhtd",
                    jax.nn.softmax(
                        jnp.einsum("nhtd,nhsd->nhts", q, kk) + causal, -1
                    ),
                    v,
                )
            ),
            "performer": jax.jit(
                lambda q, kk, v: fast_attention(
                    q, kk, v, proj, causal=True, generalized=True
                )
            ),
            "sea_fused": jax.jit(
                lambda q, kk, v: sea_block_sparse_attention(
                    q, kk, v, mask_m, None, is_causal=True,
                    interpret=jax.default_backend() != "tpu",
                )
            ),
        }
        for m in methods:
            try:
                dt = timeit(fns[m], q, kk, v, iters=5)
                results.append(
                    {"method": m, "seq_len": T, "ms": round(dt * 1e3, 3)}
                )
            except Exception as e:  # OOM-tolerant, like the reference harness
                results.append({"method": m, "seq_len": T, "error": str(e)[:200]})
    return results


def scaling_sweep(device_counts: Optional[List[int]] = None) -> List[Dict]:
    """SEA attention forward throughput on 1..n-device (dp x sp) meshes —
    the 1-chip -> n scaling-efficiency measurement (on CPU this validates
    the sharding; on a pod slice it measures real ICI scaling)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sea_tpu.config import SeaConfig
    from sea_tpu.models.attention import SeaAttention
    from sea_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    device_counts = device_counts or sorted(
        {1, min(2, n_avail), min(4, n_avail), n_avail}
    )
    cfg = SeaConfig(
        num_heads=4, head_dim=32, predictor_length=32, k=8,
        performer_nb_factor=1, causal=True, max_position_embeddings=512,
    ).validate()
    N, T = 4, 256
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
        return model.apply(p, q, q, q, q, q, q, q, q, mask).context_layer

    results = []
    base = None
    for n in device_counts:
        if n > n_avail:
            continue
        sp = 2 if n % 2 == 0 else 1
        dp = n // sp
        mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[:n])
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("dp", None, "sp", None))
        mshard = NamedSharding(mesh, P("dp", None, "sp", None))
        f = jax.jit(
            fwd,
            in_shardings=(repl, shard, mshard),
            out_shardings=NamedSharding(mesh, P("dp", "sp", None)),
        )
        dt = timeit(
            f,
            jax.device_put(params, repl),
            jax.device_put(q, shard),
            jax.device_put(causal, mshard),
            iters=5,
        )
        tput = 1.0 / dt
        if base is None:
            base = tput / n if n else tput
        eff = tput / (n * base) if base else 1.0
        results.append(
            {
                "devices": n,
                "mesh": f"dp{dp}xsp{sp}",
                "ms": round(dt * 1e3, 3),
                "scaling_eff": round(eff, 3),
            }
        )
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="attention", choices=["attention", "scaling"])
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if args.suite == "attention":
        res = attention_method_sweep()
    else:
        res = scaling_sweep()
    out = json.dumps(res, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
