"""Headline benchmark: SEA sparse-attention pipeline throughput (nnz/s/chip).

Measures the benchmark-path sparse attention chain on the canonical OPT
configuration (N=1, H=12, T=4096, D=64, T_M=256, k=64 — reference
README.md:59, benchmark harness `src/main/tests/test_perlin_benchmark.py`):
top-k compressed mask -> uniform-CSR expansion -> masked SDDMM -> segmented
softmax -> row scale -> SpMM.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over a dense fp32 softmax attention of the same
shape on the same chip (the reference's own latency harness compares
against the dense baseline the same way).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        N, H, T, D, T_M, K = 1, 12, 4096, 64, 256, 64
        dtype = jnp.float32
    else:  # CPU smoke mode
        N, H, T, D, T_M, K = 1, 4, 512, 32, 64, 16
        dtype = jnp.float32

    from sea_tpu.ops import flat_csr as fc
    from sea_tpu.ops.masks import causal_topk_masking

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((N, H, T, D)), dtype) * 0.1
    k = jnp.asarray(rng.standard_normal((N, H, T, D)), dtype) * 0.1
    v = jnp.asarray(rng.standard_normal((N, H, T, D)), dtype)
    est = jnp.asarray(rng.uniform(size=(N, H, T, T_M)), dtype)
    scaler = jnp.asarray(rng.uniform(size=(N, H, T)), dtype)
    fpmin = float(np.finfo(np.float32).min) / 2
    causal = jnp.where(jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin)
    causal = jnp.broadcast_to(causal[None, None], (N, 1, T, T))
    zeros_mask = jnp.zeros((N, 1, T, 1), dtype)

    def sparse_pipeline(est, q, k, v, scaler):
        mask = causal_topk_masking(
            est,
            k=K,
            attention_mask=zeros_mask[..., :1],
            dst_attention_mask=zeros_mask,
            causal_attention_mask=causal,
            benchmarking=True,
        )
        csr = fc.resize_from_m_to_t_csr(mask, K, T, is_causal=True)
        csr = fc.flat_csr_masked_bmm(q, k, csr)
        csr = fc.flat_csr_softmax(csr)
        csr = fc.flat_csr_elmul(csr, scaler)
        out = fc.flat_csr_sdbmm(csr, v)
        nnz = csr.valid.sum()
        return out, nnz

    def dense_attention(q, k, v):
        s = jnp.einsum("nhtd,nhsd->nhts", q, k) + causal
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("nhts,nhsd->nhtd", p, v)

    sp = jax.jit(sparse_pipeline)
    dn = jax.jit(dense_attention)

    # warmup
    out, nnz = sp(est, q, k, v, scaler)
    jax.block_until_ready(out)
    nnz = int(nnz)
    dout = dn(q, k, v)
    jax.block_until_ready(dout)

    def timeit(fn, *args, iters=20):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    t_sparse = timeit(sp, est, q, k, v, scaler)
    t_dense = timeit(dn, q, k, v)

    nnz_per_s = nnz / t_sparse
    result = {
        "metric": "sea_sparse_attention_nnz_per_s",
        "value": float(f"{nnz_per_s:.4g}"),
        "unit": f"nnz/s (N{N} H{H} T{T} D{D} Tm{T_M} k{K}, {'tpu' if on_tpu else 'cpu'})",
        "vs_baseline": float(f"{t_dense / t_sparse:.4g}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
