"""Headline benchmark: fused SEA block-sparse attention throughput on chip.

Canonical OPT configuration (N=1, H=12, T=4096, D=64, T_M=256, k=64 —
reference README.md:59 and the latency harness
`src/main/tests/test_perlin_benchmark.py`). The compressed top-k mask is
built host-side with the exact per-row budget schedule
round(H*k*T_M/w_r) (reference attention.py:856) so the kernel sees the
production sparsity pattern; the timed region is the fused Pallas kernel
(mask expansion + tile-skipped flash attention + row scaler) — the part the
reference implements as 4 Triton kernels + interpolation.

Timing methodology: the kernel is iterated inside one jitted fori_loop with
a data dependency between iterations, then a single device-to-host read —
through the remote axon runtime, per-call host timing measures only relay
round-trips. ITERS=60 puts ~60-100 ms of device work behind each sync so
the relay's multi-ms jitter is <5% of the measurement; each timing is
additionally min-of-4 reps, and the kernel block shape is autotuned over
the production candidates {512x512, 1024x512, 256x512} — block shape is a
compile-time knob a deployment tunes per (T, sparsity) config, like the
reference's Triton autotune over num_warps/block sizes.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline = speedup over dense fp32 softmax attention of the same shape
on the same chip (how the reference's own benchmark tables report).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: repeated bench runs (and the driver's run after
# a builder session) skip the remote-compile tunnel for cached executables
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ITERS = 240  # keeps ~300 ms of device work behind each sync: the relay's
# 24-43 ms round-trip must stay well under the 20% tamper-guard bound now
# that the kernel runs ~1 ms/call (at ITERS=60 the guard fired and the
# conservative no-subtraction fallback understated the headline ~20%)
ITERS_CPU = 2  # interpret mode is seconds-per-call; smoke only
# sustained pre-timing load to reach steady clock state (SEA_BENCH_WARM
# overrides for A/B experiments; SEA_BENCH_DEBUG=1 prints per-candidate ms)
WARM_SECONDS = float(os.environ.get("SEA_BENCH_WARM", "5.0"))
DEBUG = os.environ.get("SEA_BENCH_DEBUG") == "1"


def host_topk_mask(N, H, T, T_M, K, seed=0):
    """Per-row compressed mask with the reference budget schedule."""
    rng = np.random.default_rng(seed)
    flat = np.zeros((N, T, H * T_M), np.float32)
    for r in range(T):
        budget = min(max(round(H * K * T_M / (r + 1)), 1), H * T_M)
        for n in range(N):
            flat[n, r, rng.choice(H * T_M, size=budget, replace=False)] = 1.0
    return np.transpose(flat.reshape(N, T, H, T_M), (0, 2, 1, 3)).copy()


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        N, H, T, D, T_M, K = 1, 12, 4096, 64, 256, 64
    else:  # CPU smoke mode
        N, H, T, D, T_M, K = 1, 2, 256, 64, 32, 16
        global ITERS
        ITERS = ITERS_CPU

    from sea_tpu.ops.kernels.block_sparse import (
        mask_nnz,
        sea_block_sparse_attention,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32)).astype(dt)
    scaler = jnp.asarray(rng.uniform(0.1, 1.0, (N, H, T)).astype(np.float32)).astype(dt)
    mask = jnp.asarray(host_topk_mask(N, H, T, T_M, K))

    fpmin = float(np.finfo(np.float32).min) / 2
    causal = jnp.where(jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin)[None, None]

    def repeat(fn):
        def wrapped(q, *args):
            def body(i, c):
                return c + 1e-30 * fn(c, *args)

            return jax.lax.fori_loop(0, ITERS, body, q)

        return jax.jit(wrapped)

    # autotune over (block shape, impl): 'flat_wr' predicates the packed-
    # word select chain per tile over TIGHT (pixel-padded) word ranges —
    # ~2.5 of 8 words at this config — measured 17-20% faster than 'flat'
    # once the round-4 range tightening landed (docs/kernel_design.md).
    # The winner still varies with session clock state, so take the min.
    block_candidates = (
        [
            (512, 512, "flat_wr"),
            (1024, 512, "flat_wr"),
            (256, 512, "flat_wr"),
            # r5: 256-wide k-blocks make ~46% of causal tiles hit the new
            # span-1/span-2 exact-range fast paths (one broadcast or one
            # two-way select replaces the first/RMW word chain)
            (256, 256, "flat_wr"),
            (512, 256, "flat_wr"),
            (512, 512, "flat"),
            (1024, 512, "flat"),
        ]
        if on_tpu
        else [(None, None, "flat")]
    )
    sparse_fns = [
        repeat(
            lambda q, k, v, m, s, bq=bq, bk=bk, im=im: sea_block_sparse_attention(
                q, k, v, m, s, is_causal=True, block_q=bq, block_k=bk,
                impl=im, interpret=not on_tpu,
            )
        )
        for bq, bk, im in block_candidates
    ]
    noop = repeat(lambda q, *a: q)
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

    def timeit(fn, *args, reps=4):
        np.asarray(fn(*args)[0, 0, 0, 0])  # warmup/compile
        best = float("inf")
        for _ in range(reps):  # min-of-reps beats relay jitter
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    # compile everything first, then hold the chip under sustained load
    # before timing: the device-trace study (docs/kernel_design.md,
    # "Cross-session variance") attributed up-to-1.8x session-level kernel
    # slowdowns to on-device clock/power state — an idle chip measures the
    # VPU-bound kernel at reduced clocks while the HBM-bound dense path is
    # unaffected. Each fn call below keeps ITERS kernels back-to-back on
    # device, so a few seconds of this is continuous device work.
    for fn in sparse_fns:
        np.asarray(fn(q, k, v, mask, scaler)[0, 0, 0, 0])
    np.asarray(dense1(q, k, v)[0, 0, 0, 0])
    if on_tpu:
        warm_end = time.perf_counter() + WARM_SECONDS
        while time.perf_counter() < warm_end:
            np.asarray(sparse_fns[0](q, k, v, mask, scaler)[0, 0, 0, 0])
            np.asarray(dense1(q, k, v)[0, 0, 0, 0])

    t0 = timeit(noop, q, k, v, mask, scaler)
    cand_ts = [timeit(fn, q, k, v, mask, scaler) for fn in sparse_fns]
    if DEBUG:
        for (bq, bk, im), t in zip(block_candidates, cand_ts):
            print(f"# {im} {bq}x{bk}: {(t - t0) / ITERS * 1e3:.3f} ms")
    t_sparse_raw = min(cand_ts)
    t_dense_raw = timeit(dense1, q, k, v)
    if DEBUG:
        print(f"# dense: {(t_dense_raw - t0) / ITERS * 1e3:.3f} ms  "
              f"(noop {t0 * 1e3:.1f} ms total)")
    # tamper-proofing: the dispatch-overhead baseline must be small next to
    # the timed work, or the subtraction would dominate the headline number
    # (e.g. if XLA ever collapsed the noop's fori_loop). Fall back to the
    # conservative no-subtraction timing if the invariant breaks.
    if not (t0 < 0.2 * t_sparse_raw):
        t0 = 0.0
    t_sparse = max((t_sparse_raw - t0) / ITERS, 1e-9)
    t_dense = max((t_dense_raw - t0) / ITERS, 1e-9)

    nnz = int(mask_nnz(mask, T, True))

    result = {
        "metric": "sea_fused_sparse_attention_nnz_per_s",
        "value": float(f"{nnz / t_sparse:.4g}"),
        "unit": f"nnz/s (N{N} H{H} T{T} D{D} Tm{T_M} k{K}, {jax.default_backend()})",
        "vs_baseline": float(f"{t_dense / t_sparse:.4g}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
