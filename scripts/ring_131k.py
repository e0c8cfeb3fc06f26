"""T=131072 ring train step on the virtual CPU mesh (VERDICT r4 #6).

Extends the long-context ceiling table past one chip: a differentiable
sp=2 ring attention step (`ring_fused_train_attention`, K/V and dk/dv
sequence-sharded) at double the proven single-chip ceiling, executed on
the 8-virtual-device CPU mesh with per-shard buffer accounting from
XLA's compiled-buffer analysis.

Interpret-mode Pallas (the CPU path) has no VMEM/tiling constraints, so
large blocks keep the instance count tractable; the per-shard BUFFER
story (q/k/v/mask shards, flash accumulators) is geometry, not backend.

Usage: python scripts/ring_131k.py [T] [block]
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    sp = 2
    N, H, D, T_M = 1, 2, 64, 256
    from sea_tpu.parallel.sharded_attention import ring_fused_train_attention

    devs = jax.devices()[:sp]
    mesh = Mesh(np.asarray(devs), ("sp",))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(N, H, T, T_M)) < 0.25).astype(np.float32)
    )
    scaler = jnp.asarray(rng.uniform(0.1, 1.0, (N, H, T)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))

    def loss(q, k, v, scaler):
        o = ring_fused_train_attention(
            q, k, v, mask, scaler, mesh, "sp", True, block, block, True
        )
        return jnp.mean((o - tgt) ** 2)

    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    t0 = time.time()
    lowered = fn.lower(q, k, v, scaler)
    compiled = lowered.compile()
    t_compile = time.time() - t0
    st = compiled.memory_analysis()
    t0 = time.time()
    l, g = compiled(q, k, v, scaler)
    l = float(l)  # forces completion
    t_run = time.time() - t0
    gmax = max(float(jnp.abs(x).max()) for x in g)
    assert np.isfinite(l) and np.isfinite(gmax)

    bytes_per_shard_kv = 2 * N * H * (T // sp) * D * 4
    bytes_per_shard_q = N * H * (T // sp) * D * 4
    bytes_per_shard_mask = N * H * (T // sp) * T_M * 4
    print(f"T={T} sp={sp} block={block}  loss={l:.5f} max|g|={gmax:.3e}")
    print(f"compile {t_compile:.1f}s  step {t_run:.1f}s (CPU, interpret)")
    print(
        "per-shard resident shards: "
        f"K+V {bytes_per_shard_kv/2**20:.0f} MiB, "
        f"Q {bytes_per_shard_q/2**20:.0f} MiB, "
        f"mask {bytes_per_shard_mask/2**20:.0f} MiB "
        f"(vs unsharded K+V {bytes_per_shard_kv*sp/2**20:.0f} MiB)"
    )
    print(
        "XLA whole-step buffers (all shards + interpret scratch): "
        f"temp {st.temp_size_in_bytes/2**20:.0f} MiB, "
        f"args {st.argument_size_in_bytes/2**20:.0f} MiB, "
        f"out {st.output_size_in_bytes/2**20:.0f} MiB"
    )


if __name__ == "__main__":
    main()
