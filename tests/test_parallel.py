"""Sharded training-step tests on the virtual 8-device CPU mesh
(SURVEY §7 stage-6 gate; the reference has no distributed tests at all —
SURVEY §4.5 'the TPU build should do better')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sea_tpu.parallel.mesh import make_mesh, opt_state_sharding


def test_mesh_shapes():
    mesh = make_mesh(dp=2, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}
    mesh = make_mesh()
    assert mesh.size == 8


def test_dryrun_multichip_entrypoint():
    """The driver-facing multichip dry run must compile and execute."""
    import importlib.util, sys, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_attention_matches_single_device():
    """SEA attention forward under (dp, sp) sharding must equal the
    single-device result (XLA inserts the K/V gathers)."""
    from tests.test_attention import small_cfg, make_inputs
    from sea_tpu.models.attention import SeaAttention

    cfg = small_cfg(causal=True)
    inputs = make_inputs(cfg, N=2, T=32)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = jax.jit(
        lambda: model.init(
            jax.random.key(0), q, k, v, q, k, v, q, k, mask,
            attention_scores_truth=truth, context_layer_truth=ctx_truth,
        )
    )()

    def fwd(p, q, k, v, mask):
        return model.apply(
            p, q, k, v, q, k, v, q, k, mask, benchmarking=False
        ).context_layer

    single = jax.jit(fwd)(params, q, k, v, mask)

    mesh = make_mesh(dp=2, sp=4)
    repl = NamedSharding(mesh, P())
    qkv_shard = NamedSharding(mesh, P("dp", None, "sp", None))
    mask_shard = NamedSharding(mesh, P("dp", None, "sp", None))
    sharded_fwd = jax.jit(
        fwd,
        in_shardings=(repl, qkv_shard, qkv_shard, qkv_shard, mask_shard),
        out_shardings=NamedSharding(mesh, P("dp", "sp", None)),
    )
    multi = sharded_fwd(
        jax.device_put(params, repl),
        jax.device_put(q, qkv_shard),
        jax.device_put(k, qkv_shard),
        jax.device_put(v, qkv_shard),
        jax.device_put(mask, mask_shard),
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(multi), atol=2e-5
    )


def test_scaling_sweep_sparse_benchmark():
    """The scaling harness drives the sharded sparse benchmark forward and
    produces finite nnz/s for each device count (8-virtual-device CPU)."""
    from sea_tpu.benchmarks import scaling_sweep

    res = scaling_sweep(device_counts=[1, 2, 4, 8])
    assert [r["devices"] for r in res] == [1, 2, 4, 8]
    for r in res:
        assert r["nnz_per_s"] > 0 and np.isfinite(r["nnz_per_s"])
        assert "seq fused kernel" in r["mesh"]
