"""Tensor-parallel sharding rules (parallel/tp.py): spec assignment by
parameter name, and numerical equivalence of TP-sharded forwards/grads on
the virtual 8-device CPU mesh (the memory plan for the llama-7b/13b and
opt-1.3b/2.7b configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sea_tpu.models.llama import LlamaForCausalLM, llama_tiny
from sea_tpu.parallel.tp import (
    make_tp_mesh,
    shard_params_tp,
    tp_param_specs,
)
from tests.test_opt_kd import tiny_opt
from sea_tpu.models.opt import OptForCausalLM


def _ids(N, T, vocab, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(4, vocab, (N, T)), jnp.int32),
        jnp.ones((N, T), jnp.int32),
    )


def test_spec_rules_llama():
    cfg = llama_tiny("perlin")
    model = LlamaForCausalLM(cfg)
    ids, mask = _ids(1, 8, cfg.vocab_size)
    params = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()["params"]
    mesh = make_tp_mesh(dp=2, tp=4)
    specs = tp_param_specs(params, mesh)
    L0 = specs["model"]["layers_0"]
    assert L0["self_attn"]["q_proj"]["kernel"] == P(None, "tp")
    assert L0["self_attn"]["o_proj"]["kernel"] == P("tp", None)
    assert L0["mlp"]["gate_proj"]["kernel"] == P(None, "tp")
    assert L0["mlp"]["down_proj"]["kernel"] == P("tp", None)
    assert L0["input_layernorm"]["scale"] == P()
    assert specs["lm_head"]["kernel"] == P(None, "tp")
    assert specs["model"]["embed_tokens"]["embedding"] == P()
    # the SEA estimator stays replicated
    flat = jax.tree_util.tree_leaves_with_path(L0["self_attn"]["perlin"])
    assert all(spec == P() for _, spec in flat)


def test_spec_rules_opt_bias_and_scan():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    ids, mask = _ids(1, 8, cfg.vocab_size)
    params = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()["params"]
    mesh = make_tp_mesh(dp=4, tp=2)
    specs = tp_param_specs(params, mesh)
    L0 = specs["model"]["layers_0"]
    assert L0["self_attn"]["q_proj"]["kernel"] == P(None, "tp")
    assert L0["self_attn"]["q_proj"]["bias"] == P("tp")
    assert L0["self_attn"]["out_proj"]["kernel"] == P("tp", None)
    assert L0["self_attn"]["out_proj"]["bias"] == P()
    assert L0["fc1"]["kernel"] == P(None, "tp")
    assert L0["fc2"]["kernel"] == P("tp", None)

    # scan-stacked layout: leading layer dim unsharded, same body specs
    from sea_tpu.models.opt import stack_layer_params

    stacked = stack_layer_params(jax.device_get(params), cfg.num_layers)
    sspecs = tp_param_specs(stacked, mesh)
    body = sspecs["model"]["layers_scan"]["layer"]
    assert body["self_attn"]["q_proj"]["kernel"] == P(None, None, "tp")
    assert body["self_attn"]["out_proj"]["kernel"] == P(None, "tp", None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_forward_matches_replicated_llama():
    cfg = llama_tiny("perlin")
    model = LlamaForCausalLM(cfg)
    ids, mask = _ids(2, 16, cfg.vocab_size, seed=1)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    ref = np.asarray(
        jax.jit(lambda v: model.apply(v, ids, mask)["logits"])(variables)
    )

    mesh = make_tp_mesh(dp=2, tp=4)
    params_tp = shard_params_tp(variables["params"], mesh)
    extra = {k: v for k, v in variables.items() if k != "params"}
    data_sh = NamedSharding(mesh, P("dp"))
    ids_s = jax.device_put(ids, data_sh)
    mask_s = jax.device_put(mask, data_sh)
    with mesh:
        out = jax.jit(
            lambda p, i, m: model.apply({**extra, "params": p}, i, m)["logits"]
        )(params_tp, ids_s, mask_s)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_tp_benchmark_fused_head_sharded():
    """TP x fused benchmark path (VERDICT r2 #4): GSPMD cannot partition a
    pallas_call, so when a tp axis is active the fused kernel must run
    through head_sharded_sea_attention over that axis — entered via
    sharded_attention_scope(mesh, axis='tp', kind='head'). The TP-sharded
    benchmark forward must equal the replicated one."""
    from sea_tpu.parallel.context import sharded_attention_scope

    cfg = tiny_opt("perlin")  # H=2 shards over tp=2
    model = OptForCausalLM(cfg)
    ids, mask = _ids(2, 64, cfg.vocab_size, seed=3)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    ref = np.asarray(
        jax.jit(
            lambda v: model.apply(v, ids, mask, benchmarking=True)["logits"]
        )(variables)
    )

    mesh = make_tp_mesh(dp=4, tp=2)
    params_tp = shard_params_tp(variables["params"], mesh)
    extra = {k: v for k, v in variables.items() if k != "params"}
    with mesh, sharded_attention_scope(mesh, axis="tp", kind="head"):
        out = jax.jit(
            lambda p, i, m: model.apply(
                {**extra, "params": p}, i, m, benchmarking=True
            )["logits"]
        )(params_tp, ids, mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_kd_grad_matches_replicated():
    from sea_tpu.training.distill import SeaOptKD

    t_cfg = llama_tiny("none")
    s_cfg = llama_tiny("perlin")
    kd = SeaOptKD(t_cfg, s_cfg)
    ids, mask = _ids(2, 16, t_cfg.vocab_size, seed=2)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()

    def loss_fn(sp):
        sv = {**{k: v for k, v in s_vars.items() if k != "params"}, "params": sp}
        return kd.kd_loss(t_vars, sv, ids, mask, ids, use_remat=False)[0]

    g_ref = jax.jit(jax.grad(loss_fn))(s_vars["params"])

    mesh = make_tp_mesh(dp=2, tp=4)
    sp_tp = shard_params_tp(s_vars["params"], mesh)
    with mesh:
        g_tp = jax.jit(jax.grad(loss_fn))(sp_tp)

    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    tp_leaves = jax.tree_util.tree_leaves(g_tp)
    for a, b in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        )
