"""Pipeline parallelism (GPipe over a `pp` mesh axis): the pipelined
forward/backward must be semantics-free relative to the loop path —
identical logits and identical gradients — for both model families."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.models.opt import (
    OptForCausalLM,
    cross_entropy_shifted,
    stack_layer_params,
)
from sea_tpu.parallel.pp import (
    make_pp_mesh,
    pp_causal_lm_forward,
    shard_params_pp,
    split_scan_vars,
)
from tests.test_opt_kd import tiny_opt, make_batch


def four_layer_opt(method="perlin"):
    return dataclasses.replace(tiny_opt(method), num_layers=4)


def scan_vars_from_loop(v_loop, num_layers):
    out = {"params": stack_layer_params(v_loop["params"], num_layers)}
    if "performer" in v_loop:
        out["performer"] = stack_layer_params(v_loop["performer"], num_layers)
    return out


@pytest.fixture(scope="module")
def pp_setup():
    cfg_loop = four_layer_opt("perlin")
    cfg_scan = dataclasses.replace(cfg_loop, scan_layers=True)
    ids, mask = make_batch(N=4, T=16, vocab=cfg_loop.vocab_size)
    m_loop = OptForCausalLM(cfg_loop)
    v_loop = jax.jit(lambda: m_loop.init(jax.random.key(0), ids, mask))()
    out_loop = jax.jit(lambda v: m_loop.apply(v, ids, mask)["logits"])(v_loop)
    m_scan = OptForCausalLM(cfg_scan)
    v_scan = scan_vars_from_loop(v_loop, cfg_loop.num_layers)
    return cfg_loop, m_scan, v_scan, ids, mask, out_loop


@pytest.mark.parametrize("num_micro", [1, 2, 4])
def test_pp_forward_matches_loop(pp_setup, num_micro):
    cfg, m_scan, v_scan, ids, mask, out_loop = pp_setup
    mesh = make_pp_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    logits, aux = jax.jit(
        lambda v: pp_causal_lm_forward(
            m_scan, v, ids, mask, mesh=mesh, num_microbatches=num_micro
        )
    )(v_scan)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out_loop), atol=3e-5
    )
    assert np.isfinite(float(aux))


def test_pp_grads_match_scan(pp_setup):
    cfg, m_scan, v_scan, ids, mask, _ = pp_setup
    mesh = make_pp_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    labels = ids

    def loss_pp(p):
        v = {**v_scan, "params": p}
        logits, _ = pp_causal_lm_forward(
            m_scan, v, ids, mask, mesh=mesh, num_microbatches=2
        )
        return cross_entropy_shifted(logits, labels)

    def loss_scan(p):
        v = {**v_scan, "params": p}
        return m_scan.apply(v, ids, mask, labels=labels)["loss"]

    g_pp = jax.jit(jax.grad(loss_pp))(v_scan["params"])
    g_scan = jax.jit(jax.grad(loss_scan))(v_scan["params"])
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_scan = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_scan)
    )
    assert len(flat_pp) == len(flat_scan)
    for key, g in flat_pp:
        np.testing.assert_allclose(
            np.asarray(g),
            np.asarray(flat_scan[jax.tree_util.keystr(key)]),
            atol=2e-4,
            err_msg=jax.tree_util.keystr(key),
        )


def test_pp_dp_composed(pp_setup):
    """dp2 x pp4 over all 8 virtual devices: batch rows sharded over dp
    inside the pipeline, still bit-consistent with the loop path."""
    cfg, m_scan, v_scan, ids, mask, out_loop = pp_setup
    mesh = make_pp_mesh(dp=2, pp=4)
    logits, _ = jax.jit(
        lambda v: pp_causal_lm_forward(
            m_scan,
            v,
            ids,
            mask,
            mesh=mesh,
            num_microbatches=2,
            dp_axis="dp",
        )
    )(v_scan)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out_loop), atol=3e-5
    )


def test_pp_llama_forward():
    """Same pipeline machinery over the LLaMA family (RoPE bundle is
    microbatch-sliced alongside the hidden states)."""
    from sea_tpu.models.llama import LlamaForCausalLM, llama_tiny

    cfg = dataclasses.replace(llama_tiny("perlin"), num_layers=4)
    cfg_scan = dataclasses.replace(cfg, scan_layers=True)
    ids, mask = make_batch(N=2, T=16, vocab=cfg.vocab_size)
    m_loop = LlamaForCausalLM(cfg)
    v_loop = jax.jit(lambda: m_loop.init(jax.random.key(0), ids, mask))()
    out_loop = jax.jit(lambda v: m_loop.apply(v, ids, mask)["logits"])(v_loop)

    m_scan = LlamaForCausalLM(cfg_scan)
    v_scan = scan_vars_from_loop(v_loop, cfg.num_layers)
    mesh = make_pp_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    logits, _ = jax.jit(
        lambda v: pp_causal_lm_forward(
            m_scan, v, ids, mask, mesh=mesh, num_microbatches=2
        )
    )(v_scan)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(out_loop), atol=3e-5
    )
