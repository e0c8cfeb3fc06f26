"""scan_layers path: identical logits to the loop path after param
conversion (the compile-time optimisation must be semantics-free)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.models.opt import (
    OptForCausalLM,
    stack_layer_params,
    unstack_layer_params,
)
from tests.test_opt_kd import tiny_opt, make_batch


def test_scan_matches_loop():
    cfg_loop = tiny_opt("perlin")
    cfg_scan = dataclasses.replace(cfg_loop, scan_layers=True)
    ids, mask = make_batch(N=1, T=16, vocab=cfg_loop.vocab_size)

    m_loop = OptForCausalLM(cfg_loop)
    v_loop = jax.jit(lambda: m_loop.init(jax.random.key(0), ids, mask))()
    out_loop = jax.jit(lambda v: m_loop.apply(v, ids, mask)["logits"])(v_loop)

    m_scan = OptForCausalLM(cfg_scan)
    stacked_params = stack_layer_params(v_loop["params"], cfg_loop.num_layers)
    v_scan = {"params": stacked_params}
    # performer projections also need stacking when present
    if "performer" in v_loop:
        v_scan["performer"] = stack_layer_params(
            v_loop["performer"], cfg_loop.num_layers
        ) if "model" in v_loop["performer"] else v_loop["performer"]
    out_scan = jax.jit(lambda v: m_scan.apply(v, ids, mask)["logits"])(v_scan)

    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), atol=2e-5
    )

    # roundtrip
    back = unstack_layer_params(stacked_params, cfg_loop.num_layers)
    for a, b in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(v_loop["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scan_benchmarking_matches_loop_benchmark():
    """scan_benchmarking=True routes the scanned body through the fused
    benchmark path and matches the loop-layout benchmark forward (the
    driver's entry() configuration)."""
    cfg_loop = tiny_opt("perlin")
    cfg_scan = dataclasses.replace(
        cfg_loop, scan_layers=True, scan_benchmarking=True
    )
    # lane-multiple length for the fused kernel
    ids, mask = make_batch(N=1, T=64, vocab=cfg_loop.vocab_size)

    m_loop = OptForCausalLM(cfg_loop)
    v_loop = jax.jit(lambda: m_loop.init(jax.random.key(0), ids, mask))()
    out_loop = jax.jit(
        lambda v: m_loop.apply(v, ids, mask, benchmarking=True)["logits"]
    )(v_loop)

    m_scan = OptForCausalLM(cfg_scan)
    stacked_params = stack_layer_params(v_loop["params"], cfg_loop.num_layers)
    v_scan = {"params": stacked_params}
    if "performer" in v_loop:
        v_scan["performer"] = stack_layer_params(
            v_loop["performer"], cfg_loop.num_layers
        ) if "model" in v_loop["performer"] else v_loop["performer"]
    out_scan = jax.jit(
        lambda v: m_scan.apply(v, ids, mask, benchmarking=True)["logits"]
    )(v_scan)
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), atol=2e-5
    )


def test_scan_remat_grads_match():
    """scan_remat recomputes the layer body under grad with identical
    gradients (the long-context training memory plan)."""
    cfg = dataclasses.replace(tiny_opt("perlin"), scan_layers=True)
    cfg_r = dataclasses.replace(cfg, scan_remat=True)
    ids, mask = make_batch(N=1, T=16, vocab=cfg.vocab_size)

    def grads(c):
        m = OptForCausalLM(c)
        v = jax.jit(lambda: m.init(jax.random.key(0), ids, mask))()

        def loss(p):
            return m.apply({**v, "params": p}, ids, mask, labels=ids)["loss"]

        return jax.jit(jax.grad(loss))(v["params"])

    ga = grads(cfg)
    gb = grads(cfg_r)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
