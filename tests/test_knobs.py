"""Round-2 knob wiring: cosformer predictor backend, 'norm' context output,
layerwise training, use_cache gating, out_add_performer_context rejection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.config import SeaConfig
from tests.test_attention import small_cfg, make_inputs, init_and_run


def test_cosformer_predictor_backend_forward_and_loss():
    cfg = small_cfg(causal=True, predictor_backend="cosformer")
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    assert float(out.loss) > 0
    # the cosformer backend owns parameters (its internal projections)
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(getattr(x, "key", x)) for x in p) for p, _ in flat]
    assert any("cosformer_backend" in n for n in names)
    # and the benchmark path works on it too
    _, out_b = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    assert np.isfinite(np.asarray(out_b.context_layer)).all()


def test_cosformer_backend_noncausal():
    cfg = small_cfg(causal=False, predictor_backend="cosformer")
    inputs = make_inputs(cfg, N=1, T=32)
    _, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()


def test_norm_context_output_method():
    cfg = small_cfg(causal=True, context_output_method="norm", out_norm=True)
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(getattr(x, "key", x)) for x in p) for p, _ in flat]
    assert any("norm_partial" in n for n in names)
    assert any("out_norm_ln" in n for n in names)
    # output actually differs from the 'mix' method with the same weights
    cfg_mix = small_cfg(causal=True)
    _, out_mix = init_and_run(cfg_mix, benchmarking=False, inputs=inputs)
    assert not np.allclose(
        np.asarray(out.context_layer), np.asarray(out_mix.context_layer)
    )


def test_out_add_performer_context_rejected():
    with pytest.raises(ValueError):
        SeaConfig(out_add_performer_context=True).validate()


def test_layerwise_blocks_cross_layer_grads():
    """Under layerwise, gradients do not cross layer boundaries (reference
    perlin_opt.py:706-715): with a final-logits CE loss only, a non-final
    layer gets zero gradient because the next layer's input is detached."""
    import dataclasses
    from tests.test_opt_kd import tiny_opt, make_batch
    from sea_tpu.models.opt import OptForCausalLM

    def grads_for(layerwise):
        cfg = tiny_opt("perlin")
        cfg = dataclasses.replace(
            cfg, sea=dataclasses.replace(cfg.sea, layerwise=layerwise)
        )
        model = OptForCausalLM(cfg)
        ids, mask = make_batch(N=1, T=16, vocab=cfg.vocab_size)
        variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

        def loss_fn(v):
            out = model.apply(
                v, ids, mask, labels=ids, training=True,
                rng=jax.random.key(3),
            )
            return out["loss"]

        return jax.jit(jax.grad(loss_fn))(variables)["params"]

    g_lw = grads_for(True)
    g_full = grads_for(False)
    lw_l0 = sum(
        float(jnp.abs(x).sum())
        for x in jax.tree_util.tree_leaves(g_lw["model"]["layers_0"])
    )
    full_l0 = sum(
        float(jnp.abs(x).sum())
        for x in jax.tree_util.tree_leaves(g_full["model"]["layers_0"])
    )
    lw_l1 = sum(
        float(jnp.abs(x).sum())
        for x in jax.tree_util.tree_leaves(g_lw["model"]["layers_1"])
    )
    assert lw_l0 < 1e-7, lw_l0
    assert full_l0 > 1e-6
    assert lw_l1 > 1e-6


def test_decode_requires_use_cache():
    from sea_tpu.models.attention import SeaAttention

    cfg = small_cfg(causal=True)  # use_cache defaults False
    inputs = make_inputs(cfg, N=1, T=16)
    params, _ = init_and_run(cfg, benchmarking=False, inputs=inputs)
    model = SeaAttention(cfg)
    state = model.apply(params, 1, 16, method=lambda m, b, L: m.init_state(b, L))
    q = jnp.zeros((1, cfg.num_heads, 1, cfg.head_dim))
    with pytest.raises(AssertionError, match="use_cache"):
        model.apply(
            params, q, q, q, state,
            method=lambda m, a, b, c, s: m.decode(a, b, c, s),
        )
