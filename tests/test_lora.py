"""LoRA adapters: zero-init equivalence and estimator-branch separation."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.models.lora import LoraDense, LoraDelta
from sea_tpu.models.opt import OptForCausalLM
from tests.test_opt_kd import tiny_opt, make_batch


def test_lora_delta_starts_at_zero():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)
    m = LoraDelta(8, rank=4)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    # nonzero B => nonzero delta
    p2 = jax.tree_util.tree_map(lambda a: a + 0.1, params)
    out2 = m.apply(p2, x)
    assert float(jnp.abs(out2).sum()) > 0


def test_lora_dense_matches_base_at_init():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 16)), jnp.float32)
    m = LoraDense(8, rank=4, enabled=True)
    params = m.init(jax.random.key(0), x)
    base_only = m.apply(params, x)
    m2 = LoraDense(8, rank=4, enabled=False)
    p2 = {"params": {"base": params["params"]["base"]}}
    np.testing.assert_allclose(
        np.asarray(base_only), np.asarray(m2.apply(p2, x)), atol=1e-6
    )


def test_opt_with_lora_forward_matches_without_at_init():
    cfg0 = tiny_opt("perlin")
    cfg1 = dataclasses.replace(
        cfg0, sea=dataclasses.replace(cfg0.sea, lora_enabled=True, lora_r=4)
    )
    ids, mask = make_batch(N=1, T=16, vocab=cfg0.vocab_size)
    m1 = OptForCausalLM(cfg1)
    v1 = jax.jit(lambda: m1.init(jax.random.key(0), ids, mask))()
    out1 = jax.jit(lambda v: m1.apply(v, ids, mask)["logits"])(v1)
    assert np.isfinite(np.asarray(out1)).all()
    # lora params exist and B zeros make them inert at init:
    # gradient must flow into lora_b
    def loss(v):
        return m1.apply(v, ids, mask, labels=ids)["loss"]

    g = jax.jit(jax.grad(loss))(v1)
    flat = jax.tree_util.tree_flatten_with_path(g["params"])[0]
    lora_b_grads = [
        float(jnp.abs(l).sum())
        for path, l in flat
        if "lora" in "/".join(str(getattr(x, "key", x)) for x in path)
        and "lora_b" in str(path[-1])
    ]
    assert lora_b_grads and any(s > 0 for s in lora_b_grads)


def test_lora_in_approx_separates_estimator_branch():
    cfg0 = tiny_opt("perlin")
    cfg1 = dataclasses.replace(
        cfg0,
        sea=dataclasses.replace(
            cfg0.sea, lora_enabled=True, lora_in_approx_enabled=True, lora_r=4
        ),
    )
    ids, mask = make_batch(N=1, T=16, vocab=cfg0.vocab_size)
    m1 = OptForCausalLM(cfg1)
    v1 = jax.jit(lambda: m1.init(jax.random.key(0), ids, mask))()
    names = []
    def collect(tree, path=""):
        for k_, v_ in tree.items():
            if isinstance(v_, dict):
                collect(v_, path + "/" + k_)
            else:
                names.append(path + "/" + k_)
    collect(v1["params"])
    assert any("perlin_q_atten_lora" in n for n in names)
    assert any("perlin_q_score_lora" in n for n in names)
    out = jax.jit(lambda v: m1.apply(v, ids, mask)["logits"])(v1)
    assert np.isfinite(np.asarray(out)).all()
