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


def test_bert_lora_wiring():
    """LoRA on the BERT/GLUE path (reference self_attention.py:95-175 is
    shared by BERT; round-1 only wired OPT)."""
    import dataclasses
    import numpy as np
    import jax
    from tests.test_bert_kd import tiny_bert, make_batch
    from sea_tpu.models.bert import BertForSequenceClassification

    cfg = tiny_bert("perlin")
    cfg = dataclasses.replace(
        cfg,
        sea=dataclasses.replace(
            cfg.sea, lora_enabled=True, lora_in_approx_enabled=True, lora_r=4
        ),
    )
    model = BertForSequenceClassification(cfg)
    ids, mask, labels = make_batch()
    tt = None
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask, tt))()
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(getattr(x, "key", x)) for x in p) for p, _ in flat]
    for want in ("perlin_q_lora", "perlin_k_atten_lora", "perlin_q_score_lora"):
        assert any(want in n for n in names), want
    out = jax.jit(lambda v: model.apply(v, ids, mask, tt, labels=labels))(variables)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # zero-init B: LoRA deltas start as identity (same output as no-LoRA)
    cfg0 = tiny_bert("perlin")
    model0 = BertForSequenceClassification(cfg0)
    v0 = jax.jit(lambda: model0.init(jax.random.key(0), ids, mask, tt))()
    # copy shared weights from the LoRA model for comparability
    def strip(d):
        return {k: strip(v) if isinstance(v, dict) else v
                for k, v in d.items() if "lora" not in k}
    out0 = jax.jit(lambda v: model0.apply(v, ids, mask, tt, labels=labels))(
        {"params": strip(variables["params"]), **{k: v for k, v in variables.items() if k != "params"}}
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(out0["logits"]), atol=1e-5
    )
