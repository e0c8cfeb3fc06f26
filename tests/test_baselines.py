"""Baseline attention operators: shape/finite/consistency checks, plus the
BERT dispatcher coverage over every attention_method."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.ops.baselines import (
    SynthesizerDense,
    reformer_lsh_attention,
    sinkhorn_block_attention,
)
from sea_tpu.ops.cosformer import CosformerAttention, cosformer_causal, _cos_features
from tests.test_bert_kd import tiny_bert, make_batch


def test_synthesizer_shapes():
    q = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, 16, 8)), jnp.float32)
    model = SynthesizerDense(max_seq_len=32)
    params = model.init(jax.random.key(0), q, q)
    out, probs = model.apply(params, q, q)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_reformer_lsh_recovers_strong_matches():
    """With near-duplicate query clusters, LSH attention should mix values
    within the cluster (a soft property check)."""
    rng = np.random.default_rng(1)
    N, H, T, D = 1, 1, 64, 16
    base = rng.standard_normal((4, D)).astype(np.float32) * 3
    q = np.repeat(base, T // 4, axis=0)[None, None]
    q = q + rng.standard_normal(q.shape).astype(np.float32) * 0.05
    v = rng.standard_normal((N, H, T, D)).astype(np.float32)
    out = reformer_lsh_attention(jnp.asarray(q), jnp.asarray(v), bucket_size=16)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (N, H, T, D)


def test_sinkhorn_rowsums():
    rng = np.random.default_rng(2)
    N, H, T, D = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((N, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)), jnp.float32)
    out = sinkhorn_block_attention(q, k, v, block_size=16)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (N, H, T, D)


def test_cosformer_causal_matches_quadratic():
    """Linear causal cosformer == explicit masked quadratic attention with
    the same cos-reweighted features."""
    rng = np.random.default_rng(3)
    B, T, M, Dv = 2, 40, 8, 12
    qp = jnp.asarray(rng.uniform(0.1, 1, (B, T, M)), jnp.float32)
    kp = jnp.asarray(rng.uniform(0.1, 1, (B, T, M)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Dv)), jnp.float32)
    got = np.asarray(cosformer_causal(qp, kp, v, chunk=16))
    scores = np.einsum("btm,bsm->bts", qp, kp)
    tri = np.tril(np.ones((T, T)))
    num = np.einsum("bts,bsd->btd", scores * tri, np.asarray(v))
    den = np.maximum((scores * tri).sum(-1), 1e-6)
    want = num / den[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "method", ["synthesizer", "cosformer", "reformer", "sinkhorn"]
)
def test_bert_dispatcher_methods(method):
    from sea_tpu.models.bert import BertForSequenceClassification

    cfg = tiny_bert(method)
    model = BertForSequenceClassification(cfg)
    ids, mask, labels = make_batch(N=2, T=16)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(lambda v: model.apply(v, ids, mask, labels=labels))(variables)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(float(out["loss"]))


def test_scatterbrain_corrects_toward_exact():
    """Within-chunk pairs use the exact kernel: for a single chunk covering
    everything, scatterbrain == exact softmax attention."""
    from sea_tpu.ops.baselines import scatterbrain_attention
    from sea_tpu.ops.performer import gaussian_orthogonal_random_matrix
    import math

    rng = np.random.default_rng(5)
    N, H, T, D = 1, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((N, H, T, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)), jnp.float32)
    proj = gaussian_orthogonal_random_matrix(jax.random.key(0), 64, D)
    got = np.asarray(scatterbrain_attention(q, k, v, proj, bucket_size=T))
    scores = np.einsum("nhtd,nhsd->nhts", q, k) / math.sqrt(D)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("nhts,nhsd->nhtd", p, np.asarray(v))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_bert_scatterbrain_dispatch():
    from sea_tpu.models.bert import BertForSequenceClassification

    cfg = tiny_bert("scatterbrain")
    model = BertForSequenceClassification(cfg)
    ids, mask, labels = make_batch(N=2, T=16)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(lambda v: model.apply(v, ids, mask, labels=labels))(variables)
    assert np.isfinite(np.asarray(out["logits"])).all()
