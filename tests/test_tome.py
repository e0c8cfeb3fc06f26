"""ToMe token merging: merge/unmerge roundtrip properties + BERT wiring."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.ops.tome import tome_merge, tome_unmerge
from tests.test_bert_kd import tiny_bert, make_batch


def test_merge_shapes_and_unmerge_roundtrip():
    rng = np.random.default_rng(0)
    N, T, E = 2, 17, 8
    x = jnp.asarray(rng.standard_normal((N, T, E)), jnp.float32)
    sim = jnp.asarray(rng.uniform(size=(N, T, T)), jnp.float32)
    merged, state = tome_merge(x, sim, preserve_ratio=0.5, merge_ratio=0.5)
    n_preserve = round((T - 1) * 0.5)
    n_tome = T - 1 - n_preserve
    assert merged.shape == (N, 1 + n_preserve + state.n_dst, E)
    assert state.n_src + state.n_dst == n_tome

    out = tome_unmerge(merged, state)
    assert out.shape == x.shape
    # CLS and preserved tokens come back exactly
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    sig = np.asarray(sim.mean(1))[:, 1:]
    for n in range(N):
        order = np.argsort(-sig[n], kind="stable")
        for r in order[:n_preserve]:
            np.testing.assert_allclose(
                np.asarray(out[n, 1 + r]), np.asarray(x[n, 1 + r]), atol=1e-6
            )


def test_merge_averages_similar_tokens():
    """Two identical low-significance tokens merged into one dst should
    yield their mean at both positions after unmerge."""
    N, T, E = 1, 9, 4
    x = np.zeros((N, T, E), np.float32)
    x[0, :, 0] = np.arange(T)
    sim = np.full((N, T, T), 0.1, np.float32)
    # token 8 least significant, very similar to token 7
    sim[0, :, 1:8] = 0.5
    sim[0, 8, 7] = 5.0
    sim[0, 7, 8] = 5.0
    merged, state = tome_merge(
        jnp.asarray(x), jnp.asarray(sim), preserve_ratio=0.75, merge_ratio=0.5
    )
    out = np.asarray(tome_unmerge(merged, state))
    assert out.shape == (N, T, E)
    assert np.isfinite(out).all()


def test_bert_with_token_merging():
    import dataclasses

    cfg = dataclasses.replace(tiny_bert("none"), token_merging=True)
    from sea_tpu.models.bert import BertForSequenceClassification

    model = BertForSequenceClassification(cfg)
    ids, mask, labels = make_batch(N=2, T=16, pad=False)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(lambda v: model.apply(v, ids, mask, labels=labels))(variables)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_tome_probs_score_source():
    """'probs' merge-score source (reference perlin_bert.py:836-842) on the
    dense teacher and the perlin train path."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from tests.test_bert_kd import tiny_bert, make_batch

    for method in ("none", "perlin"):
        cfg = tiny_bert(method)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, token_merging=True, token_merging_score_source="probs"
        )
        from sea_tpu.models.bert import BertForSequenceClassification

        model = BertForSequenceClassification(cfg)
        ids, mask, labels = make_batch()
        tt = None
        variables = jax.jit(
            lambda: model.init(jax.random.key(0), ids, mask, tt)
        )()
        out = jax.jit(
            lambda v: model.apply(v, ids, mask, tt, labels=labels)
        )(variables)
        assert np.isfinite(np.asarray(out["logits"])).all(), method
