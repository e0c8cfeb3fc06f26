"""Config-variant coverage: 'comp' codebook predictor, QUERY_SKIPS,
DYNAMIC_K, k_oversample — the reference's env-var knobs as config fields."""

import numpy as np
import jax
import pytest

from tests.test_attention import small_cfg, make_inputs, init_and_run


def test_comp_predictor_forward():
    cfg = small_cfg(causal=False, predictor_method="comp")
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    assert float(out.loss) > 0


def test_query_skips():
    """QUERY_SKIPS=2: predictor runs on every 2nd query, rows repeated
    (reference attention.py:598-644)."""
    cfg = small_cfg(causal=True, query_skips=2)
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    probs = np.asarray(out.estimated_attention_probs_m)
    # consecutive row pairs share the same estimator output
    np.testing.assert_allclose(probs[:, :, 0::2], probs[:, :, 1::2], atol=1e-6)
    assert np.isfinite(np.asarray(out.context_layer)).all()


def test_dynamic_k_changes_budget():
    cfg_small = small_cfg(causal=True, k=2)
    cfg_dyn = small_cfg(causal=True, k=2, dynamic_k=6)
    inputs = make_inputs(cfg_small, N=1, T=32)
    params, out_small = init_and_run(cfg_small, benchmarking=True, inputs=inputs)
    _, out_dyn = init_and_run(cfg_dyn, benchmarking=True, inputs=inputs, params=params)
    # fused benchmark path returns the compressed mask; compare realized nnz
    from sea_tpu.ops.kernels.block_sparse import mask_nnz

    T = out_small.partial_attention_mask.shape[-2]
    nnz_small = int(mask_nnz(out_small.partial_attention_mask > 0, T, True))
    nnz_dyn = int(mask_nnz(out_dyn.partial_attention_mask > 0, T, True))
    assert nnz_dyn > nnz_small


def test_k_oversample_undersamples():
    cfg = small_cfg(causal=True, k=2, k_oversample=2.0, use_pallas=False)
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()


def test_enc_per_layer_variant():
    cfg = small_cfg(causal=True, enc_per_layer=True)
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(getattr(x, "key", x)) for x in p) for p, _ in flat]
    assert any("enc_per_layer_dense" in n for n in names)


def test_cnn_deeper_variant():
    cfg = small_cfg(causal=True, cnn_deeper=True)
    inputs = make_inputs(cfg, N=1, T=32)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(getattr(x, "key", x)) for x in p) for p, _ in flat]
    assert any("cnn_conv3" in n for n in names)


def test_kd_self_teacher():
    """Without a teacher, self-teacher mode produces a nonzero distill loss
    against the student's own detached dense scores."""
    cfg = small_cfg(causal=True, kd_self_teacher=True)
    inputs = make_inputs(cfg, N=1, T=32)
    q, k, v, mask, truth, ctx = inputs
    from sea_tpu.models.attention import SeaAttention

    model = SeaAttention(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.key(0), q, k, v, q, k, v, q, k, mask)
    )()
    out = jax.jit(
        lambda p: model.apply(
            p, q, k, v, q, k, v, q, k, mask, training=True
        )
    )(params)
    assert float(out.loss) > 0
