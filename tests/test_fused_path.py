"""Train-path vs fused-Pallas-path consistency inside the full SEA module
(the fused path shares the train path's exact mask semantics, so the match
should be tight — tighter than the CSR benchmark path)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_attention import small_cfg, make_inputs, init_and_run


def test_fused_benchmark_matches_train_path():
    cfg = small_cfg(causal=True, use_pallas=True)
    inputs = make_inputs(cfg, N=1, T=128)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_fused = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    err = np.abs(a - b).max()
    assert err < 2e-4, err


def test_fused_vs_csr_paths_agree():
    cfg_fused = small_cfg(causal=True, use_pallas=True)
    cfg_csr = small_cfg(causal=True, use_pallas=False)
    inputs = make_inputs(cfg_fused, N=1, T=128)
    params, out_fused = init_and_run(cfg_fused, benchmarking=True, inputs=inputs)
    _, out_csr = init_and_run(cfg_csr, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_fused.context_layer)
    b = np.asarray(out_csr.context_layer)
    # CSR expansion uses round() boundaries vs the dense-resize floor();
    # selections differ on a few boundary columns per row (the reference's
    # own train-vs-benchmark tolerance covers the same gap).
    err = np.abs(a - b).mean()
    assert err < 2e-2, err


def test_fused_noncausal_matches_train_path():
    cfg = small_cfg(causal=False, use_pallas=True)
    inputs = make_inputs(cfg, N=1, T=128)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_fused = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    err = np.abs(a - b).max()
    assert err < 5e-4, err


def test_fused_oversampled_matches_train_path():
    """k_oversample != 1 no longer falls back to the CSR gather chain, and
    the in-kernel keep-predicate matches the train path's resize exactly."""
    import sea_tpu.ops.flat_csr as flat_csr

    cfg = small_cfg(causal=True, use_pallas=True, k_oversample=2.0)
    inputs = make_inputs(cfg, N=1, T=128)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)

    real = flat_csr.resize_from_m_to_t_csr
    calls = []

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    flat_csr.resize_from_m_to_t_csr = spy
    try:
        _, out_fused = init_and_run(
            cfg, benchmarking=True, inputs=inputs, params=params
        )
    finally:
        flat_csr.resize_from_m_to_t_csr = real
    assert not calls, "oversampled benchmark must stay on the fused kernel"
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    assert np.abs(a - b).max() < 2e-4


def test_fused_nonmultiple_T_matches_train_path():
    cfg = small_cfg(causal=True, use_pallas=True)
    inputs = make_inputs(cfg, N=1, T=96)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_fused = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    assert np.abs(a - b).max() < 2e-4


def test_use_fused_train_grads_match_dense_train_path():
    """Task-only training through the differentiable fused kernel
    (use_fused_train) produces the same loss/grads as the dense train path."""
    cfg_dense = small_cfg(causal=True)
    cfg_fused = small_cfg(causal=True, use_fused_train=True)
    inputs = make_inputs(cfg_dense, N=1, T=128)
    q, k, v, mask, _, _ = inputs

    from sea_tpu.models.attention import SeaAttention

    def make_loss(cfg):
        model = SeaAttention(cfg)
        params = jax.jit(
            lambda: model.init(
                jax.random.key(0), q, k, v, q, k, v, q, k, mask,
                benchmarking=False,
            )
        )()

        def loss(p):
            out = model.apply(
                p, q, k, v, q, k, v, q, k, mask, benchmarking=False,
                training=True,
            )
            return jnp.sum(out.context_layer.astype(jnp.float32) ** 2)

        return params, loss

    p_d, loss_d = make_loss(cfg_dense)
    p_f, loss_f = make_loss(cfg_fused)
    ld, gd = jax.jit(jax.value_and_grad(loss_d))(p_d)
    lf, gf = jax.jit(jax.value_and_grad(loss_f))(p_f)
    np.testing.assert_allclose(float(ld), float(lf), rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gd)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2,
            err_msg=str(pa),
        )
