"""SEA attention module gates (SURVEY §7 stage-3):
  * forward shape/finite checks for causal (OPT) and bidirectional (BERT),
  * train-vs-benchmark consistency (dense mask path vs flat-CSR kernel path)
    — analogue of reference test_perlin_opt_consist.py,
  * causality canary — analogue of reference test_perlin_opt_causality.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.config import SeaConfig
from sea_tpu.models.attention import SeaAttention

FP_MIN32 = float(np.finfo(np.float32).min) / 2


def small_cfg(causal=True, **kw):
    base = dict(
        num_heads=2,
        head_dim=16,
        predictor_length=16,
        k=4,
        performer_nb_factor=1,
        causal=causal,
        k_flatten_dim="causal_batch",
        max_position_embeddings=128,
    )
    base.update(kw)
    return SeaConfig(**base).validate()


def make_inputs(cfg, N=2, T=32, seed=0, pad=None):
    rng = np.random.default_rng(seed)
    H, D = cfg.num_heads, cfg.head_dim
    def t(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)
    q, k, v = t((N, H, T, D)), t((N, H, T, D)), t((N, H, T, D))
    if cfg.causal:
        m = np.where(np.tril(np.ones((T, T))) > 0, 0.0, FP_MIN32).astype(np.float32)
        mask = jnp.asarray(np.broadcast_to(m[None, None], (N, 1, T, T)).copy())
    else:
        m = np.zeros((N, 1, 1, T), dtype=np.float32)
        if pad is not None:
            for i, L in enumerate(pad):
                m[i, :, :, L:] = FP_MIN32
        mask = jnp.asarray(m)
    truth = t((N, H, T, T))
    ctx_truth = t((N, T, H * D))
    return q, k, v, mask, truth, ctx_truth


def init_and_run(cfg, benchmarking, inputs, params=None, **kw):
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    if params is None:
        params = jax.jit(
            lambda: model.init(
                jax.random.key(0),
                q, k, v, q, k, v, q, k, mask,
                attention_scores_truth=truth,
                context_layer_truth=ctx_truth,
                benchmarking=False,
            )
        )()

    if benchmarking:
        fn = jax.jit(
            lambda p, q, k, v, mask: model.apply(
                p, q, k, v, q, k, v, q, k, mask, benchmarking=True, **kw
            )
        )
        out = fn(params, q, k, v, mask)
    else:
        fn = jax.jit(
            lambda p, q, k, v, mask, truth, ctx: model.apply(
                p, q, k, v, q, k, v, q, k, mask,
                attention_scores_truth=truth,
                context_layer_truth=ctx,
                benchmarking=False,
                **kw,
            )
        )
        out = fn(params, q, k, v, mask, truth, ctx_truth)
    return params, out


@pytest.mark.parametrize("causal", [True, False])
def test_forward_shapes(causal):
    cfg = small_cfg(causal=causal)
    inputs = make_inputs(cfg)
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    N, T = 2, 32
    assert out.context_layer.shape == (N, T, cfg.hidden_size)
    assert np.isfinite(np.asarray(out.context_layer)).all()
    assert np.isfinite(float(out.loss))
    assert float(out.loss) > 0


@pytest.mark.parametrize("causal", [True, False])
def test_train_vs_benchmark_consistency(causal):
    """Dense (train) and flat-CSR (benchmark) paths must produce the same
    context output given identical params/inputs — the kernel-correctness
    property (reference test_perlin_opt_consist.py:1-40)."""
    cfg = small_cfg(causal=causal)
    inputs = make_inputs(cfg)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_bench = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_bench.context_layer)
    err = np.abs(a - b).max()
    assert err < 2e-3, err


def test_causality_canary():
    """Plant a huge perturbation at position i of every input; outputs at
    positions < i must be bit-comparable to the clean run (reference
    test_perlin_opt_causality.py:191-260 — log10 abs err < -3)."""
    cfg = small_cfg(causal=True)
    N, T = 1, 32
    inputs = make_inputs(cfg, N=N, T=T)
    params, out_clean = init_and_run(cfg, benchmarking=False, inputs=inputs)

    canary_pos = 20
    q, k, v, mask, truth, ctx_truth = inputs
    def poison(x):
        return x.at[..., canary_pos:, :].set(3e5)
    poisoned = (poison(q), poison(k), poison(v), mask, truth, ctx_truth)
    _, out_poison = init_and_run(cfg, benchmarking=False, inputs=poisoned, params=params)

    a = np.asarray(out_clean.context_layer)[:, :canary_pos]
    b = np.asarray(out_poison.context_layer)[:, :canary_pos]
    err = np.abs(a - b).max()
    assert err < 1e-3, f"future leaked into past: {err}"


def test_causality_canary_benchmark_path():
    cfg = small_cfg(causal=True)
    N, T = 1, 32
    inputs = make_inputs(cfg, N=N, T=T)
    params, out_clean = init_and_run(cfg, benchmarking=True, inputs=inputs)
    canary_pos = 16
    q, k, v, mask, truth, ctx_truth = inputs
    def poison(x):
        return x.at[..., canary_pos:, :].set(3e5)
    poisoned = (poison(q), poison(k), poison(v), mask, truth, ctx_truth)
    _, out_poison = init_and_run(cfg, benchmarking=True, inputs=poisoned, params=params)
    a = np.asarray(out_clean.context_layer)[:, :canary_pos]
    b = np.asarray(out_poison.context_layer)[:, :canary_pos]
    err = np.abs(a - b).max()
    assert err < 1e-3, f"future leaked into past: {err}"


def test_padded_bert_path():
    cfg = small_cfg(causal=False)
    inputs = make_inputs(cfg, N=2, T=32, pad=[20, 32])
    params, out = init_and_run(cfg, benchmarking=False, inputs=inputs)
    ctx = np.asarray(out.context_layer)
    assert np.isfinite(ctx).all()


def test_grad_flows():
    cfg = small_cfg(causal=True)
    inputs = make_inputs(cfg, N=1, T=16)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = jax.jit(
        lambda: model.init(
            jax.random.key(0), q, k, v, q, k, v, q, k, mask,
            attention_scores_truth=truth, context_layer_truth=ctx_truth,
        )
    )()

    def loss_fn(p):
        out = model.apply(
            p, q, k, v, q, k, v, q, k, mask,
            attention_scores_truth=truth, context_layer_truth=ctx_truth,
            training=False,
        )
        return out.loss

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert leaves
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0


@pytest.mark.parametrize("deeper", [False, True])
def test_predictor_cnn_row_chunking_exact(deeper):
    """cnn_row_chunk overlap-discard chunking must be bit-exact vs the
    unchunked causal CNN (the T=65536 single-chip enabler — the stack's
    causal receptive field is 4 rows per dilated conv, so a halo of
    4*n_convs rows suffices; docs/kernel_design.md)."""
    cfg0 = small_cfg(causal=True, cnn_deeper=deeper)
    inputs = make_inputs(cfg0, T=64, seed=3)
    params, out0 = init_and_run(cfg0, benchmarking=False, inputs=inputs)
    cfg1 = small_cfg(causal=True, cnn_deeper=deeper, cnn_row_chunk=16)
    _, out1 = init_and_run(
        cfg1, benchmarking=False, inputs=inputs, params=params
    )
    np.testing.assert_array_equal(
        np.asarray(out0.context_layer), np.asarray(out1.context_layer)
    )
    np.testing.assert_array_equal(float(out0.loss), float(out1.loss))
