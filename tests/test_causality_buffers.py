"""Causality canary over ALL registered intermediate buffers (reference
test_perlin_opt_causality.py:175-260 — enumerate the profiler's
register_temp_buffer captures and assert positions before the canary are
unchanged). Runs eagerly so the registry sees concrete arrays."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.models.attention import SeaAttention
from sea_tpu.utils.profiler import get_bench
from tests.test_attention import small_cfg, make_inputs

CANARY = 20
# buffers with a query-time axis whose pre-canary prefix must be unchanged
TIME_AXIS = {
    "q": 2, "k": 2, "v": 2, "v_for_atten": 2,
    "performer_context_layer": 2, "performer_value": 2,
    "t_attention_predictor": 2, "estimated_attention_score": 2,
    "estimated_attention_probs": 2, "masked_estimated_attention_probs": 2,
    "partial_attention_mask_before_interp": 2,
    "estimated_scales": 2, "average_context_layer": 2,
    "partial_context_layer_2": 2, "partial_context_layer": 1,
    "attention_scores_dense": 2, "attention_matrix": 2,
}


def _run(model, params, inputs, poison):
    q, k, v, mask, truth, ctx_truth = inputs
    if poison:
        q = q.at[..., CANARY:, :].set(3e5)
        k = k.at[..., CANARY:, :].set(3e5)
        v = v.at[..., CANARY:, :].set(3e5)
    bench = get_bench()
    bench.activate_temp_buffers(True)
    bench.reset()
    bench.disabled = False
    try:
        model.apply(params, q, k, v, q, k, v, q, k, mask, benchmarking=False)
        buffers = {
            n: np.asarray(vals[-1], np.float32)
            for n, vals in bench.buffers.items()
            if n in TIME_AXIS
        }
    finally:
        bench.activate_temp_buffers(False)
        bench.reset()
    return buffers


def test_all_buffers_causal():
    cfg = small_cfg(causal=True)
    inputs = make_inputs(cfg, N=1, T=32, seed=11)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = model.init(jax.random.key(0), q, k, v, q, k, v, q, k, mask)

    clean = _run(model, params, inputs, poison=False)
    poisoned = _run(model, params, inputs, poison=True)
    assert clean, "no buffers captured"
    checked = 0
    for name, c in clean.items():
        p = poisoned.get(name)
        if p is None or p.shape != c.shape:
            continue
        ax = TIME_AXIS[name]
        if c.shape[ax] != 32:
            continue
        sl = [slice(None)] * c.ndim
        sl[ax] = slice(0, CANARY)
        # (T, T) score/prob maps: the column axis sees future keys before
        # the causal mask applies — restrict both time axes
        if c.ndim > ax + 1 and c.shape[ax + 1] == c.shape[ax] == 32:
            sl[ax + 1] = slice(0, CANARY)
        err = np.abs(c[tuple(sl)] - p[tuple(sl)])
        denom = np.abs(c[tuple(sl)]).max() + 1e-6
        assert err.max() / denom < 1e-3, (name, float(err.max()))
        checked += 1
    assert checked >= 8, f"only {checked} buffers checked"
