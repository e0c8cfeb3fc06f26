"""Cache consistency: incremental decode must match the full causal forward
(reference test_perlin_opt_cache.py — prefill-vs-decode comparison)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.models.attention import SeaAttention
from tests.test_attention import small_cfg, make_inputs


@pytest.mark.parametrize("T", [16, 40])
def test_decode_matches_prefill(T):
    cfg = small_cfg(causal=True, use_cache=True)
    N = 1
    inputs = make_inputs(cfg, N=N, T=T, seed=5)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = jax.jit(
        lambda: model.init(
            jax.random.key(0), q, k, v, q, k, v, q, k, mask,
            attention_scores_truth=truth, context_layer_truth=ctx_truth,
        )
    )()

    full = jax.jit(
        lambda p, q, k, v, mask: model.apply(
            p, q, k, v, q, k, v, q, k, mask, benchmarking=False
        ).context_layer
    )(params, q, k, v, mask)

    state = model.apply(params, N, T, method=lambda m, b, L: m.init_state(b, L))

    step = jax.jit(
        lambda p, q1, k1, v1, st: model.apply(
            p, q1, k1, v1, st, method=lambda m, a, b, c, s: m.decode(a, b, c, s)
        )
    )
    outs = []
    for t in range(T):
        o, state = step(
            params,
            q[:, :, t : t + 1],
            k[:, :, t : t + 1],
            v[:, :, t : t + 1],
            state,
        )
        outs.append(np.asarray(o))
    dec = np.concatenate(outs, axis=1)  # (N, T, H*D)

    err = np.abs(dec - np.asarray(full))
    # fp32 prefix-sum vs chunked scan: small accumulation differences
    assert err.max() < 5e-3, err.max()
    # early rows (exact window coverage) should be tight
    assert err[:, : min(T, 8)].max() < 1e-3
