"""Mixed-precision consistency (reference test_perlin_opt_precision.py /
test_perlin_bert_precision.py): bf16 forward must track the fp32 forward
within tolerance; fp32 islands (performer, softmax, interpolation) keep the
estimator stable."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_attention import small_cfg, make_inputs
from sea_tpu.models.attention import SeaAttention


@pytest.mark.parametrize("causal", [True, False])
def test_bf16_tracks_fp32(causal):
    cfg = small_cfg(causal=causal)
    inputs = make_inputs(cfg, N=1, T=32)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = jax.jit(
        lambda: model.init(
            jax.random.key(0), q, k, v, q, k, v, q, k, mask,
            attention_scores_truth=truth, context_layer_truth=ctx_truth,
        )
    )()

    def run(dtype):
        c = lambda x: x.astype(dtype)
        out = jax.jit(
            lambda p: model.apply(
                p,
                c(q), c(k), c(v), c(q), c(k), c(v), c(q), c(k), c(mask),
                benchmarking=False,
            )
        )(params)
        return np.asarray(out.context_layer, np.float32)

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    denom = np.abs(f32).mean() + 1e-6
    rel = np.abs(f32 - bf16).mean() / denom
    assert rel < 0.15, rel


def test_bf16_mask_constant():
    """bf16 path must use fp16_min/2 (reference attention.py:393-399)."""
    from sea_tpu.ops.masks import fp_min_for

    assert fp_min_for(jnp.bfloat16) == float(np.finfo(np.float16).min) / 2
    assert fp_min_for(jnp.float16) == float(np.finfo(np.float16).min) / 2
    assert fp_min_for(jnp.float32) == float(np.finfo(np.float32).min) / 2
