"""OPT causal baseline dispatcher (reference perlin_opt.py:315,402,478):
reformer / cosformer / sinkhorn forwards run, are finite, and are causal
(perturbing a future token leaves earlier logits unchanged)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_opt_kd import tiny_opt, make_batch
from sea_tpu.models.opt import OptForCausalLM


@pytest.mark.parametrize("method", ["reformer", "cosformer", "sinkhorn"])
def test_opt_baseline_forward_and_causality(method):
    cfg = tiny_opt(method)
    model = OptForCausalLM(cfg)
    N, T = 1, 32
    ids, mask = make_batch(N=N, T=T, vocab=cfg.vocab_size, seed=2)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    fwd = jax.jit(lambda v, i: model.apply(v, i, mask)["logits"])
    logits = fwd(variables, ids)
    assert np.isfinite(np.asarray(logits)).all()

    # causality canary: flip the last token; logits before it must not move
    ids2 = ids.at[:, -1].set((ids[:, -1] + 7) % cfg.vocab_size)
    logits2 = fwd(variables, ids2)
    np.testing.assert_allclose(
        np.asarray(logits[:, : T - 1]), np.asarray(logits2[:, : T - 1]),
        atol=1e-5,
    )


def test_sinkhorn_causal_op_causality():
    from sea_tpu.ops.baselines import sinkhorn_causal_attention

    rng = np.random.default_rng(0)
    N, H, T, D, B = 1, 2, 64, 16, 16
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))
    out = sinkhorn_causal_attention(q, k, v, block_size=B)
    assert np.isfinite(np.asarray(out)).all()
    # perturb the tail block: outputs in earlier blocks unchanged
    k2 = k.at[:, :, -B:].add(1.0)
    v2 = v.at[:, :, -B:].add(1.0)
    q2 = q.at[:, :, -B:].add(1.0)
    out2 = sinkhorn_causal_attention(q2, k2, v2, block_size=B)
    np.testing.assert_allclose(
        np.asarray(out[:, :, : T - B]), np.asarray(out2[:, :, : T - B]),
        atol=1e-5,
    )


def test_sinkhorn_nondivisible_length_pads():
    from sea_tpu.ops.baselines import sinkhorn_causal_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 50, 16)).astype(np.float32))
    out = sinkhorn_causal_attention(q, q, q, block_size=16)
    assert out.shape == (1, 2, 50, 16)
    assert np.isfinite(np.asarray(out)).all()
