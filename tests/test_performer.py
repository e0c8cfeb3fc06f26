"""FAVOR+ tests: chunked causal path vs naive prefix-sum oracle, feature
properties, state-carry consistency (decode-cache precursor)."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.ops.performer import (
    causal_linear_attention,
    fast_attention,
    gaussian_orthogonal_random_matrix,
    linear_attention_noncausal,
    relu_kernel_features,
    softmax_kernel_features,
)


def naive_causal(qp, kp, v, eps=1e-6):
    N, H, T, M = qp.shape
    Dv = v.shape[-1]
    out = np.zeros((N, H, T, Dv))
    for n in range(N):
        for h in range(H):
            S = np.zeros((M, Dv))
            z = np.zeros((M,))
            for t in range(T):
                S = S + np.outer(kp[n, h, t], v[n, h, t])
                z = z + kp[n, h, t]
                num = qp[n, h, t] @ S
                den = qp[n, h, t] @ (z + eps)
                out[n, h, t] = num / den
    return out


def test_causal_matches_naive():
    rng = np.random.default_rng(0)
    N, H, T, M, Dv = 2, 3, 50, 8, 12
    qp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    kp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    v = rng.standard_normal((N, H, T, Dv)).astype(np.float32)
    got = np.asarray(causal_linear_attention(jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(v), chunk=16))
    want = naive_causal(qp, kp, v)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_causal_state_carry():
    """Running [0:T1] then [T1:T] with carried state == running [0:T] at once."""
    rng = np.random.default_rng(1)
    N, H, T, M, Dv = 1, 2, 64, 8, 12
    T1 = 40
    qp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    kp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    v = rng.standard_normal((N, H, T, Dv)).astype(np.float32)
    full = np.asarray(causal_linear_attention(jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(v), chunk=8))
    o1, st = causal_linear_attention(
        jnp.asarray(qp[:, :, :T1]), jnp.asarray(kp[:, :, :T1]), jnp.asarray(v[:, :, :T1]),
        chunk=8, return_state=True,
    )
    o2 = causal_linear_attention(
        jnp.asarray(qp[:, :, T1:]), jnp.asarray(kp[:, :, T1:]), jnp.asarray(v[:, :, T1:]),
        chunk=8, state=st,
    )
    got = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=2)
    np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-5)


def test_padding_does_not_affect_prefix():
    """Chunk padding must not change real positions (T not multiple of chunk)."""
    rng = np.random.default_rng(2)
    N, H, T, M, Dv = 1, 1, 37, 4, 6
    qp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    kp = rng.uniform(0.1, 1.0, (N, H, T, M)).astype(np.float32)
    v = rng.standard_normal((N, H, T, Dv)).astype(np.float32)
    a = np.asarray(causal_linear_attention(jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(v), chunk=16))
    b = naive_causal(qp, kp, v)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_orthogonal_projection():
    proj = gaussian_orthogonal_random_matrix(jax.random.key(0), 24, 16)
    assert proj.shape == (24, 16)
    p = np.asarray(proj)
    # rows within a block are orthogonal
    block = p[:16]
    norms = np.linalg.norm(block, axis=1, keepdims=True)
    gram = (block / norms) @ (block / norms).T
    np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)


def test_softmax_features_approximate_softmax_attention():
    """FAVOR+ with many features approximates dense softmax attention."""
    rng = np.random.default_rng(3)
    N, H, T, D, Dv = 1, 1, 24, 16, 8
    q = (rng.standard_normal((N, H, T, D)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((N, H, T, D)) * 0.3).astype(np.float32)
    v = rng.standard_normal((N, H, T, Dv)).astype(np.float32)
    proj = gaussian_orthogonal_random_matrix(jax.random.key(1), 2048, D)
    got = np.asarray(
        fast_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), proj, causal=False, generalized=False)
    )
    scores = np.einsum("nhtd,nhsd->nhts", q, k) / np.sqrt(D)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("nhts,nhsd->nhtd", p, v)
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 0.15, err


def test_relu_features_positive():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 1, 8, 16)).astype(np.float32))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(2), 32, 16)
    f = np.asarray(relu_kernel_features(x, proj))
    assert (f >= 1e-3 - 1e-9).all()
