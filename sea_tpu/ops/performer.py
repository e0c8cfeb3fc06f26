"""FAVOR+ kernel linear attention (Performer), in-house JAX implementation.

The reference depends on the `performer_pytorch` pip package
(`FastAttention`, constructed at reference `attention.py:159-168`); we
re-implement the math natively (SURVEY §7 stage-3: "FAVOR+ in-house, ~100
LoC — don't port performer_pytorch"):

  * softmax random features with q/k max-stabilisation (non-causal / BERT),
  * generalized ReLU features (causal / OPT: the reference constructs
    `FastAttention(causal=cfg.causal, generalized_attention=cfg.causal)`),
  * Gaussian-orthogonal random projection, redrawn every N steps by the
    trainer (reference `common/performer.py:5-37` ProjectionUpdater),
  * causal prefix linear attention written the TPU way: chunked scan with an
    (M, Dv) state matmul for inter-chunk flow and a small causal-masked
    dense attention for the intra-chunk part — mathematically identical to
    the reference's cumsum-of-outer-products but MXU-shaped.

All computation is fp32 regardless of the surrounding policy (the reference
forces fp32 around the performer, `attention.py:518-534`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def gaussian_orthogonal_random_matrix(
    rng: jax.Array, nb_rows: int, nb_cols: int, scaling: int = 0
) -> jnp.ndarray:
    """Orthogonal random feature projection (FAVOR+). Rows are orthonormal
    blocks scaled by chi-distributed norms (scaling=0) so that marginals
    match an iid Gaussian matrix."""
    n_full = nb_rows // nb_cols
    blocks = []
    rngs = jax.random.split(rng, n_full + 2)
    for i in range(n_full):
        g = jax.random.normal(rngs[i], (nb_cols, nb_cols), dtype=jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_cols
    if rem > 0:
        g = jax.random.normal(rngs[n_full], (nb_cols, nb_cols), dtype=jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    mat = jnp.concatenate(blocks, axis=0)
    if scaling == 0:
        mult = jnp.linalg.norm(
            jax.random.normal(rngs[-1], (nb_rows, nb_cols), dtype=jnp.float32), axis=-1
        )
    elif scaling == 1:
        mult = jnp.full((nb_rows,), math.sqrt(nb_cols), dtype=jnp.float32)
    else:
        raise ValueError(scaling)
    return mult[:, None] * mat


def softmax_kernel_features(
    x: jnp.ndarray, proj: jnp.ndarray, is_query: bool, eps: float = 1e-4
) -> jnp.ndarray:
    """phi(x) = m^-1/2 (exp(w·x̂ - |x̂|²/2 - stab) + eps), x̂ = x/d^(1/4).

    Queries stabilise per-position (max over features), keys per-(batch,head)
    (max over features and positions)."""
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    m = proj.shape[0]
    data_normalizer = d ** -0.25
    ratio = m ** -0.5
    wx = jnp.einsum("...td,md->...tm", data_normalizer * x, proj)
    diag = jnp.sum(x * x, axis=-1, keepdims=True) / 2.0 * (data_normalizer ** 2)
    if is_query:
        stab = jax.lax.stop_gradient(jnp.max(wx, axis=-1, keepdims=True))
    else:
        stab = jax.lax.stop_gradient(jnp.max(wx, axis=(-1, -2), keepdims=True))
    return ratio * (jnp.exp(wx - diag - stab) + eps)


def relu_kernel_features(
    x: jnp.ndarray, proj: Optional[jnp.ndarray], eps: float = 1e-3
) -> jnp.ndarray:
    """Generalized-attention features: relu(w·x̂) + eps."""
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    data_normalizer = d ** -0.25
    if proj is None:
        return jax.nn.relu(data_normalizer * x) + eps
    wx = jnp.einsum("...td,md->...tm", data_normalizer * x, proj)
    return jax.nn.relu(wx) + eps


def linear_attention_noncausal(
    qp: jnp.ndarray, kp: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """out = D^-1 Q'(K'^T V), D = diag(Q'(K'^T 1))."""
    v = v.astype(jnp.float32)
    k_sum = jnp.sum(kp, axis=-2)  # (..., M)
    d_inv = 1.0 / jnp.einsum("...tm,...m->...t", qp, k_sum)
    context = jnp.einsum("...sm,...sd->...md", kp, v)
    return jnp.einsum("...md,...tm,...t->...td", context, qp, d_inv)


def causal_linear_attention(
    qp: jnp.ndarray,
    kp: jnp.ndarray,
    v: jnp.ndarray,
    chunk: int = 128,
    eps: float = 1e-6,
    state: Optional[tuple] = None,
    return_state: bool = False,
):
    """out_t = (q'_t · C_t) / (q'_t · (s_t + eps)), with prefix sums
    C_t = sum_{s<=t} k'_s v_s^T and s_t = sum_{s<=t} k'_s.

    Chunked: inter-chunk contribution via the running (M, Dv) state, intra-
    chunk via a causal-masked (chunk x chunk) dense attention — exact same
    math as the reference cumsum formulation (performer_pytorch
    causal_linear_attention_noncuda), reshaped for the MXU.

    `state`, if given, is (S, z) carrying sums of all previous positions
    (used by the decode cache); `return_state=True` also returns the final
    (S, z)."""
    qp = qp.astype(jnp.float32)
    kp = kp.astype(jnp.float32)
    v = v.astype(jnp.float32)
    *batch, T, M = qp.shape
    Dv = v.shape[-1]

    pad = (-T) % chunk
    if pad:
        qp = jnp.pad(qp, [(0, 0)] * len(batch) + [(0, pad), (0, 0)])
        kp = jnp.pad(kp, [(0, 0)] * len(batch) + [(0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * len(batch) + [(0, pad), (0, 0)])
    Tp = T + pad
    nc = Tp // chunk

    qc = jnp.moveaxis(qp.reshape(*batch, nc, chunk, M), -3, 0)
    kc = jnp.moveaxis(kp.reshape(*batch, nc, chunk, M), -3, 0)
    vc = jnp.moveaxis(v.reshape(*batch, nc, chunk, Dv), -3, 0)

    if state is None:
        S0 = jnp.zeros((*batch, M, Dv), jnp.float32)
        z0 = jnp.zeros((*batch, M), jnp.float32)
    else:
        S0, z0 = state

    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    def body(carry, inp):
        S, z = carry
        q_i, k_i, v_i = inp
        a = jnp.einsum("...tm,...sm->...ts", q_i, k_i) * tri
        num = jnp.einsum("...ts,...sd->...td", a, v_i) + jnp.einsum(
            "...tm,...md->...td", q_i, S
        )
        den = (
            jnp.sum(a, axis=-1)
            + jnp.einsum("...tm,...m->...t", q_i, z)
            + eps * jnp.sum(q_i, axis=-1)
        )
        # chunk-padding rows have den == 0; 0/0 would NaN-poison gradients
        # (the primal slices them away but the cotangent of num/den does not)
        den = jnp.where(den <= 0, 1.0, den)
        out = num / den[..., None]
        S = S + jnp.einsum("...sm,...sd->...md", k_i, v_i)
        z = z + jnp.sum(k_i, axis=-2)
        return (S, z), out

    (S_f, z_f), outs = jax.lax.scan(body, (S0, z0), (qc, kc, vc))
    out = jnp.moveaxis(outs, 0, -3).reshape(*batch, Tp, Dv)[..., :T, :]
    if return_state:
        return out, (S_f, z_f)
    return out


def redraw_projections(variables, rng: jax.Array):
    """Redraw every FAVOR+ random projection in a variables tree (the
    reference ProjectionUpdater redraws each module's features every N
    steps, `common/performer.py:5-37`; trainers call it post-step,
    `opt_trainer.py:434-436`). Returns a new variables dict."""
    if "performer" not in variables:
        return variables

    leaves, treedef = jax.tree_util.tree_flatten(variables["performer"])
    keys = jax.random.split(rng, len(leaves))
    new_leaves = [
        gaussian_orthogonal_random_matrix(k, l.shape[0], l.shape[1])
        for k, l in zip(keys, leaves)
    ]
    out = dict(variables)
    out["performer"] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out


def fast_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    proj: jnp.ndarray,
    causal: bool,
    generalized: bool,
    chunk: int = 128,
) -> jnp.ndarray:
    """The reference `FastAttention.forward` equivalent: featurize then apply
    (non-)causal linear attention. Output fp32, shape (..., T, Dv)."""
    if generalized:
        qp = relu_kernel_features(q, proj)
        kp = relu_kernel_features(k, proj)
    else:
        qp = softmax_kernel_features(q, proj, is_query=True)
        kp = softmax_kernel_features(k, proj, is_query=False)
    if causal:
        return causal_linear_attention(qp, kp, v, chunk=chunk)
    return linear_attention_noncausal(qp, kp, v.astype(jnp.float32))
