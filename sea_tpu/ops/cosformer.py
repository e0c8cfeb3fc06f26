"""Cosformer attention (cos-reweighted linear attention).

In-house JAX reimplementation of reference `src/models/cosformer.py:9-250`
(`CosformerAttention`) — used both as a baseline operator and as an
alternative SEA predictor backend (`attention.py:169-178,535-547`):

  features:  q' = [relu(q) sin(pi i / 2m), relu(q) cos(pi i / 2m)]
             k' likewise (i = 1-based position, m = max(L, S));
  causal:    out_t = (q'_t . sum_{s<=t} k'_s v_s^T) / max(q'_t . s_t, eps)
  non-causal:out = q'(K'^T V) / max(q'(K'^T 1), eps)

The causal prefix is computed with the same chunked inter/intra-chunk
decomposition as our FAVOR+ path (MXU-shaped, not materialised outer
products). The module owns q/k/v (and optional out) projections like the
reference (vdim may differ from embed_dim — SEA uses vdim = 2*embed_dim)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _cos_features(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """x: (B, T, D) post-activation; returns (B, T, 2D)."""
    T = x.shape[-2]
    idx = (jnp.arange(1, T + 1, dtype=jnp.float32) * (math.pi / 2.0) / m)[
        None, :, None
    ]
    return jnp.concatenate([x * jnp.sin(idx), x * jnp.cos(idx)], axis=-1)


def cosformer_causal(
    qp: jnp.ndarray, kp: jnp.ndarray, v: jnp.ndarray, chunk: int = 128,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Chunked causal linear attention with clamp_min denominator
    (reference `cosformer.py:115-131`). Shapes (B, T, M) x (B, T, Dv)."""
    B, T, M = qp.shape
    Dv = v.shape[-1]
    pad = (-T) % chunk
    if pad:
        qp = jnp.pad(qp, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nc = (T + pad) // chunk
    qc = jnp.moveaxis(qp.reshape(B, nc, chunk, M), 1, 0)
    kc = jnp.moveaxis(kp.reshape(B, nc, chunk, M), 1, 0)
    vc = jnp.moveaxis(v.reshape(B, nc, chunk, Dv), 1, 0)
    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    def body(carry, inp):
        S, z = carry
        q_i, k_i, v_i = inp
        a = jnp.einsum("btm,bsm->bts", q_i, k_i) * tri
        num = jnp.einsum("bts,bsd->btd", a, v_i) + jnp.einsum(
            "btm,bmd->btd", q_i, S
        )
        den = jnp.sum(a, -1) + jnp.einsum("btm,bm->bt", q_i, z)
        out = num / jnp.maximum(den, eps)[..., None]
        S = S + jnp.einsum("bsm,bsd->bmd", k_i, v_i)
        z = z + jnp.sum(k_i, axis=-2)
        return (S, z), out

    S0 = jnp.zeros((B, M, Dv), jnp.float32)
    z0 = jnp.zeros((B, M), jnp.float32)
    _, outs = jax.lax.scan(body, (S0, z0), (qc, kc, vc))
    return jnp.moveaxis(outs, 0, 1).reshape(B, T + pad, Dv)[:, :T]


class CosformerAttention(nn.Module):
    """Reference-parity module: embed_dim in, vdim value stream, per-head
    cos features, relu activation, no out-proj when used as SEA backend."""

    embed_dim: int
    num_heads: int
    vdim: Optional[int] = None
    has_outproj: bool = True
    causal: bool = False

    @nn.compact
    def __call__(self, query, key=None, value=None, eps: float = 1e-6):
        """query: (L, N, E); key/value: (S, N, E/Vd) — the reference's
        sequence-first layout."""
        key = query if key is None else key
        value = query if value is None else value
        E, H = self.embed_dim, self.num_heads
        Vd = self.vdim if self.vdim is not None else E
        hd = E // H
        vhd = Vd // H
        L, N, _ = query.shape
        S = key.shape[0]

        q = nn.relu(nn.Dense(E, name="q_proj")(query))
        k = nn.relu(nn.Dense(E, name="k_proj")(key))
        v = nn.Dense(Vd, name="v_proj")(value)

        def heads(x, d):
            return jnp.transpose(
                x.reshape(x.shape[0], N * H, d), (1, 0, 2)
            )  # (N*H, T, d)

        q = heads(q, hd).astype(jnp.float32)
        k = heads(k, hd).astype(jnp.float32)
        v = heads(v, vhd).astype(jnp.float32)

        m = max(L, S)
        q_ = _cos_features(q, m)
        k_ = _cos_features(k, m)

        if self.causal:
            out = cosformer_causal(q_, k_, v, eps=eps)
        else:
            kv = jnp.einsum("bsm,bsd->bmd", k_, v)
            z = jnp.einsum("btm,bm->bt", q_, jnp.sum(k_, axis=1))
            out = jnp.einsum("btm,bmd->btd", q_, kv) / jnp.maximum(z, eps)[..., None]

        out = jnp.transpose(out, (1, 0, 2)).reshape(L, N, H * vhd)
        if self.has_outproj:
            out = nn.Dense(Vd, name="out_proj")(out)
        return out.astype(query.dtype)
