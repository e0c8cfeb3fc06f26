"""Autoregressive decode cache for SEA attention.

TPU-native redesign of reference `attention_state.py:238-360`
(`PerlinAttentionState` + stateful ops): the clone-on-write dict of python
objects becomes one explicit NamedTuple of fixed-shape arrays threaded
through the decode loop (scan-able, jit-able):

  * `StatefulCausalPerformer` (`:43-140`) — chunked prefix FAVOR+ carrying
    k_cumsum / context_cumsum; here the running (M, Dv) state matmul. The
    reference accumulates in fp64; TPUs have no fp64, so we carry fp32
    (decode-vs-prefill tolerance covers this, as the reference's own cache
    test does with its error table).
  * `StatefulCausalCNN` (`:142-203`) — sliding window (24) of past CNN
    inputs re-run per step; 24 >= the dilated conv stack's receptive field
    (2 convs, k=3, dilation=2 -> 9 rows), so windowing is exact.
  * `StatefulCumAvg` (`:205-236`) — running mean of v.

Plus a fixed-capacity K/V cache (the `past_key_value` the reference threads
through `perlin_opt.py:625-626`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

CNN_WINDOW = 24  # reference attention_state.py:150


class SeaDecodeState(NamedTuple):
    # FAVOR+ prefix state
    performer_S: jnp.ndarray  # (N, H, M, Dv) fp32
    performer_z: jnp.ndarray  # (N, H, M) fp32
    # rolling window of dec_row outputs feeding the causal CNN
    cnn_window: jnp.ndarray  # (N, C, CNN_WINDOW, T_M // down) — newest last
    cnn_filled: jnp.ndarray  # () int32, rows valid at the window's tail
    # running average of v
    cumavg_sum: jnp.ndarray  # (N, H, 1, D) fp32
    cumavg_len: jnp.ndarray  # () int32
    # K/V cache
    k_cache: jnp.ndarray  # (N, H, max_len, D)
    v_cache: jnp.ndarray  # (N, H, max_len, D)
    length: jnp.ndarray  # () int32 — tokens already cached


def init_decode_state(
    batch: int,
    num_heads: int,
    head_dim: int,
    nb_features: int,
    predictor_length: int,
    dec_row_splits: int,
    dec_row_down_scale: int,
    max_len: int,
    dtype=jnp.float32,
) -> SeaDecodeState:
    Dv = head_dim * 2  # [identity ‖ v] performer value width
    C = dec_row_splits * num_heads
    Wd = predictor_length // dec_row_down_scale
    return SeaDecodeState(
        performer_S=jnp.zeros((batch, num_heads, nb_features, Dv), jnp.float32),
        performer_z=jnp.zeros((batch, num_heads, nb_features), jnp.float32),
        cnn_window=jnp.zeros((batch, C, CNN_WINDOW, Wd), dtype),
        cnn_filled=jnp.zeros((), jnp.int32),
        cumavg_sum=jnp.zeros((batch, num_heads, 1, head_dim), jnp.float32),
        cumavg_len=jnp.zeros((), jnp.int32),
        k_cache=jnp.zeros((batch, num_heads, max_len, head_dim), dtype),
        v_cache=jnp.zeros((batch, num_heads, max_len, head_dim), dtype),
        length=jnp.zeros((), jnp.int32),
    )


def performer_decode_step(
    state_S: jnp.ndarray,
    state_z: jnp.ndarray,
    qp: jnp.ndarray,  # (N, H, 1, M) featurized query
    kp: jnp.ndarray,  # (N, H, 1, M) featurized key
    v: jnp.ndarray,  # (N, H, 1, Dv)
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One prefix step: S += k' v^T, z += k', out = (q'.S)/(q'.(z+eps))."""
    S = state_S + jnp.einsum("nhtm,nhtd->nhmd", kp, v.astype(jnp.float32))
    z = state_z + kp[:, :, 0, :]
    num = jnp.einsum("nhtm,nhmd->nhtd", qp, S)
    den = jnp.einsum("nhtm,nhm->nht", qp, z) + eps * jnp.sum(qp, axis=-1)
    den = jnp.where(den <= 0, 1.0, den)
    return num / den[..., None], S, z


def cnn_window_push(
    window: jnp.ndarray, filled: jnp.ndarray, row: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift the window left by one and append `row` (N, C, 1, Wd)."""
    window = jnp.concatenate([window[:, :, 1:, :], row], axis=2)
    return window, jnp.minimum(filled + 1, window.shape[2])


def cumavg_step(
    cum_sum: jnp.ndarray, cum_len: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Running mean (reference StatefulCumAvg.__call__).

    `cum_len` may be () (all rows in lockstep) or (N,) (per-slot lengths in
    the serving engine); it broadcasts against `cum_sum` (N, H, 1, D)."""
    s = cum_sum + v.astype(jnp.float32)
    n = cum_len + 1
    n_b = n.astype(jnp.float32).reshape(n.shape + (1,) * (s.ndim - n.ndim))
    return (s / n_b).astype(v.dtype), s, n


def reset_state_rows(state: SeaDecodeState, rows: jnp.ndarray) -> SeaDecodeState:
    """Zero the per-sequence rows selected by the bool mask `rows` (N,) —
    used by the serving engine when a cache slot is recycled for a new
    request. Scalar-shaped fields (lockstep decode) are left untouched;
    per-slot fields ((N, ...) leading axis) are zeroed where rows is True."""
    n = rows.shape[0]

    def _reset(x):
        if x.ndim >= 1 and x.shape[0] == n:
            m = rows.reshape((n,) + (1,) * (x.ndim - 1))
            return jnp.where(m, jnp.zeros_like(x), x)
        return x

    return SeaDecodeState(*(_reset(x) for x in state))


def select_state_rows(
    state_new: SeaDecodeState, state_old: SeaDecodeState, rows: jnp.ndarray
) -> SeaDecodeState:
    """Per-row select between two states: rows where `rows` (N,) is True
    advance to `state_new`, others keep `state_old` — the serving engine
    freezes slots that were not scheduled this step (stalled on a page
    allocation, or idle)."""
    n = rows.shape[0]

    def _sel(a, b):
        if a.ndim >= 1 and a.shape[0] == n:
            m = rows.reshape((n,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)
        return a

    return SeaDecodeState(*(_sel(a, b) for a, b in zip(state_new, state_old)))


# ----------------------------------------------------------------------
# int8 KV-pool quantization (serving). No reference analogue (the
# reference decodes through fp16 HF caches); designed for TPU serving
# where HBM capacity bounds concurrency: int8 pools + per-(token, head)
# f32 scales cost ~8.25 bytes/elem-pair vs 32 for f32 pools.


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 quantization over the trailing (head_dim)
    axis. Returns (q, scale) with q int8 in [-127, 127] and scale shaped
    like x without its last axis; x ~= q * scale[..., None]."""
    scale = jnp.max(jnp.abs(x), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32):
    return q.astype(dtype) * scale[..., None].astype(dtype)
