"""Compressed-mask resize and grouped top-k selection (dense/differentiable path).

TPU-native reimplementation of the reference ops
  * `resize_from_m_to_t`   — reference `ops/kernels/resize_m_to_t.py:6-73`
  * grouped top-k masking  — reference `attention.py:774-947` (inline) and
    `ops/kernels/causal_topk_masking.py:3-77` (standalone)

Everything here is pure `jnp` with static shapes: XLA fuses the index math,
and the functions are differentiable where the reference path needs gradients
(the resize is a gather, so gradients flow into `x`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def fp_min_for(dtype) -> float:
    """Mask fill constant.

    The reference uses fp16-min/2 even under bf16 "because of F.interpolate"
    (`attention.py:393-399`); we keep the same constant for parity.
    """
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16)):
        return float(jnp.finfo(jnp.float16).min) / 2
    if dtype == jnp.dtype(jnp.float32):
        return float(jnp.finfo(jnp.float32).min) / 2
    raise ValueError(f"unsupported dtype {dtype}")


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """CUDA `round` semantics: half away from zero (`triton_round`,
    reference `causal_resize_m_to_t.py:240-264`). All inputs here are >= 0."""
    return jnp.floor(x + 0.5)


def _causal_block_rows(t1: int) -> int:
    """Row-block size for the causal one-hot-matmul resize: bounds the
    per-block selector at BR·(T_M+1)·T2 while keeping enough rows per
    batched matmul for the MXU."""
    return min(256, t1)


def _causal_static_resize_matmul(grid_input: jnp.ndarray, t2: int, t_m: int):
    """No-padding causal resize as a blocked one-hot matmul (bit-exact).

    grid_input: (N, H, T1, T_M+1) — x padded with the fill column.
    Computes out[n,h,r,c] = grid_input[n,h,r, IDX[r,c]] where IDX is the
    STATIC no-padding causal index map of reference resize_m_to_t.py:36-71
    (reproduced with the exact same f32 arithmetic/rounding: cumsum of an
    unpadded causal row is exactly min(c+1, r+1) in f32, so the indices
    are bit-identical to the dynamic path's). Each output element is one
    input times 1.0 plus zeros — no accumulation rounding.
    """
    N, H, T1, _ = grid_input.shape
    br = _causal_block_rows(T1)
    nb = T1 // br
    grid_blocks = grid_input.reshape(N, H, nb, br, t_m + 1)
    c = jnp.arange(t2, dtype=jnp.float32)[None, :]
    p = jnp.arange(t_m + 1, dtype=jnp.int32)[None, :, None]

    def one_block(b):
        r = (b * br + jnp.arange(br, dtype=jnp.int32)).astype(jnp.float32)[:, None]
        mask_cs = jnp.minimum(c + 1.0, r + 1.0)
        idx = (
            jnp.floor((mask_cs - 1.0 + 0.5) / (r + 1.0) * t_m - 1e-4).astype(jnp.int32)
            + jnp.where(c > r, t_m, 0)
        )
        idx = jnp.clip(idx, 0, t_m)  # (br, T2)
        sel = (idx[:, None, :] == p).astype(grid_input.dtype)  # (br, T_M+1, T2)
        return jnp.einsum(
            "nhrp,rpc->nhrc", grid_blocks[:, :, b], sel,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = jax.lax.map(one_block, jnp.arange(nb))  # (nb, N, H, br, T2)
    return jnp.transpose(out, (1, 2, 0, 3, 4)).reshape(N, H, T1, t2)


def resize_from_m_to_t(
    x: jnp.ndarray,
    masked_fill_value: float,
    attention_mask: jnp.ndarray,
    target_width: Optional[int] = None,
    is_causal: bool = True,
    k: Optional[float] = None,
    oversampled: Optional[float] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Nearest-neighbour width-resize of a compressed (.., T_M) map to (.., T2).

    Padding-aware via cumulative-sum index math; matches reference
    `resize_m_to_t.py:36-71` exactly (including the 1e-4 epsilon and the
    `(1-mask)*T_M` pad redirect).

    Args:
      x: (N, H, T1, T_M) compressed map.
      masked_fill_value: value written at padded / undersampled positions.
      attention_mask: additive mask, 0 for keep / <=FP_MIN for pad;
        shape (N, 1, 1, T2) when not causal, (N, 1, T1, T2) when causal.
      target_width: T2 (defaults to T1).
      k / oversampled: when given, apply the `oversampled` undersampling mask
        (reference `resize_m_to_t.py:54-71`).
      rng: when given, apply the training-time index jitter with probability
        0.1 (reference `resize_m_to_t.py:39-45`).
    """
    N, H, T1, T_M = x.shape
    T2 = target_width if target_width is not None else T1

    if is_causal:
        assert attention_mask.shape == (N, 1, T1, T2), attention_mask.shape
    else:
        assert attention_mask.shape == (N, 1, 1, T2), attention_mask.shape
        attention_mask = jnp.broadcast_to(attention_mask, (N, 1, T1, T2))

    mask = (attention_mask > -1).astype(jnp.float32)
    mask_cs = jnp.cumsum(mask, axis=-1)
    token_length = mask_cs[..., -1:]

    if rng is not None:
        # index jitter: mask_cs + U(-0.75, 0.75), clamped to [1, argmax(mask_cs)]
        # (the reference clamps to the *index* of the max — a quirk we keep).
        jitter_rng, gate_rng = jax.random.split(rng)
        noise = jax.random.uniform(jitter_rng, mask_cs.shape) * 1.5 - 0.75
        hi = jnp.argmax(mask_cs, axis=-1, keepdims=True).astype(mask_cs.dtype)
        jittered = jnp.clip(mask_cs + noise, 1.0, hi)
        apply = jax.random.uniform(gate_rng, ()) < 0.1
        mask_cs = jnp.where(apply, jittered, mask_cs)

    token_index_x = (
        jnp.floor(((mask_cs - 1) + 0.5) / token_length * T_M - 1e-4).astype(jnp.int32)
        + ((1 - mask) * T_M).astype(jnp.int32)
    )
    token_index_x = jnp.clip(token_index_x, 0, T_M)

    grid_input = jnp.pad(
        x, ((0, 0), (0, 0), (0, 0), (0, 1)), constant_values=masked_fill_value
    )
    if not is_causal and rng is None:
        # Non-causal (and no jitter): the index map is ROW-INVARIANT (the
        # (N,1,1,T2) mask makes every row of token_index_x identical), so
        # the gather is a per-item column selection — one-hot MATMUL on
        # the MXU instead of an O(T1·T2) index-map gather. XLA TPU
        # gathers run at ~dozens of cycles/element: at LRA scale
        # (B4·H4·T2048, T_M 64) the six per-layer resize gathers were 91%
        # of the measured KD step device time (8.0 s -> the matmul is
        # sub-ms and its backward is the transposed matmul, killing the
        # scatter too). Bit-exact: each output element is exactly one
        # input times 1.0 plus zeros.
        idx = token_index_x[:, 0, 0, :]  # (N, T2) — row-invariant
        sel = (
            idx[:, None, :] == jnp.arange(T_M + 1, dtype=jnp.int32)[None, :, None]
        ).astype(grid_input.dtype)  # (N, T_M+1, T2)
        output = jnp.einsum(
            "nhrp,npc->nhrc", grid_input, sel,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif is_causal and T1 == T2 and T1 % _causal_block_rows(T1) == 0:
        # Causal: the map is row-VARYING, but with NO padding it is the
        # STATIC triangle map (depends on (r, c) only). A blocked one-hot
        # matmul (row-batched per block, selector built on the fly from
        # iota — never round-tripped through HBM whole) measured 60x the
        # gather forward and 31x its backward scatter on chip at T=2048
        # (scripts/causal_resize_probe.py, bit-exact both directions).
        # Padded batches and jittered steps (10% of training steps) take
        # the original gather via a runtime lax.cond, so semantics are
        # unchanged for every input.
        no_pad = jnp.all(
            (attention_mask > -1)
            == (
                jnp.arange(T2, dtype=jnp.int32)[None, :]
                <= jnp.arange(T1, dtype=jnp.int32)[:, None]
            )[None, None]
        )
        if rng is not None:
            no_pad = jnp.logical_and(no_pad, jnp.logical_not(apply))

        def _matmul_branch(gi):
            return _causal_static_resize_matmul(gi, T1, T_M)

        def _gather_branch(gi):
            tix = jnp.broadcast_to(token_index_x, (N, H, T1, T2))
            return jnp.take_along_axis(gi, tix, axis=-1)

        output = jax.lax.cond(no_pad, _matmul_branch, _gather_branch, grid_input)
    else:
        token_index_x = jnp.broadcast_to(token_index_x, (N, H, T1, T2))
        output = jnp.take_along_axis(grid_input, token_index_x, axis=-1)

    if oversampled is not None and oversampled != 1.0:
        assert k is not None
        xs = jnp.arange(T2, dtype=jnp.float32).reshape(1, 1, 1, T2)
        ws = token_length
        ps = jnp.maximum(round_half_away(token_length / oversampled), 1.0)
        oys = jnp.clip(token_length, round(k), round(k * oversampled)) / k
        frac = (xs + 1) / ws * ps
        keep = jnp.abs(frac - round_half_away(frac)) <= ((1.0 / oys) * 0.5 + 1e-4)
        output = jnp.where(keep, output, masked_fill_value)

    return output


def per_item_top_k(
    cfg_k: float,
    k_oversample: float,
    k_flatten_dim: str,
    num_heads: int,
    t_m: int,
    token_length: jnp.ndarray,
    causal_token_length: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Per-row retained-entry budget (reference `attention.py:834-868`).

    Returns a float array broadcastable against the flattened score tensor:
      'causal_batch' -> (N, T_DST, 1) causal, (N, 1, 1) otherwise
      'batch'        -> (N, 1)
      'head'         -> (N, 1, 1)
      'query'        -> (N, 1, 1, 1)
    """
    H, T_M = num_heads, t_m
    k_eff = cfg_k * k_oversample
    if k_flatten_dim == "batch":
        assert not causal
        out = token_length * H * (k_eff * T_M / token_length)
        out = out.reshape(out.shape[0], 1)
    elif k_flatten_dim == "head":
        assert not causal
        out = (token_length * (k_eff * T_M / token_length)).reshape(-1, 1, 1)
    elif k_flatten_dim == "causal_batch":
        if not causal:
            out = (H * (k_eff * T_M / token_length)).reshape(-1, 1, 1)
        else:
            assert causal_token_length is not None
            # (N, T_DST, 1)
            out = H * (k_eff * T_M / causal_token_length)
    elif k_flatten_dim == "query":
        assert not causal
        out = (k_eff * T_M / token_length).reshape(-1, 1, 1, 1)
    else:
        raise ValueError(k_flatten_dim)
    out = round_half_away(out)
    return jnp.maximum(out, 1.0)


def _ranks_desc(t: jnp.ndarray) -> jnp.ndarray:
    """Dense descending ranks along the last axis.

    Matches the reference's scatter-of-arange trick (`attention.py:888-917`):
    element with the largest value gets rank 0. Stable on ties (the reference
    top-k is also deterministic on ties by index order).
    """
    order = jnp.argsort(-t, axis=-1, stable=True)
    width = t.shape[-1]
    arange = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32), t.shape
    )
    ranks = jnp.zeros(t.shape, dtype=jnp.int32)
    ranks = jnp.put_along_axis(ranks, order, arange, axis=-1, inplace=False)
    return ranks


def topk_mask(
    estimated_attention_probs: jnp.ndarray,
    dst_alive: jnp.ndarray,
    per_item_k: jnp.ndarray,
    k_flatten_dim: str,
    benchmarking: bool,
    fp_min: float,
) -> jnp.ndarray:
    """Grouped top-k -> compressed mask (reference `attention.py:822-947`).

    Args:
      estimated_attention_probs: (N, H, T_DST, T_M) post-softmax estimates,
        already zeroed at padded query rows.
      dst_alive: (N, 1, T_DST, 1) boolean, False at padded query rows.
      per_item_k: broadcastable per-row budget from `per_item_top_k`.
      benchmarking: True -> binary {0,1} mask; False -> additive {0, FP_MIN}.

    Returns (N, H, T_DST, T_M) mask.
    """
    N, H, T_DST, T_M = estimated_attention_probs.shape
    probs = estimated_attention_probs

    if k_flatten_dim in ("causal_batch",):
        t = jnp.transpose(probs, (0, 2, 1, 3)).reshape(N, T_DST, H * T_M)
    elif k_flatten_dim == "batch":
        t = probs.reshape(N, H * T_DST * T_M)
    elif k_flatten_dim == "head":
        t = probs.reshape(N, H, T_DST * T_M)
    elif k_flatten_dim == "query":
        t = probs
    else:
        raise ValueError(k_flatten_dim)

    ranks = _ranks_desc(t)
    if benchmarking:
        alive = (ranks < per_item_k).astype(probs.dtype)
        mask = alive
    else:
        dead = ranks >= per_item_k
        mask = dead.astype(probs.dtype) * fp_min

    if k_flatten_dim == "causal_batch":
        mask = jnp.transpose(mask.reshape(N, T_DST, H, T_M), (0, 2, 1, 3))
        fill = 0.0 if benchmarking else fp_min
        mask = jnp.where(dst_alive, mask, fill)
    elif k_flatten_dim == "query":
        fill = 0.0 if benchmarking else fp_min
        mask = jnp.where(dst_alive, mask, fill)
    else:
        mask = mask.reshape(N, H, T_DST, T_M)
    return mask.reshape(N, H, T_DST, T_M)


def causal_topk_masking(
    estimated_probs: jnp.ndarray,
    k: int,
    attention_mask: jnp.ndarray,
    dst_attention_mask: jnp.ndarray,
    causal_attention_mask: jnp.ndarray,
    not_padded: bool = True,
    k_oversample: float = 1.0,
    benchmarking: bool = False,
) -> jnp.ndarray:
    """Standalone grouped top-k (reference `ops/kernels/causal_topk_masking.py:3-77`).

    NOTE the standalone reference op uses *floor* for the budget while the
    inline trainer path uses *round* (`attention.py:856`); we follow the
    trainer path (round) in both, since that is the trained configuration.
    """
    N, H, T_DST, T_M = estimated_probs.shape
    T_SRC = causal_attention_mask.shape[-1]
    causal_token_length = jnp.arange(1, T_DST + 1, dtype=jnp.float32).reshape(
        1, T_DST, 1
    )
    causal_token_length = jnp.broadcast_to(causal_token_length, (N, T_DST, 1))
    dst_alive = dst_attention_mask > -1  # (N, 1, T_DST, 1)
    probs = estimated_probs * dst_alive.astype(estimated_probs.dtype)
    budget = per_item_top_k(
        cfg_k=k,
        k_oversample=k_oversample,
        k_flatten_dim="causal_batch",
        num_heads=H,
        t_m=T_M,
        token_length=None,
        causal_token_length=causal_token_length,
        causal=True,
    )
    return topk_mask(
        probs,
        dst_alive,
        budget,
        "causal_batch",
        benchmarking,
        fp_min_for(estimated_probs.dtype),
    )
