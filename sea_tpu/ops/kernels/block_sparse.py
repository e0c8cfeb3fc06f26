"""Fused block-sparse SEA attention — the Pallas TPU fast path.

Replaces the reference's 4-kernel ragged-CSR chain (masked SDDMM -> sparse
softmax -> row scale -> SpMM, `ops/kernels/flat_csr_*.py`) with ONE fused
flash-style kernel that:

  * derives the element mask from the compressed (T_M-wide) top-k mask with
    the *dense-resize* semantics (column s of row r alive iff
    mask_m[r, pixel(r, s)] with pixel(r,s) = floor((s+0.5)/w_r * T_M - 1e-4),
    reference `resize_m_to_t.py:46`), so the kernel path is exactly
    consistent with the differentiable train path;
  * skips (BQ x BK) tiles with no alive column, using precomputed per-tile
    activity lists (scalar-prefetched) — the analogue of splash-attention's
    mask-block skipping, driven here by SEA's *dynamic* estimated mask;
  * computes q.k^T on the MXU only for active tiles, applies the bit-packed
    element mask, does an online-softmax (flash) accumulation of P.V, and
    multiplies the per-(row,head) sigmoid scaler into the output.

Memory traffic per (n,h,q-block): q once + k/v tiles of active blocks + the
packed bitmask (T/8 bytes per row) — near speed-of-light for the sparse
access pattern, vs. the XLA gather path which decomposes into per-element
dynamic gathers.

Layout: heads are folded into the batch grid dimension, which realises the
per-(row, head) segmented-softmax semantics of `flat_csr_softmax` exactly.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA-side preparation
# ---------------------------------------------------------------------------


def pack_alive_bits(
    mask_m: jnp.ndarray,
    t_src: int,
    is_causal: bool,
    row_chunk: int = 256,
) -> jnp.ndarray:
    """(N, H, T_DST, T_M) binary compressed mask -> (N, H, T_DST, T_SRC//32)
    uint32 packed element mask under dense-resize semantics (+ causal).

    Computed in row chunks via lax.map so only O(chunk * T_SRC) is transient.
    """
    N, H, T_DST, T_M = mask_m.shape
    assert t_src % 32 == 0
    m = (mask_m > 0).reshape(N * H, T_DST, T_M)

    s_idx = jnp.arange(t_src, dtype=jnp.float32)  # (T_SRC,)
    bit_w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)

    n_chunks = (T_DST + row_chunk - 1) // row_chunk
    pad_rows = n_chunks * row_chunk - T_DST
    m_p = jnp.pad(m, ((0, 0), (0, pad_rows), (0, 0)))
    m_c = m_p.reshape(N * H, n_chunks, row_chunk, T_M)
    m_c = jnp.moveaxis(m_c, 1, 0)  # (n_chunks, NH, row_chunk, T_M)

    def chunk_fn(args):
        ci, m_blk = args  # m_blk: (NH, row_chunk, T_M)
        r0 = ci * row_chunk
        rows = r0 + jnp.arange(row_chunk, dtype=jnp.int32)  # (RC,)
        if is_causal:
            w = (rows + 1).astype(jnp.float32)[:, None]  # (RC,1)
        else:
            w = jnp.full((row_chunk, 1), float(t_src), jnp.float32)
        pixel = jnp.floor((s_idx[None, :] + 0.5) / w * T_M - 1e-4).astype(jnp.int32)
        pixel = jnp.clip(pixel, 0, T_M - 1)  # (RC, T_SRC)
        alive = jnp.take_along_axis(
            m_blk, jnp.broadcast_to(pixel[None], (m_blk.shape[0],) + pixel.shape),
            axis=-1,
        )
        if is_causal:
            alive = alive & (s_idx[None, None, :] <= rows[None, :, None])
        packed = alive.reshape(m_blk.shape[0], row_chunk, t_src // 32, 32)
        packed = jnp.sum(
            packed.astype(jnp.uint32) * bit_w[None, None, None, :],
            axis=-1,
            dtype=jnp.uint32,
        )
        return packed  # (NH, RC, T_SRC//32)

    packed = jax.lax.map(
        chunk_fn, (jnp.arange(n_chunks, dtype=jnp.int32), m_c)
    )  # (n_chunks, NH, RC, W)
    packed = jnp.moveaxis(packed, 0, 1).reshape(N * H, n_chunks * row_chunk, -1)
    return packed[:, :T_DST].reshape(N, H, T_DST, t_src // 32)


def element_mask_int8(
    mask_m: jnp.ndarray,
    t_src: int,
    is_causal: bool,
    row_chunk: int = 256,
) -> jnp.ndarray:
    """(N,H,T_DST,T_M) compressed mask -> (N,H,T_DST,T_SRC) int8 alive mask
    (dense-resize semantics + causal). The unpacked twin of
    `pack_alive_bits` — Mosaic consumes int8 tiles directly, no in-kernel
    bit unpacking. O(T^2) bytes; fine to ~8k sequence, after which the
    packed layout should take over."""
    N, H, T_DST, T_M = mask_m.shape
    m = (mask_m > 0).reshape(N * H, T_DST, T_M)
    s_idx = jnp.arange(t_src, dtype=jnp.float32)
    n_chunks = (T_DST + row_chunk - 1) // row_chunk
    pad_rows = n_chunks * row_chunk - T_DST
    m_p = jnp.pad(m, ((0, 0), (0, pad_rows), (0, 0)))
    m_c = jnp.moveaxis(
        m_p.reshape(N * H, n_chunks, row_chunk, T_M), 1, 0
    )

    def chunk_fn(args):
        ci, m_blk = args
        rows = ci * row_chunk + jnp.arange(row_chunk, dtype=jnp.int32)
        if is_causal:
            w = (rows + 1).astype(jnp.float32)[:, None]
        else:
            w = jnp.full((row_chunk, 1), float(t_src), jnp.float32)
        pixel = jnp.floor((s_idx[None, :] + 0.5) / w * T_M - 1e-4).astype(jnp.int32)
        pixel = jnp.clip(pixel, 0, T_M - 1)
        alive = jnp.take_along_axis(
            m_blk,
            jnp.broadcast_to(pixel[None], (m_blk.shape[0],) + pixel.shape),
            axis=-1,
        )
        if is_causal:
            alive = alive & (s_idx[None, None, :] <= rows[None, :, None])
        return alive.astype(jnp.int8)

    alive = jax.lax.map(chunk_fn, (jnp.arange(n_chunks, dtype=jnp.int32), m_c))
    alive = jnp.moveaxis(alive, 0, 1).reshape(N * H, n_chunks * row_chunk, t_src)
    return alive[:, :T_DST].reshape(N, H, T_DST, t_src)


def active_tile_lists(
    bits: jnp.ndarray, block_q: int, block_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per (n, h, q-block): ascending list of active k-block indices.

    Returns (counts (N,H,NQ) int32, idx (N,H,NQ,NKB) int32); idx is padded
    by repeating the last active block so BlockSpec index maps re-fetch
    nothing for skipped grid steps.
    """
    N, H, T, W = bits.shape
    t_src = W * 32
    assert T % block_q == 0 and t_src % block_k == 0
    NQ, NKB = T // block_q, t_src // block_k
    wpb = block_k // 32
    tile = bits.reshape(N, H, NQ, block_q, NKB, wpb)
    active = jnp.any(tile != 0, axis=(3, 5))  # (N,H,NQ,NKB)
    counts = active.sum(-1).astype(jnp.int32)
    # stable argsort of (not active) puts active block indices first, ascending
    order = jnp.argsort(jnp.where(active, 0, 1), axis=-1, stable=True)
    ar = jnp.arange(NKB, dtype=jnp.int32)
    within = ar[None, None, None, :] < jnp.maximum(counts[..., None], 1)
    idx = jnp.where(within, order, 0).astype(jnp.int32)
    # pad tail with the last active index (no-op refetches)
    last = jnp.take_along_axis(
        idx, jnp.maximum(counts[..., None] - 1, 0), axis=-1
    )
    idx = jnp.where(within, idx, last)
    return counts, idx


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _kernel(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKB)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    alive_ref,  # (1, BQ, BK) int8 element mask tile
    scale_ref,  # (1, BQ, 128) row scaler (broadcast over lanes)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
):
    h = pl.program_id(0)
    q_blk = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, q_blk]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j < count)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (BQ, D)
        k = k_ref[0].astype(jnp.float32)  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        # int8 compare is unsupported on some TPU targets; widen first
        alive = alive_ref[0].astype(jnp.float32) > 0.0

        s = jnp.where(alive, s, NEG_INF)
        m_prev = m_scr[:, 0:1]  # (BQ,1)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(alive, jnp.exp(s - m_cur), 0.0)
        corr = jnp.exp(m_prev - m_cur)  # (BQ,1)
        l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p,
            v_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)


def sea_block_sparse_attention(
    q: jnp.ndarray,  # (N, H, T_DST, D) — pre-scaled
    k: jnp.ndarray,  # (N, H, T_SRC, D)
    v: jnp.ndarray,  # (N, H, T_SRC, D)
    mask_m: jnp.ndarray,  # (N, H, T_DST, T_M) binary compressed mask
    row_scaler: Optional[jnp.ndarray] = None,  # (N, H, T_DST) sigmoid scaler
    *,
    is_causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sparse attention: softmax(mask(q.k^T)) . v * scaler.

    Per-(row, head) softmax over alive columns only; rows with no alive
    column produce zeros (matching `flat_csr_softmax` zero-nnz behaviour).
    """
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    assert T_DST % block_q == 0 and T_SRC % block_k == 0

    alive8 = element_mask_int8(mask_m, T_SRC, is_causal).reshape(
        N * H, T_DST, T_SRC
    )
    bits = pack_alive_bits(mask_m, T_SRC, is_causal)  # (N,H,T,W)
    counts, idx = active_tile_lists(bits, block_q, block_k)

    NH = N * H
    NQ = T_DST // block_q
    NKB = T_SRC // block_k
    qf = q.reshape(NH, T_DST, D)
    kf = k.reshape(NH, T_SRC, D)
    vf = v.reshape(NH, T_SRC, D)
    countsf = counts.reshape(NH, NQ)
    idxf = idx.reshape(NH, NQ, NKB)
    if row_scaler is None:
        scalerf = jnp.ones((NH, T_DST, 128), q.dtype)
    else:
        scalerf = jnp.broadcast_to(
            row_scaler.reshape(NH, T_DST, 1), (NH, T_DST, 128)
        ).astype(q.dtype)

    wpb = block_k // 32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NH, NQ, NKB),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, D), lambda h, i, j, c, x: (h, i, 0)
            ),
            pl.BlockSpec(
                (1, block_k, D), lambda h, i, j, c, x: (h, x[h, i, j], 0)
            ),
            pl.BlockSpec(
                (1, block_k, D), lambda h, i, j, c, x: (h, x[h, i, j], 0)
            ),
            pl.BlockSpec(
                (1, block_q, block_k), lambda h, i, j, c, x: (h, i, x[h, i, j])
            ),
            pl.BlockSpec(
                (1, block_q, 128), lambda h, i, j, c, x: (h, i, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda h, i, j, c, x: (h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(countsf, idxf, qf, kf, vf, alive8, scalerf)
    return out.reshape(N, H, T_DST, D)


def dense_reference(
    q, k, v, mask_m, row_scaler=None, *, is_causal=True
) -> jnp.ndarray:
    """jnp oracle with identical semantics (dense-resize mask + per-row
    softmax + scaler), for kernel tests."""
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    T_M = mask_m.shape[-1]
    s_idx = jnp.arange(T_SRC, dtype=jnp.float32)[None, :]
    r_idx = jnp.arange(T_DST, dtype=jnp.int32)[:, None]
    if is_causal:
        w = (r_idx + 1).astype(jnp.float32)
    else:
        w = jnp.full((T_DST, 1), float(T_SRC), jnp.float32)
    pixel = jnp.floor((s_idx + 0.5) / w * T_M - 1e-4).astype(jnp.int32)
    pixel = jnp.clip(pixel, 0, T_M - 1)  # (T_DST, T_SRC)
    alive = jnp.take_along_axis(
        (mask_m > 0), jnp.broadcast_to(pixel, (N, H, T_DST, T_SRC)), axis=-1
    )
    if is_causal:
        alive = alive & (s_idx[None, None] <= r_idx[None, None].astype(jnp.float32))
    scores = jnp.einsum("nhtd,nhsd->nhts", q, k).astype(jnp.float32)
    scores = jnp.where(alive, scores, NEG_INF)
    m = jnp.max(scores, -1, keepdims=True)
    p = jnp.where(alive, jnp.exp(scores - m), 0.0)
    l = jnp.sum(p, -1, keepdims=True)
    p = p / jnp.where(l > 0, l, 1.0)
    out = jnp.einsum("nhts,nhsd->nhtd", p, v.astype(jnp.float32))
    if row_scaler is not None:
        out = out * row_scaler[..., None]
    return out.astype(q.dtype)
