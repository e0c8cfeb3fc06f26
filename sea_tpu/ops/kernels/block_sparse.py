"""Fused block-sparse SEA attention — the Pallas TPU fast path.

Replaces the reference's 4-kernel ragged-CSR chain (masked SDDMM -> sparse
softmax -> row scale -> SpMM, `ops/kernels/flat_csr_*.py`) with ONE fused
flash-style kernel that:

  * derives the element mask from the compressed (T_M-wide) top-k mask with
    the *dense-resize* semantics (column s of row r alive iff
    mask_m[r, pixel(r, s)] with pixel(r,s) = floor((s+0.5)/w_r * T_M - 1e-4),
    reference `resize_m_to_t.py:46`), so the kernel path is exactly
    consistent with the differentiable train path;
  * skips (BQ x BK) tiles with no alive column, using per-tile activity
    lists computed by interval math in the *compressed* domain (the
    splash-attention block-skipping idea, driven by SEA's dynamic mask);
  * expands the mask *inside the kernel arithmetically* — no gathers, and
    (v2, causal path) at minimum VPU cost:
      - pixel index = one fused multiply-add per element
        (pix = trunc(col*a_r + b_r), bit-exact with the reference formula —
        verified exhaustively up to T=8192 in scripts/analyze_tile_activity.py);
      - the packed mask word is selected from TWO per-row candidates
        (c0=word[wlo], c1=word[wlo+1]) whenever the row is wide enough that a
        128-column sub-tile spans <= 2 mask words (w >= 4*T_M); narrow rows
        (<7% of causal elements at T=4096) take the full select chain;
      - no clip and no causal compare: columns past the causal width map to
        pixel >= T_M, whose mask word/bits are zero by construction, so they
        die for free;
      - the mask folds into the score arithmetically (dead score = -2e30
        against an m-floor of -1e30), so exp() underflows dead lanes to 0
        and no post-exp select is needed.
  * computes q.k^T on the MXU per 128-wide sub-tile (only those with any
    alive column), accumulates scores into a (BQ, BKO) VMEM staging buffer,
    and runs ONE online-softmax (flash) update per 512-wide outer tile,
    fusing the per-(row,head) sigmoid scaler into the epilogue.

Heads fold into the batch grid dimension, which realises the per-(row,
head) segmented-softmax semantics of `flat_csr_softmax` exactly.

k_oversample != 1 applies the train path's undersampling keep-predicate
(reference `resize_m_to_t.py:54-71`) inside the kernel with the same f32
expression order, and non-128-multiple sequence lengths are zero-padded in
the wrapper — no config routes to a slow fallback.
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
DEAD = -2.0e30  # masked score; exp(DEAD - m) == 0 for any m >= M_INIT
M_INIT = -1.0e30  # running-max floor


# ---------------------------------------------------------------------------
# XLA-side preparation — everything O(T * T_M), no dense T x T tensors.
# ---------------------------------------------------------------------------


def pack_compressed_bits(mask_m: jnp.ndarray) -> jnp.ndarray:
    """(N, H, T_DST, T_M) binary mask -> (N, H, T_DST, ceil(T_M/32)) uint32
    (zero-padded to a whole word; pixel indices never reach the padding)."""
    N, H, T, T_M = mask_m.shape
    pad = (-T_M) % 32
    m = mask_m > 0
    if pad:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, pad)))
    bit_w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    m = m.reshape(N, H, T, (T_M + pad) // 32, 32)
    return jnp.sum(m.astype(jnp.uint32) * bit_w, axis=-1, dtype=jnp.uint32)


def _pixel_starts(widths: jnp.ndarray, t_m: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive run starts / exclusive ends of each compressed pixel under
    the dense-resize floor semantics. widths: (R,) float; returns
    (vs, ve) each (R, T_M) int32 (columns, clipped to [0, w))."""
    b = jnp.arange(t_m + 1, dtype=jnp.float32)[None, :]
    w = widths[:, None]
    bounds = jnp.ceil((b + 1e-4) * w / t_m - 0.5).astype(jnp.int32)
    bounds = jnp.clip(bounds, 0, w.astype(jnp.int32))
    return bounds[:, :-1], bounds[:, 1:]


def _causal_activity(
    mask_m: jnp.ndarray,
    t_src: int,
    block_q: int,
    block_k: int,
    row_widths: Optional[jnp.ndarray] = None,
    row_chunk: int = 512,
) -> jnp.ndarray:
    """(N, H, NQ, NKB) bool: q-block x k-block has >=1 alive column
    (conservative superset via compressed-domain interval overlap)."""
    N, H, T_DST, T_M = mask_m.shape
    NQ, NKB = T_DST // block_q, t_src // block_k
    m = mask_m > 0

    rows = jnp.arange(T_DST, dtype=jnp.float32)
    if row_widths is not None:
        widths = row_widths.astype(jnp.float32)
    else:
        widths = rows + 1.0
    vs, ve = _pixel_starts(widths, T_M)  # (T_DST, T_M)
    lo_blk = jnp.maximum(vs - 1, 0) // block_k
    hi_blk = jnp.minimum(ve, widths.astype(jnp.int32)[:, None] - 1) // block_k
    nonempty = ve > vs

    j_ids = jnp.arange(NKB, dtype=jnp.int32)
    n_chunks = (T_DST + row_chunk - 1) // row_chunk
    pad = n_chunks * row_chunk - T_DST
    m_p = jnp.pad(m.reshape(N * H, T_DST, T_M), ((0, 0), (0, pad), (0, 0)))
    lo_p = jnp.pad(lo_blk, ((0, pad), (0, 0)))
    hi_p = jnp.pad(hi_blk, ((0, pad), (0, 0)), constant_values=-1)
    ne_p = jnp.pad(nonempty, ((0, pad), (0, 0)))

    def chunk_fn(ci):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, ci * row_chunk, row_chunk, 0)
        m_c = jax.lax.dynamic_slice_in_dim(m_p, ci * row_chunk, row_chunk, 1)
        lo_c, hi_c, ne_c = sl(lo_p), sl(hi_p), sl(ne_p)
        inside = (
            (j_ids[None, None, :] >= lo_c[:, :, None])
            & (j_ids[None, None, :] <= hi_c[:, :, None])
            & ne_c[:, :, None]
        )  # (RC, T_M, NKB)
        return jnp.einsum(
            "nrb,rbj->nrj",
            m_c.astype(jnp.float32),
            inside.astype(jnp.float32),
        ) > 0

    act = jax.lax.map(chunk_fn, jnp.arange(n_chunks, dtype=jnp.int32))
    act = jnp.moveaxis(act, 0, 1).reshape(N * H, n_chunks * row_chunk, NKB)
    return act[:, :T_DST].reshape(N, H, NQ, block_q, NKB).any(axis=3)


def _compact_lists(act: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """act (..., NKB) bool -> (counts, idx) with idx padded by repeating the
    last active block (skipped grid steps refetch nothing)."""
    NKB = act.shape[-1]
    counts = act.sum(-1).astype(jnp.int32)
    order = jnp.argsort(jnp.where(act, 0, 1), axis=-1, stable=True)
    ar = jnp.arange(NKB, dtype=jnp.int32)
    within = ar[None, None, None, :] < jnp.maximum(counts[..., None], 1)
    idx = jnp.where(within, order, 0).astype(jnp.int32)
    last = jnp.take_along_axis(idx, jnp.maximum(counts[..., None] - 1, 0), axis=-1)
    idx = jnp.where(within, idx, last)
    return counts, idx


def tile_activity_lists(
    mask_m: jnp.ndarray,
    t_src: int,
    is_causal: bool,
    block_q: int,
    block_k: int,
    row_chunk: int = 512,
    lengths: Optional[jnp.ndarray] = None,
    row_widths: Optional[jnp.ndarray] = None,  # (T_DST,) causal widths override
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per (n, h, q-block): ascending list of active k-block indices from
    compressed-domain interval overlap (conservative superset: run bounds
    padded by one column against fp boundary rounding).

    Returns (counts (N,H,NQ) int32, idx (N,H,NQ,NKB) int32)."""
    N, H, T_DST, T_M = mask_m.shape
    NQ, NKB = T_DST // block_q, t_src // block_k
    m = mask_m > 0

    if (not is_causal) and lengths is not None:
        # padded bidirectional: per-example widths; sizes are small enough
        # (BERT T<=512) to compute unchunked
        j_ids = jnp.arange(NKB, dtype=jnp.int32)
        w = lengths.astype(jnp.float32)[:, None]  # (N, 1)
        b = jnp.arange(T_M + 1, dtype=jnp.float32)[None, :]
        bounds = jnp.ceil((b + 1e-4) * w / T_M - 0.5).astype(jnp.int32)
        bounds = jnp.clip(bounds, 0, lengths[:, None].astype(jnp.int32))
        vs_n, ve_n = bounds[:, :-1], bounds[:, 1:]  # (N, T_M)
        lo = jnp.maximum(vs_n - 1, 0) // block_k
        hi = jnp.minimum(ve_n, lengths[:, None].astype(jnp.int32) - 1) // block_k
        ne = ve_n > vs_n
        inside = (
            (j_ids[None, None, :] >= lo[:, :, None])
            & (j_ids[None, None, :] <= hi[:, :, None])
            & ne[:, :, None]
        )  # (N, T_M, NKB)
        act = jnp.einsum(
            "nhrb,nbj->nhrj", m.astype(jnp.float32), inside.astype(jnp.float32)
        ) > 0  # (N, H, T_DST, NKB)
        act = act.reshape(N, H, NQ, block_q, NKB).any(axis=3)
        return _compact_lists(act)

    if is_causal:
        act = _causal_activity(mask_m, t_src, block_q, block_k, row_widths, row_chunk)
    else:
        widths = jnp.full((T_DST,), float(t_src))
        act = _causal_activity(
            mask_m, t_src, block_q, block_k, row_widths=widths, row_chunk=row_chunk
        )
    return _compact_lists(act)


def tile_activity_sub(
    mask_m: jnp.ndarray,
    t_src: int,
    block_q: int,
    block_ko: int,
    sub: int,
    row_widths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Causal activity at `sub` granularity grouped under `block_ko` outer
    k-blocks. Returns (counts (N,H,NQ), idx (N,H,NQ,NKO), submask
    (N,H,NQ,NKO) int32 bitmask of active sub-tiles, aligned with idx)."""
    spb = block_ko // sub
    act = _causal_activity(mask_m, t_src, block_q, sub, row_widths)  # (..., NKBi)
    N, H, NQ, NKBi = act.shape
    NKO = NKBi // spb
    grouped = act.reshape(N, H, NQ, NKO, spb)
    bits = jnp.sum(
        grouped.astype(jnp.int32) * (1 << jnp.arange(spb, dtype=jnp.int32)), axis=-1
    )
    counts, idx = _compact_lists(grouped.any(-1))
    submask = jnp.take_along_axis(bits, idx, axis=-1)
    return counts, idx, submask


# ---------------------------------------------------------------------------
# causal kernel, 'flat' impl (default): one (BQ, BK) tile per grid step,
# masking with fma pixel math + full word-select chain, mask folded into the
# score via the DEAD/M_INIT trick (no clip, no causal compare, no post-exp
# select — measured fastest on v5e)
# ---------------------------------------------------------------------------


def _causal_kernel_flat(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKB)
    rowbase_ref,  # scalar prefetch: (NH, NQ)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    mbits_ref,  # (1, BQ, n_words) uint32
    scale_ref,  # (1, BQ, 128)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
    ab_scr,  # (BQ, 128) f32 — lanes 0/1 hold the per-row pixel slope a and
    #          intercept base (j-invariant: computed once per q-tile; the
    #          divide per k-step measurably dominated at small block_k)
    base_scr,  # (BQ, BK) f32 — colio·a, also j-invariant (the local column
    #          index resets every k-block; only the b2 intercept moves)
    *,
    t_m: int,
    block_q: int,
    block_k: int,
    n_words: int,
    oversample: float,
    k_cfg: float,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    BQ, BK = block_q, block_k

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, M_INIT)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        a0 = (1.0 / w) * jnp.float32(t_m)
        ab_scr[:] = jnp.broadcast_to(a0, ab_scr.shape)
        colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(
            jnp.float32
        )
        base_scr[:] = colio * a0

    @pl.when(j < count)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32

        bk = idx_ref[h, i, j]
        a = ab_scr[:, 0:1]
        b2 = (bk * BK).astype(jnp.float32) * a + (a * 0.5 - 1e-4)  # (BQ,1)
        u = base_scr[:] + b2
        # trunc == floor+low-clip for u > -1; columns past the causal width
        # land on pixel >= T_M whose packed word/bits are zero -> dead
        pix = u.astype(jnp.int32)
        word_idx = pix >> 5
        mtile = jax.lax.bitcast_convert_type(mbits_ref[0], jnp.int32)
        word = jnp.zeros((BQ, BK), jnp.int32)
        for wi in range(n_words):
            wcol = mtile[:, wi][:, None]
            word = jnp.where(word_idx == wi, wcol, word)
        # sign-bit test: move bit (pix & 31) to bit 31; out-of-range pixels
        # keep word == 0 -> non-negative -> dead
        alive = jax.lax.shift_left(word, jnp.bitwise_and(jnp.bitwise_not(pix), 31)) < 0
        if oversample != 1.0:
            rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, 1), 0
            )
            w = (rows + 1).astype(jnp.float32)
            ps = jnp.maximum(jnp.floor(w / oversample + 0.5), 1.0)
            oys = jnp.clip(w, round(k_cfg), round(k_cfg * oversample)) / k_cfg
            thr = (1.0 / oys) * 0.5 + 1e-4
            colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(
                jnp.float32
            )
            xs1 = colio + (bk * BK + 1).astype(jnp.float32)
            frac = xs1 / w * ps  # exact train-path expression order
            keep = jnp.abs(frac - jnp.floor(frac + 0.5)) <= thr
            alive = alive & keep
        s = jnp.where(alive, s, DEAD)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)  # dead lanes underflow to exactly 0
        corr = jnp.exp(m_prev - m_cur)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)


def _causal_kernel_flat_wr(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKB)
    submask_ref,  # scalar prefetch: (NH, NQ, NKB) — packed word range
    #                wlo | (whi << 8) for the tile at list slot j
    rowbase_ref,  # scalar prefetch: (NH, NQ)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    mbits_ref,  # (1, BQ, n_words) uint32
    scale_ref,  # (1, BQ, 128)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
    ab_scr,  # (BQ, 128) f32
    base_scr,  # (BQ, BK) f32 — colio·a (j-invariant)
    word_scr,  # (BQ, BK) i32 — mask word staging (predicated writes)
    *,
    t_m: int,
    block_q: int,
    block_k: int,
    n_words: int,
    oversample: float,
    k_cfg: float,
):
    """'flat' with per-tile WORD-RANGE predication: the select chain over
    the T_M//32 packed words is the largest VPU block in the flat kernel
    (2 wide ops per word: the per-row word broadcast + the select). A
    (BQ, BK) tile's pixels span [trunc((c0+0.5)·T_M/w_max − 1e-4),
    trunc((c1−0.5)·T_M/w_min − 1e-4)] (monotone in c and in w, so the
    corners bound it exactly); deep tiles span 1-2 words of the 8, and
    `pl.when` skips the rest entirely. The first in-range word writes
    word_scr fresh (no zero-init pass); subsequent words read-modify-write."""
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    BQ, BK = block_q, block_k

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, M_INIT)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        a0 = (1.0 / w) * jnp.float32(t_m)
        ab_scr[:] = jnp.broadcast_to(a0, ab_scr.shape)
        colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(
            jnp.float32
        )
        base_scr[:] = colio * a0

    @pl.when(j < count)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32

        bk = idx_ref[h, i, j]
        wr = submask_ref[h, i, j]
        wlo = wr & 0xFF
        whi = (wr >> 8) & 0xFF
        exact = (wr >> 16) != 0
        span1 = jnp.logical_and(exact, wlo == whi)
        span2 = jnp.logical_and(exact, whi == wlo + 1)
        slow = jnp.logical_not(jnp.logical_or(span1, span2))
        a = ab_scr[:, 0:1]
        b2 = (bk * BK).astype(jnp.float32) * a + (a * 0.5 - 1e-4)  # (BQ,1)
        u = base_scr[:] + b2
        pix = u.astype(jnp.int32)
        word_idx = pix >> 5
        mtile = jax.lax.bitcast_convert_type(mbits_ref[0], jnp.int32)
        # Fast paths (VERDICT r4 #2a), valid only when the range is EXACT
        # (bit 16 — no out-of-range pixel can alias into [wlo, whi]):
        #   span-1: every pixel lives in word wlo → raw broadcast, no
        #     compare, no select.
        #   span-2 (the dominant case: a 512-wide tile spans 32-34 px):
        #     one two-way select replaces first(select)+RMW(select+read).
        # Everything else falls back to the first/RMW chain.
        for wi in range(n_words):

            @pl.when(jnp.logical_and(wi == wlo, span1))
            def _one(wi=wi):
                word_scr[:] = jnp.broadcast_to(
                    mtile[:, wi][:, None], (BQ, BK)
                )

            if wi + 1 < n_words:

                @pl.when(jnp.logical_and(wi == wlo, span2))
                def _pair(wi=wi):
                    word_scr[:] = jnp.where(
                        word_idx == wi,
                        mtile[:, wi][:, None],
                        mtile[:, wi + 1][:, None],
                    )

            @pl.when(jnp.logical_and(wi == wlo, slow))
            def _first(wi=wi):
                wcol = mtile[:, wi][:, None]
                word_scr[:] = jnp.where(word_idx == wi, wcol, 0)

            @pl.when(
                jnp.logical_and(
                    slow, jnp.logical_and(wlo < wi, wi <= whi)
                )
            )
            def _select(wi=wi):
                wcol = mtile[:, wi][:, None]
                word_scr[:] = jnp.where(word_idx == wi, wcol, word_scr[:])
        word = word_scr[:]
        alive = jax.lax.shift_left(word, jnp.bitwise_and(jnp.bitwise_not(pix), 31)) < 0
        if oversample != 1.0:
            rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, 1), 0
            )
            w = (rows + 1).astype(jnp.float32)
            ps = jnp.maximum(jnp.floor(w / oversample + 0.5), 1.0)
            oys = jnp.clip(w, round(k_cfg), round(k_cfg * oversample)) / k_cfg
            thr = (1.0 / oys) * 0.5 + 1e-4
            colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(
                jnp.float32
            )
            xs1 = colio + (bk * BK + 1).astype(jnp.float32)
            frac = xs1 / w * ps
            keep = jnp.abs(frac - jnp.floor(frac + 0.5)) <= thr
            alive = alive & keep
        s = jnp.where(alive, s, DEAD)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        corr = jnp.exp(m_prev - m_cur)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)


def _tile_word_ranges(
    counts: jnp.ndarray,  # (N, H, NQ)
    idx: jnp.ndarray,  # (N, H, NQ, NKB) active k-block list
    t_m: int,
    n_words: int,
    block_q: int,
    block_k: int,
    row_widths: Optional[jnp.ndarray] = None,  # (T_DST,) causal widths
) -> jnp.ndarray:
    """Packed per-tile word ranges wlo | (whi << 8) aligned with `idx`.
    Corner evaluation of the kernel's exact pixel expression (monotone in
    col and width), padded by one PIXEL each side against fp associativity
    wobble (the kernel computes (c0·a + c·a) where the corner computes
    (c0+c)·a — ≤ a few ulps, which can flip trunc only within ~1e-4 of a
    pixel boundary). Word-level ±1 padding, used through round 3, added
    ~2 dead words to every tile and ate most of flat_wr's skip win: tight
    ranges average ~2.5 of 8 words at the canonical config vs ~4.5."""
    N, H, NQ, NKB = idx.shape
    if row_widths is None:
        rows = jnp.arange(NQ * block_q, dtype=jnp.float32)
        widths = rows + 1.0
    else:
        widths = row_widths.astype(jnp.float32)
    w_rows = widths.reshape(NQ, block_q)
    w_min = w_rows.min(axis=1)  # (NQ,) smallest width in the q-block
    w_max = w_rows.max(axis=1)

    c0 = (idx * block_k).astype(jnp.float32)  # (N,H,NQ,NKB)
    c1 = c0 + float(block_k) - 1.0

    def pix(c, w):
        a = (1.0 / w) * jnp.float32(t_m)
        return (c * a + (a * 0.5 - 1e-4)).astype(jnp.int32)

    lo = pix(c0, w_max.reshape(1, 1, NQ, 1))
    hi = pix(c1, w_min.reshape(1, 1, NQ, 1))
    wlo = jnp.clip((lo - 1) >> 5, 0, n_words - 1)
    whi = jnp.clip((hi + 1) >> 5, 0, n_words - 1)
    # bit 16: the range is EXACT — every padded pixel of the tile provably
    # lands in [wlo, whi]. Only HIGH-side clipping can lie (folding
    # out-of-range words — pixels past T_M at the causal edge — onto
    # n_words-1); low-side clipping at 0 is always safe because kernel
    # pixels are >= 0 (u = c·a + a/2 - 1e-4 truncates toward zero). Only
    # when exact may the kernel use the flat_wr fast paths: span-1 → raw
    # row broadcast, span-2 → one two-way select (the dominant case at
    # 512-wide tiles, whose pixel span is BK·T_M/w ≈ 32-34 px ≥ 2 words
    # even at full depth).
    exact = ((hi + 1) >> 5) == whi
    return (wlo | (whi << 8) | (exact.astype(jnp.int32) << 16)).astype(
        jnp.int32
    )


def _causal_kernel_flat_fori(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKB)
    submask_ref,  # scalar prefetch: (NH, NQ, NKB) — packed tight word range
    rowbase_ref,  # scalar prefetch: (NH, NQ)
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    mbits_ref,  # (1, BQ, n_words) uint32
    scale_ref,  # (1, BQ, 128)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
    ab_scr,  # (BQ, 128) f32
    *,
    t_m: int,
    block_q: int,
    block_k: int,
    n_words: int,
    oversample: float,
    k_cfg: float,
):
    """'flat' with the static word-select chain replaced by a dynamic-trip
    fori_loop over the tile's (tight, pixel-padded) word range.

    flat_wr's lesson: pl.when-predicated chain steps must stage the carried
    word tile in VMEM scratch, and the read-modify-write per step costs
    about what the skipped selects saved. A fori_loop carries the word tile
    in REGISTERS instead; the price is that the loop index is dynamic, so
    the per-word (BQ, 1) column extraction can't be a static lane index —
    it becomes a lane one-hot + cross-lane sum on the narrow (BQ, n_words)
    mask tile, which is ~1/4 of a (BQ, 128) pass per step vs the two full
    (BQ, BK) tile ops it gates. Average trip count at the canonical config
    (T=4096, BQ=BK=512, T_M=256) is ~2.5 of 8 words."""
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    BQ, BK = block_q, block_k

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, M_INIT)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        a0 = (1.0 / w) * jnp.float32(t_m)
        ab_scr[:] = jnp.broadcast_to(a0, ab_scr.shape)

    @pl.when(j < count)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32

        bk = idx_ref[h, i, j]
        wr = submask_ref[h, i, j]
        wlo = wr & 0xFF
        whi = (wr >> 8) & 0xFF
        a = ab_scr[:, 0:1]
        b2 = (bk * BK).astype(jnp.float32) * a + (a * 0.5 - 1e-4)  # (BQ,1)
        colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(jnp.float32)
        u = colio * a + b2
        pix = u.astype(jnp.int32)
        word_idx = pix >> 5
        mtile = jax.lax.bitcast_convert_type(mbits_ref[0], jnp.int32)
        laneio = jax.lax.broadcasted_iota(jnp.int32, (BQ, n_words), 1)

        def body(wi, word):
            # one-hot sum = dynamic lane extraction (sum is exact: one term)
            sel = jnp.where(laneio == wi, mtile, 0)
            wcol = jnp.sum(sel, axis=1, keepdims=True)  # (BQ, 1)
            return jnp.where(word_idx == wi, wcol, word)

        word = jax.lax.fori_loop(
            wlo, whi + 1, body, jnp.zeros((BQ, BK), jnp.int32)
        )
        # sign-bit test: place bit (pix & 31) at bit 31; words outside the
        # range (incl. pixel >= T_M) stay 0 -> non-negative -> dead
        shift = jnp.bitwise_and(jnp.bitwise_not(pix), 31)
        alive = jax.lax.shift_left(word, shift) < 0
        if oversample != 1.0:
            rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, 1), 0
            )
            w = (rows + 1).astype(jnp.float32)
            ps = jnp.maximum(jnp.floor(w / oversample + 0.5), 1.0)
            oys = jnp.clip(w, round(k_cfg), round(k_cfg * oversample)) / k_cfg
            thr = (1.0 / oys) * 0.5 + 1e-4
            xs1 = colio + (bk * BK + 1).astype(jnp.float32)
            frac = xs1 / w * ps
            keep = jnp.abs(frac - jnp.floor(frac + 0.5)) <= thr
            alive = alive & keep
        s = jnp.where(alive, s, DEAD)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        corr = jnp.exp(m_prev - m_cur)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# causal kernel, 'subtile' impl: 128-wide sub-tile masking with 2-candidate
# word select + score staging buffer (kept for block-size experiments; slower
# than 'flat' on v5e at the canonical config)
# ---------------------------------------------------------------------------


def _causal_kernel(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKO)
    submask_ref,  # scalar prefetch: (NH, NQ, NKO)
    rowbase_ref,  # scalar prefetch: (NH, NQ) global base row id per q-block
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BKO, D)
    v_ref,  # (1, BKO, D)
    mbits_ref,  # (1, BQ, n_words) uint32 — compressed-domain packed mask
    scale_ref,  # (1, BQ, 128) row scaler (broadcast over lanes)
    o_ref,  # (1, BQ, D)
    s_buf,  # (BQ, BKO) f32 score staging
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
    *,
    t_m: int,
    block_q: int,
    block_ko: int,
    sub: int,
    n_words: int,
    oversample: float,
    k_cfg: float,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    nsub = block_ko // sub
    BQ = block_q

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, M_INIT)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j < count)
    def _compute():
        bk = idx_ref[h, i, j]
        sm = submask_ref[h, i, j]
        rowbase = rowbase_ref[h, i]

        # per-row constants (BQ, 1)
        rows = rowbase + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        a = (1.0 / w) * jnp.float32(t_m)  # pixel slope
        base = a * 0.5 - 1e-4
        # candidate-word row indices at the first column of each sub-tile
        # are computed inside the sub loop (they depend on the sub offset).
        colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, sub), 1).astype(jnp.float32)

        if oversample != 1.0:
            # train-path undersampling constants (reference resize_m_to_t.py:54-71)
            ps = jnp.maximum(jnp.floor(w / oversample + 0.5), 1.0)
            oys = jnp.clip(w, round(k_cfg), round(k_cfg * oversample)) / k_cfg
            thr = (1.0 / oys) * 0.5 + 1e-4
        else:
            ps = thr = None

        # a 128-wide sub-tile spans <=2 mask words iff w*32 >= t_m*sub
        short_ok = (rowbase + 1) * 32 >= t_m * sub

        def sub_scores(ss, short: bool):
            s0 = bk * block_ko + ss * sub
            sc = jax.lax.dot_general(
                q_ref[0],
                k_ref[0, ss * sub : (ss + 1) * sub, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, sub) f32
            b2 = s0.astype(jnp.float32) * a + base  # (BQ,1)
            u = colio * a + b2
            pix = u.astype(jnp.int32)  # trunc == floor+low-clip for u > -1
            word_idx = pix >> 5
            bit_idx = (pix & 31).astype(jnp.uint32)
            if short:
                pix0 = b2.astype(jnp.int32)
                wlo = pix0 >> 5
                c0 = jnp.zeros((BQ, 1), jnp.uint32)
                c1 = jnp.zeros((BQ, 1), jnp.uint32)
                for wi in range(n_words):
                    wcol = mbits_ref[0, :, wi][:, None]
                    c0 = jnp.where(wlo == wi, wcol, c0)
                    c1 = jnp.where(wlo + 1 == wi, wcol, c1)
                word = jnp.where(
                    word_idx == wlo, c0, jnp.where(word_idx == wlo + 1, c1, 0)
                )
            else:
                word = jnp.zeros((BQ, sub), jnp.uint32)
                for wi in range(n_words):
                    wcol = mbits_ref[0, :, wi][:, None]
                    word = jnp.where(word_idx == wi, wcol, word)
            alive = ((word >> bit_idx) & 1) == 1
            if oversample != 1.0:
                xs1 = colio + (s0 + 1).astype(jnp.float32)
                frac = xs1 / w * ps  # exact train-path expression order
                keep = jnp.abs(frac - jnp.floor(frac + 0.5)) <= thr
                alive = alive & keep
            return jnp.where(alive, sc, DEAD)

        for ss in range(nsub):
            lo, hi = ss * sub, (ss + 1) * sub

            @pl.when(((sm >> ss) & 1) == 0)
            def _fill(lo=lo, hi=hi):
                s_buf[:, lo:hi] = jnp.full((BQ, sub), DEAD, jnp.float32)

        @pl.when(short_ok)
        def _short():
            for ss in range(nsub):

                @pl.when(((sm >> ss) & 1) == 1)
                def _do(ss=ss):
                    s_buf[:, ss * sub : (ss + 1) * sub] = sub_scores(ss, True)

        @pl.when(jnp.logical_not(short_ok))
        def _long():
            for ss in range(nsub):

                @pl.when(((sm >> ss) & 1) == 1)
                def _do(ss=ss):
                    s_buf[:, ss * sub : (ss + 1) * sub] = sub_scores(ss, False)

        # one flash update over the whole outer tile
        s = s_buf[:]
        m_prev = m_scr[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)  # dead lanes underflow to exactly 0
        corr = jnp.exp(m_prev - m_cur)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# v1 generic kernel (kept for the padded bidirectional path)
# ---------------------------------------------------------------------------


def _kernel(
    counts_ref,  # scalar prefetch: (NH, NQ)
    idx_ref,  # scalar prefetch: (NH, NQ, NKB)
    lengths_ref,  # scalar prefetch: (NH,) per-(batch,head) token length
    rowbase_ref,  # scalar prefetch: (NH, NQ) global base row id per q-block
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    mbits_ref,  # (1, BQ, T_M//32) uint32 — compressed-domain packed mask
    scale_ref,  # (1, BQ, 128) row scaler (broadcast over lanes)
    o_ref,  # (1, BQ, D)
    m_scr,  # (BQ, 128) f32
    l_scr,  # (BQ, 128) f32
    acc_scr,  # (BQ, D) f32
    *,
    t_m: int,
    t_src: int,
    is_causal: bool,
    block_q: int,
    block_k: int,
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
        # native-dtype operands with f32 accumulation: bf16 inputs hit the
        # fast MXU path instead of being upcast to f32 first
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32

        bk = idx_ref[h, q_blk, j]
        BQ, BK = block_q, block_k
        r_glob = (
            rowbase_ref[h, q_blk]
            + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        )
        s_glob = bk * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        if is_causal:
            width = (r_glob + 1).astype(jnp.float32)
        else:
            # padding-aware width: the dense resize maps columns through the
            # cumsum index, which for contiguous-left padding equals the
            # per-example token length (reference resize_m_to_t.py:36-52)
            width = jnp.full((BQ, BK), 1.0, jnp.float32) * lengths_ref[h].astype(jnp.float32)
        u = (s_glob.astype(jnp.float32) + 0.5) / width * t_m - 1e-4
        pix = jnp.clip(u.astype(jnp.int32), 0, t_m - 1)  # floor for u >= 0

        # bit extraction: static select chain over the T_M//32 words
        word_idx = pix // 32
        bit_idx = (pix % 32).astype(jnp.uint32)
        words = jnp.zeros((BQ, BK), jnp.uint32)
        for wi in range((t_m + 31) // 32):
            w_col = mbits_ref[0, :, wi][:, None]  # (BQ, 1)
            words = jnp.where(word_idx == wi, w_col, words)
        alive = ((words >> bit_idx) & 1) == 1
        if is_causal:
            alive = alive & (s_glob <= r_glob)
        else:
            alive = alive & (s_glob < lengths_ref[h])

        s = jnp.where(alive, s, NEG_INF)
        m_prev = m_scr[:, 0:1]  # (BQ,1)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(alive, jnp.exp(s - m_cur), 0.0)
        corr = jnp.exp(m_prev - m_cur)  # (BQ,1)
        l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype),  # probs in io dtype -> fast MXU for bf16
            v_ref[0],
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


def _pad_to(x: jnp.ndarray, axis: int, target: int, value=0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


def sea_block_sparse_attention(
    q: jnp.ndarray,  # (N, H, T_DST, D) — pre-scaled
    k: jnp.ndarray,  # (N, H, T_SRC, D)
    v: jnp.ndarray,  # (N, H, T_SRC, D)
    mask_m: jnp.ndarray,  # (N, H, T_DST, T_M) binary compressed mask
    row_scaler: Optional[jnp.ndarray] = None,  # (N, H, T_DST) sigmoid scaler
    *,
    is_causal: bool = True,
    lengths: Optional[jnp.ndarray] = None,  # (N,) token lengths (non-causal)
    row_base: Optional[jnp.ndarray] = None,  # (NQ,) global base row per block
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    sub_block: int = 128,
    oversample: float = 1.0,
    k_cfg: float = 64.0,
    impl: str = "flat",  # 'flat' | 'flat_wr' | 'flat_fori' | 'subtile' (causal-only)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sparse attention: softmax(mask(q.k^T)) . v * scaler.

    Per-(row, head) softmax over alive columns only; rows with no alive
    column produce zeros (matching `flat_csr_softmax` zero-nnz behaviour).

    Sequence lengths that are not multiples of the lane width are padded
    here (padded rows have empty masks and are sliced off); `oversample`
    applies the train path's undersampling keep-predicate in-kernel."""
    N, H, T_DST0, D = q.shape
    T_SRC0 = k.shape[2]
    T_M = mask_m.shape[-1]

    # pad sequence dims to lane multiples (padded rows are fully dead)
    T_DST = ((T_DST0 + 127) // 128) * 128
    T_SRC = ((T_SRC0 + 127) // 128) * 128
    if T_DST != T_DST0 or T_SRC != T_SRC0:
        assert row_base is None, "row_base requires pre-padded shards"
        q = _pad_to(q, 2, T_DST)
        k = _pad_to(k, 2, T_SRC)
        v = _pad_to(v, 2, T_SRC)
        mask_m = _pad_to(mask_m, 2, T_DST)
        if row_scaler is not None:
            row_scaler = _pad_to(row_scaler, 2, T_DST)
        if not is_causal and lengths is None:
            # plain bidirectional: the resize width must stay the real T_SRC
            lengths = jnp.full((N,), T_SRC0, jnp.int32)

    def auto_block(t):
        for b in (512, 256, 128):
            if t % b == 0:
                return b
        return t

    block_q = block_q or auto_block(T_DST)
    block_k = block_k or auto_block(T_SRC)
    assert T_DST % block_q == 0 and T_SRC % block_k == 0
    n_words = (T_M + 31) // 32

    mbits = pack_compressed_bits(mask_m)  # (N, H, T, T_M//32)
    NH = N * H
    NQ = T_DST // block_q
    qf = q.reshape(NH, T_DST, D)
    kf = k.reshape(NH, T_SRC, D)
    vf = v.reshape(NH, T_SRC, D)
    mbitsf = mbits.reshape(NH, T_DST, n_words)
    if row_scaler is None:
        scalerf = jnp.ones((NH, T_DST, 128), q.dtype)
    else:
        scalerf = jnp.broadcast_to(
            row_scaler.reshape(NH, T_DST, 1), (NH, T_DST, 128)
        ).astype(q.dtype)
    if row_base is None:
        row_base_arr = jnp.arange(NQ, dtype=jnp.int32) * block_q
    else:
        row_base_arr = row_base.astype(jnp.int32)
    rowbasef = jnp.broadcast_to(row_base_arr[None, :], (NH, NQ)).astype(jnp.int32)

    if is_causal:
        row_widths = None
        if row_base is not None:
            rw = row_base_arr[:, None] + jnp.arange(block_q, dtype=jnp.int32)[None, :]
            row_widths = (rw + 1).reshape(-1).astype(jnp.float32)
        NKO = T_SRC // block_k
        if impl == "subtile":
            sub = min(sub_block, block_k)
            counts, idx, submask = tile_activity_sub(
                mask_m, T_SRC, block_q, block_k, sub, row_widths=row_widths
            )
            kernel = functools.partial(
                _causal_kernel,
                t_m=T_M,
                block_q=block_q,
                block_ko=block_k,
                sub=sub,
                n_words=n_words,
                oversample=oversample,
                k_cfg=k_cfg,
            )
        elif impl in ("flat_wr", "flat_fori"):
            counts, idx = tile_activity_lists(
                mask_m, T_SRC, True, block_q, block_k, row_widths=row_widths
            )
            submask = _tile_word_ranges(
                counts, idx, T_M, n_words, block_q, block_k,
                row_widths=row_widths,
            )
            kernel = functools.partial(
                _causal_kernel_flat_wr if impl == "flat_wr"
                else _causal_kernel_flat_fori,
                t_m=T_M,
                block_q=block_q,
                block_k=block_k,
                n_words=n_words,
                oversample=oversample,
                k_cfg=k_cfg,
            )
        else:
            assert impl == "flat", impl
            counts, idx = tile_activity_lists(
                mask_m, T_SRC, True, block_q, block_k, row_widths=row_widths
            )
            submask = None  # 'flat' takes no submask operand (smem is 1 MiB
            # and every scalar-prefetch array counts — see CLAUDE.md)
            kernel = functools.partial(
                _causal_kernel_flat,
                t_m=T_M,
                block_q=block_q,
                block_k=block_k,
                n_words=n_words,
                oversample=oversample,
                k_cfg=k_cfg,
            )
        countsf = counts.reshape(NH, NQ)
        idxf = idx.reshape(NH, NQ, NKO)
        # varargs index maps serve both prefetch arities (with/without the
        # submask operand used only by subtile/flat_wr)
        scalar_args = (countsf, idxf) + (
            (submask.reshape(NH, NQ, NKO),) if submask is not None else ()
        ) + (rowbasef,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
            grid=(NH, NQ, NKO),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, *s: (h, i, 0)),
                pl.BlockSpec(
                    (1, block_k, D), lambda h, i, j, c, x, *s: (h, x[h, i, j], 0)
                ),
                pl.BlockSpec(
                    (1, block_k, D), lambda h, i, j, c, x, *s: (h, x[h, i, j], 0)
                ),
                pl.BlockSpec(
                    (1, block_q, n_words), lambda h, i, j, c, x, *s: (h, i, 0)
                ),
                pl.BlockSpec(
                    (1, block_q, 128), lambda h, i, j, c, x, *s: (h, i, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, D), lambda h, i, j, c, x, *s: (h, i, 0)
            ),
            scratch_shapes=([pltpu.VMEM((block_q, block_k), jnp.float32)]
                            if impl == "subtile" else []) + [
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ] + ([pltpu.VMEM((block_q, 128), jnp.float32)]
                 if impl in ("flat", "flat_wr", "flat_fori") else [])
            + ([pltpu.VMEM((block_q, block_k), jnp.float32)]
               if impl in ("flat", "flat_wr") else [])
            + ([pltpu.VMEM((block_q, block_k), jnp.int32)]
               if impl == "flat_wr" else []),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*scalar_args, qf, kf, vf, mbitsf, scalerf)
        out = out.reshape(N, H, T_DST, D)
        return out[:, :, :T_DST0]

    # ---- padded bidirectional path (v1 kernel) ----
    assert oversample == 1.0, "oversample is causal-only (reference OPT configs)"
    counts, idx = tile_activity_lists(
        mask_m, T_SRC, is_causal, block_q, block_k, lengths=lengths
    )
    if lengths is None:
        lengths = jnp.full((N,), T_SRC, jnp.int32)
    lengthsf = jnp.broadcast_to(lengths[:, None], (N, H)).reshape(N * H).astype(jnp.int32)

    NKB = T_SRC // block_k
    countsf = counts.reshape(NH, NQ)
    idxf = idx.reshape(NH, NQ, NKB)

    kernel = functools.partial(
        _kernel,
        t_m=T_M,
        t_src=T_SRC,
        is_causal=is_causal,
        block_q=block_q,
        block_k=block_k,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NH, NQ, NKB),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, L, rb: (h, i, 0)),
            pl.BlockSpec(
                (1, block_k, D), lambda h, i, j, c, x, L, rb: (h, x[h, i, j], 0)
            ),
            pl.BlockSpec(
                (1, block_k, D), lambda h, i, j, c, x, L, rb: (h, x[h, i, j], 0)
            ),
            pl.BlockSpec(
                (1, block_q, n_words), lambda h, i, j, c, x, L, rb: (h, i, 0)
            ),
            pl.BlockSpec((1, block_q, 128), lambda h, i, j, c, x, L, rb: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda h, i, j, c, x, L, rb: (h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(countsf, idxf, lengthsf, rowbasef, qf, kf, vf, mbitsf, scalerf)
    out = out.reshape(N, H, T_DST, D)
    return out[:, :, :T_DST0]


# ---------------------------------------------------------------------------
# Oracles / compatibility helpers (used by tests and the bench harness)
# ---------------------------------------------------------------------------


def element_mask_int8(
    mask_m: jnp.ndarray,
    t_src: int,
    is_causal: bool,
    row_chunk: int = 256,
) -> jnp.ndarray:
    """Materialised (N,H,T_DST,T_SRC) int8 alive mask (dense-resize
    semantics + causal). O(T^2) — test/debug only; the kernel never needs
    it."""
    N, H, T_DST, T_M = mask_m.shape
    m = (mask_m > 0).reshape(N * H, T_DST, T_M)
    s_idx = jnp.arange(t_src, dtype=jnp.float32)
    n_chunks = (T_DST + row_chunk - 1) // row_chunk
    pad_rows = n_chunks * row_chunk - T_DST
    m_p = jnp.pad(m, ((0, 0), (0, pad_rows), (0, 0)))
    m_c = jnp.moveaxis(m_p.reshape(N * H, n_chunks, row_chunk, T_M), 1, 0)

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


def pack_alive_bits(
    mask_m: jnp.ndarray, t_src: int, is_causal: bool, row_chunk: int = 256
) -> jnp.ndarray:
    """Packed (N,H,T_DST,T_SRC//32) uint32 element mask (test/debug)."""
    alive = element_mask_int8(mask_m, t_src, is_causal, row_chunk)
    N, H, T, _ = alive.shape
    bit_w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).astype(jnp.uint32)
    packed = alive.reshape(N, H, T, t_src // 32, 32)
    return jnp.sum(packed.astype(jnp.uint32) * bit_w, axis=-1, dtype=jnp.uint32)


def active_tile_lists(
    bits: jnp.ndarray, block_q: int, block_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Activity lists from a packed *element* mask (test/debug twin of
    `tile_activity_lists` — exact, not conservative)."""
    N, H, T, W = bits.shape
    t_src = W * 32
    NQ, NKB = T // block_q, t_src // block_k
    wpb = block_k // 32
    tile = bits.reshape(N, H, NQ, block_q, NKB, wpb)
    active = jnp.any(tile != 0, axis=(3, 5))
    return _compact_lists(active)


def mask_nnz(mask_m: jnp.ndarray, t_src: int, is_causal: bool) -> jnp.ndarray:
    """Realized element-mask nnz computed in the compressed domain:
    sum over alive pixels of their run length (O(T*T_M), no expansion)."""
    N, H, T_DST, T_M = mask_m.shape
    rows = jnp.arange(T_DST, dtype=jnp.float32)
    widths = rows + 1.0 if is_causal else jnp.full((T_DST,), float(t_src))
    vs, ve = _pixel_starts(widths, T_M)
    run = jnp.maximum(ve - vs, 0)  # (T_DST, T_M)
    return jnp.sum((mask_m > 0) * run[None, None].astype(jnp.int32))


def dense_reference(
    q, k, v, mask_m, row_scaler=None, *, is_causal=True, lengths=None,
    oversample: float = 1.0, k_cfg: float = 64.0,
) -> jnp.ndarray:
    """jnp oracle with identical semantics (dense-resize mask + per-row
    softmax + scaler + optional undersampling), for kernel tests."""
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    T_M = mask_m.shape[-1]
    s_idx = jnp.arange(T_SRC, dtype=jnp.float32)[None, :]
    r_idx = jnp.arange(T_DST, dtype=jnp.int32)[:, None]
    if is_causal:
        w = (r_idx + 1).astype(jnp.float32)[None]
    elif lengths is not None:
        w = jnp.broadcast_to(
            lengths.astype(jnp.float32)[:, None, None], (N, T_DST, 1)
        )
    else:
        w = jnp.full((1, T_DST, 1), float(T_SRC), jnp.float32)
    pixel = jnp.floor((s_idx[None] + 0.5) / w * T_M - 1e-4).astype(jnp.int32)
    pixel = jnp.clip(pixel, 0, T_M - 1)  # (N?, T_DST, T_SRC)
    pixel = jnp.broadcast_to(pixel[:, None], (N, H, T_DST, T_SRC)) \
        if pixel.shape[0] == N else jnp.broadcast_to(pixel[None], (N, H, T_DST, T_SRC))
    alive = jnp.take_along_axis((mask_m > 0), pixel, axis=-1)
    if is_causal:
        alive = alive & (s_idx[None, None] <= r_idx[None, None].astype(jnp.float32))
    elif lengths is not None:
        alive = alive & (
            s_idx[None, None] < lengths.astype(jnp.float32)[:, None, None, None]
        )
    if oversample != 1.0:
        # reference resize_m_to_t.py:54-71 keep predicate (train path)
        xs = s_idx  # (1, T_SRC)
        ps = jnp.maximum(jnp.floor(w / oversample + 0.5), 1.0)
        oys = jnp.clip(w, round(k_cfg), round(k_cfg * oversample)) / k_cfg
        frac = (xs[None] + 1) / w * ps
        keep = jnp.abs(frac - jnp.floor(frac + 0.5)) <= ((1.0 / oys) * 0.5 + 1e-4)
        keep = (
            jnp.broadcast_to(keep[:, None], (N, H, T_DST, T_SRC))
            if keep.shape[0] == N
            else jnp.broadcast_to(keep[None], (N, H, T_DST, T_SRC))
        )
        alive = alive & keep
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


# ---------------------------------------------------------------------------
# Differentiable fused attention (custom_vjp): flash-style recompute backward
# (reference backward semantics: masked_mm.py:91-112 — gradients only at
# mask positions, which holds structurally here because p == 0 off-mask)
# ---------------------------------------------------------------------------


def _causal_kernel_fwd_stats(
    counts_ref, idx_ref, rowbase_ref,
    q_ref, k_ref, v_ref, mbits_ref, scale_ref,
    o_ref, lse_ref,  # extra output: per-row logsumexp (1, BQ, 128)
    m_scr, l_scr, acc_scr, ab_scr,
    *, t_m, block_q, block_k, n_words,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    BQ, BK = block_q, block_k

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, M_INIT)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        ab_scr[:] = jnp.broadcast_to((1.0 / w) * jnp.float32(t_m), ab_scr.shape)

    @pl.when(j < count)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bk = idx_ref[h, i, j]
        a = ab_scr[:, 0:1]
        b2 = (bk * BK).astype(jnp.float32) * a + (a * 0.5 - 1e-4)
        colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(jnp.float32)
        pix = (colio * a + b2).astype(jnp.int32)
        word_idx = pix >> 5
        bit_idx = (pix & 31).astype(jnp.uint32)
        word = jnp.zeros((BQ, BK), jnp.uint32)
        for wi in range(n_words):
            wcol = mbits_ref[0, :, wi][:, None]
            word = jnp.where(word_idx == wi, wcol, word)
        alive = ((word >> bit_idx) & 1) == 1
        s = jnp.where(alive, s, DEAD)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        corr = jnp.exp(m_prev - m_cur)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_cur, m_scr.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l > 0, l, 1.0)
        scale = scale_ref[0][:, 0:1].astype(jnp.float32)
        o_ref[0] = (acc_scr[:] / safe_l * scale).astype(o_ref.dtype)
        # logsumexp; +inf for all-dead rows so bwd's exp(s - lse) -> 0
        lse = jnp.where(l > 0, m_scr[:, 0:1] + jnp.log(safe_l), jnp.inf)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref[0].shape)


def _alive_scores(q_blk, k_blk, rowbase, bk, t_m, n_words, mbits_ref, BQ, BK,
                  a=None):
    """Shared recompute: masked scores for one (q-block, k-block) tile.
    `a` is the per-row pixel slope T_M/w; pass it precomputed when the
    q-block is grid-invariant (the divide per step is measurable)."""
    s = jax.lax.dot_general(
        q_blk, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if a is None:
        rows = rowbase + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        a = (1.0 / w) * jnp.float32(t_m)
    b2 = bk.astype(jnp.float32) * a + (a * 0.5 - 1e-4)
    colio = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1).astype(jnp.float32)
    pix = (colio * a + b2).astype(jnp.int32)
    word_idx = pix >> 5
    bit_idx = (pix & 31).astype(jnp.uint32)
    word = jnp.zeros((BQ, BK), jnp.uint32)
    for wi in range(n_words):
        wcol = mbits_ref[0, :, wi][:, None]
        word = jnp.where(word_idx == wi, wcol, word)
    alive = ((word >> bit_idx) & 1) == 1
    return jnp.where(alive, s, DEAD)


def _causal_kernel_dq(
    counts_ref, idx_ref, rowbase_ref,
    q_ref, k_ref, v_ref, mbits_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr, ab_scr,
    *, t_m, block_q, block_k, n_words,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    count = counts_ref[h, i]
    BQ, BK = block_q, block_k

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        rows = rowbase_ref[h, i] + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        w = (rows + 1).astype(jnp.float32)
        ab_scr[:] = jnp.broadcast_to((1.0 / w) * jnp.float32(t_m), ab_scr.shape)

    @pl.when(j < count)
    def _compute():
        bk = idx_ref[h, i, j] * BK
        s = _alive_scores(
            q_ref[0], k_ref[0], rowbase_ref[h, i], bk, t_m, n_words,
            mbits_ref, BQ, BK, a=ab_scr[:, 0:1],
        )
        p = jnp.exp(s - lse_ref[0][:, 0:1])  # (BQ, BK), 0 off-mask
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        ds = p * (dp - delta_ref[0][:, 0:1])
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == pl.num_programs(2) - 1)
    def _epilogue():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _causal_kernel_dkv(
    counts_ref, idx_ref, rowbase_ref,
    q_ref, k_ref, v_ref, mbits_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, t_m, block_q, block_k, n_words,
):
    """Grid (NH, NKB, NQ): k/v block fixed, loop active q-blocks (counts/idx
    are the TRANSPOSED activity lists; mbits/do/lse/delta blocks follow the
    looped q-block via the idx indirection)."""
    h = pl.program_id(0)
    jk = pl.program_id(1)
    iq = pl.program_id(2)
    count = counts_ref[h, jk]
    BQ, BK = block_q, block_k

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(iq < count)
    def _compute():
        qb = idx_ref[h, jk, iq]
        s = _alive_scores(
            q_ref[0], k_ref[0], rowbase_ref[h, qb], jk * BK, t_m, n_words,
            mbits_ref, BQ, BK,
        )
        p = jnp.exp(s - lse_ref[0][:, 0:1])  # (BQ, BK)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, 0:1])
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)

    @pl.when(iq == pl.num_programs(2) - 1)
    def _epilogue():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _diff_prep(q, k, mask_m, block_q, block_k, row_base=None):
    """row_base: optional (NQ,) global base row per local q-block (float or
    int) — set by the sequence-sharded path, where a shard's rows are
    zigzag-permuted blocks of the global sequence and the causal widths
    must use the GLOBAL row index."""
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    T_M = mask_m.shape[-1]
    assert T_DST % block_q == 0 and T_SRC % block_k == 0, (
        "differentiable path requires lane-multiple lengths"
    )
    n_words = (T_M + 31) // 32
    NH, NQ, NKB = N * H, T_DST // block_q, T_SRC // block_k
    mbits = pack_compressed_bits(mask_m).reshape(NH, T_DST, n_words)
    if row_base is None:
        row_widths = None
        row_base_arr = jnp.arange(NQ, dtype=jnp.int32) * block_q
    else:
        row_base_arr = row_base.astype(jnp.int32)
        rw = row_base_arr[:, None] + jnp.arange(block_q, dtype=jnp.int32)[None, :]
        row_widths = (rw + 1).reshape(-1).astype(jnp.float32)
    act = _causal_activity(
        mask_m, T_SRC, block_q, block_k, row_widths=row_widths
    )  # (N,H,NQ,NKB)
    counts, idx = _compact_lists(act)
    countsT, idxT = _compact_lists(jnp.swapaxes(act, -1, -2))
    rowbase = jnp.broadcast_to(row_base_arr[None, :], (NH, NQ)).astype(jnp.int32)
    return mbits, counts.reshape(NH, NQ), idx.reshape(NH, NQ, NKB), \
        countsT.reshape(NH, NKB), idxT.reshape(NH, NKB, NQ), rowbase, n_words


def _fwd_with_stats(q, k, v, mask_m, scaler, block_q, block_k, interpret,
                    row_base=None):
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    T_M = mask_m.shape[-1]
    mbits, counts, idx, countsT, idxT, rowbase, n_words = _diff_prep(
        q, k, mask_m, block_q, block_k, row_base
    )
    NH, NQ, NKB = N * H, T_DST // block_q, T_SRC // block_k
    qf = q.reshape(NH, T_DST, D)
    kf = k.reshape(NH, T_SRC, D)
    vf = v.reshape(NH, T_SRC, D)
    scalerf = jnp.broadcast_to(
        scaler.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(q.dtype)
    kernel = functools.partial(
        _causal_kernel_fwd_stats, t_m=T_M, block_q=block_q, block_k=block_k,
        n_words=n_words,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NH, NQ, NKB),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, c, x, rb: (h, x[h, i, j], 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, c, x, rb: (h, x[h, i, j], 0)),
            pl.BlockSpec((1, block_q, n_words), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, i, j, c, x, rb: (h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, i, j, c, x, rb: (h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
            jax.ShapeDtypeStruct((NH, T_DST, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, idx, rowbase, qf, kf, vf, mbits, scalerf)
    return o.reshape(N, H, T_DST, D), lse


def _causal_kernel_fwd_stats_cb(
    counts_ref, idx_ref, rowbase_ref, cb_ref, *rest, **kw
):
    """fwd_stats with an extra column-window prefetch operand (cb_ref,
    consumed only by the k/v BlockSpec index maps — idx holds GLOBAL
    k-block ids so the in-kernel pixel math needs no change)."""
    return _causal_kernel_fwd_stats(
        counts_ref, idx_ref, rowbase_ref, *rest, **kw
    )


def fwd_stats_window(
    q: jnp.ndarray,  # (N, H, T_DST, D) local query rows (pre-scaled)
    k_win: jnp.ndarray,  # (N, H, CH, D) one K window (chunk) of the source
    v_win: jnp.ndarray,  # (N, H, CH, D)
    mbits: jnp.ndarray,  # (NH, T_DST, n_words) packed compressed mask
    counts: jnp.ndarray,  # (NH, NQ) active blocks within the window
    idx_global: jnp.ndarray,  # (NH, NQ, NKW) GLOBAL k-block ids
    rowbase: jnp.ndarray,  # (NH, NQ) global base row per q-block
    col_block_base: jnp.ndarray,  # (1,) int32: first global k-block of k_win
    *,
    t_m: int,
    block_q: int,
    block_k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One flash pass of the causal kernel over a K/V WINDOW: returns the
    window-normalized output and per-row logsumexp, for cross-window merge
    (the ring-attention building block — K/V never materialize beyond one
    chunk per device). idx_global carries global block ids (correct pixel
    math); the BlockSpec subtracts `col_block_base` to index the window."""
    N, H, T_DST, D = q.shape
    CH = k_win.shape[2]
    n_words = mbits.shape[-1]
    NH, NQ = N * H, T_DST // block_q
    NKW = CH // block_k
    qf = q.reshape(NH, T_DST, D)
    kf = k_win.reshape(NH, CH, D)
    vf = v_win.reshape(NH, CH, D)
    scalerf = jnp.ones((NH, T_DST, 128), q.dtype)
    kernel = functools.partial(
        _causal_kernel_fwd_stats_cb, t_m=t_m, block_q=block_q,
        block_k=block_k, n_words=n_words,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NH, NQ, NKW),
        in_specs=[
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, c, x, rb, cb:
                         (h, x[h, i, j] - cb[0], 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, c, x, rb, cb:
                         (h, x[h, i, j] - cb[0], 0)),
            pl.BlockSpec((1, block_q, n_words),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
            jax.ShapeDtypeStruct((NH, T_DST, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, idx_global, rowbase,
      col_block_base.astype(jnp.int32), qf, kf, vf, mbits, scalerf)
    return o, lse[:, :, 0]


def _causal_kernel_dq_cb(
    counts_ref, idx_ref, rowbase_ref, cb_ref, *rest, **kw
):
    """dq kernel with the column-window prefetch operand (cb_ref consumed
    only by the k/v BlockSpec index maps; idx carries GLOBAL block ids)."""
    return _causal_kernel_dq(
        counts_ref, idx_ref, rowbase_ref, *rest, **kw
    )


def _causal_kernel_dkv_win(
    counts_ref, idx_ref, rowbase_ref, cb_ref,
    q_ref, k_ref, v_ref, mbits_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, t_m, block_q, block_k, n_words,
):
    """dk/dv for ONE K/V window: grid (NH, NKW, NQl) with jk local to the
    window — the pixel math uses the GLOBAL k-block id jk + cb_ref[0]."""
    h = pl.program_id(0)
    jk = pl.program_id(1)
    iq = pl.program_id(2)
    count = counts_ref[h, jk]
    BQ, BK = block_q, block_k

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(iq < count)
    def _compute():
        qb = idx_ref[h, jk, iq]
        s = _alive_scores(
            q_ref[0], k_ref[0], rowbase_ref[h, qb],
            (jk + cb_ref[0]) * BK, t_m, n_words,
            mbits_ref, BQ, BK,
        )
        p = jnp.exp(s - lse_ref[0][:, 0:1])
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, 0:1])
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == pl.num_programs(2) - 1)
    def _epilogue():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def dq_window(
    q, k_win, v_win, mbits, dou, lse, delta,
    counts, idx_global, rowbase, col_block_base,
    *, t_m, block_q, block_k, interpret=False,
):
    """dq contribution of ONE K/V window (flash-recompute). lse/delta are
    per-LOCAL-row totals over ALL columns (the merged ring statistics), so
    summing window contributions reproduces the full backward exactly."""
    N, H, T_DST, D = q.shape
    CH = k_win.shape[2]
    n_words = mbits.shape[-1]
    NH, NQ, NKW = N * H, T_DST // block_q, CH // block_k
    qf = q.reshape(NH, T_DST, D)
    kf = k_win.reshape(NH, CH, D)
    vf = v_win.reshape(NH, CH, D)
    douf = dou.reshape(NH, T_DST, D)
    lsef = jnp.broadcast_to(
        lse.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(jnp.float32)
    deltaf = jnp.broadcast_to(
        delta.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(jnp.float32)
    kernel = functools.partial(
        _causal_kernel_dq_cb, t_m=t_m, block_q=block_q, block_k=block_k,
        n_words=n_words,
    )
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NH, NQ, NKW),
        in_specs=[
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, c, x, rb, cb:
                         (h, x[h, i, j] - cb[0], 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, i, j, c, x, rb, cb:
                         (h, x[h, i, j] - cb[0], 0)),
            pl.BlockSpec((1, block_q, n_words),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_q, D),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, i, j, c, x, rb, cb: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda h, i, j, c, x, rb, cb: (h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    dq = pl.pallas_call(
        kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, idx_global, rowbase,
      col_block_base.astype(jnp.int32), qf, kf, vf, mbits, douf, lsef,
      deltaf)
    return dq.reshape(N, H, T_DST, D)


def dkv_window(
    q, k_win, v_win, mbits, dou, lse, delta,
    countsT, idxT_local, rowbase, col_block_base,
    *, t_m, block_q, block_k, interpret=False,
):
    """dk/dv partials of ONE window from the LOCAL query rows.
    countsT/idxT_local: per window k-block, the list of LOCAL q-block ids
    active for it (transposed activity restricted to the window)."""
    N, H, T_DST, D = q.shape
    CH = k_win.shape[2]
    n_words = mbits.shape[-1]
    NH, NQ, NKW = N * H, T_DST // block_q, CH // block_k
    qf = q.reshape(NH, T_DST, D)
    kf = k_win.reshape(NH, CH, D)
    vf = v_win.reshape(NH, CH, D)
    douf = dou.reshape(NH, T_DST, D)
    lsef = jnp.broadcast_to(
        lse.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(jnp.float32)
    deltaf = jnp.broadcast_to(
        delta.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(jnp.float32)
    kernel = functools.partial(
        _causal_kernel_dkv_win, t_m=t_m, block_q=block_q, block_k=block_k,
        n_words=n_words,
    )
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NH, NKW, NQ),
        in_specs=[
            pl.BlockSpec((1, block_q, D),
                         lambda h, jk, iq, c, x, rb, cb:
                         (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, jk, iq, c, x, rb, cb: (h, jk, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, jk, iq, c, x, rb, cb: (h, jk, 0)),
            pl.BlockSpec((1, block_q, n_words),
                         lambda h, jk, iq, c, x, rb, cb:
                         (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, D),
                         lambda h, jk, iq, c, x, rb, cb:
                         (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, jk, iq, c, x, rb, cb:
                         (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda h, jk, iq, c, x, rb, cb:
                         (h, x[h, jk, iq], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D),
                         lambda h, jk, iq, c, x, rb, cb: (h, jk, 0)),
            pl.BlockSpec((1, block_k, D),
                         lambda h, jk, iq, c, x, rb, cb: (h, jk, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=spec,
        out_shape=[
            jax.ShapeDtypeStruct((NH, CH, D), q.dtype),
            jax.ShapeDtypeStruct((NH, CH, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(countsT, idxT_local, rowbase,
      col_block_base.astype(jnp.int32), qf, kf, vf, mbits, douf, lsef,
      deltaf)
    return dk.reshape(N, H, CH, D), dv.reshape(N, H, CH, D)


def _diff_core(q, k, v, mask_m, scaler, row_base, block_q, block_k, interpret):
    o, lse = _fwd_with_stats(
        q, k, v, mask_m, scaler, block_q, block_k, interpret, row_base
    )
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_sparse_attention(
    q, k, v, mask_m, row_scaler, row_base=None,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
):
    """Differentiable fused causal sparse attention (custom_vjp).

    Same semantics as `sea_block_sparse_attention(..., is_causal=True)`:
    per-(row,head) softmax over the dense-resize-expanded compressed mask,
    times the row scaler (pass ones when unused — custom_vjp needs a
    concrete cotangent slot). mask_m gets zero cotangent (binary
    selection); q/k/v/row_scaler get flash-style recompute gradients.

    row_base: optional (NQ,) FLOAT array of global base rows per local
    q-block — the sequence-sharded train path passes the zigzag block
    bases so the causal widths use global row indices (zero cotangent)."""
    o, _ = _diff_core(
        q, k, v, mask_m, row_scaler, row_base, block_q, block_k, interpret
    )
    return o


def _fused_fwd(q, k, v, mask_m, row_scaler, row_base, block_q, block_k,
               interpret):
    o, lse = _diff_core(
        q, k, v, mask_m, row_scaler, row_base, block_q, block_k, interpret
    )
    return o, (q, k, v, mask_m, row_scaler, row_base, o, lse)


def _fused_bwd(block_q, block_k, interpret, res, do):
    q, k, v, mask_m, scaler, row_base, o, lse = res  # lse (NH,T,128)
    N, H, T_DST, D = q.shape
    T_SRC = k.shape[2]
    T_M = mask_m.shape[-1]
    NH, NQ, NKB = N * H, T_DST // block_q, T_SRC // block_k
    mbits, counts, idx, countsT, idxT, rowbase, n_words = _diff_prep(
        q, k, mask_m, block_q, block_k, row_base
    )

    do_f = do.astype(jnp.float32)
    o_f = o.astype(jnp.float32)
    scale_f = scaler.astype(jnp.float32)[..., None]  # (N,H,T,1)
    safe_scale = jnp.where(scale_f != 0, scale_f, 1.0)
    o_unscaled = o_f / safe_scale
    # d scaler = <do, o_unscaled> per row; d o_unscaled = do * scale
    dscaler = jnp.sum(do_f * o_unscaled, axis=-1).astype(scaler.dtype)
    dou = (do_f * scale_f).astype(q.dtype)
    delta = jnp.sum(dou.astype(jnp.float32) * o_unscaled, axis=-1)  # (N,H,T)

    qf = q.reshape(NH, T_DST, D)
    kf = k.reshape(NH, T_SRC, D)
    vf = v.reshape(NH, T_SRC, D)
    douf = dou.reshape(NH, T_DST, D)
    deltaf = jnp.broadcast_to(
        delta.reshape(NH, T_DST, 1), (NH, T_DST, 128)
    ).astype(jnp.float32)

    dq_kernel = functools.partial(
        _causal_kernel_dq, t_m=T_M, block_q=block_q, block_k=block_k,
        n_words=n_words,
    )
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NH, NQ, NKB),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, c, x, rb: (h, x[h, i, j], 0)),
            pl.BlockSpec((1, block_k, D), lambda h, i, j, c, x, rb: (h, x[h, i, j], 0)),
            pl.BlockSpec((1, block_q, n_words), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, i, j, c, x, rb: (h, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, i, j, c, x, rb: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda h, i, j, c, x, rb: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    lsef = lse  # (NH, T_DST, 128) f32 from the stats forward
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((NH, T_DST, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, idx, rowbase, qf, kf, vf, mbits, douf, lsef, deltaf)

    dkv_kernel = functools.partial(
        _causal_kernel_dkv, t_m=T_M, block_q=block_q, block_k=block_k,
        n_words=n_words,
    )
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NH, NKB, NQ),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, jk, iq, c, x, rb: (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_k, D), lambda h, jk, iq, c, x, rb: (h, jk, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, jk, iq, c, x, rb: (h, jk, 0)),
            pl.BlockSpec((1, block_q, n_words), lambda h, jk, iq, c, x, rb: (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, D), lambda h, jk, iq, c, x, rb: (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, jk, iq, c, x, rb: (h, x[h, jk, iq], 0)),
            pl.BlockSpec((1, block_q, 128), lambda h, jk, iq, c, x, rb: (h, x[h, jk, iq], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda h, jk, iq, c, x, rb: (h, jk, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, jk, iq, c, x, rb: (h, jk, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NH, T_SRC, D), q.dtype),
            jax.ShapeDtypeStruct((NH, T_SRC, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(countsT, idxT, rowbase, qf, kf, vf, mbits, douf, lsef, deltaf)

    dq = dq.reshape(N, H, T_DST, D)
    dk = dk.reshape(N, H, T_SRC, D)
    dv = dv.reshape(N, H, T_SRC, D)
    dmask = jnp.zeros_like(mask_m)
    drow_base = None if row_base is None else jnp.zeros_like(row_base)
    return dq, dk, dv, dmask, dscaler, drow_base


fused_sparse_attention.defvjp(_fused_fwd, _fused_bwd)
