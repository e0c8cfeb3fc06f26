"""Uniform (fixed-nnz-per-row) flat-CSR sparse mask and its linear algebra.

TPU-native redesign of the reference's ragged flat-CSR pipeline
(`/root/reference/src/models/perlin_attention/ops/kernels/*.py`). The sparse
layout keeps the reference's column encoding — shape (N, T_DST, H*T_SRC) with
column c meaning head = c // T_SRC, source position = c % T_SRC, head-major
contiguous within a row (`flat_csr_masked_bmm.py:22-24`, SURVEY A.1) — but
replaces the ragged `crow_indices` with a *static* per-row slot count
`max_nnz`, padding unused slots with column sentinel -1. This removes the
dynamic-shape `ncols overflow` retry (`causal_resize_m_to_t.py:978-991`) by
construction and gives every kernel fixed block shapes, which is what the
TPU/XLA compilation model requires.

All functions here are the pure-`jnp` reference implementations (the analogue
of the reference's `naive_*` oracles). The Pallas fast path lives in
`sea_tpu/ops/kernels/` and is tested against these.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .masks import round_half_away


@struct.dataclass
class UniformCsr:
    """Fixed-budget flat CSR mask.

    cols:   (N, T_DST, Z) int32, flat column c = head * t_src + src_pos,
            -1 for empty slots. Head-major contiguous within each row.
    values: (N, T_DST, Z) float, 1.0 at creation; kernels rewrite them
            through the pipeline (SDDMM scores -> softmax probs -> scaled).
    """

    cols: jnp.ndarray
    values: jnp.ndarray
    num_heads: int = struct.field(pytree_node=False)
    t_src: int = struct.field(pytree_node=False)

    @property
    def valid(self) -> jnp.ndarray:
        return self.cols >= 0

    @property
    def head_ids(self) -> jnp.ndarray:
        return jnp.where(self.valid, self.cols // self.t_src, 0)

    @property
    def src_ids(self) -> jnp.ndarray:
        return jnp.where(self.valid, self.cols % self.t_src, 0)

    @property
    def nnz_per_row(self) -> jnp.ndarray:
        return self.valid.sum(-1)


def resize_from_m_to_t_csr(
    compressed_mask: jnp.ndarray,
    k: int,
    target_width: int,
    is_causal: bool = True,
    max_nnz: Optional[int] = None,
) -> UniformCsr:
    """Expand a binary compressed mask (N, H, T_DST, T_M) to a uniform flat CSR.

    Semantics pinned from reference `causal_resize_m_to_t.py` (`scan_col`,
    `__scan_col_4_compute`):
      * per-row target width w_r = r+1 (causal) or T_SRC (`:953-957`);
      * pixel b expands to the run [round(b*s), round((b+1)*s)) with
        s = w_r / T_M and round = half-away-from-zero (`triton_round`);
      * run length clamped to `k` entries (`:657-659` clamp_max(max_k));
      * clamped runs store columns descending from v_end-1 with integer
        stride trunc(j*(v_end-v_start)/col_len) (`:561-572`);
      * flat column = head * T_SRC + col; pixels scanned in (T_DST, H, T_M)
        order so heads stay contiguous per row.

    Unlike the reference we never reallocate: rows that would exceed
    `max_nnz` are truncated (the bound H*(k+ceil(T_SRC/T_M))+slack makes this
    unreachable for the canonical configs).
    """
    N, H, T_DST, T_M = compressed_mask.shape
    T_SRC = target_width
    if max_nnz is None:
        # worst case over row widths; see SeaConfig.max_nnz_for
        max_nnz = H * max(
            math.ceil(math.sqrt(k * T_M)) + 1,
            2 * k + math.ceil(T_SRC / T_M) + 1,
        )
        max_nnz = ((max_nnz + 127) // 128) * 128
    Z = max_nnz

    x = jnp.transpose(compressed_mask, (0, 2, 1, 3))  # (N, T_DST, H, T_M)
    x = (x > 0).astype(jnp.int32)

    if is_causal:
        widths = jnp.arange(1, T_SRC + 1, dtype=jnp.float32)[-T_DST:]
    else:
        widths = jnp.full((T_DST,), float(T_SRC), dtype=jnp.float32)
    scales = widths / T_M  # (T_DST,)

    b = jnp.arange(T_M, dtype=jnp.float32).reshape(1, T_M)
    v_starts = round_half_away(b * scales[:, None]).astype(jnp.int32)  # (T_DST, T_M)
    v_ends = round_half_away((b + 1) * scales[:, None]).astype(jnp.int32)
    run_len = jnp.minimum(v_ends - v_starts, k)  # clamp_max(max_k=k)

    counts = run_len[None, :, None, :] * x  # (N, T_DST, H, T_M)
    counts = counts.reshape(N, T_DST, H * T_M)
    cum = jnp.cumsum(counts, axis=-1)  # inclusive
    nnz = jnp.minimum(cum[..., -1], Z)  # (N, T_DST)

    # For each output slot z find the covering pixel: p = first index with
    # cum[p] > z  (== searchsorted right over the inclusive cumsum).
    slots = jnp.arange(Z, dtype=cum.dtype)

    def row_search(cum_row):
        return jnp.searchsorted(cum_row, slots, side="right")

    p = jax.vmap(jax.vmap(row_search))(cum)  # (N, T_DST, Z)
    p = jnp.minimum(p, H * T_M - 1)

    excl = cum - counts  # exclusive offsets
    offset = jnp.take_along_axis(excl, p, axis=-1)
    j = (slots[None, None, :] - offset).astype(jnp.float32)

    h_idx = p // T_M
    b_idx = p % T_M
    vs = v_starts[None, :, :]  # (1, T_DST, T_M)
    ve = v_ends[None, :, :]
    vs_p = jnp.take_along_axis(jnp.broadcast_to(vs, (N, T_DST, T_M)), b_idx, axis=-1)
    ve_p = jnp.take_along_axis(jnp.broadcast_to(ve, (N, T_DST, T_M)), b_idx, axis=-1)
    clen = jnp.take_along_axis(counts, p, axis=-1)
    clen_safe = jnp.maximum(clen, 1)
    stride_step = (
        j * (ve_p - vs_p).astype(jnp.float32) / clen_safe.astype(jnp.float32)
    ).astype(jnp.int32)
    col = ve_p - 1 - stride_step
    flat_col = h_idx * T_SRC + col

    valid = slots[None, None, :] < nnz[..., None]
    cols = jnp.where(valid, flat_col, -1).astype(jnp.int32)
    values = valid.astype(compressed_mask.dtype)

    return UniformCsr(cols=cols, values=values, num_heads=H, t_src=T_SRC)


# ---------------------------------------------------------------------------
# Sparse linear algebra over UniformCsr — pure-jnp reference implementations
# mirroring the reference naive oracles (A.2 in SURVEY.md).
# ---------------------------------------------------------------------------


def _gather_nhsd(table: jnp.ndarray, csr: UniformCsr) -> jnp.ndarray:
    """Gather (N, H, T_SRC, D) rows by flat column -> (N, T_DST, Z, D)."""
    N, H, T_SRC, D = table.shape
    flat = table.reshape(N, H * T_SRC, D)
    idx = jnp.where(csr.valid, csr.cols, 0)
    NT, T_DST, Z = idx.shape
    g = jnp.take_along_axis(flat, idx.reshape(N, T_DST * Z, 1), axis=1)
    return g.reshape(N, T_DST, Z, D)


def flat_csr_masked_bmm(
    a: jnp.ndarray, b: jnp.ndarray, csr: UniformCsr
) -> UniformCsr:
    """Masked SDDMM: out_values[n,r,z] = dot(a[n,h,r,:], b[n,h,c,:]).

    Reference oracle `flat_csr_masked_bmm.py:8-27`. No sqrt(d) scaling — the
    OPT path pre-scales q in the projection (`perlin_opt.py:565`)."""
    N, H, T_DST, D = a.shape
    b_g = _gather_nhsd(b, csr)  # (N, T_DST, Z, D)
    a_rh = jnp.transpose(a, (0, 2, 1, 3))  # (N, T_DST, H, D)
    a_g = jnp.take_along_axis(a_rh, csr.head_ids[..., None], axis=2)
    vals = jnp.sum(a_g.astype(jnp.float32) * b_g.astype(jnp.float32), axis=-1)
    vals = (vals * csr.values.astype(jnp.float32)).astype(a.dtype)
    vals = jnp.where(csr.valid, vals, 0)
    return csr.replace(values=vals)


def flat_csr_softmax(csr: UniformCsr) -> UniformCsr:
    """Per-(row, head)-segment softmax over values.

    Reference oracle `flat_csr_softmax.py:12-43`: within each (batch, row,
    head) segment subtract the max, exponentiate, normalize; zero-nnz
    segments produce zeros."""
    H = csr.num_heads
    vals = csr.values.astype(jnp.float32)
    head = csr.head_ids
    valid = csr.valid
    N, T_DST, Z = vals.shape
    # segment-reduce over the (row, head) segments in two scatters + two
    # gathers (H-independent; a python loop over heads would emit H passes)
    n_idx = jnp.broadcast_to(jnp.arange(N)[:, None, None], (N, T_DST, Z))
    r_idx = jnp.broadcast_to(jnp.arange(T_DST)[None, :, None], (N, T_DST, Z))
    masked = jnp.where(valid, vals, -jnp.inf)
    seg_max = jnp.full((N, T_DST, H), -jnp.inf, jnp.float32)
    seg_max = seg_max.at[n_idx, r_idx, head].max(masked)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    e = jnp.where(
        valid, jnp.exp(vals - jnp.take_along_axis(seg_max, head, axis=-1)), 0.0
    )
    seg_sum = jnp.zeros((N, T_DST, H), jnp.float32)
    seg_sum = seg_sum.at[n_idx, r_idx, head].add(e)
    s = jnp.take_along_axis(seg_sum, head, axis=-1)
    out = jnp.where(valid, e / jnp.maximum(s, 1e-30), 0.0)
    return csr.replace(values=out.astype(csr.values.dtype))


def flat_csr_elmul(csr: UniformCsr, row_scaler: jnp.ndarray) -> UniformCsr:
    """Multiply values by a per-(row, head) scalar (reference oracle
    `flat_csr_elmul.py:6-28`; in practice the sigmoid row scaler broadcast
    over T_SRC, `attention.py:1170-1171`).

    row_scaler: (N, H, T_DST)."""
    s_rh = jnp.transpose(row_scaler, (0, 2, 1))  # (N, T_DST, H)
    s = jnp.take_along_axis(s_rh, csr.head_ids, axis=2)
    vals = csr.values * s.astype(csr.values.dtype)
    vals = jnp.where(csr.valid, vals, 0)
    return csr.replace(values=vals)


def flat_csr_sdbmm(csr: UniformCsr, v: jnp.ndarray) -> jnp.ndarray:
    """SpMM: out[n,h,r,:] = sum_z values[z] * v[n,h,src(z),:] over head-h slots.

    Reference `flat_csr_sdbmm.py:227-313`; accumulation in fp32."""
    N, H, T_SRC, D = v.shape
    v_g = _gather_nhsd(v, csr).astype(jnp.float32)  # (N, T_DST, Z, D)
    vals = (csr.values * csr.valid).astype(jnp.float32)
    head = csr.head_ids
    _, T_DST, Z = vals.shape
    # one scatter-add into (N, T_DST, H, D) replaces H masked einsum passes
    n_idx = jnp.broadcast_to(jnp.arange(N)[:, None, None], (N, T_DST, Z))
    r_idx = jnp.broadcast_to(jnp.arange(T_DST)[None, :, None], (N, T_DST, Z))
    out = jnp.zeros((N, T_DST, H, D), jnp.float32)
    out = out.at[n_idx, r_idx, head].add(vals[..., None] * v_g)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(v.dtype)


def flat_csr_to_dense(csr: UniformCsr) -> jnp.ndarray:
    """Densify to (N, H, T_DST, T_SRC) for tests/visualization
    (reference `flat_csr_to_dense.py:3-36`)."""
    N, T_DST, Z = csr.cols.shape
    H, T_SRC = csr.num_heads, csr.t_src
    n_idx = jnp.broadcast_to(jnp.arange(N)[:, None, None], (N, T_DST, Z))
    r_idx = jnp.broadcast_to(jnp.arange(T_DST)[None, :, None], (N, T_DST, Z))
    vals = jnp.where(csr.valid, csr.values, 0)
    dense = jnp.zeros((N, H, T_DST, T_SRC), dtype=csr.values.dtype)
    dense = dense.at[n_idx, csr.head_ids, r_idx, csr.src_ids].add(vals)
    return dense
