"""Sequence-sharded SEA sparse attention (the BASELINE.json north star:
"sequence/head row-partitioning of the attention matrix with K/V exchange
over ICI collectives overlapped with kernel compute").

Every stage of the SEA sparse pipeline is query-row independent, so the
query axis shards cleanly over the `sp` mesh axis; the compressed top-k
mask is per-row-local too. Only K/V cross shards: SEA's estimated mask is
*global* (top-k can select any source position), so unlike local-window
attention there is no bounded halo — each shard needs the full K/V, which
`jax.lax.all_gather` moves over ICI (tiled, so XLA can overlap the gather
with the kernel's first tiles). The fused Pallas kernel then runs on the
shard's rows only; its tile-skipping still applies per shard.

For causal inputs the work per row grows with the row index, so contiguous
row sharding load-imbalances (last shard does ~2x the mean). `zigzag=True`
assigns row-blocks round-robin across shards (the standard causal flash
sharding trick), restoring balance at the cost of a gather/scatter of the
row permutation (cheap: rows are independent).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.kernels.block_sparse import sea_block_sparse_attention


def _zigzag_perm(t: int, n_shards: int, block: int) -> jnp.ndarray:
    """Permutation assigning row-blocks round-robin to shards: shard s gets
    blocks s, s+n, s+2n, ... (concatenated order)."""
    nb = t // block
    order = []
    for s in range(n_shards):
        order.extend(range(s, nb, n_shards))
    idx = jnp.asarray(order, jnp.int32)
    return (idx[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)


def head_sharded_sea_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_m: jnp.ndarray,
    row_scaler: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    axis: str = "sp",
    is_causal: bool = True,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    oversample: float = 1.0,
    k_cfg: float = 64.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-partitioned variant (the other half of the north star's
    "sequence/head row-partitioning"): every SEA stage is head-independent
    except the shared per-row budget, which is already baked into `mask_m`
    before this op — so heads shard with NO cross-device communication at
    all (K/V shard by head too). Ideal when H >= n_devices."""
    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    assert H % n_shards == 0

    spec = P(None, axis, None, None)
    scaler_spec = P(None, axis, None)

    def shard_fn(q_l, k_l, v_l, mask_l, scaler_l):
        return sea_block_sparse_attention(
            q_l, k_l, v_l, mask_l, scaler_l,
            is_causal=is_causal, block_q=block_q, block_k=block_k,
            oversample=oversample, k_cfg=k_cfg,
            interpret=interpret,
        )

    scaler = (
        row_scaler if row_scaler is not None else jnp.ones((N, H, T), q.dtype)
    )
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec, scaler_spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, mask_m, scaler)


def sharded_sea_attention(
    q: jnp.ndarray,  # (N, H, T, D) pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_m: jnp.ndarray,  # (N, H, T, T_M)
    row_scaler: Optional[jnp.ndarray],  # (N, H, T) or None
    mesh: Mesh,
    *,
    axis: str = "sp",
    is_causal: bool = True,
    zigzag: bool = True,
    use_kernel: bool = True,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    oversample: float = 1.0,
    k_cfg: float = 64.0,
    interpret: bool = False,
) -> jnp.ndarray:
    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    assert T % n_shards == 0
    bq = block_q or 128
    assert (T // n_shards) % bq == 0

    if zigzag and is_causal and n_shards > 1:
        perm = _zigzag_perm(T, n_shards, bq)
        inv = jnp.argsort(perm)
    else:
        perm = inv = None

    if perm is not None:
        qp = q[:, :, perm]
        maskp = mask_m[:, :, perm]
        scalerp = row_scaler[:, :, perm] if row_scaler is not None else None
    else:
        qp, maskp, scalerp = q, mask_m, row_scaler
    if scalerp is None:
        scalerp = jnp.ones((N, H, T), q.dtype)

    # global row index per (permuted) row — consumed as widths inside the
    # fallback rowwise implementation
    rows = perm if perm is not None else jnp.arange(T, dtype=jnp.int32)
    rows_b = jnp.broadcast_to(rows[None, None, :], (N, H, T))

    in_specs = (
        P(None, None, axis, None),  # q rows sharded
        P(),  # k replicated (all-gathered once)
        P(),  # v replicated
        P(None, None, axis, None),  # mask rows sharded
        P(None, None, axis),  # scaler rows sharded
        P(None, None, axis),  # global row ids
    )
    out_spec = P(None, None, axis, None)

    def shard_fn(q_l, k_full, v_full, mask_l, scaler_l, rows_l):
        # rows within a shard are blocked contiguous groups of bq rows
        # (zigzag permutes whole blocks); the fused kernel consumes the
        # global base row of each local q-block for its causal width math.
        if use_kernel:
            row_base = rows_l[0, 0, ::bq]  # (TL/bq,)
            return sea_block_sparse_attention(
                q_l, k_full, v_full, mask_l, scaler_l,
                is_causal=is_causal, row_base=row_base,
                block_q=bq, block_k=block_k,
                oversample=oversample, k_cfg=k_cfg, interpret=interpret,
            )
        return _masked_rowwise_attention(
            q_l, k_full, v_full, mask_l, scaler_l, rows_l,
            is_causal=is_causal, interpret=interpret,
        )

    out = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,  # pallas_call out_shape carries no vma metadata
    )(qp, k, v, maskp, scalerp, rows_b)

    if inv is not None:
        out = out[:, :, inv]
    return out


def _masked_rowwise_attention(
    q_l, k_full, v_full, mask_l, scaler_l, rows_l, *, is_causal, interpret
):
    """Per-shard dense-resize masked attention with explicit global row ids
    (XLA implementation; rows are few per shard). The Pallas fused kernel
    covers the unsharded path; fusing it here with a row-offset argument is
    the round-2 optimisation."""
    N, H, TL, D = q_l.shape
    T_SRC = k_full.shape[2]
    T_M = mask_l.shape[-1]
    s_idx = jnp.arange(T_SRC, dtype=jnp.float32)[None, None, None, :]
    r_glob = rows_l[..., None].astype(jnp.float32)  # (N,H,TL,1)
    if is_causal:
        w = r_glob + 1.0
    else:
        w = jnp.full_like(r_glob, float(T_SRC))
    pixel = jnp.floor((s_idx + 0.5) / w * T_M - 1e-4).astype(jnp.int32)
    pixel = jnp.clip(pixel, 0, T_M - 1)
    alive = jnp.take_along_axis(mask_l > 0, pixel, axis=-1)
    if is_causal:
        alive = alive & (s_idx <= r_glob)
    scores = jnp.einsum("nhtd,nhsd->nhts", q_l, k_full).astype(jnp.float32)
    scores = jnp.where(alive, scores, -1e30)
    m = jnp.max(scores, -1, keepdims=True)
    p = jnp.where(alive, jnp.exp(scores - m), 0.0)
    l = jnp.sum(p, -1, keepdims=True)
    p = p / jnp.where(l > 0, l, 1.0)
    out = jnp.einsum("nhts,nhsd->nhtd", p, v_full.astype(jnp.float32))
    out = out * scaler_l[..., None].astype(jnp.float32)
    return out.astype(q_l.dtype)
