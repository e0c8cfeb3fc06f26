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

import functools
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


def head_sharded_fused_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_m: jnp.ndarray,
    row_scaler: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "sp",
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-partitioned DIFFERENTIABLE fused attention: like
    `head_sharded_sea_attention` but through the custom_vjp kernel
    (`fused_sparse_attention`), so gradients flow — zero cross-device
    communication in forward AND backward (every cotangent is
    head-local)."""
    from ..ops.kernels.block_sparse import fused_sparse_attention

    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    assert H % n_shards == 0
    spec = P(None, axis, None, None)
    scaler_spec = P(None, axis, None)

    def shard_fn(q_l, k_l, v_l, mask_l, scaler_l):
        return fused_sparse_attention(
            q_l, k_l, v_l, mask_l, scaler_l, None,
            block_q, block_k, interpret,
        )

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec, scaler_spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, mask_m, row_scaler)


def sharded_fused_train_attention(
    q: jnp.ndarray,  # (N, H, T, D) pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_m: jnp.ndarray,  # (N, H, T, T_M)
    row_scaler: jnp.ndarray,  # (N, H, T)
    mesh: Mesh,
    *,
    axis: str = "sp",
    zigzag: bool = True,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sequence-sharded DIFFERENTIABLE fused attention (VERDICT r2 #2):
    query rows zigzag-shard over `axis`, K/V replicated per shard, and the
    custom_vjp kernel runs with per-shard global `row_base` so the causal
    widths (and the compressed-mask pixel math) use GLOBAL row indices.

    Backward: dq/dscaler are row-local (ride the same sharding); dk/dv are
    per-shard partials over the full source axis, psum'ed by shard_map's
    transpose of the replicated in_spec — one reduce per backward, the
    sequence-parallel analogue of Megatron's column-parallel grad reduce.
    Long-context *training* memory for scores/stats scales 1/n_shards."""
    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    assert T % n_shards == 0
    block_q = min(block_q, T // n_shards)  # shard-local rows bound the tile
    assert (T // n_shards) % block_q == 0, (T, n_shards, block_q)

    if zigzag and n_shards > 1:
        perm = _zigzag_perm(T, n_shards, block_q)
        inv = jnp.argsort(perm)
        qp = q[:, :, perm]
        maskp = mask_m[:, :, perm]
        scalerp = row_scaler[:, :, perm]
        rows = perm
    else:
        inv = None
        qp, maskp, scalerp = q, mask_m, row_scaler
        rows = jnp.arange(T, dtype=jnp.int32)
    # float row ids: row_base is a differentiable custom_vjp slot (gets a
    # structural zero cotangent); int primals would need float0 handling
    rows_b = jnp.broadcast_to(
        rows[None, None, :].astype(jnp.float32), (N, H, T)
    )

    in_specs = (
        P(None, None, axis, None),  # q rows sharded
        P(),  # k replicated
        P(),  # v replicated
        P(None, None, axis, None),  # mask rows sharded
        P(None, None, axis),  # scaler rows sharded
        P(None, None, axis),  # global row ids
    )

    def shard_fn(q_l, k_full, v_full, mask_l, scaler_l, rows_l):
        row_base = rows_l[0, 0, ::block_q]  # (TL/bq,) f32 global bases
        return fused_sparse_attention_ref(
            q_l, k_full, v_full, mask_l, scaler_l, row_base,
            block_q, block_k, interpret,
        )

    from ..ops.kernels.block_sparse import (
        fused_sparse_attention as fused_sparse_attention_ref,
    )

    out = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )(qp, k, v, maskp, scalerp, rows_b)
    if inv is not None:
        out = out[:, :, inv]
    return out


def ring_sea_attention(
    q: jnp.ndarray,  # (N, H, T, D) pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_m: jnp.ndarray,  # (N, H, T, T_M)
    row_scaler: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    axis: str = "sp",
    zigzag: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Memory-scalable sequence-sharded SEA attention (VERDICT r2 #6/#7):
    K/V stay SHARDED over `axis` (per-chip K/V memory O(T/n_shards), not
    O(T)) and rotate around the ring with `lax.ppermute` — each step the
    kernel consumes the resident chunk while the next one is in flight
    (ring attention; XLA overlaps the ppermute with the pallas_call since
    neither depends on the other within a step).

    Query rows zigzag-shard as in `sharded_sea_attention`; per-step flash
    partials (window-normalized out + logsumexp from `fwd_stats_window`)
    merge with the standard logaddexp recombination, so the result is
    bit-consistent with one full-width kernel pass up to fp reassociation.

    This IS the differentiable ring's forward (`_ring_train_fwd_impl`)
    with the per-row total logsumexp discarded — one ring-step body, one
    set of flash-merge edge-case conventions.
    """
    if row_scaler is None:
        row_scaler = jnp.ones(q.shape[:3], q.dtype)
    out, _ = _ring_train_fwd_impl(
        q, k, v, mask_m, row_scaler,
        mesh, axis, zigzag, block_q, block_k, interpret,
    )
    return out


def _ring_shared_prep(mask_l, rows_l, T, T_M, block_q, block_k):
    """Per-shard prep reused by the ring fwd and bwd shard_maps."""
    from ..ops.kernels.block_sparse import (
        _causal_activity,
        pack_compressed_bits,
    )

    N, H, TL, _ = mask_l.shape
    NH = N * H
    n_words = (T_M + 31) // 32
    row_base = rows_l[0, 0, ::block_q]
    rowbase = jnp.broadcast_to(
        row_base[None, :], (NH, TL // block_q)
    ).astype(jnp.int32)
    row_widths = (rows_l[0, 0] + 1).astype(jnp.float32)
    act = _causal_activity(
        mask_l, T, block_q, block_k, row_widths=row_widths
    ).reshape(NH, TL // block_q, T // block_k)
    mbits = pack_compressed_bits(mask_l).reshape(NH, TL, n_words)
    return rowbase, act, mbits


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def ring_fused_train_attention(
    q, k, v, mask_m, row_scaler,
    mesh, axis: str = "sp", zigzag: bool = True,
    block_q: int = 128, block_k: int = 128, interpret: bool = False,
):
    """DIFFERENTIABLE ring attention: K/V (and dk/dv) stay sequence-
    sharded — per-chip K/V memory O(T/shards) in forward AND backward,
    the strongest form of the north-star's "K/V exchange over ICI
    overlapped with compute" for long-context TRAINING.

    Forward: as `ring_sea_attention` (per-window flash partials merged by
    logaddexp), additionally materialising the per-row total logsumexp
    for the backward. Backward: (k, v, dk_acc, dv_acc) rotate the ring
    together; each step the resident chunk picks up dk/dv partials from
    this shard's local query rows (`dkv_window`) and the local dq
    accumulates `dq_window` — after S hops every chunk is home with all
    contributions. q/mask/scaler shard by rows (zigzag); mask gets a zero
    cotangent."""
    out, _ = _ring_train_fwd_impl(
        q, k, v, mask_m, row_scaler,
        mesh, axis, zigzag, block_q, block_k, interpret,
    )
    return out


def _ring_train_fwd_impl(
    q, k, v, mask_m, row_scaler,
    mesh, axis, zigzag, block_q, block_k, interpret,
):
    from ..ops.kernels.block_sparse import _compact_lists, fwd_stats_window

    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    assert T % n_shards == 0
    TL = T // n_shards
    block_q = min(block_q, TL)
    block_k = min(block_k, TL)
    assert TL % block_q == 0 and TL % block_k == 0
    T_M = mask_m.shape[-1]
    NKW = TL // block_k

    if zigzag and n_shards > 1:
        perm = _zigzag_perm(T, n_shards, block_q)
        inv = jnp.argsort(perm)
        qp_, maskp, scalerp = (
            q[:, :, perm], mask_m[:, :, perm], row_scaler[:, :, perm]
        )
        rows = perm
    else:
        inv = None
        qp_, maskp, scalerp = q, mask_m, row_scaler
        rows = jnp.arange(T, dtype=jnp.int32)
    rows_b = jnp.broadcast_to(rows[None, None, :], (N, H, T))

    seq_spec = P(None, None, axis, None)
    in_specs = (
        seq_spec, seq_spec, seq_spec, seq_spec,
        P(None, None, axis), P(None, None, axis),
    )

    def shard_fn(q_l, k_l, v_l, mask_l, scaler_l, rows_l):
        me = jax.lax.axis_index(axis)
        NH = N * H
        rowbase, act, mbits = _ring_shared_prep(
            mask_l, rows_l, T, T_M, block_q, block_k
        )
        qf = q_l.reshape(N, H, TL, D)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def step(carry, s):
            k_cur, v_cur, L, acc = carry
            chunk_id = (me - s) % n_shards
            w0 = chunk_id * NKW
            act_win = jax.lax.dynamic_slice_in_dim(act, w0, NKW, axis=-1)
            counts, idx = _compact_lists(act_win[:, None])
            counts, idx = counts[:, 0], idx[:, 0] + w0
            o_s, lse_s = fwd_stats_window(
                qf, k_cur, v_cur, mbits, counts, idx, rowbase,
                jnp.reshape(w0, (1,)).astype(jnp.int32),
                t_m=T_M, block_q=block_q, block_k=block_k,
                interpret=interpret,
            )
            lse_m = jnp.where(jnp.isposinf(lse_s), -jnp.inf, lse_s)
            L_new = jnp.logaddexp(L, lse_m)
            w_old = jnp.where(
                jnp.isneginf(L), 0.0, jnp.exp(L - L_new)
            )[..., None]
            w_s = jnp.where(
                jnp.isneginf(lse_m), 0.0, jnp.exp(lse_m - L_new)
            )[..., None]
            acc = acc * w_old + o_s.astype(jnp.float32) * w_s
            k_nxt = jax.lax.ppermute(k_cur, axis, fwd)
            v_nxt = jax.lax.ppermute(v_cur, axis, fwd)
            return (k_nxt, v_nxt, L_new, acc), None

        L0 = jnp.full((NH, TL), -jnp.inf, jnp.float32)
        acc0 = jnp.zeros((NH, TL, D), jnp.float32)
        (_, _, L, acc), _ = jax.lax.scan(
            step, (k_l, v_l, L0, acc0), jnp.arange(n_shards)
        )
        out = acc.reshape(N, H, TL, D) * scaler_l[..., None].astype(
            jnp.float32
        )
        return out.astype(q_l.dtype), L.reshape(N, H, TL)

    out, L = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(None, None, axis, None), P(None, None, axis)),
        check_vma=False,
    )(qp_, k, v, maskp, scalerp, rows_b)
    if inv is not None:
        out = out[:, :, inv]
        L = L[:, :, inv]
    return out, L


def _ring_train_fwd(
    q, k, v, mask_m, row_scaler,
    mesh, axis, zigzag, block_q, block_k, interpret,
):
    out, L = _ring_train_fwd_impl(
        q, k, v, mask_m, row_scaler,
        mesh, axis, zigzag, block_q, block_k, interpret,
    )
    return out, (q, k, v, mask_m, row_scaler, out, L)


def _ring_train_bwd(
    mesh, axis, zigzag, block_q, block_k, interpret, res, do
):
    from ..ops.kernels.block_sparse import (
        _compact_lists,
        dkv_window,
        dq_window,
    )

    q, k, v, mask_m, scaler, out, L = res
    N, H, T, D = q.shape
    n_shards = mesh.shape[axis]
    TL = T // n_shards
    block_q = min(block_q, TL)
    block_k = min(block_k, TL)
    T_M = mask_m.shape[-1]
    NKW = TL // block_k

    # row-local scaler/delta math (as _fused_bwd)
    do_f = do.astype(jnp.float32)
    o_f = out.astype(jnp.float32)
    scale_f = scaler.astype(jnp.float32)[..., None]
    safe_scale = jnp.where(scale_f != 0, scale_f, 1.0)
    o_unscaled = o_f / safe_scale
    dscaler = jnp.sum(do_f * o_unscaled, axis=-1).astype(scaler.dtype)
    dou = (do_f * scale_f).astype(q.dtype)
    delta = jnp.sum(dou.astype(jnp.float32) * o_unscaled, axis=-1)
    # ring merge uses -inf for all-dead rows; the backward's
    # exp(s - lse) -> 0 convention needs +inf there
    L_b = jnp.where(jnp.isneginf(L), jnp.inf, L)

    if zigzag and n_shards > 1:
        perm = _zigzag_perm(T, n_shards, block_q)
        inv = jnp.argsort(perm)
        qp_ = q[:, :, perm]
        maskp = mask_m[:, :, perm]
        doup = dou[:, :, perm]
        Lp = L_b[:, :, perm]
        deltap = delta[:, :, perm]
        rows = perm
    else:
        inv = None
        qp_, maskp, doup, Lp, deltap = q, mask_m, dou, L_b, delta
        rows = jnp.arange(T, dtype=jnp.int32)
    rows_b = jnp.broadcast_to(rows[None, None, :], (N, H, T))

    seq_spec = P(None, None, axis, None)
    row_spec = P(None, None, axis)
    in_specs = (
        seq_spec, seq_spec, seq_spec, seq_spec,
        seq_spec, row_spec, row_spec, row_spec,
    )

    def shard_fn(q_l, k_l, v_l, mask_l, dou_l, L_l, delta_l, rows_l):
        me = jax.lax.axis_index(axis)
        NH = N * H
        rowbase, act, mbits = _ring_shared_prep(
            mask_l, rows_l, T, T_M, block_q, block_k
        )
        qf = q_l.reshape(N, H, TL, D)
        douf = dou_l.reshape(N, H, TL, D)
        Lf = L_l.reshape(NH, TL)
        deltaf = delta_l.reshape(NH, TL)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def step(carry, s):
            k_cur, v_cur, dk_acc, dv_acc, dq_acc = carry
            chunk_id = (me - s) % n_shards
            w0 = chunk_id * NKW
            act_win = jax.lax.dynamic_slice_in_dim(act, w0, NKW, axis=-1)
            counts, idx = _compact_lists(act_win[:, None])
            counts, idx = counts[:, 0], idx[:, 0] + w0
            cb = jnp.reshape(w0, (1,)).astype(jnp.int32)
            dq_w = dq_window(
                qf, k_cur, v_cur, mbits, douf, Lf, deltaf,
                counts, idx, rowbase, cb,
                t_m=T_M, block_q=block_q, block_k=block_k,
                interpret=interpret,
            )
            countsT, idxT = _compact_lists(
                jnp.swapaxes(act_win, -1, -2)[:, None]
            )
            countsT, idxT = countsT[:, 0], idxT[:, 0]
            dk_w, dv_w = dkv_window(
                qf, k_cur, v_cur, mbits, douf, Lf, deltaf,
                countsT, idxT, rowbase, cb,
                t_m=T_M, block_q=block_q, block_k=block_k,
                interpret=interpret,
            )
            dq_acc = dq_acc + dq_w.astype(jnp.float32)
            dk_acc = dk_acc + dk_w.astype(jnp.float32)
            dv_acc = dv_acc + dv_w.astype(jnp.float32)
            k_nxt = jax.lax.ppermute(k_cur, axis, fwd)
            v_nxt = jax.lax.ppermute(v_cur, axis, fwd)
            dk_nxt = jax.lax.ppermute(dk_acc, axis, fwd)
            dv_nxt = jax.lax.ppermute(dv_acc, axis, fwd)
            return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc), None

        z = jnp.zeros((N, H, TL, D), jnp.float32)
        (k_fin, v_fin, dk, dv, dq), _ = jax.lax.scan(
            step, (k_l, v_l, z, z, z), jnp.arange(n_shards)
        )
        return dq.astype(q_l.dtype), dk.astype(q_l.dtype), dv.astype(
            q_l.dtype
        )

    dq, dk, dv = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(seq_spec, seq_spec, seq_spec),
        check_vma=False,
    )(qp_, k, v, maskp, doup, Lp, deltap, rows_b)
    if inv is not None:
        dq = dq[:, :, inv]
    dmask = jnp.zeros_like(mask_m)
    return dq, dk, dv, dmask, dscaler


ring_fused_train_attention.defvjp(_ring_train_fwd, _ring_train_bwd)


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
