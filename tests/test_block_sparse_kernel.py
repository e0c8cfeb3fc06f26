"""Fused block-sparse kernel vs dense oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.ops.kernels.block_sparse import (
    active_tile_lists,
    dense_reference,
    pack_alive_bits,
    pack_compressed_bits,
    sea_block_sparse_attention,
    tile_activity_lists,
)


def make_case(seed=0, N=1, H=2, T=256, D=64, T_M=32, density=0.3, causal=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(N, H, T, T_M)) < density).astype(np.float32))
    scaler = jnp.asarray(rng.uniform(0.1, 1.0, (N, H, T)).astype(np.float32))
    return q, k, v, mask, scaler


def test_pack_alive_bits_matches_resize_semantics():
    q, k, v, mask, _ = make_case(T=128, T_M=16)
    bits = pack_alive_bits(mask, 128, True)
    assert bits.shape == (1, 2, 128, 4)
    # unpack and compare against direct formula
    b = np.asarray(bits)
    unpacked = np.zeros((1, 2, 128, 128), bool)
    for w in range(4):
        for j in range(32):
            unpacked[..., w * 32 + j] = (b[..., w] >> j) & 1
    m = np.asarray(mask) > 0
    for r in range(128):
        wdt = r + 1
        for s in range(128):
            pix = int(np.floor((s + 0.5) / wdt * 16 - 1e-4))
            pix = min(max(pix, 0), 15)
            want = m[..., r, pix] & (s <= r)
            np.testing.assert_array_equal(unpacked[..., r, s], want, err_msg=f"{r},{s}")


def test_active_tiles():
    q, k, v, mask, _ = make_case(T=256, T_M=32, density=0.05)
    bits = pack_alive_bits(mask, 256, True)
    counts, idx = active_tile_lists(bits, 64, 64)
    assert counts.shape == (1, 2, 4)
    assert idx.shape == (1, 2, 4, 4)
    b = np.asarray(bits).reshape(1, 2, 4, 64, 4, 2)
    want_active = (b != 0).any(axis=(3, 5))
    np.testing.assert_array_equal(np.asarray(counts), want_active.sum(-1))
    # listed blocks ascending and actually active
    c = np.asarray(counts)
    ix = np.asarray(idx)
    for n in range(1):
        for h in range(2):
            for qb in range(4):
                lst = ix[n, h, qb, : c[n, h, qb]]
                assert list(lst) == sorted(set(lst))
                for bk in lst:
                    assert want_active[n, h, qb, bk]


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("density", [0.05, 0.4])
def test_kernel_matches_dense_oracle(causal, density):
    q, k, v, mask, scaler = make_case(T=256, T_M=32, density=density, causal=causal)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=causal, block_q=64, block_k=64,
        interpret=True,
    )
    want = dense_reference(q, k, v, mask, scaler, is_causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_compressed_tile_activity_is_superset():
    """The gather-free compressed-domain activity must cover every tile the
    exact (element-mask) activity finds, for both causal and bidirectional."""
    for causal in (True, False):
        for density in (0.02, 0.3):
            q, k, v, mask, _ = make_case(
                T=256, T_M=32, density=density, causal=causal, seed=7
            )
            bits = pack_alive_bits(mask, 256, causal)
            exact_counts, _ = active_tile_lists(bits, 64, 64)
            c2, idx2 = tile_activity_lists(mask, 256, causal, 64, 64)
            # exact active tiles must all appear in the conservative list
            tilebits = np.asarray(bits).reshape(1, 2, 4, 64, 4, 2)
            exact_active = (tilebits != 0).any(axis=(3, 5))
            cc = np.asarray(c2)
            ii = np.asarray(idx2)
            for n in range(1):
                for h in range(2):
                    for qb in range(4):
                        listed = set(ii[n, h, qb, : cc[n, h, qb]])
                        for bk in range(4):
                            if exact_active[n, h, qb, bk]:
                                assert bk in listed, (causal, density, qb, bk)


def test_pack_compressed_bits_roundtrip():
    rng = np.random.default_rng(3)
    mask = (rng.uniform(size=(1, 2, 8, 64)) < 0.5).astype(np.float32)
    bits = np.asarray(pack_compressed_bits(jnp.asarray(mask)))
    for b in range(64):
        got = (bits[..., b // 32] >> (b % 32)) & 1
        np.testing.assert_array_equal(got, mask[..., b].astype(np.uint32))


def test_kernel_padded_noncausal_matches_oracle():
    """Per-example token lengths (BERT padding) drive the pixel mapping."""
    q, k, v, mask, scaler = make_case(
        seed=9, N=2, T=256, T_M=32, density=0.3, causal=False
    )
    lengths = jnp.asarray([160, 256], jnp.int32)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=False, lengths=lengths,
        block_q=64, block_k=64, interpret=True,
    )
    want = dense_reference(
        q, k, v, mask, scaler, is_causal=False, lengths=lengths
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_empty_rows_zero():
    """Rows whose compressed mask is fully dead must output zeros."""
    q, k, v, mask, scaler = make_case(T=128, T_M=16, density=0.3)
    mask = mask.at[:, :, 64:80, :].set(0.0)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=True, block_q=64, block_k=64,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got)[:, :, 64:80], 0.0, atol=1e-6)


def test_kernel_oversample_matches_oracle():
    """k_oversample != 1 applies the train path's keep-predicate in-kernel."""
    q, k, v, mask, scaler = make_case(T=256, T_M=32, density=0.4)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=True, block_q=64, block_k=64,
        oversample=1.5, k_cfg=4.0, interpret=True,
    )
    want = dense_reference(
        q, k, v, mask, scaler, is_causal=True, oversample=1.5, k_cfg=4.0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_oversample_oracle_matches_train_resize():
    """dense_reference's keep-predicate == masks.resize_from_m_to_t with
    handle_oversample (the train-path source of truth), compared at the
    attention-output level in the same f32 arithmetic."""
    from sea_tpu.ops.masks import resize_from_m_to_t, fp_min_for

    rng = np.random.default_rng(5)
    N, H, T, T_M, K, OS = 1, 2, 128, 16, 4, 2.0
    mask_m = jnp.asarray((rng.uniform(size=(N, H, T, T_M)) < 0.4).astype(np.float32))
    fpmin = fp_min_for(jnp.float32)
    causal = jnp.where(jnp.tril(jnp.ones((T, T))) > 0, 0.0, fpmin)[None, None]
    causal = jnp.broadcast_to(causal, (N, 1, T, T))
    mask_additive = jnp.where(mask_m > 0, 0.0, fpmin)  # train-path encoding
    resized = resize_from_m_to_t(
        mask_additive, fpmin, attention_mask=causal, target_width=T,
        is_causal=True, k=K, oversampled=OS,
    )
    q = jnp.asarray(rng.standard_normal((N, H, T, 8)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((N, H, T, 8)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((N, H, T, 8)).astype(np.float32))
    # train-path attention with the resized additive mask
    scores = jnp.einsum("nhtd,nhsd->nhts", q, k)
    masked = scores + resized + causal
    probs = jax.nn.softmax(masked, -1)
    probs = jnp.where((resized < -1) | (causal < -1), 0.0, probs)
    denom = probs.sum(-1, keepdims=True)
    probs = jnp.where(denom > 0, probs / denom, 0.0)
    want_train = jnp.einsum("nhts,nhsd->nhtd", probs, v)
    got = dense_reference(
        q, k, v, mask_m, None, is_causal=True, oversample=OS, k_cfg=float(K)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_train), atol=2e-4
    )


def test_kernel_nonmultiple_lengths_padded():
    """T not a multiple of 128 pads transparently (causal + bidirectional)."""
    for causal in (True, False):
        q, k, v, mask, scaler = make_case(T=200, T_M=32, density=0.3, causal=causal)
        got = sea_block_sparse_attention(
            q, k, v, mask, scaler, is_causal=causal, interpret=True,
        )
        want = dense_reference(q, k, v, mask, scaler, is_causal=causal)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("impl", ["flat", "subtile", "flat_wr", "flat_fori"])
def test_kernel_impls_match_oracle(impl):
    q, k, v, mask, scaler = make_case(T=256, T_M=32, density=0.3)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=True, block_q=64, block_k=64,
        impl=impl, interpret=True,
    )
    want = dense_reference(q, k, v, mask, scaler, is_causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("impl", ["flat_wr", "flat_fori"])
def test_word_range_multiword_oracle(impl):
    """flat_wr/flat_fori at T_M=256 (8 packed mask words): the per-tile
    word-range machinery (_tile_word_ranges corner math + wlo|whi<<8
    packing, and flat_fori's dynamic-trip word loop) is degenerate at
    n_words=1, so the T_M=32 parametrized case above never exercises it —
    this canary does (T=512 keeps interpret mode fast)."""
    q, k, v, mask, scaler = make_case(T=512, T_M=256, density=0.25)
    got = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=True, block_q=128, block_k=128,
        impl=impl, interpret=True,
    )
    want = dense_reference(q, k, v, mask, scaler, is_causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_vjp_matches_dense_grads():
    """custom_vjp backward vs jax.grad of the dense oracle (q, k, v and the
    row scaler; mask cotangent is structurally zero — reference
    masked_mm.py:91-112 writes grads only at mask positions)."""
    from sea_tpu.ops.kernels.block_sparse import fused_sparse_attention

    q, k, v, mask, scaler = make_case(T=256, T_M=32, density=0.3)
    tgt = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, 2, 256, 64)).astype(np.float32)
    )

    def loss_fused(q, k, v, scaler):
        o = fused_sparse_attention(
            q, k, v, mask, scaler, None, 64, 64, True
        )
        return jnp.sum((o - tgt) ** 2)

    def loss_dense(q, k, v, scaler):
        o = dense_reference(q, k, v, mask, scaler, is_causal=True)
        return jnp.sum((o - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, scaler)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, scaler)
    for a, b, name in zip(gf, gd, ["dq", "dk", "dv", "dscaler"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3, err_msg=name
        )


def test_fused_vjp_forward_matches_kernel():
    from sea_tpu.ops.kernels.block_sparse import fused_sparse_attention

    q, k, v, mask, scaler = make_case(T=256, T_M=32, density=0.3)
    o1 = fused_sparse_attention(q, k, v, mask, scaler, None, 64, 64, True)
    o2 = sea_block_sparse_attention(
        q, k, v, mask, scaler, is_causal=True, block_q=64, block_k=64,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)


def test_tile_word_ranges_exact_bit_safety():
    """Bit 16 of the packed range ('the range is exact — no clipping')
    gates the flat_wr span-1/span-2 fast paths. It must be UNSET whenever
    clipping folded an out-of-range word (causal-edge tiles whose pixels
    cross T_M) onto the range, and whenever it is set together with a
    1- or 2-word span, EVERY pixel of the tile must land inside
    [wlo, whi] — the broadcast/pair-select must never widen semantics."""
    from sea_tpu.ops.kernels.block_sparse import _tile_word_ranges

    T, T_M, BQ, BK = 4096, 256, 512, 512
    n_words = T_M // 32
    NQ = T // BQ
    NKB = T // BK
    # full activity list: every (q-block, k-block) tile
    idx = jnp.broadcast_to(
        jnp.arange(NKB, dtype=jnp.int32), (1, 1, NQ, NKB)
    )
    counts = jnp.full((1, 1, NQ), NKB, jnp.int32)
    wr = np.asarray(_tile_word_ranges(counts, idx, T_M, n_words, BQ, BK))
    wlo, whi, exact = wr & 0xFF, (wr >> 8) & 0xFF, (wr >> 16) & 1

    n_fast = 0
    # oracle: the kernel's exact per-pixel expression over the whole tile
    rows = np.arange(T, dtype=np.float32) + 1.0
    for qi in range(NQ):
        w = rows[qi * BQ : (qi + 1) * BQ][:, None]
        a = (1.0 / w) * T_M
        for kj in range(NKB):
            cols = np.arange(kj * BK, (kj + 1) * BK, dtype=np.float32)[None]
            pix = (cols * a + (a * 0.5 - 1e-4)).astype(np.int32)
            words = np.unique(pix >> 5)
            lo_, hi_, e_ = (
                wlo[0, 0, qi, kj], whi[0, 0, qi, kj], exact[0, 0, qi, kj]
            )
            # range must cover every in-bounds word
            inb = words[(words >= 0) & (words < n_words)]
            if inb.size:
                assert inb.min() >= lo_ and inb.max() <= hi_, (qi, kj)
            if e_ and hi_ - lo_ <= 1:
                # fast path fires: every pixel (incl. would-be
                # out-of-range ones) must land inside [wlo, whi]
                assert words.min() >= lo_ and words.max() <= hi_, (
                    qi, kj, words, lo_, hi_,
                )
                n_fast += 1
    # the span-2 fast path must actually fire (deep tiles span 32-34 px)
    assert n_fast > 0
