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
