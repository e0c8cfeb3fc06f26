"""Uniform flat-CSR build + sparse linear algebra vs numpy loop oracles
(SURVEY §7 stage-2 gate; semantics pinned in SURVEY Appendix A)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from sea_tpu.ops import (
    UniformCsr,
    flat_csr_elmul,
    flat_csr_masked_bmm,
    flat_csr_sdbmm,
    flat_csr_softmax,
    flat_csr_to_dense,
    resize_from_m_to_t_csr,
)

FP16_MIN_HALF = float(np.finfo(np.float16).min) / 2


def rnd_half_away(x):
    return np.floor(x + 0.5)


def np_expand_oracle(mask, k, T_SRC, is_causal):
    """Loop oracle of the CSR expansion (reference scan_col semantics,
    causal_resize_m_to_t.py:631-762): returns per-row python lists of flat
    columns in scan order."""
    N, H, T_DST, T_M = mask.shape
    rows = []
    for n in range(N):
        batch_rows = []
        for r in range(T_DST):
            w = (r + 1) if is_causal else T_SRC
            s = w / T_M
            cols = []
            for h in range(H):
                for b in range(T_M):
                    if mask[n, h, r, b] <= 0:
                        continue
                    vs = int(rnd_half_away(b * s))
                    ve = int(rnd_half_away((b + 1) * s))
                    clen = min(ve - vs, k)
                    for j in range(clen):
                        col = ve - 1 - int(j * (ve - vs) / clen)
                        cols.append(h * T_SRC + col)
            batch_rows.append(cols)
        rows.append(batch_rows)
    return rows


@pytest.mark.parametrize("is_causal", [True, False])
def test_expand_matches_oracle(is_causal):
    rng = np.random.default_rng(0)
    N, H, T_DST, T_M, k = 2, 3, 48, 16, 4
    T_SRC = T_DST
    mask = (rng.uniform(size=(N, H, T_DST, T_M)) < 0.3).astype(np.float32)
    csr = resize_from_m_to_t_csr(jnp.asarray(mask), k, T_SRC, is_causal=is_causal)
    want = np_expand_oracle(mask, k, T_SRC, is_causal)
    cols = np.asarray(csr.cols)
    for n in range(N):
        for r in range(T_DST):
            got_row = [c for c in cols[n, r] if c >= 0]
            assert got_row == want[n][r], (n, r, got_row, want[n][r])


def test_expand_head_major_contiguous():
    """A.1 invariant: all of head h's columns precede head h+1's in each row."""
    rng = np.random.default_rng(1)
    N, H, T_DST, T_M, k = 1, 4, 32, 8, 3
    mask = (rng.uniform(size=(N, H, T_DST, T_M)) < 0.5).astype(np.float32)
    csr = resize_from_m_to_t_csr(jnp.asarray(mask), k, T_DST, is_causal=True)
    cols = np.asarray(csr.cols)
    heads = np.where(cols >= 0, cols // T_DST, 999)
    for n in range(N):
        for r in range(T_DST):
            h_seq = [h for h in heads[n, r] if h != 999]
            assert h_seq == sorted(h_seq)


def test_expand_causal_no_future():
    rng = np.random.default_rng(2)
    N, H, T_DST, T_M, k = 1, 2, 40, 8, 8
    mask = np.ones((N, H, T_DST, T_M), dtype=np.float32)
    csr = resize_from_m_to_t_csr(jnp.asarray(mask), k, T_DST, is_causal=True)
    cols = np.asarray(csr.cols)
    src = np.where(cols >= 0, cols % T_DST, -1)
    for r in range(T_DST):
        assert src[0, r].max() <= r, r


def test_nnz_within_static_budget():
    """With a realistic top-k-limited mask (budget = round(H*k*T_M/w) alive
    pixels per row, as produced by causal_topk_masking), the static budget
    must hold with no truncation."""
    rng = np.random.default_rng(7)
    N, H, T_DST, T_M, k = 2, 4, 128, 16, 4
    # build a mask respecting the per-row alive-pixel budget
    mask = np.zeros((N, H, T_DST, T_M), dtype=np.float32)
    for n in range(N):
        for r in range(T_DST):
            budget = min(max(round(H * k * T_M / (r + 1)), 1), H * T_M)
            flat = rng.choice(H * T_M, size=budget, replace=False)
            for f in flat:
                mask[n, f // T_M, r, f % T_M] = 1.0
    csr = resize_from_m_to_t_csr(jnp.asarray(mask), k, T_DST, is_causal=True)
    nnz = np.asarray(csr.nnz_per_row)
    # no truncation: every row matches the oracle exactly
    want = np_expand_oracle(mask, k, T_DST, True)
    for n in range(N):
        for r in range(T_DST):
            assert nnz[n, r] == len(want[n][r]), (n, r)


class TestSparseOps:
    def setup_method(self):
        rng = np.random.default_rng(3)
        N, H, T, T_M, D, k = 2, 3, 32, 8, 16, 4
        self.dims = (N, H, T, T_M, D, k)
        mask = (rng.uniform(size=(N, H, T, T_M)) < 0.4).astype(np.float32)
        self.csr = resize_from_m_to_t_csr(jnp.asarray(mask), k, T, is_causal=True)
        self.q = rng.standard_normal((N, H, T, D)).astype(np.float32)
        self.k_ = rng.standard_normal((N, H, T, D)).astype(np.float32)
        self.v = rng.standard_normal((N, H, T, D)).astype(np.float32)
        self.dense_mask = np.asarray(flat_csr_to_dense(self.csr)) > 0

    def test_masked_bmm(self):
        out = flat_csr_masked_bmm(jnp.asarray(self.q), jnp.asarray(self.k_), self.csr)
        dense = np.asarray(flat_csr_to_dense(out))
        want = np.einsum("nhtd,nhsd->nhts", self.q, self.k_) * self.dense_mask
        np.testing.assert_allclose(dense, want, atol=1e-5)

    def test_softmax(self):
        scored = flat_csr_masked_bmm(
            jnp.asarray(self.q), jnp.asarray(self.k_), self.csr
        )
        probs = flat_csr_softmax(scored)
        dense = np.asarray(flat_csr_to_dense(probs))
        # dense oracle: softmax over masked entries per (n,h,row)
        scores = np.einsum("nhtd,nhsd->nhts", self.q, self.k_)
        masked = np.where(self.dense_mask, scores, -np.inf)
        m = masked.max(-1, keepdims=True)
        m = np.where(np.isfinite(m), m, 0.0)
        e = np.where(self.dense_mask, np.exp(masked - m), 0.0)
        want = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
        np.testing.assert_allclose(dense, want, atol=1e-5)
        # rows with nonzero mask sum to 1
        sums = dense.sum(-1)
        has = self.dense_mask.any(-1)
        np.testing.assert_allclose(sums[has], 1.0, atol=1e-5)

    def test_elmul(self):
        N, H, T, T_M, D, k = self.dims
        scaler = np.random.default_rng(5).uniform(size=(N, H, T)).astype(np.float32)
        out = flat_csr_elmul(self.csr, jnp.asarray(scaler))
        dense = np.asarray(flat_csr_to_dense(out))
        want = self.dense_mask * scaler[..., None]
        np.testing.assert_allclose(dense, want, atol=1e-6)

    def test_sdbmm(self):
        scored = flat_csr_masked_bmm(
            jnp.asarray(self.q), jnp.asarray(self.k_), self.csr
        )
        probs = flat_csr_softmax(scored)
        out = np.asarray(flat_csr_sdbmm(probs, jnp.asarray(self.v)))
        dense_probs = np.asarray(flat_csr_to_dense(probs))
        want = np.einsum("nhts,nhsd->nhtd", dense_probs, self.v)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_end_to_end_sparse_attention_vs_dense(self):
        """Full sparse pipeline == dense masked attention (the core
        train-vs-benchmark consistency property, reference
        test_perlin_opt_consist.py)."""
        scored = flat_csr_masked_bmm(
            jnp.asarray(self.q), jnp.asarray(self.k_), self.csr
        )
        probs = flat_csr_softmax(scored)
        ctx = np.asarray(flat_csr_sdbmm(probs, jnp.asarray(self.v)))

        scores = np.einsum("nhtd,nhsd->nhts", self.q, self.k_)
        masked = np.where(self.dense_mask, scores, FP16_MIN_HALF)
        masked = masked - masked.max(-1, keepdims=True)
        e = np.exp(masked) * self.dense_mask
        p = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
        want = np.einsum("nhts,nhsd->nhtd", p, self.v)
        np.testing.assert_allclose(ctx, want, atol=1e-4)
