"""Property tests for resize_from_m_to_t and grouped top-k masking against
independent numpy loop oracles (SURVEY §7 stage-1 gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.ops import (
    resize_from_m_to_t,
    topk_mask,
    per_item_top_k,
    causal_topk_masking,
    fp_min_for,
)

FP_MIN32 = float(np.finfo(np.float32).min) / 2


def np_resize_oracle(x, fill, add_mask, is_causal, T2, k=None, oversampled=None):
    """Loop oracle for the padding-aware nearest resize
    (semantics of reference resize_m_to_t.py:36-71)."""
    N, H, T1, T_M = x.shape
    if not is_causal:
        add_mask = np.broadcast_to(add_mask, (N, 1, T1, T2))
    out = np.full((N, H, T1, T2), fill, dtype=np.float64)
    for n in range(N):
        for t in range(T1):
            row_mask = (add_mask[n, 0, t] > -1).astype(np.float64)
            cs = np.cumsum(row_mask)
            L = cs[-1]
            for s in range(T2):
                if row_mask[s] < 1:
                    continue
                idx = int(np.floor((cs[s] - 1 + 0.5) / L * T_M - 1e-4))
                idx = min(max(idx, 0), T_M)
                if idx == T_M:
                    continue
                for h in range(H):
                    out[n, h, t, s] = x[n, h, t, idx]
            if oversampled is not None and oversampled != 1.0:
                ps = max(round(L / oversampled), 1)
                oys = min(max(L, round(k)), round(k * oversampled)) / k
                for s in range(T2):
                    frac = (s + 1) / L * ps
                    keep = abs(frac - np.floor(frac + 0.5)) <= (1 / oys) * 0.5 + 1e-4
                    if not keep:
                        out[n, :, t, s] = fill
    return out


def make_padded_mask(rng, N, T, min_len):
    m = np.full((N, 1, 1, T), FP_MIN32, dtype=np.float32)
    lens = []
    for i in range(N):
        L = rng.integers(min_len, T + 1)
        m[i, :, :, :L] = 0.0
        lens.append(L)
    return m, np.array(lens)


def make_causal_mask(N, T):
    m = np.where(np.tril(np.ones((T, T))) > 0, 0.0, FP_MIN32).astype(np.float32)
    return np.broadcast_to(m[None, None], (N, 1, T, T)).copy()


class TestResize:
    def test_noncausal_padded(self):
        rng = np.random.default_rng(0)
        N, H, T, T_M = 3, 2, 37, 16
        x = rng.standard_normal((N, H, T, T_M)).astype(np.float32)
        mask, _ = make_padded_mask(rng, N, T, 5)
        got = resize_from_m_to_t(
            jnp.asarray(x), 7.0, jnp.asarray(mask), target_width=T, is_causal=False
        )
        want = np_resize_oracle(x, 7.0, mask, False, T)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_causal(self):
        rng = np.random.default_rng(1)
        N, H, T, T_M = 2, 3, 41, 8
        x = rng.standard_normal((N, H, T, T_M)).astype(np.float32)
        mask = make_causal_mask(N, T)
        got = resize_from_m_to_t(
            jnp.asarray(x), FP_MIN32, jnp.asarray(mask), target_width=T, is_causal=True
        )
        want = np_resize_oracle(x, FP_MIN32, mask, True, T)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_causal_row_widths(self):
        """Causal row i must only read compressed pixels mapped from [0, i]."""
        N, H, T, T_M = 1, 1, 16, 4
        x = np.arange(T * T_M, dtype=np.float32).reshape(1, 1, T, T_M)
        mask = make_causal_mask(N, T)
        got = np.asarray(
            resize_from_m_to_t(jnp.asarray(x), -1.0, jnp.asarray(mask), T, True)
        )
        for i in range(T):
            assert np.all(got[0, 0, i, i + 1 :] == -1.0), f"row {i} leaks future"
            # first i+1 entries come from the compressed row, stretched
            assert np.all(got[0, 0, i, : i + 1] >= x[0, 0, i, 0])

    def test_causal_padded_takes_gather_branch(self):
        """Causal + per-item padding: the static-map lax.cond must detect
        the padded mask at runtime and fall back to the gather; output
        still matches the oracle exactly."""
        rng = np.random.default_rng(7)
        N, H, T, T_M = 3, 2, 32, 8
        x = rng.standard_normal((N, H, T, T_M)).astype(np.float32)
        mask = make_causal_mask(N, T)
        # pad: item i attends only to the first L_i columns
        for i, L in enumerate([32, 20, 9]):
            mask[i, :, :, L:] = FP_MIN32
        got = resize_from_m_to_t(
            jnp.asarray(x), -2.0, jnp.asarray(mask), target_width=T, is_causal=True
        )
        want = np_resize_oracle(x, -2.0, mask, True, T)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_causal_jitter_unchanged_by_fast_path(self):
        """With rng, the 10%-probability jitter branch must behave exactly
        as the pre-fast-path implementation: compare against an inline
        replica of the original (always-gather) path across keys that DO
        and do NOT fire the jitter gate."""
        rng = np.random.default_rng(3)
        N, H, T, T_M = 2, 2, 64, 8
        x = jnp.asarray(rng.standard_normal((N, H, T, T_M)), jnp.float32)
        mask = jnp.asarray(make_causal_mask(N, T))

        def legacy(x, key):  # the original gather-only causal path
            m = (mask > -1).astype(jnp.float32)
            mask_cs = jnp.cumsum(m, axis=-1)
            token_length = mask_cs[..., -1:]
            jitter_rng, gate_rng = jax.random.split(key)
            noise = jax.random.uniform(jitter_rng, mask_cs.shape) * 1.5 - 0.75
            hi = jnp.argmax(mask_cs, axis=-1, keepdims=True).astype(mask_cs.dtype)
            jittered = jnp.clip(mask_cs + noise, 1.0, hi)
            apply = jax.random.uniform(gate_rng, ()) < 0.1
            mask_cs = jnp.where(apply, jittered, mask_cs)
            tix = (
                jnp.floor((mask_cs - 1 + 0.5) / token_length * T_M - 1e-4).astype(jnp.int32)
                + ((1 - m) * T_M).astype(jnp.int32)
            )
            tix = jnp.clip(tix, 0, T_M)
            grid = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)), constant_values=0.0)
            tix = jnp.broadcast_to(tix, (N, H, T, T))
            return jnp.take_along_axis(grid, tix, axis=-1), apply

        fired = set()
        for seed in range(24):
            key = jax.random.key(seed)
            got = resize_from_m_to_t(
                x, 0.0, mask, target_width=T, is_causal=True, rng=key
            )
            want, applied = legacy(x, key)
            fired.add(bool(applied))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert fired == {True, False}, "keys must cover both gate outcomes"

    def test_causal_fast_path_gradients(self):
        """d(resize)/dx through the matmul branch equals the gather
        branch's gradient. Not bit-exact: each input pixel feeds MANY
        output columns, and the matmul transpose (ct @ sel^T) sums those
        cotangents in a different order than the gather's scatter-add —
        same terms, fp addition order differs."""
        rng = np.random.default_rng(5)
        N, H, T, T_M = 1, 2, 48, 8
        x = jnp.asarray(rng.standard_normal((N, H, T, T_M)), jnp.float32)
        mask_np = make_causal_mask(N, T)
        mask = jnp.asarray(mask_np)
        ct = jnp.asarray(rng.standard_normal((N, H, T, T)), jnp.float32)

        def fwd(x, m):
            return jnp.vdot(
                resize_from_m_to_t(x, 0.0, m, target_width=T, is_causal=True), ct
            )

        g_fast = jax.grad(fwd)(x, mask)
        # force the gather branch via one padded column on item 0
        mask_pad = mask_np.copy()
        mask_pad[0, :, :, -1] = FP_MIN32
        g_slow_full = jax.grad(fwd)(x, jnp.asarray(mask_pad))
        # rows untouched by the padding must agree (same terms, fp order)
        np.testing.assert_allclose(
            np.asarray(g_fast[0, :, : T - 1]),
            np.asarray(g_slow_full[0, :, : T - 1]),
            rtol=1e-5, atol=1e-6,
        )

    def test_causal_fast_path_bf16(self):
        """bf16 inputs through the matmul branch: still exact vs the
        gather (one nonzero per selector column — no accumulation)."""
        rng = np.random.default_rng(9)
        N, H, T, T_M = 2, 2, 32, 8
        x = jnp.asarray(rng.standard_normal((N, H, T, T_M)), jnp.bfloat16)
        mask = jnp.asarray(make_causal_mask(N, T))
        got = resize_from_m_to_t(x, 0.0, mask, target_width=T, is_causal=True)
        # oracle: direct numpy gather on the bf16 values
        want = np_resize_oracle(
            np.asarray(x, np.float32), 0.0, np.asarray(mask), True, T
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(got, np.float32), want)

    def test_oversample_undersampling(self):
        rng = np.random.default_rng(2)
        N, H, T, T_M = 2, 2, 64, 16
        k, os_ = 4, 2.0
        x = rng.standard_normal((N, H, T, T_M)).astype(np.float32)
        mask = make_causal_mask(N, T)
        got = resize_from_m_to_t(
            jnp.asarray(x), 0.0, jnp.asarray(mask), T, True, k=k, oversampled=os_
        )
        want = np_resize_oracle(x, 0.0, mask, True, T, k=k, oversampled=os_)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


class TestTopkMask:
    def _oracle(self, probs, budget, benchmarking):
        """Rank oracle over the flattened (H*T_M) axis, causal_batch layout."""
        N, H, T, T_M = probs.shape
        t = probs.transpose(0, 2, 1, 3).reshape(N, T, H * T_M)
        out = np.zeros_like(t)
        for n in range(N):
            for r in range(T):
                order = np.argsort(-t[n, r], kind="stable")
                ranks = np.empty_like(order)
                ranks[order] = np.arange(len(order))
                alive = ranks < budget[n, r, 0]
                out[n, r] = alive if benchmarking else (~alive) * FP_MIN32
        return out.reshape(N, T, H, T_M).transpose(0, 2, 1, 3)

    @pytest.mark.parametrize("benchmarking", [False, True])
    def test_causal_batch(self, benchmarking):
        rng = np.random.default_rng(3)
        N, H, T, T_M = 2, 4, 32, 8
        k = 3
        probs = rng.uniform(size=(N, H, T, T_M)).astype(np.float32)
        ctl = np.arange(1, T + 1, dtype=np.float32).reshape(1, T, 1)
        ctl = np.broadcast_to(ctl, (N, T, 1))
        budget = np.maximum(np.floor(H * (k * T_M / ctl) + 0.5), 1.0)
        dst_alive = jnp.ones((N, 1, T, 1), dtype=bool)
        got = topk_mask(
            jnp.asarray(probs),
            dst_alive,
            jnp.asarray(budget),
            "causal_batch",
            benchmarking,
            FP_MIN32,
        )
        want = self._oracle(probs, budget, benchmarking)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_budget_realized(self):
        """Realized k should equal the configured budget when budget < width
        (reference test_perlin_avg_k.py property)."""
        rng = np.random.default_rng(4)
        N, H, T, T_M = 1, 4, 64, 32
        k = 8
        probs = rng.uniform(size=(N, H, T, T_M)).astype(np.float32)
        mask = np.zeros((N, 1, T, 1), dtype=np.float32)
        got = causal_topk_masking(
            jnp.asarray(probs),
            k=k,
            attention_mask=jnp.asarray(mask[..., :1]),
            dst_attention_mask=jnp.asarray(mask),
            causal_attention_mask=jnp.asarray(make_causal_mask(N, T)),
            benchmarking=True,
        )
        got = np.asarray(got)
        per_row = got.sum(axis=(1, 3))  # (N, T)
        for r in range(T):
            budget = max(round(H * k * T_M / (r + 1)), 1)
            assert per_row[0, r] == min(budget, H * T_M), r

    def test_per_item_top_k_shapes(self):
        tl = jnp.full((2, 1), 10.0)
        out = per_item_top_k(4, 1.0, "causal_batch", 8, 16, tl, causal=False)
        assert out.shape == (2, 1, 1)
        ctl = jnp.ones((2, 5, 1))
        out = per_item_top_k(4, 1.0, "causal_batch", 8, 16, None, ctl, causal=True)
        assert out.shape == (2, 5, 1)
