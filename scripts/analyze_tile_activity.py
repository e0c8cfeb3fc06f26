"""Offline (CPU/numpy) analysis driving the round-2 kernel redesign.

1. Parity: is pix = int32(s*a + b) with a = T_M*(1/w), b = 0.5*a - 1e-4
   bit-identical to the reference floor((s+0.5)/w*T_M - 1e-4) for every
   (row, col) at canonical sizes?  (fma form = 1 VPU pass vs divide)
2. Tile activity: fraction of (block_q x block_k) tiles with >=1 alive
   element, and the share of causal *elements* they cover, for
   (a) the bench's i.i.d. random per-row mask and (b) a row-correlated
   mask in the shape of real predictor output (smooth scores -> top-k).
"""

import numpy as np


def pixel_ref(s, w, t_m):
    return np.floor((s + 0.5) / w * t_m - 1e-4).astype(np.int64)


def pixel_fma(s, w, t_m):
    a = (np.float32(t_m) * (np.float32(1.0) / w.astype(np.float32))).astype(np.float32)
    b = (np.float32(0.5) * a - np.float32(1e-4)).astype(np.float32)
    u = (s.astype(np.float32) * a + b).astype(np.float32)
    return u.astype(np.int64)


def parity_check(T, t_m):
    bad = 0
    worst = None
    for r in range(T):
        w = np.float32(r + 1)
        s = np.arange(r + 1, dtype=np.float32)  # causal columns only
        p0 = pixel_ref(s, w, t_m)
        p1 = pixel_fma(s, np.full_like(s, w), t_m)
        neq = p0 != p1
        if neq.any():
            bad += int(neq.sum())
            if worst is None:
                i = int(np.argmax(neq))
                worst = (r, i, int(p0[i]), int(p1[i]))
    print(f"parity T={T} T_M={t_m}: mismatches={bad} worst={worst}")
    return bad


def host_topk_mask_random(N, H, T, T_M, K, seed=0):
    rng = np.random.default_rng(seed)
    flat = np.zeros((N, T, H * T_M), np.float32)
    for r in range(T):
        budget = min(max(round(H * K * T_M / (r + 1)), 1), H * T_M)
        for n in range(N):
            flat[n, r, rng.choice(H * T_M, size=budget, replace=False)] = 1.0
    return np.transpose(flat.reshape(N, T, H, T_M), (0, 2, 1, 3)).copy()


def host_topk_mask_predictor_like(N, H, T, T_M, K, seed=0, corr_len=256):
    """Row-correlated scores (smooth AR(1) along rows, like a CNN predictor
    over smoothly-varying performer features) -> same grouped top-k budget."""
    rng = np.random.default_rng(seed)
    scores = np.zeros((N, T, H * T_M), np.float32)
    x = rng.standard_normal((N, H * T_M)).astype(np.float32)
    rho = np.exp(-1.0 / corr_len)
    nse = np.sqrt(1 - rho * rho)
    for r in range(T):
        x = rho * x + nse * rng.standard_normal((N, H * T_M)).astype(np.float32)
        scores[:, r] = x
    flat = np.zeros_like(scores)
    for r in range(T):
        budget = min(max(round(H * K * T_M / (r + 1)), 1), H * T_M)
        idx = np.argpartition(-scores[:, r], budget - 1, axis=-1)[:, :budget]
        for n in range(N):
            flat[n, r, idx[n]] = 1.0
    return np.transpose(flat.reshape(N, T, H, T_M), (0, 2, 1, 3)).copy()


def element_mask(mask_m, T):
    """(N,H,T,T_M) -> (N,H,T,T) causal alive (dense-resize semantics)."""
    N, H, Td, T_M = mask_m.shape
    alive = np.zeros((N, H, Td, T), bool)
    s = np.arange(T, dtype=np.float32)
    for r in range(Td):
        w = np.float32(r + 1)
        pix = np.clip(pixel_ref(s[: r + 1], w, T_M), 0, T_M - 1)
        alive[:, :, r, : r + 1] = mask_m[:, :, r, pix] > 0
    return alive


def tile_stats(alive, bq, bk):
    N, H, T, S = alive.shape
    nq, nk = T // bq, S // bk
    t = alive.reshape(N, H, nq, bq, nk, bk)
    act = t.any(axis=(3, 5))  # (N,H,nq,nk)
    causal_tiles = 0
    for i in range(nq):
        for j in range(nk):
            if j * bk <= (i + 1) * bq - 1:  # tile intersects causal
                causal_tiles += 1
    causal_tiles *= N * H
    frac_tiles = act.sum() / causal_tiles
    # share of causal elements covered by active tiles
    causal_elems = N * H * T * (T + 1) / 2
    covered = act.sum() * bq * bk  # upper bound incl. above-diagonal waste
    return frac_tiles, act.sum() / (N * H), covered / causal_elems


def main():
    t_m = 256
    for T in (2048, 4096, 8192):
        parity_check(T, t_m)

    N, H, T, T_M, K = 1, 12, 4096, 256, 64
    for name, mk in (
        ("random", host_topk_mask_random),
        ("predictor-like c64", lambda *a: host_topk_mask_predictor_like(*a, corr_len=64)),
        ("predictor-like c256", lambda *a: host_topk_mask_predictor_like(*a, corr_len=256)),
    ):
        m = mk(N, H, T, T_M, K)
        alive = element_mask(m, T)
        nnz = alive.sum()
        print(f"--- mask={name} nnz={nnz} ({nnz/(N*H*T*T/2):.3%} of causal)")
        for bq, bk in ((512, 512), (512, 128), (256, 128), (128, 128), (256, 256)):
            ft, na, cov = tile_stats(alive, bq, bk)
            print(
                f"  bq={bq:4d} bk={bk:4d}: active/causal tiles={ft:.2%} "
                f"tiles/head={na:.0f} mxu+vpu work vs full-causal={cov:.2%}"
            )


if __name__ == "__main__":
    main()
