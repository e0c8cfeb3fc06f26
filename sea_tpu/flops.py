"""Analytic FLOPs model of SEA vs dense attention.

Reimplements the reference cost model (`src/main/plot/calculate_flops.py`):
per-layer forward FLOPs as a function of (H, T, T_M, d, k, nb_features),
used for the paper-style efficiency plots and sanity-checking measured
throughput against speed-of-light.

Run: python -m sea_tpu.flops [--t 8192]
"""

from __future__ import annotations

import argparse
import json
import math
from typing import Dict


def dense_attention_flops(h: int, t: int, d: int) -> float:
    """QK^T + softmax(~5 ops/elem) + PV."""
    return h * (2 * t * t * d + 5 * t * t + 2 * t * t * d)


def sea_attention_flops(
    h: int,
    t: int,
    d: int,
    t_m: int = 256,
    k: int = 64,
    nb_features: int = 33,
) -> Dict[str, float]:
    m = nb_features
    dv = 2 * d  # [identity ‖ v]
    # FAVOR+: feature maps + prefix linear attention
    performer = h * (2 * t * d * m * 2 + 2 * t * m * dv + 2 * t * m * dv)
    # predictor: enc (3d->2d), dec_row (2d -> T_M/4*splits), CNN convs
    enc = h * t * 2 * (3 * d) * (2 * d)
    splits = 2
    dec_row = h * t * 2 * (2 * d) * (t_m // 4 * splits)
    ch = splits * h
    cnn = 2 * t * (t_m // 4) * (2 * ch * ch * 9) + t * t_m * 2 * ch * h
    # top-k (sort ~ n log n compares over H*T_M per row)
    topk = t * h * t_m * math.log2(max(h * t_m, 2)) * 2
    # sparse attention: nnz ~ H*(k + ceil(T/T_M)) per row, SDDMM + PV
    nnz = h * t * (k + math.ceil(t / t_m))
    sparse = 2 * nnz * d + 5 * nnz + 2 * nnz * d
    total = performer + enc + dec_row + cnn + topk + sparse
    return {
        "performer": performer,
        "predictor_enc": enc,
        "predictor_dec_row": dec_row,
        "predictor_cnn": cnn,
        "topk": topk,
        "sparse_attention": sparse,
        "total": total,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--t", type=int, default=8192)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--t-m", type=int, default=256)
    p.add_argument("--k", type=int, default=64)
    args = p.parse_args()
    sea = sea_attention_flops(args.heads, args.t, args.d, args.t_m, args.k)
    dense = dense_attention_flops(args.heads, args.t, args.d)
    print(json.dumps({
        "dense_flops": dense,
        "sea": sea,
        "sea_vs_dense": sea["total"] / dense,
    }, indent=2))


if __name__ == "__main__":
    main()
