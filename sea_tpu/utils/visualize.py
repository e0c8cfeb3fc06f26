"""Attention-map visualization dumps.

Analogue of reference `src/main/visualize/` (`visualize/glue.py:36-50`):
dump teacher vs estimated vs partial attention maps for inspection. Maps
are collected through the profiler's temp-buffer registry (the same
mechanism the tests use) and written as .npz plus optional .png grids.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .profiler import get_bench


VIS_BUFFERS = [
    "estimated_attention_probs",
    "masked_estimated_attention_probs",
    "partial_attention_mask_before_interp",
    "attention_matrix",
    "attention_scores_dense",
    "partial_context_layer",
]


def collect_attention_maps() -> Dict[str, np.ndarray]:
    bench = get_bench()
    out = {}
    for name in VIS_BUFFERS:
        if name in bench.buffers:
            out[name] = np.asarray(bench.buffers[name][-1])
    return out


def dump_attention_maps(
    save_dir: str,
    tag: str = "maps",
    layer: int = -1,
    head: int = 0,
    batch: int = 0,
    render_png: bool = True,
) -> str:
    """Write collected maps to `{save_dir}/{tag}.npz` (+ .png grid when
    matplotlib is available). Returns the npz path."""
    os.makedirs(save_dir, exist_ok=True)
    maps = collect_attention_maps()
    path = os.path.join(save_dir, f"{tag}.npz")
    np.savez_compressed(path, **maps)

    if render_png and maps:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            picks = {
                k: v
                for k, v in maps.items()
                if v.ndim == 4 and v.shape[1] > head
            }
            if picks:
                fig, axes = plt.subplots(
                    1, len(picks), figsize=(4 * len(picks), 4)
                )
                if len(picks) == 1:
                    axes = [axes]
                for ax, (name, arr) in zip(axes, picks.items()):
                    img = arr[batch, head]
                    ax.imshow(img, aspect="auto", cmap="viridis")
                    ax.set_title(name, fontsize=8)
                fig.tight_layout()
                fig.savefig(os.path.join(save_dir, f"{tag}.png"), dpi=120)
                plt.close(fig)
        except Exception:
            pass
    return path
