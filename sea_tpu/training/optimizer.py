"""Optimizer construction mirroring the reference 4-group AdamW
(`src/trainer/opt_trainer.py:317-390`):

  group                    lr              weight decay
  -----------------------  --------------  ------------
  base params              lr * low_scale  wd
  base bias/LayerNorm      lr * low_scale  0
  'perlin' params          lr * high_scale wd
  'perlin' bias/LayerNorm  lr * high_scale 0

plus global-norm gradient clipping at 1.0 (reference opt_trainer.py:425-432).
For the canonical OPT-perlin runs: lr=1e-5, wd=1e-2, high_scale=10,
low_scale=0.2 (`perlin_trainer.py:404-405`).

ZeRO-style optimizer-state sharding is expressed separately via sharding
annotations (see parallel/mesh.py), not a different optimizer.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_labels(params) -> Any:
    """Label each param leaf with one of the 4 groups."""

    def label(path, leaf):
        p = _path_str(path).lower()
        if "teacher" in p.split("/"):
            return "frozen"  # combined KD trees: teacher params never move
        high = "perlin" in p
        name = p.rsplit("/", 1)[-1]
        nodecay = name in ("bias", "scale")
        if high and nodecay:
            return "high_nd"
        if high:
            return "high"
        if nodecay:
            return "low_nd"
        return "low"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    lr: float = 1e-5,
    wd: float = 1e-2,
    lr_high_scale: float = 10.0,
    lr_low_scale: float = 0.2,
    clip_norm: float = 1.0,
    params=None,
    mu_dtype=None,
):
    """mu_dtype: AdamW first-moment storage dtype (optax mu_dtype) — part
    of the single-chip memory plan for 1.3b+ KD (TrainerConfig.param_dtype
    docs); None keeps the params dtype.

    lr may be a float or an optax schedule (callable step -> lr); the
    4-group scales compose with either."""

    def adamw(scale, decay):
        rate = (lambda s: lr(s) * scale) if callable(lr) else lr * scale
        return optax.adamw(rate, weight_decay=decay, mu_dtype=mu_dtype)

    tx = optax.multi_transform(
        {
            "low": adamw(lr_low_scale, wd),
            "low_nd": adamw(lr_low_scale, 0.0),
            "high": adamw(lr_high_scale, wd),
            "high_nd": adamw(lr_high_scale, 0.0),
            "frozen": optax.set_to_zero(),
        },
        param_labels,
    )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
