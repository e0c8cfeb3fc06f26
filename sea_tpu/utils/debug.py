"""Numerical tripwires (reference `utils/__init__.py:132-147` raise_if_nan:
NaN/Inf check that dumps the offending tensor to disk).

On TPU, eager per-op checks would force syncs; instead `checkify_nan` wraps
a jitted function with `jax.experimental.checkify` so NaN checks compile
into the graph, and `assert_all_finite` is the eager/test-time variant that
dumps to `saves/debug/` like the reference.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def assert_all_finite(tree: Any, name: str = "tensor", dump_dir: str = "./saves/debug"):
    """Eager check; dumps the offending array and raises (reference
    raise_if_nan semantics)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            os.makedirs(dump_dir, exist_ok=True)
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            f = os.path.join(dump_dir, f"nan_{name.replace('/', '_')}.npy")
            np.save(f, arr)
            raise FloatingPointError(
                f"non-finite values in {name}:{p} (dumped to {f})"
            )


def checkify_nan(fn):
    """Wrap a function so NaN production raises a checkify error when the
    returned (err, out) is consumed with err.throw()."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)
