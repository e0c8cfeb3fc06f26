"""Long-context extension by parameter interpolation.

Analogue of the reference `__CONTEXT` eval hack (`perlin_trainer.py:533-566`
resize_pos_embed): stretch the OPT learned positional embeddings and every
layer's `v_eye_learned_causal` table to a longer window by linear
interpolation, then evaluate with a strided loader (`__STRIDE`). Combined
with `SeaConfig.dynamic_k` / `query_skips` these are the knobs the
reference's `exp_long_context.py` sweeps.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _interp_rows(table: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear interpolation along axis 0 of (L, E) to (new_len, E)."""
    old_len = table.shape[0]
    if old_len == new_len:
        return table
    pos = jnp.linspace(0.0, old_len - 1, new_len)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, old_len - 1)
    hi = jnp.clip(lo + 1, 0, old_len - 1)
    frac = (pos - lo)[:, None]
    return table[lo] * (1 - frac) + table[hi] * frac


def extend_opt_context(params: Dict[str, Any], new_max_pos: int) -> Dict[str, Any]:
    """Return params with positional tables stretched to `new_max_pos`.

    * `model/embed_positions/embedding` (max_pos+2, E): the two OPT offset
      rows are kept; the rest interpolates (reference interpolates the
      whole positional matrix the same way);
    * every `.../perlin/v_eye_learned_causal` (1,1,max_pos,D) interpolates
      along the time axis.
    """

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1] if path else ""
        if name == "embedding" and len(path) >= 2 and path[-2] == "embed_positions":
            head, body = tree[:2], tree[2:]
            return jnp.concatenate([head, _interp_rows(body, new_max_pos)], axis=0)
        if name == "v_eye_learned_causal":
            table = tree[0, 0]  # (max_pos, D)
            return _interp_rows(table, new_max_pos)[None, None]
        return tree

    return walk(params)
