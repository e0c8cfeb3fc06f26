"""ToMe token merging (reference `perlin_bert.py:826-970`,
TokenMergingStart/End): sort tokens by attention significance, merge the
bottom (1 - preserve) fraction into their most-similar kept neighbours
before the FFN, unmerge after. All counts are static functions of (T,
ratios), so the implementation is jit-clean.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TomeState(NamedTuple):
    sort_idx: jnp.ndarray  # (N, T-1) significance order of non-CLS tokens
    node_idx: jnp.ndarray  # (N, N_SRC) merge target within the dst set
    n_preserve: int
    n_src: int
    n_dst: int


def tome_merge(
    x: jnp.ndarray,  # (N, T, E) hidden states (token 0 = CLS)
    sim: jnp.ndarray,  # (N, T, T) similarity/probability map (head-mean)
    preserve_ratio: float = 0.5,
    merge_ratio: float = 0.5,
) -> Tuple[jnp.ndarray, TomeState]:
    N, T, E = x.shape
    N_CLS = 1
    n_preserve = round((T - 1) * preserve_ratio)
    n_tome = T - N_CLS - n_preserve
    assert n_tome > 0, "nothing to merge; lower preserve_ratio"

    sig = sim.mean(1)  # (N, T) significance per token
    sig_tokens = sig[:, N_CLS:]
    order = jnp.argsort(-sig_tokens, axis=-1, stable=True)  # (N, T-1)

    x_tokens = x[:, N_CLS:, :]
    x_sorted = jnp.take_along_axis(x_tokens, order[..., None], axis=1)
    x_preserve = x_sorted[:, :n_preserve]
    x_tome = x_sorted[:, n_preserve:]  # (N, n_tome, E)

    sim_tok = sim[:, N_CLS:, N_CLS:]
    sim_s = jnp.take_along_axis(sim_tok, order[:, :, None], axis=1)
    sim_s = jnp.take_along_axis(sim_s, order[:, None, :], axis=2)
    sim_tome = sim_s[:, n_preserve:, n_preserve:]  # (N, n_tome, n_tome)

    n_src = math.floor(merge_ratio * n_tome)
    n_dst = max(1, n_tome - n_src)
    n_src = n_tome - n_dst

    if n_src == 0:
        merged = jnp.concatenate([x[:, :N_CLS], x_preserve, x_tome], axis=1)
        node_idx = jnp.zeros((N, 0), jnp.int32)
        return merged, TomeState(order, node_idx, n_preserve, 0, n_dst)

    src = x_tome[:, :n_src]
    dst = x_tome[:, n_src:]
    scores = sim_tome[:, :n_src, n_src:] + jnp.swapaxes(
        sim_tome[:, n_src:, :n_src], -1, -2
    )
    node_idx = jnp.argmax(scores, axis=-1)  # (N, n_src) target in dst set

    # scatter-mean (torch scatter_reduce 'mean' with include_self)
    n_range = jnp.arange(N)[:, None]
    sums = dst.at[n_range, node_idx].add(src)
    counts = jnp.ones((N, n_dst), dst.dtype).at[n_range, node_idx].add(1.0)
    dst_merged = sums / counts[..., None]

    merged = jnp.concatenate([x[:, :N_CLS], x_preserve, dst_merged], axis=1)
    return merged, TomeState(order, node_idx, n_preserve, n_src, n_dst)


def tome_unmerge(x: jnp.ndarray, state: TomeState) -> jnp.ndarray:
    """Invert the merge: copy each dst back to its merged src positions,
    then undo the significance sort."""
    N, T1, E = x.shape
    N_CLS = 1
    x_cls = x[:, :N_CLS]
    x_sorted = x[:, N_CLS:]
    x_preserve = x_sorted[:, : state.n_preserve]
    dst = x_sorted[:, state.n_preserve :]
    if state.n_src > 0:
        src = jnp.take_along_axis(dst, state.node_idx[..., None], axis=1)
        tome = jnp.concatenate([src, dst], axis=1)
    else:
        tome = dst
    x_sorted_full = jnp.concatenate([x_preserve, tome], axis=1)
    T_tok = state.sort_idx.shape[1]
    unsorted = jnp.zeros((N, T_tok, E), x.dtype)
    unsorted = unsorted.at[jnp.arange(N)[:, None], state.sort_idx].set(
        x_sorted_full
    )
    return jnp.concatenate([x_cls, unsorted], axis=1)
