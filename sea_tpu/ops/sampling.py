"""Token sampling: temperature / top-k / top-p (nucleus) filtering.

The reference decodes through HF `generate`
(/root/reference/src/main/opt_generate.py), whose sampling stack applies
temperature scaling, then top-k, then top-p filtering before a
categorical draw. This is the jit-friendly TPU equivalent, shared by
`OptForCausalLM.generate_sample` / `LlamaForCausalLM.generate_sample`
and the serving engine's per-slot sampler — everything is shape-static
and vectorised over rows, so per-request parameters ride as (N,) arrays
through one compiled program.

Filtering is POSITION-based on the descending sort order (rank
scatter), so top-k keeps exactly k tokens and top-p exactly the
smallest prefix reaching mass p even when logits tie at the boundary
(untrained/tiny models tie constantly) — matching HF's exact-k warpers;
the token that crosses the p boundary is included, and at least one
token always survives (min_tokens_to_keep=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _filters_statically_off(top_k, top_p) -> bool:
    """True when both filters are python-level disabled constants — the
    hot decode loop then skips the (N, V) sort entirely."""
    return (
        isinstance(top_k, (int, float)) and int(top_k) == 0
        and isinstance(top_p, (int, float)) and float(top_p) >= 1.0
    )


def filter_logits(logits: jnp.ndarray, top_k=0, top_p=1.0) -> jnp.ndarray:
    """Mask logits outside the top-k / top-p set to -inf.

    logits: (N, V) float; top_k: scalar or (N,) int32, 0 disables;
    top_p: scalar or (N,) float, 1.0 disables. HF composition order:
    top-p mass is measured on the distribution RENORMALISED over the
    top-k survivors (TopKLogitsWarper then TopPLogitsWarper), and at
    least one token always survives (min_tokens_to_keep=1).
    Returns (N, V).
    """
    logits = logits.astype(jnp.float32)
    if _filters_statically_off(top_k, top_p):
        return logits
    N, V = logits.shape
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (N,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (N,))

    order = jnp.argsort(-logits, axis=-1)  # (N, V) descending token ids
    sorted_desc = jnp.take_along_axis(logits, order, axis=-1)
    pos = jnp.arange(V, dtype=jnp.int32)[None, :]

    # top-k: keep exactly the first k sorted positions
    keep_k = jnp.where(top_k[:, None] > 0, pos < top_k[:, None], True)

    # top-p over the top-k survivors (HF warper order — the mass is
    # renormalised over the top-k set): smallest prefix reaching mass p,
    # crossing token included, position 0 always kept
    probs = jax.nn.softmax(jnp.where(keep_k, sorted_desc, -jnp.inf), axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep_p = ((csum - probs) < top_p[:, None]) | (pos == 0)
    keep_p = jnp.where(top_p[:, None] < 1.0, keep_p, True)

    # scatter the sorted-position keep decisions back to token ids
    keep = (
        jnp.zeros((N, V), bool)
        .at[jnp.arange(N, dtype=jnp.int32)[:, None], order]
        .set(keep_k & keep_p)
    )
    return jnp.where(keep, logits, -jnp.inf)


def sample_logits(
    key, logits: jnp.ndarray, temperature=1.0, top_k=0, top_p=1.0
) -> jnp.ndarray:
    """Draw one token id per row (N,) int32.

    temperature: scalar or (N,); <= 0 means greedy for that row (the
    serving convention — a greedy request and a sampling request share
    one compiled step). HF order of operations: scale by temperature,
    then top-k, then top-p, then categorical.
    """
    logits = logits.astype(jnp.float32)
    N, V = logits.shape
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (N,))
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    filtered = filter_logits(scaled, top_k, top_p)
    sampled = jax.random.categorical(key, filtered)
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
