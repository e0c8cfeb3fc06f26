"""Token sampling: temperature / top-k / top-p (nucleus) filtering.

The reference decodes through HF `generate`
(/root/reference/src/main/opt_generate.py), whose sampling stack applies
temperature scaling, then top-k, then top-p filtering before a
categorical draw. This is the jit-friendly TPU equivalent, shared by
`OptForCausalLM.generate_sample` / `LlamaForCausalLM.generate_sample`
and the serving engine's per-slot sampler — everything is shape-static
and vectorised over rows, so per-request parameters ride as (N,) arrays
through one compiled program.

Filtering uses sorted-threshold semantics: top-k keeps every logit >=
the k-th largest (ties at the boundary are all kept — at f32 logits
ties are measure-zero except for degenerate inputs), top-p keeps the
smallest sorted prefix whose probability mass reaches p (the token that
crosses the boundary is included, matching HF's convention).
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

    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]  # (N, V)

    # top-k: threshold at the k-th largest value
    k_idx = jnp.clip(top_k - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)  # (N, 1)
    keep_k = jnp.where(top_k[:, None] > 0, logits >= kth, True)

    # top-p over the top-k survivors: renormalise by masking the sorted
    # tail beyond k to -inf before the softmax, then keep the smallest
    # prefix reaching mass p (the crossing token included); position 0
    # is always kept (min_tokens_to_keep)
    pos = jnp.arange(V, dtype=jnp.int32)[None, :]
    in_k = jnp.where(top_k[:, None] > 0, pos < top_k[:, None], True)
    probs = jax.nn.softmax(jnp.where(in_k, sorted_desc, -jnp.inf), axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep_sorted = ((csum - probs) < top_p[:, None]) | (pos == 0)
    thresh_p = jnp.min(
        jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1
    )  # (N,)
    keep_p = jnp.where(top_p[:, None] < 1.0, logits >= thresh_p[:, None], True)

    return jnp.where(keep_k & keep_p, logits, -jnp.inf)


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
