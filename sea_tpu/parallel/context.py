"""Sharding scope that routes SeaAttention's fused benchmark path through
the sequence/head-sharded kernels (parallel/sharded_attention.py).

The mesh is a runtime object and cannot live in the hashable SeaConfig, so
the model consults this scope at trace time — enter it around `jit`
tracing/calls of the benchmark forward:

    with sharded_attention_scope(mesh, axis="sp", kind="seq"):
        out = jit_forward(params, ids, mask)   # attention runs shard_mapped

Every SEA stage before the kernel is query-row/head local, so only the
attention op itself needs the explicit shard_map; the surrounding stages
follow whatever GSPMD sharding the caller's jit provides. This mirrors how
flax treats logical-axis rules as ambient context.
"""

from __future__ import annotations

import dataclasses
import threading
from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_TLS = threading.local()


@dataclasses.dataclass(frozen=True)
class AttnShardingContext:
    mesh: Mesh
    axis: str = "sp"
    kind: str = "auto"  # 'auto' | 'seq' (zigzag row blocks) | 'head' | 'ring'
    #   'ring': K/V stay sequence-sharded and rotate via ppermute —
    #   per-chip K/V memory O(T/shards); differentiable on the
    #   use_fused_train path (dk/dv ring home with their chunks)
    #   'auto': resolve_attention_kind picks 'ring' at long T, else 'seq'
    zigzag: bool = True
    block_q: Optional[int] = None
    block_k: Optional[int] = None


# 'seq' replicates full K/V on every shard (SEA's mask is global, so there
# is no bounded halo): per-shard K/V cost is O(T) regardless of the shard
# count, 2*N*H*T*D*dtype bytes. 'ring' keeps K/V (and dk/dv in the
# differentiable variant) sequence-sharded at the price of S ppermute hops
# and a per-window logsumexp recombination. Below this T the replicated
# K/V is a few MB and the ring hops are pure overhead; above it K/V
# replication starts to crowd out activations on a 16 GB chip
# (T=16384, H=12, D=64 bf16 -> 50 MB per layer per direction; by T=65536
# it is 800 MB across a 12-layer scan's live window). Override per-run via
# sharded_attention_scope(kind=...); the rule is documented in
# docs/operations.md.
RING_MIN_T = 16384


def resolve_attention_kind(
    ctx: "AttnShardingContext", *, t: int, oversample: float = 1.0
) -> str:
    """Resolve kind='auto' by (T, shard count): 'ring' when the sequence is
    long enough that per-shard K/V replication dominates, 'seq' otherwise.
    'ring' does not implement the k_oversample keep-predicate, so any
    oversampled config stays on 'seq'."""
    if ctx.kind != "auto":
        return ctx.kind
    n = ctx.mesh.shape[ctx.axis]
    if n > 1 and t >= RING_MIN_T and oversample == 1.0:
        return "ring"
    return "seq"


def current_attention_sharding() -> Optional[AttnShardingContext]:
    return getattr(_TLS, "ctx", None)


@contextmanager
def sharded_attention_scope(
    mesh: Mesh,
    axis: str = "sp",
    kind: str = "auto",
    zigzag: bool = True,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
):
    prev = getattr(_TLS, "ctx", None)
    _TLS.ctx = AttnShardingContext(
        mesh=mesh, axis=axis, kind=kind, zigzag=zigzag,
        block_q=block_q, block_k=block_k,
    )
    try:
        yield _TLS.ctx
    finally:
        _TLS.ctx = prev
