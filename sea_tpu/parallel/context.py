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
    kind: str = "seq"  # 'seq' (zigzag row blocks) | 'head' | 'ring'
    #   'ring': K/V stay sequence-sharded and rotate via ppermute —
    #   per-chip K/V memory O(T/shards); differentiable on the
    #   use_fused_train path (dk/dv ring home with their chunks)
    zigzag: bool = True
    block_q: Optional[int] = None
    block_k: Optional[int] = None


def current_attention_sharding() -> Optional[AttnShardingContext]:
    return getattr(_TLS, "ctx", None)


@contextmanager
def sharded_attention_scope(
    mesh: Mesh,
    axis: str = "sp",
    kind: str = "seq",
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
