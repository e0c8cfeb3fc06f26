"""Parallelism: mesh construction, sharding rules, distributed launch."""

from .mesh import batch_sharding, make_mesh, opt_state_sharding, param_sharding, replicated

__all__ = [
    "batch_sharding",
    "make_mesh",
    "opt_state_sharding",
    "param_sharding",
    "replicated",
]
