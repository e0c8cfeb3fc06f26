"""Parallelism: mesh construction, sharding rules, distributed launch."""

from .mesh import batch_sharding, make_mesh, opt_state_sharding, param_sharding, replicated
from .tp import make_tp_mesh, shard_params_tp, tp_param_specs, tp_shardings

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_tp_mesh",
    "opt_state_sharding",
    "param_sharding",
    "replicated",
    "shard_params_tp",
    "tp_param_specs",
    "tp_shardings",
]
