"""Device mesh + sharding rules (TPU-native replacement for the reference's
DeepSpeed/NCCL data parallelism, SURVEY §2.5/§5.8).

The reference scales with 1-process-per-GPU DeepSpeed ZeRO; here parallelism
is expressed once as sharding annotations over a `jax.sharding.Mesh` and XLA
inserts the ICI collectives:

  * `dp` — data parallel: batch axis of activations; optimizer state is
    sharded over `dp` (the ZeRO analogue);
  * `sp` — sequence/row parallel: the T_DST (query-row) axis of the SEA
    attention pipeline. Every stage of the sparse path (top-k, CSR expand,
    SDDMM, softmax, scaler, SpMM) is row-independent, so only K/V and the
    compressed estimator need cross-shard gathers (halo/all-gather on ICI),
    which the SPMD partitioner emits from the einsum shardings.

Multi-host: `jax.distributed.initialize()` before mesh creation; `dp` spans
DCN (between hosts), `sp` stays within a host's ICI domain.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, sp: Optional[int] = None, devices=None
) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        # favour sequence sharding within a host
        sp = min(n, 4)
        dp = n // sp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, (dp, sp, n)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, T, ...) activations: batch over dp, sequence over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params):
    """Params replicated (125m-scale); larger models would shard the FFN/
    embed over `sp` (tensor parallel) — hook point for later configs."""
    return jax.tree_util.tree_map(lambda _: replicated(mesh), params)


def opt_state_sharding(mesh: Mesh, opt_state, params_spec=None):
    """ZeRO-1 analogue: shard each optimizer-state moment along its first
    axis over `dp` when divisible, else replicate."""
    dp = mesh.shape["dp"]

    def rule(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] % dp == 0 and leaf.shape[0] > 1:
            return NamedSharding(mesh, P("dp"))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, opt_state)
