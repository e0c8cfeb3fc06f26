"""Tensor parallelism as GSPMD sharding rules (Megatron-style, expressed
declaratively — the TPU answer to model-parallel memory for the 7B/13B
configs, which the reference handles with DeepSpeed ZeRO-2 + CPU offload,
`config/ds_opt_1.3.json`).

Instead of rewriting the model with collectives, parameters get
PartitionSpecs by name and XLA's SPMD partitioner derives the activation
shardings and inserts the psum at each row-parallel projection:

  * column-parallel (output dim = heads/ffn sharded over `tp`):
    q/k/v projections, fc1 / gate_proj / up_proj, lm_head;
  * row-parallel (input dim sharded, psum after):
    out_proj / o_proj, fc2 / down_proj;
  * everything else (embeddings, norms, the SEA estimator — which is tiny
    next to the base weights) replicated.

Because the q/k/v output dim is head-major, sharding it over `tp` shards
the *head* axis of (N, H, T, D) activations: every SEA stage that is
per-head (performer, predictor CNN, SDDMM/softmax/SpMM) stays
communication-free; the grouped top-k over the flattened (H·T_M) axis is
the one cross-head op and GSPMD emits its small all-gather (T_M ≪ T).

Works for both model families (OPT `models/opt.py`, LLaMA
`models/llama.py`); the parameter name tables below cover both.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernel param names -> which dim of the (in, out) flax Dense kernel shards
COLUMN_PARALLEL = {
    "q_proj", "k_proj", "v_proj",  # OPT + LLaMA attention inputs
    "fc1",                          # OPT MLP up
    "gate_proj", "up_proj",         # LLaMA SwiGLU up
    "lm_head",                      # untied head (LLaMA)
}
ROW_PARALLEL = {
    "out_proj", "o_proj",  # attention output
    "fc2", "down_proj",    # MLP down
}


def make_tp_mesh(
    dp: Optional[int] = None, tp: Optional[int] = None, devices=None
) -> Mesh:
    """(dp, tp) mesh; tp should map to an ICI-adjacent device group."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and tp is None:
        tp = min(n, 4)
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names=("dp", "tp"))


def _spec_for(names, shape, axis: str, tp_size: int, stacked: bool) -> P:
    """Spec for a kernel/bias of `shape` (scan-stacked arrays carry a
    leading layer dim, handled via `stacked`)."""
    owner = None
    for n in names:
        if n in COLUMN_PARALLEL or n in ROW_PARALLEL:
            owner = n
    if owner is None:
        return P()
    field = names[-1]
    lead = (None,) if stacked else ()
    body = shape[1:] if stacked else shape
    if owner in COLUMN_PARALLEL:
        if field == "kernel" and len(body) == 2 and body[1] % tp_size == 0:
            return P(*lead, None, axis)
        if field == "bias" and len(body) == 1 and body[0] % tp_size == 0:
            return P(*lead, axis)
        return P()
    # row-parallel: shard the input dim; bias/output replicated (psum-ed)
    if field == "kernel" and len(body) == 2 and body[0] % tp_size == 0:
        return P(*lead, axis, None)
    return P()


def tp_param_specs(params, mesh: Mesh, axis: str = "tp"):
    """PartitionSpec tree for a model-family param tree (loop OR scan
    layout — scan-stacked kernels are (L, in, out); the leading layer dim
    stays unsharded)."""
    tp_size = mesh.shape[axis]

    def rule(path, leaf):
        if not hasattr(leaf, "ndim"):
            return P()
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        field = names[-1]
        stacked = (field == "kernel" and leaf.ndim == 3) or (
            field == "bias" and leaf.ndim == 2
        )
        return _spec_for(names, leaf.shape, axis, tp_size, stacked)

    return jax.tree_util.tree_map_with_path(rule, params)


def tp_shardings(params, mesh: Mesh, axis: str = "tp"):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        tp_param_specs(params, mesh, axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """Place a param tree with the TP layout (device_put with the specs)."""
    return jax.device_put(params, tp_shardings(params, mesh, axis))
