"""Pipeline parallelism: GPipe over a `pp` mesh axis (shard_map + ppermute).

The reference never scales past one node (DeepSpeed ZeRO-DP only,
/root/reference/src/trainer/opt_trainer.py:392-407); the 7B/13B headline
configs (reference README.md:35-39) need model parallelism. Tensor
parallelism (`parallel/tp.py`) covers the within-layer axis; this module
adds the cross-layer axis, TPU-style:

  * The scan-stacked parameter layout (`models/layers_scan/layer/...`,
    leading dim = layer) doubles as the pipeline layout: shard the layer
    dim over `pp` and each stage holds a contiguous block of layers.
  * The schedule is a single `lax.scan` over M + S - 1 ticks inside one
    `shard_map`: every tick, each stage runs its local layers (an inner
    `lax.scan`) and hands its activation to the next stage with
    `lax.ppermute` (one ICI hop — stages are mesh-adjacent by
    construction). Microbatches stream in at stage 0 and drain at stage
    S-1; the classic GPipe bubble is (S-1)/(M+S-1) of the ticks.
  * Everything is differentiable (`ppermute`/`scan` have transposes), so
    the same function serves benchmark forward and task-loss training.

Works for both model families: OPT (`models/opt.py`) and LLaMA
(`models/llama.py`) expose identical `embed / layer(h, bundle) /
finalize / logits` hooks; the bundle (causal mask, RoPE tables) is
microbatch-sliced along with the hidden states.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pp_mesh(
    dp: Optional[int] = None, pp: Optional[int] = None, devices=None
) -> Mesh:
    """(dp, pp) mesh; `pp` should map to an ICI-adjacent ring so each
    ppermute hop is one link."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and pp is None:
        pp = min(n, 4)
        dp = n // pp
    elif dp is None:
        dp = n // pp
    elif pp is None:
        pp = n // dp
    assert dp * pp == n, (dp, pp, n)
    return Mesh(np.asarray(devices).reshape(dp, pp), axis_names=("dp", "pp"))


def pp_stage_specs(layer_vars, axis: str = "pp"):
    """PartitionSpecs sharding every scan-stacked leaf's leading (layer)
    dim over `axis`."""
    return jax.tree_util.tree_map(lambda _: P(axis), layer_vars)


def shard_params_pp(layer_vars, mesh: Mesh, axis: str = "pp"):
    return jax.device_put(
        layer_vars,
        jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec),
            pp_stage_specs(layer_vars, axis),
            is_leaf=lambda x: isinstance(x, P),
        ),
    )


def _micro_reshape(x: jnp.ndarray, num_micro: int) -> jnp.ndarray:
    n = x.shape[0]
    assert n % num_micro == 0, (n, num_micro)
    return x.reshape(num_micro, n // num_micro, *x.shape[1:])


def pipeline_layers(
    layer_apply,
    layer_vars,
    h: jnp.ndarray,
    bundle,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
):
    """GPipe forward through scan-stacked layers.

    layer_apply(one_layer_vars, h_mb, bundle_mb) -> (h_mb', aux_scalar)
    h: (N, T, D) with N % num_microbatches == 0; bundle: pytree whose
    batch-leading leaves are microbatch-sliced alongside h.

    Returns (h_out (N, T, D), aux_mean) — aux averaged over layers and
    microbatches exactly like the loop path's mean over per-layer aux.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    N = h.shape[0]
    num_layers = jax.tree_util.tree_leaves(layer_vars)[0].shape[0]
    assert num_layers % S == 0, (num_layers, S)
    h_m = _micro_reshape(h, M)
    bundle_m = jax.tree_util.tree_map(
        lambda b: _micro_reshape(b, M)
        if hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N
        else b,
        bundle,
    )
    is_micro = jax.tree_util.tree_map(
        lambda b: hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N, bundle
    )

    mb_spec = (
        P(None, dp_axis) if dp_axis is not None else P()
    )  # (M, mb, ...) — micro dim replicated, rows optionally dp-sharded

    def bundle_spec(micro):
        return mb_spec if micro else P()

    in_specs = (
        pp_stage_specs(layer_vars, axis),
        mb_spec,
        jax.tree_util.tree_map(bundle_spec, is_micro),
    )
    out_specs = (mb_spec, P())

    def stage_fn(lv, hm, bm):
        stage = lax.axis_index(axis)

        def slice_bundle(t):
            # the microbatch this stage processes at tick t is t - stage
            idx = jnp.clip(t - stage, 0, M - 1)
            return jax.tree_util.tree_map(
                lambda b, micro: lax.dynamic_index_in_dim(
                    b, idx, 0, keepdims=False
                )
                if micro
                else b,
                bm,
                is_micro,
            )

        def run_local(x, bundle_t):
            def body(c, p):
                y, aux = layer_apply(p, c, bundle_t)
                return y, aux

            y, auxs = lax.scan(body, x, lv)
            return y, jnp.sum(auxs)

        def tick(carry, t):
            state, aux_total = carry
            inject = lax.dynamic_index_in_dim(
                hm, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            x = jnp.where(stage == 0, inject, state)
            y, aux = run_local(x, slice_bundle(t))
            # stage s carries real microbatches only at ticks [s, s + M)
            valid = jnp.logical_and(t >= stage, t < stage + M)
            aux_total = aux_total + jnp.where(valid, aux, 0.0)
            nxt = lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (nxt, aux_total), y

        state0 = jnp.zeros_like(hm[0])
        (_, aux_total), ys = lax.scan(
            tick, (state0, jnp.float32(0.0)), jnp.arange(M + S - 1)
        )
        # the last stage's y at tick t is microbatch t - (S - 1)'s output
        outs = ys[S - 1 :]
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = lax.psum(outs, axis)
        aux = lax.psum(aux_total, axis) / jnp.float32(num_layers * M)
        return outs, aux

    outs, aux = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(layer_vars, h_m, bundle_m)
    return outs.reshape(N, *outs.shape[2:]), aux


def split_scan_vars(variables) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split scan-layout variables into (layer stacks, the rest).

    layer stacks: {collection: stacked tree} for every collection carrying
    `model/layers_scan/layer`; the rest feeds embed/finalize/logits."""
    layer_vars = {}
    for col, tree in variables.items():
        sub = tree.get("model", {}) if isinstance(tree, dict) else {}
        if "layers_scan" in sub:
            layer_vars[col] = sub["layers_scan"]["layer"]
    return layer_vars, variables


def _layer_module(model):
    """The per-layer module for a ForCausalLM family instance."""
    from ..models.opt import OptDecoderLayer, OptForCausalLM

    if isinstance(model, OptForCausalLM):
        return OptDecoderLayer(model.cfg)
    from ..models.llama import LlamaDecoderLayer, LlamaForCausalLM

    if isinstance(model, LlamaForCausalLM):
        return LlamaDecoderLayer(model.cfg)
    raise TypeError(f"unsupported model family: {type(model)}")


def pp_causal_lm_forward(
    model,
    variables,
    input_ids: jnp.ndarray,
    attention_mask_1d: jnp.ndarray,
    *,
    mesh: Mesh,
    num_microbatches: int,
    benchmarking: bool = False,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pipeline-parallel forward of an OPT/LLaMA ForCausalLM in scan
    layout (cfg.scan_layers=True variables). Embed/finalize/logits are
    replicated (tiny next to the layer stack); the layer stack streams
    through the pp stages. Returns (logits, aux_mean)."""
    layer_vars, variables = split_scan_vars(variables)
    assert layer_vars, "variables are not in scan layout (no layers_scan)"
    layer_mod = _layer_module(model)

    h, bundle = model.apply(
        variables,
        input_ids,
        attention_mask_1d,
        method=lambda m, i, a: m.model.embed(i, a),
    )

    def layer_apply(lv, h_mb, bundle_mb):
        out, aux, _ = layer_mod.apply(
            lv, h_mb, bundle_mb, benchmarking=benchmarking
        )
        return out, (aux if aux is not None else jnp.float32(0.0))

    h, aux = pipeline_layers(
        layer_apply,
        layer_vars,
        h,
        bundle,
        mesh=mesh,
        num_microbatches=num_microbatches,
        axis=axis,
        dp_axis=dp_axis,
    )

    h = model.apply(variables, h, method=lambda m, x: m.model.finalize(x))
    logits = model.apply(variables, h, method=lambda m, x: m.logits(x))
    return logits, aux
