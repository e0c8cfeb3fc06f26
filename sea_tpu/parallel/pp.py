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
  * Schedules: plain GPipe (`pipeline_layers`, bubble (S-1)/(M+S-1)),
    the interleaved/looped schedule (`pipeline_layers_interleaved`, V
    chunks per stage, bubble (S-1)/(V·M+S-1)), and true 1F1B
    (`pipeline_1f1b_value_and_grad`). The first two are differentiable
    forwards — outer AD produces a GPipe-ordered backward, so all M
    microbatches' stage activations stay live between the forward scan
    and its transpose (per-layer remat via `use_remat` drops the
    within-layer residuals but not the M-deep window). 1F1B sidesteps
    outer AD entirely: one combined fwd+bwd scan over the host-simulated
    PipeDream-flush schedule (`sim_1f1b_schedule`), per-stage jax.vjp
    with recompute at backward ticks, and an in-flight stash bounded by
    the window S - s — activation memory O(S), independent of M
    (measured 2-3x below GPipe+remat, 9-12x below plain GPipe at pp4:
    scripts/pp_memory.py, RESULTS.md).

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
    h,
    bundle,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
):
    """GPipe forward through scan-stacked layers.

    layer_apply(one_layer_vars, h_mb, bundle_mb) -> (h_mb', aux)
    h: an (N, T, D) array — or a pytree of arrays sharing the leading
    batch dim N (the KD path pipelines the (teacher, student) hidden pair
    as one carry) — with N % num_microbatches == 0; bundle: pytree whose
    batch-leading leaves are microbatch-sliced alongside h. aux: a f32
    scalar, or any fixed-shape f32 array (e.g. per-loss-component sums).

    Returns (h_out, aux_mean) — aux averaged over layers and microbatches
    exactly like the loop path's mean over per-layer aux.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    tmap = jax.tree_util.tree_map
    N = jax.tree_util.tree_leaves(h)[0].shape[0]
    num_layers = jax.tree_util.tree_leaves(layer_vars)[0].shape[0]
    assert num_layers % S == 0, (num_layers, S)
    h_m = tmap(lambda x: _micro_reshape(x, M), h)
    bundle_m = tmap(
        lambda b: _micro_reshape(b, M)
        if hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N
        else b,
        bundle,
    )
    is_micro = tmap(
        lambda b: hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N, bundle
    )

    mb_spec = (
        P(None, dp_axis) if dp_axis is not None else P()
    )  # (M, mb, ...) — micro dim replicated, rows optionally dp-sharded

    def bundle_spec(micro):
        return mb_spec if micro else P()

    in_specs = (
        pp_stage_specs(layer_vars, axis),
        tmap(lambda _: mb_spec, h_m),
        tmap(bundle_spec, is_micro),
    )
    out_specs = (tmap(lambda _: mb_spec, h_m), P())

    def stage_fn(lv, hm, bm):
        stage = lax.axis_index(axis)

        def slice_bundle(t):
            # the microbatch this stage processes at tick t is t - stage
            idx = jnp.clip(t - stage, 0, M - 1)
            return tmap(
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
            return y, jnp.sum(auxs, axis=0)

        def tick(carry, t):
            state, aux_total = carry
            inject = tmap(
                lambda x: lax.dynamic_index_in_dim(
                    x, jnp.clip(t, 0, M - 1), 0, keepdims=False
                ),
                hm,
            )
            x = tmap(lambda i, s: jnp.where(stage == 0, i, s), inject, state)
            y, aux = run_local(x, slice_bundle(t))
            # stage s carries real microbatches only at ticks [s, s + M)
            valid = jnp.logical_and(t >= stage, t < stage + M)
            aux_total = aux_total + jnp.where(valid, aux, 0.0)
            nxt = tmap(
                lambda z: lax.ppermute(
                    z, axis, [(i, (i + 1) % S) for i in range(S)]
                ),
                y,
            )
            return (nxt, aux_total), y

        state0 = tmap(lambda x: jnp.zeros_like(x[0]), hm)
        aux0 = jnp.zeros(
            jax.eval_shape(
                lambda x, b: run_local(x, b)[1], state0, slice_bundle(0)
            ).shape,
            jnp.float32,
        )
        (_, aux_total), ys = lax.scan(
            tick, (state0, aux0), jnp.arange(M + S - 1)
        )
        # the last stage's y at tick t is microbatch t - (S - 1)'s output
        outs = tmap(lambda y: y[S - 1 :], ys)
        outs = tmap(
            lambda y: jnp.where(stage == S - 1, y, jnp.zeros_like(y)), outs
        )
        outs = lax.psum(outs, axis)
        aux = lax.psum(aux_total, axis) / jnp.float32(num_layers * M)
        if dp_axis is not None:
            # each dp shard's aux is the mean over its LOCAL rows; equal
            # shard sizes make the full-batch mean the pmean over dp
            aux = lax.pmean(aux, dp_axis)
        return outs, aux

    outs, aux = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(layer_vars, h_m, bundle_m)
    return tmap(lambda o: o.reshape(N, *o.shape[2:]), outs), aux


def pipeline_layers_interleaved(
    layer_apply,
    layer_vars,
    h: jnp.ndarray,
    bundle,
    *,
    mesh: Mesh,
    num_microbatches: int,
    num_chunks: int,  # V: layer chunks per stage (interleave factor)
    axis: str = "pp",
    dp_axis: Optional[str] = None,
):
    """Interleaved ("looped") pipeline: each stage holds V non-contiguous
    layer chunks (stage s owns global chunks s, s+S, ..., s+(V-1)S), so
    the warm-up/drain bubble shrinks from GPipe's (S-1)/(M+S-1) of the
    run to (S-1)/(V·M+S-1) — the Megatron interleaved-schedule idea,
    expressed as one lax.scan + ppermute ring.

    Conflict-free schedule (derived for this scan form): at tick t, stage
    s processes microbatch m = (t-s) mod M of its local chunk
    d = (t-s) div M — exactly one unit of work per stage per tick, chunk
    boundaries ride the same one-hop ppermute ring as GPipe (chunk c is
    on stage c mod S; c+1 on (c+1) mod S), and the V-wrap (stage S-1 ->
    stage 0, consumed M-S+1 ticks later) is absorbed by a per-stage
    (M, ...) pending ring buffer: the value received at tick t is written
    to slot (t+1-s) mod M, which is exactly the slot tick t+1 reads.
    Requires M >= S and num_layers % (S·V) == 0.

    Same contract as `pipeline_layers` (array h, scalar/array aux);
    returns (h_out, aux_mean)."""
    S = mesh.shape[axis]
    M = num_microbatches
    V = num_chunks
    assert M >= S, f"interleaved schedule needs M >= S (got M={M}, S={S})"
    tmap = jax.tree_util.tree_map
    N = h.shape[0]
    num_layers = jax.tree_util.tree_leaves(layer_vars)[0].shape[0]
    assert num_layers % (S * V) == 0, (num_layers, S, V)
    LC = num_layers // (S * V)  # layers per chunk

    # (L, ...) -> (V, S, LC, ...): global chunk c = d*S + s holds layers
    # [c*LC, (c+1)*LC); dim 1 shards over the pp axis
    def to_chunks(x):
        return x.reshape(V, S, LC, *x.shape[1:])

    chunked_vars = tmap(to_chunks, layer_vars)
    h_m = _micro_reshape(h, M)
    bundle_m = tmap(
        lambda b: _micro_reshape(b, M)
        if hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N
        else b,
        bundle,
    )
    is_micro = tmap(
        lambda b: hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N, bundle
    )

    mb_spec = P(None, dp_axis) if dp_axis is not None else P()

    def bundle_spec(micro):
        return mb_spec if micro else P()

    in_specs = (
        tmap(lambda _: P(None, axis), chunked_vars),
        mb_spec,
        tmap(bundle_spec, is_micro),
    )
    out_specs = (mb_spec, P())

    total_ticks = V * M + S - 1

    def stage_fn(lv, hm, bm):
        stage = lax.axis_index(axis)
        lv = tmap(lambda x: x[:, 0], lv)  # (V, LC, ...) local chunks

        def slice_bundle(m):
            return tmap(
                lambda b, micro: lax.dynamic_index_in_dim(
                    b, m, 0, keepdims=False
                )
                if micro
                else b,
                bm,
                is_micro,
            )

        def run_chunk(d, x, bundle_t):
            chunk = tmap(
                lambda p: lax.dynamic_index_in_dim(p, d, 0, keepdims=False),
                lv,
            )

            def body(c, p):
                y, aux = layer_apply(p, c, bundle_t)
                return y, aux

            y, auxs = lax.scan(body, x, chunk)
            return y, jnp.sum(auxs, axis=0)

        aux_shape = jax.eval_shape(
            lambda x, b: run_chunk(0, x, b)[1], hm[0], slice_bundle(0)
        ).shape

        def tick(carry, t):
            pend, aux_total = carry
            rel = t - stage
            m = jnp.clip(rel, 0, None) % M
            d = jnp.clip(rel, 0, None) // M
            valid = jnp.logical_and(rel >= 0, d < V)
            d_c = jnp.clip(d, 0, V - 1)
            inject = lax.dynamic_index_in_dim(hm, m, 0, keepdims=False)
            buffered = lax.dynamic_index_in_dim(pend, m, 0, keepdims=False)
            first = jnp.logical_and(stage == 0, d_c == 0)
            x = jnp.where(first, inject, buffered)
            y, aux = run_chunk(d_c, x, slice_bundle(m))
            aux_total = aux_total + jnp.where(valid, aux, 0.0)
            recv = lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            # slot = the SENDER's microbatch id (t - sender_stage) mod M:
            # non-wrap hops read it next tick; the V-wrap (stage S-1 ->
            # stage 0) reads it M-S+1 ticks later — same slot either way
            sender = (stage - 1) % S
            slot = jnp.clip(t - sender, 0, None) % M
            pend = lax.dynamic_update_index_in_dim(pend, recv, slot, 0)
            return (pend, aux_total), y

        pend0 = jnp.zeros_like(hm)
        aux0 = jnp.zeros(aux_shape, jnp.float32)
        (_, aux_total), ys = lax.scan(
            tick, (pend0, aux0), jnp.arange(total_ticks)
        )
        # microbatch m's final output leaves stage S-1 at tick
        # (V-1)M + S-1 + m — the last M ticks, in microbatch order
        outs = ys[total_ticks - M :]
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = lax.psum(outs, axis)
        aux = lax.psum(aux_total, axis) / jnp.float32(num_layers * M)
        if dp_axis is not None:
            aux = lax.pmean(aux, dp_axis)
        return outs, aux

    outs, aux = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(chunked_vars, h_m, bundle_m)
    return outs.reshape(N, *outs.shape[2:]), aux


def sim_1f1b_schedule(S: int, M: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side greedy simulation of the synchronous 1F1B (PipeDream-flush)
    schedule: one op (F or B) per stage per tick, backward preferred when
    ready, forwards capped by the per-stage in-flight window S - s. Returns
    int32 tables (T, S): f_m[t, s] / b_m[t, s] = microbatch id, -1 = idle.

    The window cap is what distinguishes 1F1B from GPipe: a stage never
    holds more than S - s microbatches between forward and backward, so
    the activation stash is O(S), not O(M)."""
    done_f = np.full((S, M), -1)  # tick at which F(s, m) completed
    done_b = np.full((S, M), -1)
    next_f = [0] * S
    next_b = [0] * S
    f_tab, b_tab = [], []
    t = 0
    while any(nb < M for nb in next_b):
        assert t < 4 * (M + S) + 8, "1F1B schedule simulation did not drain"
        f_row, b_row = [-1] * S, [-1] * S
        for s in range(S):
            m_b = next_b[s]
            b_ready = m_b < M and (
                done_f[s][m_b] >= 0 and done_f[s][m_b] < t
                if s == S - 1
                else done_b[s + 1][m_b] >= 0 and done_b[s + 1][m_b] < t
            )
            m_f = next_f[s]
            f_ready = (
                m_f < M
                and (s == 0 or (done_f[s - 1][m_f] >= 0 and done_f[s - 1][m_f] < t))
                and (next_f[s] - next_b[s]) < (S - s)
            )
            if b_ready:
                b_row[s] = m_b
                done_b[s][m_b] = t
                next_b[s] += 1
            elif f_ready:
                f_row[s] = m_f
                done_f[s][m_f] = t
                next_f[s] += 1
        f_tab.append(f_row)
        b_tab.append(b_row)
        t += 1
    return np.asarray(f_tab, np.int32), np.asarray(b_tab, np.int32)


def pipeline_1f1b_value_and_grad(
    layer_apply,
    head_loss,
    layer_vars,
    head_vars,
    h,
    bundle,
    head_args,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
    head_has_aux: bool = False,
):
    """True 1F1B: ONE combined forward+backward pass with the PipeDream-
    flush schedule, computed as an explicit gradient (per-stage jax.vjp at
    backward ticks) rather than outer AD over a forward schedule.

    Why it exists: `pipeline_layers` under jax.grad is GPipe — all M
    microbatches' stage activations stay live between the forward scan and
    its transpose. Here a stage stashes only its in-flight window (at most
    S - s stage-input activations, statically S + 1 slots) and re-derives
    the rest by recompute inside the per-microbatch vjp, so activation
    memory is O(S · microbatch), independent of M — the 1F1B memory
    property (measured: scripts/pp_memory.py).

    layer_apply(one_layer_vars, h_mb, bundle_mb) -> (h_mb', aux) as in
    `pipeline_layers`. head_loss(head_vars, h_out_mb, head_args_mb) ->
    scalar loss for one microbatch (e.g. finalize + logits + CE); it runs
    on the last stage at each backward tick and seeds the cotangent.
    head_args leaves with a leading batch dim are microbatch-sliced like
    bundle. h may be a single array or a pytree of arrays sharing the
    leading batch dim N — the KD path pipelines the (teacher, student,
    per-layer-loss accumulator) carry exactly like `pipeline_layers`;
    per-layer differentiable losses must ride IN the carry (an
    accumulator leaf) because only head_loss seeds cotangents here (the
    aux channel is reporting-only, unlike GPipe-under-jax.grad).

    head_has_aux: head_loss returns (scalar, f32 aux vector); the aux
    vector is summed over microbatches / M and returned as the second
    element of a (layer_aux, head_aux) pair.

    Returns (loss_mean, aux_mean, (d_layer_vars, d_head_vars, d_h)):
    loss_mean = mean over microbatches of head_loss; gradients are of
    M·loss_mean = sum of per-microbatch losses, scaled by 1/M, i.e. they
    match jax.grad of the equivalent GPipe loss. d_h (same structure as
    h) lets the caller run the embedding backward (jax.vjp of the embed
    at h) outside.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    tmap = jax.tree_util.tree_map
    N = jax.tree_util.tree_leaves(h)[0].shape[0]
    num_layers = jax.tree_util.tree_leaves(layer_vars)[0].shape[0]
    assert num_layers % S == 0, (num_layers, S)
    f_tab, b_tab = sim_1f1b_schedule(S, M)
    T_ticks = f_tab.shape[0]
    W = S + 1  # stash slots (in-flight ≤ S - s, +1 against receive overlap)

    h_m = tmap(lambda x: _micro_reshape(x, M), h)
    def micro_or_keep(b):
        return (
            _micro_reshape(b, M)
            if hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N
            else b
        )
    bundle_m = tmap(micro_or_keep, bundle)
    head_args_m = tmap(micro_or_keep, head_args)
    is_micro_b = tmap(
        lambda b: hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N, bundle
    )
    is_micro_ha = tmap(
        lambda b: hasattr(b, "ndim") and b.ndim >= 1 and b.shape[0] == N,
        head_args,
    )

    # receive-slot tables (host-side): the fwd message stage s reads at the
    # START of tick t+1 was sent by stage s-1 at tick t carrying microbatch
    # f_tab[t, s-1]; slot = m % W, trash slot W when idle or edge stage.
    recv_f = np.full((T_ticks, S), W, np.int32)
    recv_b = np.full((T_ticks, S), W, np.int32)
    for t in range(T_ticks):
        for s in range(S):
            if s > 0 and f_tab[t, s - 1] >= 0:
                recv_f[t, s] = f_tab[t, s - 1] % W
            if s < S - 1 and b_tab[t, s + 1] >= 0:
                recv_b[t, s] = b_tab[t, s + 1] % W

    mb_spec = P(None, dp_axis) if dp_axis is not None else P()

    def bspec(micro):
        return mb_spec if micro else P()

    in_specs = (
        pp_stage_specs(layer_vars, axis),
        tmap(lambda _: P(), head_vars),
        tmap(lambda _: mb_spec, h_m),
        tmap(bspec, is_micro_b),
        tmap(bspec, is_micro_ha),
    )
    out_specs = (
        P(),  # loss
        P(),  # aux (layer aux, or (layer aux, head aux))
        pp_stage_specs(layer_vars, axis),
        tmap(lambda _: P(), head_vars),
        tmap(lambda _: mb_spec, h_m),  # d_h (M, mb, ...)
    )

    def stage_fn(lv, hv, hm, bm, ham):
        stage = lax.axis_index(axis)

        def slice_tree(tree, is_micro, m):
            return tmap(
                lambda b, micro: lax.dynamic_index_in_dim(
                    b, m, 0, keepdims=False
                )
                if micro
                else b,
                tree,
                is_micro,
            )

        def run_local(lv_, x, bundle_t):
            def body(c, p):
                y, aux = layer_apply(p, c, bundle_t)
                return y, aux

            y, auxs = lax.scan(body, x, lv_)
            return y, jnp.sum(auxs, axis=0)

        mb_sd = tmap(lambda x: jax.eval_shape(lambda a: a[0], x), hm)

        def mb_zeros():
            return tmap(lambda s: jnp.zeros(s.shape, s.dtype), mb_sd)

        aux0 = jnp.zeros(
            jax.eval_shape(
                lambda x, b: run_local(lv, x, b)[1],
                mb_zeros(),
                slice_tree(bm, is_micro_b, 0),
            ).shape,
            jnp.float32,
        )
        if head_has_aux:
            ha_sd = jax.eval_shape(
                lambda hv_, y_, a_: head_loss(hv_, y_, a_)[1],
                hv, mb_zeros(), slice_tree(ham, is_micro_ha, 0),
            )
            haux0 = jnp.zeros(ha_sd.shape, jnp.float32)
        else:
            haux0 = jnp.float32(0.0)

        def tick(carry, xs):
            (stash, cot_buf, d_lv, d_hv, d_h, loss_t, aux_t, haux_t) = carry
            fm_row, bm_row, rf_row, rb_row = xs
            fm = lax.dynamic_index_in_dim(fm_row, stage, 0, keepdims=False)
            bmb = lax.dynamic_index_in_dim(bm_row, stage, 0, keepdims=False)
            rf = lax.dynamic_index_in_dim(rf_row, stage, 0, keepdims=False)
            rb = lax.dynamic_index_in_dim(rb_row, stage, 0, keepdims=False)

            # ---- forward op (fm >= 0) ----
            def do_f(stash):
                m = fm
                slot = m % W
                x_inj = tmap(
                    lambda x_: lax.dynamic_index_in_dim(x_, m, 0, keepdims=False),
                    hm,
                )
                x_buf = tmap(
                    lambda b_: lax.dynamic_index_in_dim(
                        b_, slot, 0, keepdims=False
                    ),
                    stash,
                )
                x = tmap(
                    lambda i_, b_: jnp.where(stage == 0, i_, b_), x_inj, x_buf
                )
                y, aux = run_local(lv, x, slice_tree(bm, is_micro_b, m))
                stash = tmap(
                    lambda b_, v_: lax.dynamic_update_index_in_dim(
                        b_, v_, slot, 0
                    ),
                    stash,
                    x,
                )
                return stash, y, aux

            def no_f(stash):
                return stash, mb_zeros(), aux0

            stash, y_msg, aux = lax.cond(fm >= 0, do_f, no_f, stash)
            aux_t = aux_t + aux

            # ---- backward op (bmb >= 0) ----
            def do_b(args):
                d_lv, d_hv, d_h, loss_t, haux_t = args
                m = bmb
                x = tmap(
                    lambda b_: lax.dynamic_index_in_dim(
                        b_, m % W, 0, keepdims=False
                    ),
                    stash,
                )
                bnd = slice_tree(bm, is_micro_b, m)

                def fwd_only(lv_, x_):
                    return run_local(lv_, x_, bnd)[0]

                y, pull = jax.vjp(fwd_only, lv, x)

                def head_seed(_):
                    ha = slice_tree(ham, is_micro_ha, m)
                    if head_has_aux:
                        loss_m, head_pull, h_aux = jax.vjp(
                            lambda hv_, y_: head_loss(hv_, y_, ha), hv, y,
                            has_aux=True,
                        )
                        h_aux = jnp.asarray(h_aux, jnp.float32)
                    else:
                        loss_m, head_pull = jax.vjp(
                            lambda hv_, y_: head_loss(hv_, y_, ha), hv, y
                        )
                        h_aux = haux0
                    g_hv, g_y = head_pull(jnp.float32(1.0))
                    g_y = tmap(
                        lambda g_, y_: g_.astype(y_.dtype), g_y, y
                    )
                    return g_y, g_hv, loss_m, h_aux

                def mid_seed(_):
                    g_y = tmap(
                        lambda b_: lax.dynamic_index_in_dim(
                            b_, m % W, 0, keepdims=False
                        ),
                        cot_buf,
                    )
                    return (
                        g_y, tmap(jnp.zeros_like, hv), jnp.float32(0.0),
                        haux0,
                    )

                g_y, g_hv, loss_m, h_aux = lax.cond(
                    stage == S - 1, head_seed, mid_seed, 0
                )
                g_lv, g_x = pull(g_y)
                d_lv = tmap(jnp.add, d_lv, g_lv)
                d_hv = tmap(jnp.add, d_hv, g_hv)
                loss_t = loss_t + loss_m
                haux_t = haux_t + h_aux
                # only stage 0's input cotangent is the caller's d_h; other
                # stages keep zeros and the final psum picks stage 0's
                d_h = tmap(
                    lambda d_, g_: lax.dynamic_update_index_in_dim(
                        d_,
                        jnp.where(stage == 0, g_, jnp.zeros_like(g_)),
                        m,
                        0,
                    ),
                    d_h,
                    g_x,
                )
                return (d_lv, d_hv, d_h, loss_t, haux_t), g_x

            def no_b(args):
                return args, mb_zeros()

            (d_lv, d_hv, d_h, loss_t, haux_t), dx_msg = lax.cond(
                bmb >= 0, do_b, no_b, (d_lv, d_hv, d_h, loss_t, haux_t)
            )

            # ---- ring exchange (collectives run unconditionally) ----
            f_recv = tmap(
                lambda z: lax.ppermute(
                    z, axis, [(i, (i + 1) % S) for i in range(S)]
                ),
                y_msg,
            )
            b_recv = tmap(
                lambda z: lax.ppermute(
                    z, axis, [(i, (i - 1) % S) for i in range(S)]
                ),
                dx_msg,
            )
            stash = tmap(
                lambda b_, v_: lax.dynamic_update_index_in_dim(b_, v_, rf, 0),
                stash,
                f_recv,
            )
            cot_buf = tmap(
                lambda b_, v_: lax.dynamic_update_index_in_dim(b_, v_, rb, 0),
                cot_buf,
                b_recv,
            )
            return (
                stash, cot_buf, d_lv, d_hv, d_h, loss_t, aux_t, haux_t
            ), None

        carry0 = (
            # stash (+ trash slot)
            tmap(lambda s: jnp.zeros((W + 1,) + s.shape, s.dtype), mb_sd),
            # cotangent buffer
            tmap(lambda s: jnp.zeros((W + 1,) + s.shape, s.dtype), mb_sd),
            tmap(jnp.zeros_like, lv),
            tmap(jnp.zeros_like, hv),
            # d_h per microbatch
            tmap(lambda s: jnp.zeros((M,) + s.shape, s.dtype), mb_sd),
            jnp.float32(0.0),
            aux0,
            haux0,
        )
        xs = (
            jnp.asarray(f_tab),
            jnp.asarray(b_tab),
            jnp.asarray(recv_f),
            jnp.asarray(recv_b),
        )
        (_, _, d_lv, d_hv, d_h, loss_t, aux_t, haux_t), _ = lax.scan(
            tick, carry0, xs
        )
        loss = lax.psum(loss_t, axis) / jnp.float32(M)
        aux = lax.psum(aux_t, axis) / jnp.float32(num_layers * M)
        haux = lax.psum(haux_t, axis) / jnp.float32(M)
        d_hv = tmap(lambda g: lax.psum(g, axis), d_hv)
        # only stage 0 wrote non-zeros
        d_h = tmap(lambda g: lax.psum(g, axis), d_h)
        if dp_axis is not None:
            loss = lax.pmean(loss, dp_axis)
            aux = lax.pmean(aux, dp_axis)
            haux = lax.pmean(haux, dp_axis)
            d_lv = tmap(lambda g: lax.pmean(g, dp_axis), d_lv)
            d_hv = tmap(lambda g: lax.pmean(g, dp_axis), d_hv)
            # d_h rows stay dp-local but the loss is the dp-mean
            d_h = tmap(
                lambda g: g / jnp.float32(mesh.shape[dp_axis]), d_h
            )
        scale = 1.0 / jnp.float32(M)
        d_lv = tmap(lambda g: g * scale, d_lv)
        d_hv = tmap(lambda g: g * scale, d_hv)
        d_h = tmap(lambda g: g * scale, d_h)
        out_aux = (aux, haux) if head_has_aux else aux
        return loss, out_aux, d_lv, d_hv, d_h

    loss, aux, d_lv, d_hv, d_h = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(layer_vars, head_vars, h_m, bundle_m, head_args_m)
    d_h = tmap(lambda d: d.reshape(N, *d.shape[2:]), d_h)
    return loss, aux, (d_lv, d_hv, d_h)


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
    use_remat: bool = False,
    interleave: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pipeline-parallel forward of an OPT/LLaMA ForCausalLM in scan
    layout (cfg.scan_layers=True variables). Embed/finalize/logits are
    replicated (tiny next to the layer stack); the layer stack streams
    through the pp stages. Returns (logits, aux_mean).

    use_remat: rematerialize each layer in backward (the scan_remat
    analogue for the pipelined path — long-context training would
    otherwise save every layer's T-sized activations per tick).
    interleave: >1 runs the looped/interleaved schedule
    (`pipeline_layers_interleaved`) with that many layer chunks per
    stage — bubble (S-1)/(interleave·M+S-1) instead of GPipe's
    (S-1)/(M+S-1); needs num_microbatches >= pp size."""
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

    if use_remat:
        layer_apply = jax.checkpoint(layer_apply, prevent_cse=False)

    if interleave > 1:
        h, aux = pipeline_layers_interleaved(
            layer_apply,
            layer_vars,
            h,
            bundle,
            mesh=mesh,
            num_microbatches=num_microbatches,
            num_chunks=interleave,
            axis=axis,
            dp_axis=dp_axis,
        )
    else:
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


def pp_kd_loss(
    teacher_model,
    student_model,
    teacher_variables,
    student_variables,
    input_ids: jnp.ndarray,
    attention_mask_1d: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
    task_scale: float = 0.1,
    ignore_kd: bool = False,
    use_remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Knowledge-distillation loss through the pipeline: the (teacher,
    student) layer pair streams through the pp stages as ONE carry, so the
    per-layer teacher captures (dense scores + context,
    `/root/reference/src/trainer/opt_trainer.py:91-199`'s KD recipe) stay
    stage-local — the O(T^2) capture never crosses an ICI hop, only the two
    (mb, T, D) hidden states do.

    Exactly the `SeaOptKDScan.kd_loss` math (training/distill.py):
      0.1·task CE + 5·mean hidden MSE (incl. embedding layer) +
      0.2·logit KL + mean attention-distill aux,
    with embeds/finalize/logits replicated (tiny next to the layer stacks)
    and the layer pairs pipelined. Teacher gradients are structurally zero
    (stop_gradient per stage). Both variable trees must be in scan layout.

    Returns (loss, details) with the same keys as SeaOptKD.kd_loss.
    """
    from ..models.opt import cross_entropy_shifted

    t_layer_vars, t_vars = split_scan_vars(teacher_variables)
    s_layer_vars, s_vars = split_scan_vars(student_variables)
    assert t_layer_vars and s_layer_vars, "variables are not in scan layout"
    t_layer_mod = _layer_module(teacher_model)
    s_layer_mod = _layer_module(student_model)
    num_layers = jax.tree_util.tree_leaves(t_layer_vars)[0].shape[0]

    h_t, bundle = teacher_model.apply(
        t_vars,
        input_ids,
        attention_mask_1d,
        method=lambda m, i, a: m.model.embed(i, a),
    )
    h_s, _ = student_model.apply(
        s_vars,
        input_ids,
        attention_mask_1d,
        method=lambda m, i, a: m.model.embed(i, a),
    )
    h_t = jax.lax.stop_gradient(h_t)
    mse0 = jnp.mean((h_t.astype(jnp.float32) - h_s.astype(jnp.float32)) ** 2)

    def layer_apply(lv, carry_mb, bundle_mb):
        ht, hs = carry_mb
        ht2, _, cap = t_layer_mod.apply(lv["t"], ht, bundle_mb)
        ht2 = jax.lax.stop_gradient(ht2)
        cap = jax.tree_util.tree_map(jax.lax.stop_gradient, cap)
        hs2, aux, _ = s_layer_mod.apply(
            lv["s"], hs, bundle_mb, cap, training=True
        )
        mse = jnp.mean(
            (ht2.astype(jnp.float32) - hs2.astype(jnp.float32)) ** 2
        )
        aux = aux if aux is not None else jnp.float32(0.0)
        return (ht2, hs2), jnp.stack([jnp.asarray(aux, jnp.float32), mse])

    if use_remat:
        # rematerialize the layer pair in backward: never save a dense
        # (mb, H, T, T) teacher capture across the GPipe schedule (same
        # policy as SeaOptKDScan's nn.remat body)
        layer_apply = jax.checkpoint(layer_apply, prevent_cse=False)

    (h_t, h_s), aux_mean = pipeline_layers(
        layer_apply,
        {"t": t_layer_vars, "s": s_layer_vars},
        (h_t, h_s),
        bundle,
        mesh=mesh,
        num_microbatches=num_microbatches,
        axis=axis,
        dp_axis=dp_axis,
    )
    # aux_mean[c] = (1/(L·M))·ΣΣ — with equal microbatches, per-layer
    # full-batch means are the microbatch-mean, so Σ_layers mse = L·mean
    loss_special = aux_mean[0]
    loss_hidden = (mse0 + aux_mean[1] * num_layers) / (num_layers + 1) * 5.0

    logits_t = jax.lax.stop_gradient(
        teacher_model.apply(
            t_vars, h_t, method=lambda m, x: m.logits(m.model.finalize(x))
        )
    )
    logits_s = student_model.apply(
        s_vars, h_s, method=lambda m, x: m.logits(m.model.finalize(x))
    )
    task_loss = cross_entropy_shifted(logits_s, labels)
    lt = logits_t.reshape(-1, logits_t.shape[-1]).astype(jnp.float32)
    ls = logits_s.reshape(-1, logits_s.shape[-1]).astype(jnp.float32)
    target = jax.nn.softmax(lt, -1)
    log_input = jax.nn.log_softmax(ls, -1)
    loss_logit_kl = (
        (target * (jnp.log(target + 1e-12) - log_input)).sum()
        / lt.shape[0]
        * 0.2
    )
    if ignore_kd:
        loss = task_loss
    else:
        loss = (
            task_scale * task_loss + loss_hidden + loss_logit_kl
            + loss_special
        )
    return loss, {
        "loss": loss,
        "loss_model": task_scale * task_loss,
        "loss_kd_hidden": loss_hidden,
        "loss_kd_logit": loss_logit_kl,
        "loss_sp": loss_special,
        "student_task_loss": task_loss,
    }


def _prune_scan_layers(variables):
    """Drop the model/layers_scan subtree from every collection (the
    embed/finalize/logits params are all that's left — what the pipeline
    head needs; keeps the 1F1B head-grad accumulators lean)."""
    out = {}
    for col, tree in variables.items():
        sub = tree.get("model") if isinstance(tree, dict) else None
        if isinstance(sub, dict) and "layers_scan" in sub:
            tree = {
                **tree,
                "model": {k: v for k, v in sub.items() if k != "layers_scan"},
            }
        out[col] = tree
    return out


def _insert_scan_layers(pruned, layer_vars):
    """Inverse of `_prune_scan_layers` + `split_scan_vars`: re-insert the
    stacked layer trees so the result matches the full scan-layout
    variables structure (grads merge back for the optimizer)."""
    out = {}
    for col, tree in pruned.items():
        if col in layer_vars:
            sub = dict(tree.get("model", {}))
            sub["layers_scan"] = {"layer": layer_vars[col]}
            tree = {**tree, "model": sub}
        out[col] = tree
    return out


def pp_kd_1f1b_value_and_grad(
    teacher_model,
    student_model,
    teacher_variables,
    student_variables,
    input_ids: jnp.ndarray,
    attention_mask_1d: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = None,
    task_scale: float = 0.1,
    use_remat: bool = True,
):
    """KD pair on the TRUE 1F1B schedule (VERDICT r4 #3): the (teacher,
    student) hidden pair streams through `pipeline_1f1b_value_and_grad`
    with the per-layer differentiable KD losses (hidden MSE + attention
    distill aux) riding IN the carry as a per-row accumulator — the only
    way per-layer losses reach the explicit-vjp schedule, where cotangents
    are seeded solely by the last-stage head.

    Exactly `pp_kd_loss`'s math (0.1·task CE + 5·mean hidden MSE incl.
    embedding + 0.2·logit KL + attention aux) but with 1F1B's O(S)
    activation stash instead of GPipe's O(M) — the 13b KD deployment
    schedule. At num_microbatches=1 gradients equal `jax.grad` of
    `pp_kd_loss` exactly; at M>1 they equal the same microbatch
    decomposition (nonlinear masked-mean aux terms decompose like
    gradient accumulation, see test_pp_kd_microbatched_*).

    Returns (loss, details, d_student_variables) where d_student_variables
    has the full scan-layout structure of `student_variables` (embed +
    head + layer-stack grads merged; teacher gradients are structurally
    zero and not returned).
    """
    from ..models.opt import cross_entropy_shifted

    t_layer_vars, t_vars = split_scan_vars(teacher_variables)
    s_layer_vars, s_vars = split_scan_vars(student_variables)
    assert t_layer_vars and s_layer_vars, "variables are not in scan layout"
    t_layer_mod = _layer_module(teacher_model)
    s_layer_mod = _layer_module(student_model)
    L = jax.tree_util.tree_leaves(t_layer_vars)[0].shape[0]
    tmap = jax.tree_util.tree_map

    t_head_vars = _prune_scan_layers(t_vars)
    s_head_vars = _prune_scan_layers(s_vars)

    h_t, bundle = teacher_model.apply(
        t_head_vars,
        input_ids,
        attention_mask_1d,
        method=lambda m, i, a: m.model.embed(i, a),
    )
    h_t = jax.lax.stop_gradient(h_t)

    def embed_fn(sv):
        h_s, _ = student_model.apply(
            sv,
            input_ids,
            attention_mask_1d,
            method=lambda m, i, a: m.model.embed(i, a),
        )
        mse0 = jnp.mean(
            (h_t.astype(jnp.float32) - h_s.astype(jnp.float32)) ** 2
        )
        return h_s, mse0

    (h_s, mse0), embed_pull = jax.vjp(embed_fn, s_head_vars)
    N = h_s.shape[0]
    mse0_w = 5.0 / (L + 1)

    def layer_apply(lv, carry_mb, bundle_mb):
        ht, hs, acc = carry_mb
        ht2, _, cap = t_layer_mod.apply(lv["t"], ht, bundle_mb)
        ht2 = jax.lax.stop_gradient(ht2)
        cap = tmap(jax.lax.stop_gradient, cap)
        hs2, aux, _ = s_layer_mod.apply(
            lv["s"], hs, bundle_mb, cap, training=True
        )
        mse = jnp.mean(
            (ht2.astype(jnp.float32) - hs2.astype(jnp.float32)) ** 2
        )
        aux = jnp.asarray(
            aux if aux is not None else jnp.float32(0.0), jnp.float32
        )
        acc = acc + aux / L + mse * mse0_w
        return (ht2, hs2, acc), jnp.stack([aux, mse])

    if use_remat:
        layer_apply = jax.checkpoint(layer_apply, prevent_cse=False)

    def head_loss(sv, y, ha):
        ht, hs, acc = y
        logits_t = jax.lax.stop_gradient(
            teacher_model.apply(
                t_head_vars, ht,
                method=lambda m, x: m.logits(m.model.finalize(x)),
            )
        )
        logits_s = student_model.apply(
            sv, hs, method=lambda m, x: m.logits(m.model.finalize(x))
        )
        task_loss = cross_entropy_shifted(logits_s, ha["labels"])
        lt = logits_t.reshape(-1, logits_t.shape[-1]).astype(jnp.float32)
        ls = logits_s.reshape(-1, logits_s.shape[-1]).astype(jnp.float32)
        target = jax.nn.softmax(lt, -1)
        log_input = jax.nn.log_softmax(ls, -1)
        kl = (
            (target * (jnp.log(target + 1e-12) - log_input)).sum()
            / lt.shape[0]
            * 0.2
        )
        loss = task_scale * task_loss + kl + jnp.mean(acc)
        return loss, jnp.stack([task_loss, kl])

    acc0 = jnp.zeros((N,), jnp.float32)
    loss_pipe, (layer_aux, head_aux), (d_lv, d_hv, d_h) = (
        pipeline_1f1b_value_and_grad(
            layer_apply,
            head_loss,
            {"t": t_layer_vars, "s": s_layer_vars},
            s_head_vars,
            (h_t, h_s, acc0),
            bundle,
            {"labels": labels},
            mesh=mesh,
            num_microbatches=num_microbatches,
            axis=axis,
            dp_axis=dp_axis,
            head_has_aux=True,
        )
    )
    loss = loss_pipe + mse0_w * mse0

    # embedding backward: pipeline input cotangent + the mse0 term
    _, d_h_s, _ = d_h
    (g_embed,) = embed_pull((d_h_s, jnp.float32(mse0_w)))
    d_s_rest = tmap(jnp.add, g_embed, d_hv)
    d_student = _insert_scan_layers(d_s_rest, d_lv["s"])

    loss_sp = layer_aux[0]
    loss_hidden = (mse0 + layer_aux[1] * L) * mse0_w
    details = {
        "loss": loss,
        "loss_model": task_scale * head_aux[0],
        "loss_kd_hidden": loss_hidden,
        "loss_kd_logit": head_aux[1],
        "loss_sp": loss_sp,
        "student_task_loss": head_aux[0],
    }
    return loss, details, d_student
