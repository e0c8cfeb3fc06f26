"""Pipeline-schedule activation-memory comparison on the virtual CPU mesh.

Measures XLA's compiled temp buffer size (memory_analysis().temp_size_in_bytes
— the activation/workspace high-water, excluding the params and inputs) for
the combined fwd+bwd step of each pipeline schedule at a geometry where
M x activation is the dominant term. GPipe under jax.grad keeps every
microbatch's stage activations live between the forward scan and its
transpose; per-layer remat drops the within-layer residuals; the explicit
1F1B schedule (`pipeline_1f1b_value_and_grad`) additionally bounds the
stage-input stash to its in-flight window (S+1 slots, independent of M).

Run: python scripts/pp_memory.py   (forces the 8-device CPU mesh)
Prints one JSON line per (schedule, M).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sea_tpu.parallel.pp import (
    make_pp_mesh,
    pipeline_1f1b_value_and_grad,
    pipeline_layers,
    pipeline_layers_interleaved,
    sim_1f1b_schedule,
)

S, L, N, T, D, C = 4, 8, 16, 1024, 256, 64
EXP = 4  # MLP expansion: per-layer residuals are EXP x the boundary act


def build(mesh, M, schedule):
    rng = np.random.default_rng(0)
    lv = {
        "w1": jnp.asarray(rng.standard_normal((L, D, EXP * D)), jnp.float32) * 0.05,
        "w2": jnp.asarray(rng.standard_normal((L, EXP * D, D)), jnp.float32) * 0.05,
    }
    hv = {"wo": jnp.asarray(rng.standard_normal((D, C)), jnp.float32) * 0.1}
    h = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    head_args = {"y": jnp.asarray(rng.integers(0, C, (N, T)), jnp.int32)}

    def layer_apply(p, x, bnd):
        y = jnp.tanh(x @ p["w1"]) @ p["w2"] + x
        return y, jnp.float32(0.0)

    def head_loss(hvars, y_mb, ha):
        lp = jax.nn.log_softmax(y_mb @ hvars["wo"], -1)
        return -jnp.mean(jnp.sum(jax.nn.one_hot(ha["y"], C) * lp, -1))

    la = layer_apply
    if schedule.endswith("+remat"):
        la = jax.checkpoint(layer_apply, prevent_cse=False)

    if schedule.startswith("1f1b"):
        # keep loss AND grads as outputs — lowering only the loss lets
        # XLA dead-code-eliminate much of the explicit backward, which
        # would make the comparison vs jax.grad (whose outputs ARE the
        # grads) apples-to-oranges
        fn = lambda lv_, hv_, h_: pipeline_1f1b_value_and_grad(
            la, head_loss, lv_, hv_, h_, {}, head_args,
            mesh=mesh, num_microbatches=M,
        )[::2]  # (loss, (d_lv, d_hv, d_h))
        return jax.jit(fn), (lv, hv, h)

    if schedule.startswith("interleaved"):
        def loss(lv_, hv_, h_):
            out, _ = pipeline_layers_interleaved(
                la, lv_, h_, {}, mesh=mesh, num_microbatches=M, num_chunks=2
            )
            return head_loss(hv_, out, head_args)
    else:
        def loss(lv_, hv_, h_):
            out, _ = pipeline_layers(
                la, lv_, h_, {}, mesh=mesh, num_microbatches=M
            )
            return head_loss(hv_, out, head_args)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2))), (lv, hv, h)


KD_N, KD_T, KD_D, KD_L = 16, 512, 256, 8


def build_kd(mesh, M, schedule):
    """The same comparison on REAL OPT/SEA layers (VERDICT r4 #3): the
    (teacher, student) KD pair through GPipe-under-jax.grad vs the
    explicit 1F1B — at a geometry where M x boundary activation is the
    dominant term (both schedules remat within-layer residuals, so the
    difference IS the stage-input stash policy: O(M) vs O(S)). Both
    branches keep the gradients as OUTPUTS (see build's 1f1b note)."""
    import dataclasses

    from sea_tpu.config import SeaConfig
    from sea_tpu.models.opt import OptConfig, OptForCausalLM, stack_layer_params
    from sea_tpu.parallel.pp import pp_kd_1f1b_value_and_grad, pp_kd_loss
    from sea_tpu.training.distill import SeaOptKD
    sea = SeaConfig(
        num_heads=4, head_dim=KD_D // 4, predictor_length=64, k=16,
        performer_nb_factor=1, causal=True,
        max_position_embeddings=KD_T,
    ).validate()
    base = OptConfig(
        vocab_size=512, hidden_size=KD_D, num_layers=KD_L, num_heads=4,
        ffn_dim=4 * KD_D, max_position_embeddings=KD_T, sea=sea,
    )
    t_cfg = dataclasses.replace(base, attention_method="none")
    s_cfg = dataclasses.replace(base, attention_method="perlin")
    kd = SeaOptKD(t_cfg, s_cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 512, (KD_N, KD_T)), jnp.int32)
    mask = jnp.ones_like(ids)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    t_scan = {"params": stack_layer_params(t_vars["params"], KD_L)}
    s_scan = {"params": stack_layer_params(s_vars["params"], KD_L)}
    for extra in ("performer",):
        if extra in t_vars:
            t_scan[extra] = stack_layer_params(t_vars[extra], KD_L)
        if extra in s_vars:
            s_scan[extra] = stack_layer_params(s_vars[extra], KD_L)
    m_t = OptForCausalLM(dataclasses.replace(t_cfg, scan_layers=True))
    m_s = OptForCausalLM(dataclasses.replace(s_cfg, scan_layers=True))

    if schedule == "1f1b-kd":
        fn = lambda sv: pp_kd_1f1b_value_and_grad(
            m_t, m_s, t_scan, sv, ids, mask, ids,
            mesh=mesh, num_microbatches=M, use_remat=True,
        )[::2]  # (loss, d_student) — grads stay live outputs
        return jax.jit(fn), (s_scan,)
    fn = jax.value_and_grad(
        lambda sv: pp_kd_loss(
            m_t, m_s, t_scan, sv, ids, mask, ids,
            mesh=mesh, num_microbatches=M, use_remat=True,
        )[0]
    )
    return jax.jit(fn), (s_scan,)


def main_kd():
    mesh = make_pp_mesh(dp=1, pp=S, devices=jax.devices()[:S])
    for M in (4, 8, 16):
        act_mb = KD_N // M * KD_T * KD_D * 4 * 2  # (t, s) boundary pair
        for sched in ("gpipe-kd", "1f1b-kd"):
            fn, args = build_kd(mesh, M, sched)
            stats = fn.lower(*args).compile().memory_analysis()
            print(
                json.dumps(
                    {
                        "schedule": sched,
                        "layers": "OPT/SEA KD pair (D=256, T=512, L=8)",
                        "M": M,
                        "temp_MiB": round(stats.temp_size_in_bytes / 2**20, 1),
                        "microbatch_act_MiB": round(act_mb / 2**20, 2),
                    }
                ),
                flush=True,
            )


def main():
    mesh = make_pp_mesh(dp=1, pp=S, devices=jax.devices()[:S])
    act_mb = {M: N // M * T * D * 4 for M in (4, 8)}
    for M in (4, 8):
        f_tab, _ = sim_1f1b_schedule(S, M)
        for sched in (
            "gpipe",
            "gpipe+remat",
            "interleaved+remat",
            "1f1b",
        ):
            fn, args = build(mesh, M, sched)
            stats = fn.lower(*args).compile().memory_analysis()
            print(
                json.dumps(
                    {
                        "schedule": sched,
                        "M": M,
                        "temp_MiB": round(stats.temp_size_in_bytes / 2**20, 1),
                        "microbatch_act_MiB": round(act_mb[M] / 2**20, 2),
                        "ticks": int(
                            f_tab.shape[0] if sched == "1f1b" else (
                                2 * M + S - 1 if sched == "interleaved+remat"
                                else M + S - 1
                            )
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    if "--kd" in sys.argv:
        main_kd()
    else:
        main()
