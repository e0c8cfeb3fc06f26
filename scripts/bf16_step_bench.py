"""On-chip KD step-time comparison: f32 vs bf16 compute for OPT-125m.

The TPU analogue of the reference's AMP benchmark question (its trainer
wraps the step in torch.cuda.amp.autocast + GradScaler,
/root/reference/src/trainer/opt_trainer.py:244-263). Here mixed precision
is a model-config field (`compute_dtype`): bf16 activations/matmuls with
f32 params/optimizer and f32 loss islands; no loss scaling (bf16 keeps
f32's exponent range).

    python scripts/bf16_step_bench.py --steps 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def time_steps(dtype, steps):
    import jax
    import jax.numpy as jnp

    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="opt-125m",
        batch_size=2,
        max_seq_len=512,
        stride=256,
        gradient_accumulation_steps=1,
        num_steps=1,
        pretrain_teacher_steps=0,
        scan_kd=True,
        save_dir=f"./saves/bf16_bench_{dtype or 'default'}",
        compute_dtype=dtype,
    )
    t0 = time.time()
    tr = OptTrainer(cfg)
    build_s = time.time() - t0

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (2, 512)), jnp.int32)
    mask = jnp.ones((2, 512), jnp.int32)
    labels = ids
    key = jax.random.key(0)

    p, o = tr.combined_params, tr.opt_state
    t0 = time.time()
    p, o, loss, det = tr._train_step(p, o, ids, mask, labels, key)
    loss0 = float(np.asarray(loss))  # forces completion through the relay
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        p, o, loss, det = tr._train_step(p, o, ids, mask, labels, key)
    lossN = float(np.asarray(loss))
    per_step = (time.time() - t0) / steps

    # device-loop timing: run `steps` optimizer steps inside ONE jitted
    # fori_loop so the relay's per-call latency (seconds) divides out —
    # the only way to see the real on-device step time through the tunnel
    # (same methodology as bench.py; host-loop step_s above is relay-bound)
    def fused(p, o, loss0_):
        def body(i, carry):
            p, o, _ = carry
            p2, o2, loss, _det = tr._train_step_scan_impl(
                p, o, ids, mask, labels, key
            )
            return (p2, o2, loss)

        return jax.lax.fori_loop(0, steps, body, (p, o, loss0_))

    fused_j = jax.jit(fused)
    z = jnp.float32(0.0)
    pf, of, lf = fused_j(p, o, z)  # compile + warm
    np.asarray(lf)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        pf, of, lf = fused_j(p, o, z)
        np.asarray(lf)
        best = min(best, time.time() - t0)
    device_per_step = best / steps

    return dict(
        dtype=dtype or "float32",
        build_s=round(build_s, 1),
        first_step_s=round(compile_s, 1),
        step_s=round(per_step, 4),
        device_step_s=round(device_per_step, 4),
        loss0=round(loss0, 4),
        lossN=round(lossN, 4),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--dtypes", default="float32,bfloat16")
    args = p.parse_args()
    out = []
    for d in args.dtypes.split(","):
        r = time_steps(None if d == "default" else d, args.steps)
        print(json.dumps(r), flush=True)
        out.append(r)
    if len(out) == 2:
        print(json.dumps({
            "host_loop_speedup": round(out[0]["step_s"] / out[1]["step_s"], 2),
            "device_speedup": round(
                out[0]["device_step_s"] / out[1]["device_step_s"], 2
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
