"""OPT-1.3b KD on one v5e chip — the memory-plan proof (VERDICT r2 #3).

The reference tunes opt-1.3b with DeepSpeed ZeRO-2 + CPU offload across
GPUs (`/root/reference/README.md:45`, `config/ds_opt_1.3.json`); a single
16 GB chip cannot hold f32 AdamW for 1.3B x2 (params+moments alone are
20.8 GB). The TPU analogue proven here: scan_kd (one compiled layer-pair
body), bf16 params + bf16 mu (frozen-teacher moments never allocated —
optax.multi_transform masks them), bf16 activations, remat per layer pair,
donated buffers. Production multi-chip runs should keep f32 params and
shard optimizer state over dp (parallel/mesh.opt_state_sharding) instead.

Run (defaults: 10 steps, T=1024, N=1):
    python scripts/exp_opt13b.py --steps 10 --seq-len 1024
Prints one JSON line per step and a final summary with s/step and the
device peak HBM bytes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="opt-1.3b")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seq-len", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--save-dir", default="./saves/opt13b_proof")
    p.add_argument("--eval-steps", type=int, default=0,
                   help="strided eval-ppl every N steps (0 = proof mode, "
                        "no eval/checkpoint inside the run)")
    args = p.parse_args()

    from sea_tpu.benchmarks import device_peak_bytes
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model=args.model,
        num_steps=args.steps,
        batch_size=args.batch_size,
        max_seq_len=args.seq_len,
        stride=args.seq_len // 2,
        gradient_accumulation_steps=1,
        scan_kd=True,
        param_dtype="bfloat16",
        moment_dtype="bfloat16",
        logit_chunk=256,
        log_steps=1,
        eval_steps=args.eval_steps or 10 ** 9,
        save_dir=args.save_dir,
    )
    t0 = time.time()
    tr = OptTrainer(cfg)
    print(json.dumps({"event": "init_done", "s": round(time.time() - t0, 1)}),
          flush=True)

    losses = []
    orig_log = tr.log

    def log(rec):
        losses.append(rec.get("loss"))
        rec = dict(rec)
        rec["event"] = "step"
        print(json.dumps(rec), flush=True)
        orig_log(rec)

    tr.log = log
    t1 = time.time()
    tr.train()
    # log_steps=1 floats every loss (device->host sync per step), so the
    # wall clock below includes real completion, not async dispatch
    wall = time.time() - t1
    peak = device_peak_bytes()
    print(json.dumps({
        "event": "summary",
        "model": args.model,
        "steps": args.steps,
        "seq_len": args.seq_len,
        "s_per_step": round(wall / max(args.steps, 1), 3),
        "wall_s": round(wall, 1),
        "peak_hbm_gib": round(peak / 2 ** 30, 2) if peak else None,
        "losses": [round(float(x), 4) for x in losses if x is not None],
    }), flush=True)


if __name__ == "__main__":
    main()
