"""On-chip OPT-125m KD session with a logged eval-ppl trajectory
(VERDICT round-1 #5 'done when': >=1k optimizer steps on the chip with
eval-ppl on a schedule). Synthetic Zipf corpus (zero egress); teacher is
CE-pretrained first, standing in for the HF-hub finetuned teacher.

    python scripts/chip_kd_session.py --steps 1000 --eval-steps 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--eval-steps", type=int, default=100)
    p.add_argument("--pretrain-teacher", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--save-dir", default="./saves/chip_kd_r2")
    p.add_argument("--compute-dtype", default=None,
                   choices=[None, "bfloat16", "float32"])
    args = p.parse_args()

    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="opt-125m",
        num_steps=args.steps,
        batch_size=args.batch_size,
        max_seq_len=args.seq_len,
        stride=args.seq_len // 2,
        gradient_accumulation_steps=1,
        eval_steps=args.eval_steps,
        log_steps=20,
        scan_kd=True,
        pretrain_teacher_steps=args.pretrain_teacher,
        save_dir=args.save_dir,
        compute_dtype=args.compute_dtype,
    )
    t0 = time.time()
    tr = OptTrainer(cfg)
    print(f"trainer built (+teacher pretrain): {time.time() - t0:.0f}s", flush=True)
    ppl0 = tr.evaluate(max_batches=16)
    tr.log({"eval_ppl": ppl0})
    print(f"initial ppl: {ppl0:.3f}", flush=True)
    t0 = time.time()
    tr.train()
    print(f"train {cfg.num_steps} steps: {time.time() - t0:.0f}s", flush=True)
    ppl1 = tr.evaluate(max_batches=16)
    tr.log({"eval_ppl": ppl1, "final": 1})
    traj = []
    with open(tr.metrics_path) as f:
        for line in f:
            r = json.loads(line)
            if "eval_ppl" in r:
                traj.append((r["step"], round(r["eval_ppl"], 3)))
    print(json.dumps({"ppl_trajectory": traj, "final_ppl": ppl1}), flush=True)


if __name__ == "__main__":
    main()
