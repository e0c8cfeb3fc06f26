#!/usr/bin/env python
"""Multi-host TPU pod-slice launcher.

TPU-native replacement for the reference's DeepSpeed launcher
(`scripts/opt.py:113-154`, which shells out `deepspeed ...
src/trainer/perlin_trainer.py` to spawn one NCCL rank per GPU). On TPU,
one process per *host* calls `jax.distributed.initialize()`; JAX discovers
the slice topology from the TPU environment and all chips join one global
mesh — collectives ride ICI within a host's chips and DCN across hosts.

Usage (run on every host of the slice, e.g. via `gcloud ... ssh --worker=all`):

  python scripts/launch.py --trainer opt --model opt-125m --steps 10000 \
      [--coordinator <host0-ip>:8476 --num-processes N --process-id i]

Without explicit coordinator flags, jax.distributed auto-detects the TPU
pod environment (TPU_WORKER_HOSTNAMES et al.). Single-host runs work too
(initialize() is skipped when only one process).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trainer", default="opt", choices=["opt", "glue", "lra"])
    p.add_argument("--model", default="opt-125m")
    p.add_argument("--subset", default="mrpc")
    p.add_argument("--task", default="listops")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--predictor-length", type=int, default=256)
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    import jax

    if args.coordinator or args.num_processes:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run

    print(
        f"[launch] process {jax.process_index()}/{jax.process_count()} "
        f"local_devices={len(jax.local_devices())} global={len(jax.devices())}",
        flush=True,
    )

    if args.trainer == "opt":
        from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

        cfg = TrainerConfig(
            model=args.model,
            num_steps=args.steps,
            batch_size=args.batch_size,
            max_seq_len=args.seq_len,
            stride=args.seq_len // 2,
            k=args.k,
            predictor_length=args.predictor_length,
            teacher_checkpoint=args.teacher_checkpoint,
        )
        tr = OptTrainer(cfg)
        tr.train()
        if jax.process_index() == 0:
            print("final ppl:", tr.evaluate(max_batches=16))
    elif args.trainer == "glue":
        from sea_tpu.training.glue_trainer import GlueTrainer, GlueTrainerConfig

        tr = GlueTrainer(GlueTrainerConfig(subset=args.subset, num_steps=args.steps))
        tr.train()
        if jax.process_index() == 0:
            print("eval:", tr.evaluate())
    else:
        from sea_tpu.training.lra_trainer import LraTrainer, LraTrainerConfig

        tr = LraTrainer(LraTrainerConfig(task=args.task, num_steps=args.steps))
        tr.train()
        if jax.process_index() == 0:
            print("acc:", tr.evaluate("student"))


if __name__ == "__main__":
    main()
