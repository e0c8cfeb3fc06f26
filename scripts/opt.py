"""Canonical OPT launch wrapper — the analogue of reference
`scripts/opt.py:28-130`, which picks a DeepSpeed config per
(model, method) and launches `perlin_trainer`. The TPU equivalents of
those memory plans are flag presets on the unified CLI:

  ds_opt_125.json   (ZeRO-0)          -> plain loop KD
  ds_opt_350_zero2  (ZeRO-2)          -> scan_kd (scanned layer pair)
  ds_opt_1.3/2.7    (ZeRO-2+offload)  -> scan_kd + data-parallel dp mesh
                                         (ZeRO-1-style opt-state sharding
                                         lives in parallel/mesh.py)

    python scripts/opt.py --model opt-125m --method perlin [cli args...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# per-model TPU memory-plan presets (reference deepspeed_config table)
TUNING = {
    "opt-125m": [],
    "opt-350m": ["--scan-kd"],
    # single-chip fit (proven on the 16 GB v5e, RESULTS.md "OPT-1.3b KD"):
    # bf16 params + bf16 mu; multi-chip runs may drop the dtype flags and
    # rely on dp opt-state sharding instead
    "opt-1.3b": ["--scan-kd", "--data-parallel",
                 "--param-dtype", "bfloat16", "--moment-dtype", "bfloat16",
                 "--batch-size", "1", "--gradient-accumulation-steps", "32"],
    "opt-2.7b": ["--scan-kd", "--data-parallel",
                 "--param-dtype", "bfloat16", "--moment-dtype", "bfloat16",
                 "--batch-size", "1", "--gradient-accumulation-steps", "32"],
    "tiny": [],
}


def build_argv(argv):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, choices=sorted(TUNING))
    p.add_argument("--method", default="perlin",
                   choices=["none", "perlin", "performer", "reformer",
                            "sinkhorn", "cosformer"])
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--predictor-length", type=int, default=256)
    p.add_argument("--nbf", type=int, default=8)
    args, rest = p.parse_known_args(argv)
    out = [
        "--dataset", "wikitext2",
        "--model", args.model,
        "--method", args.method,
        "--k", str(args.k),
        "--predictor-length", str(args.predictor_length),
        "--performer-nb-feature-factor", str(args.nbf),
    ] + TUNING[args.model] + rest
    return out


def main():
    from sea_tpu.training.cli import main as cli_main

    cli_main(build_argv(sys.argv[1:]))


if __name__ == "__main__":
    main()
