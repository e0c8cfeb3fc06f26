"""Unified trainer CLI — the `perlin_trainer.py` entry point
(reference `src/trainer/perlin_trainer.py:41-61,200-224,440-591`).

One command dispatches on --dataset (wikitext2 -> OPT KD trainer,
glue -> GLUE trainer, lra -> LRA trainer), applies the shared SEA model
options, derives the experiment name with the reference's postfix mangling
(format_exp), and supports --load-checkpoint / --load-only-additionals.

    python -m sea_tpu.training.cli --dataset wikitext2 --model opt-125m \
        --k 64 --predictor-length 256 --performer-nb-feature-factor 8

DeepSpeed/AMP/compile toggles from the reference map to TPU-native
equivalents: --data-parallel (DP over the device mesh), --scan-kd
(scanned layer-pair graph), bf16 compute is a model-config field.
"""

from __future__ import annotations

import argparse
import os


def add_perlin_model_options(parser, predictor_length=128, k=7, nbf=1.0):
    """Shared SEA knobs (reference perlin_trainer.py:41-61)."""
    parser.add_argument("--method", default="perlin", type=str)
    parser.add_argument("--layerwise", action="store_true", default=False)
    parser.add_argument("--enable-lora", action="store_true", default=False)
    parser.add_argument("--k", default=k, type=int)
    parser.add_argument("--k-flatten-dim", default="causal_batch", type=str)
    parser.add_argument("--attention-predictor-method", default="mlp", type=str)
    parser.add_argument(
        "--performer-nb-feature-factor", default=nbf, type=float
    )
    parser.add_argument("--token-merging", action="store_true", default=False)
    parser.add_argument("--token-merging-preserve", default=0.2, type=float)
    parser.add_argument("--token-merging-ratio", default=0.5, type=float)
    parser.add_argument("--predictor-length", default=predictor_length, type=int)
    parser.add_argument("--predictor-backend", type=str, default="performer")
    parser.add_argument("--enc-per-layer", action="store_true", default=False)
    parser.add_argument("--context-output-method", default="mix", type=str)
    parser.add_argument("--k-oversample", default=1.0, type=float)
    return parser


def format_exp(name: str, args) -> str:
    """Experiment-name postfix mangling (reference perlin_trainer.py:200-224):
    non-default knobs append compact tags so checkpoints/metrics never
    collide across configurations."""
    b2i = lambda b: int(bool(b))
    postfixes = [
        f"lw{b2i(args.layerwise)}",
        f"{args.method}",
        f"k{args.k}" if args.k != 7 else "",
        "full" if not args.enable_lora else "",
        f"pred{args.attention_predictor_method}"
        if args.attention_predictor_method != "mlp" else "",
        f"nbf{args.performer_nb_feature_factor}"
        if args.performer_nb_feature_factor != 1 else "",
        f"tome_r{args.token_merging_ratio}_p{args.token_merging_preserve}"
        if args.token_merging else "",
        f"kdim_{args.k_flatten_dim}"
        if args.k_flatten_dim != "causal_batch" else "",
        f"pw{args.predictor_length}" if args.predictor_length != 256 else "",
        f"pbe{args.predictor_backend}"
        if args.predictor_backend != "performer" else "",
        "epl" if args.enc_per_layer else "",
        f"com_{args.context_output_method}"
        if args.context_output_method != "mix" else "",
        f"kover_{args.k_oversample}" if args.k_oversample != 1.0 else "",
    ]
    for p in postfixes:
        if p:
            name += f"_{p}"
    return name


def build_parser():
    parser = argparse.ArgumentParser(prog="sea_tpu.training.cli")
    parser.add_argument("--dataset", default="wikitext2",
                        choices=["wikitext2", "glue", "lra"])
    parser.add_argument("--model", default="opt-125m")
    parser.add_argument("--subset", default=None, type=str)
    parser.add_argument("--num-steps", default=None, type=int)
    parser.add_argument("--max-seq-len", default=None, type=int)
    parser.add_argument("--batch-size", default=None, type=int)
    parser.add_argument("--gradient-accumulation-steps", default=None, type=int)
    parser.add_argument("--eval-steps", default=None, type=int)
    parser.add_argument("--teacher-checkpoint", default=None, type=str)
    parser.add_argument("--load-checkpoint", default=None, type=str)
    parser.add_argument("--load-only-additionals", action="store_true")
    parser.add_argument("--eval", action="store_true", default=False)
    parser.add_argument("--save-root", default="./saves", type=str)
    parser.add_argument("--data-parallel", action="store_true", default=False)
    parser.add_argument("--scan-kd", action="store_true", default=False)
    # AMP analogue (reference opt_trainer.py:244-263 GradScaler): bf16
    # activations/matmuls, f32 params/optimizer. None = family default.
    parser.add_argument("--compute-dtype", default=None,
                        choices=[None, "bfloat16", "float32"])
    # single-chip memory plan for 1.3b+ (TrainerConfig.param_dtype docs):
    # bf16 param storage / bf16 AdamW first moment
    parser.add_argument("--param-dtype", default=None,
                        choices=[None, "bfloat16", "float32"])
    parser.add_argument("--moment-dtype", default=None,
                        choices=[None, "bfloat16", "float32"])
    # failure detection / elastic recovery (training/resilience.py):
    # keep N rotating step-tagged checkpoints, auto-resume the newest
    # intact one, and retry after divergence/device failure
    parser.add_argument("--checkpoint-rotation", default=0, type=int)
    parser.add_argument("--supervised", action="store_true", default=False,
                        help="run under the in-process elastic Supervisor "
                             "(auto-resume latest, rollback on divergence)")
    parser.add_argument("--max-restarts", default=3, type=int)
    add_perlin_model_options(parser)
    return parser


def build_trainer(args):
    """Resolve args -> (trainer, exp_name). Split out for tests."""
    if args.dataset == "wikitext2":
        from .opt_trainer import OptTrainer, TrainerConfig

        exp = format_exp(f"wikitext2_{args.model}", args)
        kw = dict(
            model=args.model,
            method=args.method,
            k=args.k,
            predictor_length=args.predictor_length,
            nb_factor=int(args.performer_nb_feature_factor),
            teacher_checkpoint=args.teacher_checkpoint,
            save_dir=os.path.join(args.save_root, exp),
            scan_kd=args.scan_kd,
            data_parallel=args.data_parallel,
            compute_dtype=args.compute_dtype,
            param_dtype=args.param_dtype,
            moment_dtype=args.moment_dtype,
            checkpoint_rotation=args.checkpoint_rotation,
        )
        if args.num_steps is not None:
            kw["num_steps"] = args.num_steps
        if args.max_seq_len is not None:
            kw["max_seq_len"] = args.max_seq_len
            kw["stride"] = args.max_seq_len // 2
        if args.batch_size is not None:
            kw["batch_size"] = args.batch_size
        if args.gradient_accumulation_steps is not None:
            kw["gradient_accumulation_steps"] = args.gradient_accumulation_steps
        if args.eval_steps is not None:
            kw["eval_steps"] = args.eval_steps
        return OptTrainer(TrainerConfig(**kw)), exp
    if args.dataset == "glue":
        from .glue_trainer import GlueTrainer, GlueTrainerConfig

        subset = args.subset or "mrpc"
        exp = format_exp(f"glue_{subset}", args)
        kw = dict(
            subset=subset,
            model=args.model if args.model != "opt-125m" else "bert-base",
            k=args.k,
            predictor_length=args.predictor_length,
            teacher_checkpoint=args.teacher_checkpoint,
            save_dir=os.path.join(args.save_root, exp),
        )
        if args.num_steps is not None:
            kw["num_steps"] = args.num_steps
        if args.batch_size is not None:
            kw["batch_size"] = args.batch_size
        if args.eval_steps is not None:
            kw["eval_steps"] = args.eval_steps
        if args.max_seq_len is not None:
            kw["max_length"] = args.max_seq_len
        return GlueTrainer(GlueTrainerConfig(**kw)), exp
    assert args.dataset == "lra"
    from .lra_trainer import LraTrainer, LraTrainerConfig

    task = args.subset or "listops"
    exp = format_exp(f"lra_{task}", args)
    kw = dict(
        task=task,
        k=args.k,
        predictor_length=args.predictor_length,
        save_dir=os.path.join(args.save_root, exp),
    )
    if args.num_steps is not None:
        kw["num_steps"] = args.num_steps
    if args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.eval_steps is not None:
        kw["eval_steps"] = args.eval_steps
    if args.max_seq_len is not None:
        kw["max_length"] = args.max_seq_len
    return LraTrainer(LraTrainerConfig(**kw)), exp


def main(argv=None):
    args = build_parser().parse_args(argv)
    trainer, exp = build_trainer(args)
    print(f"experiment: {exp}")
    if args.load_checkpoint:
        ok = trainer.load(
            args.load_checkpoint, only_additionals=args.load_only_additionals
        ) if args.dataset == "wikitext2" else trainer.load(args.load_checkpoint)
        print(f"loaded checkpoint {args.load_checkpoint}: {ok}")
    if args.eval:
        if args.dataset == "wikitext2":
            print("ppl:", trainer.evaluate(max_batches=32))
        elif args.dataset == "glue":
            print("score:", trainer.evaluate())
        else:
            print("acc:", trainer.evaluate("student"))
        return
    if args.dataset != "wikitext2":
        # supervision / rotation are OptTrainer-only features; don't let
        # the flags be silently ignored on glue/lra runs
        ignored = [
            name
            for name, on in (
                ("--supervised", args.supervised),
                ("--checkpoint-rotation", getattr(args, "checkpoint_rotation", 0)),
            )
            if on
        ]
        if ignored:
            raise SystemExit(
                f"{' and '.join(ignored)} only supported with "
                f"--dataset wikitext2 (got {args.dataset})"
            )
    if args.supervised and args.dataset == "wikitext2":
        from .resilience import Supervisor

        report = Supervisor(trainer, max_restarts=args.max_restarts).run()
        print(
            f"supervised run complete: step={report.final_step} "
            f"restarts={report.restarts}"
        )
    else:
        trainer.train()
    trainer.save()


if __name__ == "__main__":
    main()
