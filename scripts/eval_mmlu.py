"""MMLU evaluation driver for a trained SEA student (or dense teacher).

The reference's headline table reports MMLU for LLaMA-13B vs SEA-13B
(`/root/reference/README.md:38`) without shipping an evaluation harness;
this is the sea_tpu one. Offline-friendly: with no --data/--tokenizer the
synthetic task + hash tokenizer keep the pipeline runnable end to end.

  python scripts/eval_mmlu.py --model llama-tiny --fewshot 0
  python scripts/eval_mmlu.py --model llama-13b --checkpoint /path/ckpt \
      --data /path/mmlu --tokenizer /path/hf_dir --fewshot 5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-tiny")
    ap.add_argument("--method", default="perlin")
    ap.add_argument("--checkpoint", default=None,
                    help="local HF checkpoint dir for the weights")
    ap.add_argument("--data", default=None, help="MMLU csv dir (hendrycks layout)")
    ap.add_argument("--tokenizer", default=None, help="local HF tokenizer dir")
    ap.add_argument("--fewshot", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--benchmarking", action="store_true",
                    help="score through the fused sparse path")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sea_tpu.data.mmlu import (
        CHOICES,
        evaluate_mmlu,
        load_mmlu,
        make_choice_score_fn,
        synthetic_tokenizer,
    )
    from sea_tpu.training.opt_trainer import TrainerConfig, model_configs
    from sea_tpu.training.distill import causal_lm_for

    tcfg = TrainerConfig(model=args.model, method=args.method)
    _, s_cfg = model_configs(tcfg)
    model = causal_lm_for(s_cfg)

    ids = jnp.ones((1, 8), jnp.int32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, ids))()
    if args.checkpoint:
        from sea_tpu.models.llama import LlamaConfig
        from sea_tpu.models.loader import (
            load_llama_params,
            load_opt_params,
            student_from_teacher,
        )

        load = (
            load_llama_params
            if isinstance(s_cfg, LlamaConfig)
            else load_opt_params
        )
        loaded = load(args.checkpoint, s_cfg)
        variables = student_from_teacher(
            variables, loaded.get("params", loaded)
        )

    if args.tokenizer:
        from transformers import AutoTokenizer

        tk = AutoTokenizer.from_pretrained(args.tokenizer)
        tokenize = lambda s: tk(s, add_special_tokens=True)["input_ids"]
        letter_ids = [tk(f" {c}", add_special_tokens=False)["input_ids"][-1]
                      for c in CHOICES]
    else:
        tokenize = synthetic_tokenizer(s_cfg.vocab_size)
        letter_ids = [tokenize(c)[0] for c in CHOICES]

    examples = load_mmlu(args.data, "test")
    if args.limit:
        examples = examples[: args.limit]
    fewshot = None
    if args.fewshot > 0:
        dev = load_mmlu(args.data, "dev")
        fewshot = {}
        for ex in dev:
            fewshot.setdefault(ex.subject, [])
            if len(fewshot[ex.subject]) < args.fewshot:
                fewshot[ex.subject].append(ex)

    score = make_choice_score_fn(model, variables, benchmarking=args.benchmarking)
    res = evaluate_mmlu(
        score, examples, tokenize, letter_ids,
        max_len=args.max_len, batch_size=args.batch_size,
        fewshot_by_subject=fewshot,
    )
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
