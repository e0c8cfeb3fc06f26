#!/usr/bin/env python
"""Autoregressive generation demo with the SEA decode cache — the analogue
of reference `src/main/opt_generate.py` (HF generate + perlin cache).

Usage: python scripts/generate.py [--model tiny] [--steps 32]
With --model opt-125m and --checkpoint <dir>, generates from real weights.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=8)
    p.add_argument("--max-len", type=int, default=128)
    p.add_argument("--parallel-prefill", action="store_true", default=False,
                   help="ingest the prompt with ONE batched forward "
                        "(prefill_parallel) instead of per-token decode")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="> 0 samples (HF do_sample semantics); 0 = greedy")
    p.add_argument("--top-k", type=int, default=0, help="0 disables")
    p.add_argument("--top-p", type=float, default=1.0, help="1.0 disables")
    p.add_argument("--seed", type=int, default=0, help="sampling key")
    args = p.parse_args()

    from sea_tpu.models.opt import OptForCausalLM, opt_125m
    from sea_tpu.training.opt_trainer import tiny_configs

    if args.model == "tiny":
        _, cfg = tiny_configs()
        cfg = dataclasses.replace(cfg, sea=dataclasses.replace(cfg.sea, use_cache=True))
    else:
        cfg = opt_125m("perlin")
        cfg = dataclasses.replace(cfg, sea=dataclasses.replace(cfg.sea, use_cache=True))
    model = OptForCausalLM(cfg)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (1, args.prompt_len)), jnp.int32
    )
    mask = jnp.ones_like(prompt)
    variables = model.init(jax.random.key(0), prompt, mask)
    if args.checkpoint:
        from sea_tpu.models.loader import load_opt_params, student_from_teacher

        teacher = load_opt_params(args.checkpoint, cfg)
        variables = student_from_teacher(variables, teacher.get("params", teacher))

    states = model.apply(
        variables, 1, args.max_len,
        method=lambda m, b, L: m.init_decode_states(b, L),
    )
    step = jax.jit(
        lambda v, tok, pos, sts: model.apply(
            v, tok, pos, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )

    tokens = [int(t) for t in np.asarray(prompt[0])]
    if args.parallel_prefill:
        # one batched forward builds the decode caches (prompt latency
        # drops from prompt_len matvec steps to one MXU pass)
        logits_all, states = jax.jit(
            lambda v, pr: model.apply(
                v, pr, args.max_len,
                method=lambda m, p_, L: m.prefill_parallel(p_, L),
            )
        )(variables, prompt)
        logits = logits_all[:, -1:, :]
    else:
        # prefill through the decode path (exercises the stateful cache)
        logits = None
        for t in range(args.prompt_len):
            logits, states = step(
                variables, prompt[:, t : t + 1], jnp.int32(t), states
            )
    from sea_tpu.ops.sampling import sample_logits

    sample = jax.jit(
        lambda k, lg: sample_logits(
            k, lg, args.temperature, args.top_k, args.top_p
        )
    )
    key = jax.random.key(args.seed)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        nxt = int(np.asarray(sample(sub, logits[:, -1].astype(jnp.float32)))[0])
        tokens.append(nxt)
        logits, states = step(
            variables,
            jnp.asarray([[nxt]], jnp.int32),
            jnp.int32(args.prompt_len + i),
            states,
        )
    print("generated token ids:", tokens)


if __name__ == "__main__":
    main()
