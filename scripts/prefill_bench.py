"""Parallel vs sequential prompt prefill on chip.

Measures `prefill_parallel` (one batched forward) against the sequential
decode-prefill scan for growing prompt lengths, plus token agreement of
the greedy continuations. Both variants run as ONE jitted computation
ending in a device-to-host read (the axon-safe timing recipe).

Run: python scripts/prefill_bench.py [--model tiny|opt-125m] [--steps 8]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="opt-125m")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--prompt-lens", default="128,512,1024")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from sea_tpu.models.opt import OptForCausalLM, opt_125m
    from sea_tpu.training.opt_trainer import tiny_configs

    if args.model == "tiny":
        _, cfg = tiny_configs()
    else:
        cfg = opt_125m("perlin")
    cfg = dataclasses.replace(
        cfg, sea=dataclasses.replace(cfg.sea, use_cache=True)
    )
    model = OptForCausalLM(cfg)

    rng = np.random.default_rng(0)
    for P in [int(x) for x in args.prompt_lens.split(",")]:
        max_len = P + args.steps
        if max_len > cfg.max_position_embeddings:
            continue
        prompt = jnp.asarray(
            rng.integers(4, cfg.vocab_size, (1, P)), jnp.int32
        )
        mask = jnp.ones_like(prompt)
        variables = jax.jit(
            lambda pr=prompt, m=mask: model.init(jax.random.key(0), pr, m)
        )()

        def gen(par, v, pr):
            return model.apply(
                v, pr, max_len, args.steps,
                method=lambda mm, a, b, c: mm.generate_greedy(
                    a, b, c, parallel_prefill=par
                ),
            )

        f_seq = jax.jit(lambda v, pr: gen(False, v, pr))
        f_par = jax.jit(lambda v, pr: gen(True, v, pr))

        def timed(f):
            np.asarray(f(variables, prompt))  # compile+warm
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = np.asarray(f(variables, prompt))
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_seq, tok_seq = timed(f_seq)
        t_par, tok_par = timed(f_par)
        print(json.dumps({
            "model": args.model,
            "prompt_len": P,
            "gen_steps": args.steps,
            "sequential_s": round(t_seq, 4),
            "parallel_s": round(t_par, 4),
            "speedup": round(t_seq / max(t_par, 1e-9), 2),
            "tokens_identical": bool((tok_seq == tok_par).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
