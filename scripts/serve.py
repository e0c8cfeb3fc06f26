#!/usr/bin/env python
"""Continuous-batching serving demo/benchmark over the paged KV engine.

Submits a stream of synthetic requests with staggered arrivals and
variable prompt/output lengths, drives the engine to completion, and
prints throughput (the serving analogue of scripts/generate.py; the
reference has no serving system — `src/main/opt_generate.py` decodes one
batch at a time through HF generate).

Usage:
  python scripts/serve.py --model tiny --requests 8            # smoke
  python scripts/serve.py --model opt-125m --slots 8 --cpu     # layout test
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--num-pages", type=int, default=128)
    p.add_argument("--max-pages-per-slot", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=24)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0, help="0 disables")
    p.add_argument("--top-p", type=float, default=1.0, help="1.0 disables")
    p.add_argument("--chunk", type=int, default=1,
                   help="decode steps per host round trip (multi-step scheduling)")
    p.add_argument("--cpu", action="store_true", help="force local CPU")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax

    from sea_tpu.models.opt import OptForCausalLM, opt_125m
    from sea_tpu.serving import ServingEngine
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
    import jax.numpy as jnp

    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    t0 = time.time()
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    eng = ServingEngine(
        model,
        variables,
        max_slots=args.slots,
        page_size=args.page_size,
        num_pages=args.num_pages,
        max_pages_per_slot=args.max_pages_per_slot,
    )
    prompts = [
        rng.integers(4, cfg.vocab_size, size=int(n)).tolist()
        for n in rng.integers(3, 17, size=args.requests)
    ]

    # staggered arrivals: half up front, the rest trickle in while decoding
    for pr in prompts[: len(prompts) // 2]:
        eng.submit(pr, args.max_new_tokens, args.temperature,
                   args.top_k, args.top_p)
    t0 = time.time()
    steps = 0
    pending = prompts[len(prompts) // 2 :]
    while eng.has_work or pending:
        if pending and steps % 3 == 1:
            eng.submit(pending.pop(0), args.max_new_tokens,
                       args.temperature, args.top_k, args.top_p)
        eng.step(args.chunk)
        steps += 1
        if steps > 100_000:
            raise RuntimeError("runaway")
    # force device completion before timing (axon: block_until_ready lies)
    np.asarray(eng.pool_k[0, 0, 0, 0, 0])
    dt = time.time() - t0

    out = eng.finished
    gen = sum(len(r.output) for r in out.values())
    fed = sum(len(r.prompt) for r in out.values()) + gen - len(out)
    print(f"served {len(out)} requests in {steps} engine steps (chunk {args.chunk}), {dt:.2f}s")
    print(
        f"generated {gen} tokens ({gen / dt:.1f} tok/s), "
        f"processed {fed} ({fed / dt:.1f} tok/s incl. prefill)"
    )
    print(f"pages free at end: {eng.allocator.available}")
    for rid in sorted(out)[:4]:
        r = out[rid]
        print(f"  req {rid}: prompt {len(r.prompt)} -> {r.output[:8]}...")


if __name__ == "__main__":
    main()
