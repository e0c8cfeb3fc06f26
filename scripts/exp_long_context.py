"""Long-context sweep driver — the (context x dynamic_k x query_skips)
grid of reference `src/main/exp_long_context.py:1-60` (which re-launches
`perlin_trainer --eval` per combo with DYNAMIC_K/QUERY_SKIPS/__CONTEXT
env vars). TPU-native version: one process, parameters stretched once per
context via `extend_opt_context`, each combo jit-evaluated in-graph.

    python scripts/exp_long_context.py --model tiny \
        --contexts 128,256 --dynamic-ks 2,4 --query-skips 1,2

Prints one JSON line per combo: {context, dynamic_k, query_skips, ppl}.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sweep(
    model: str = "tiny",
    contexts=(64, 128),
    dynamic_ks=(0,),
    query_skips=(1, 2),
    checkpoint: str = "",
    n_eval_batches: int = 8,
    use_cpu: bool = False,
):
    if use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from sea_tpu.data.wikitext2 import get_corpus
    from sea_tpu.models.long_context import extend_opt_context
    from sea_tpu.models.opt import OptForCausalLM
    from sea_tpu.training.opt_trainer import model_configs, TrainerConfig

    base_cfg = TrainerConfig(model=model)
    _, s_cfg = model_configs(base_cfg)

    # base student params: from a checkpoint dir (orbax save of the trainer)
    # or fresh init (machinery sweep)
    model_base = OptForCausalLM(s_cfg)
    T0 = s_cfg.max_position_embeddings
    ids0 = jnp.ones((1, min(32, T0)), jnp.int32)
    variables = model_base.init(jax.random.key(0), ids0, jnp.ones_like(ids0))
    if checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(checkpoint))
        variables = {**variables, "params": restored["params"]}

    results = []
    for ctx in contexts:
        params_ext = extend_opt_context(variables["params"], ctx)
        vars_ext = {**variables, "params": params_ext}
        corpus = get_corpus(ctx, ctx, "test", vocab_size=s_cfg.vocab_size)
        for dk in dynamic_ks:
            for qs in query_skips:
                sea = dataclasses.replace(
                    s_cfg.sea,
                    max_position_embeddings=ctx,
                    dynamic_k=dk,
                    query_skips=qs,
                )
                cfg = dataclasses.replace(
                    s_cfg, sea=sea, max_position_embeddings=ctx
                )
                m = OptForCausalLM(cfg)

                @jax.jit
                def eval_step(v, ids, mask, labels):
                    out = m.apply(v, ids, mask)
                    logits = out["logits"][:, :-1].astype(jnp.float32)
                    tgt = labels[:, 1:]
                    valid = tgt != -100
                    safe = jnp.where(valid, tgt, 0)
                    logp = jax.nn.log_softmax(logits, -1)
                    nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
                    return jnp.where(valid, nll, 0.0).sum(), valid.sum()

                tot, toks = 0.0, 0
                for i, (ids, mask, labels) in enumerate(corpus.batches(1)):
                    if i >= n_eval_batches:
                        break
                    nll, tk = eval_step(
                        vars_ext, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(labels),
                    )
                    tot += float(nll)
                    toks += int(tk)
                ppl = float(np.exp(tot / max(toks, 1)))
                rec = {
                    "context": ctx,
                    "dynamic_k": dk,
                    "query_skips": qs,
                    "ppl": round(ppl, 4),
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--contexts", default="128,256")
    p.add_argument("--dynamic-ks", default="0")
    p.add_argument("--query-skips", default="1,2")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--eval-batches", type=int, default=8)
    args = p.parse_args()
    sweep(
        model=args.model,
        contexts=[int(x) for x in args.contexts.split(",")],
        dynamic_ks=[int(x) for x in args.dynamic_ks.split(",")],
        query_skips=[int(x) for x in args.query_skips.split(",")],
        checkpoint=args.checkpoint,
        n_eval_batches=args.eval_batches,
    )


if __name__ == "__main__":
    main()
