"""opt-2.7b EXECUTES on one 16 GB v5e chip (VERDICT r3 #3).

The reference tunes opt-2.7b on 24 GB GPUs (README.md:45); round 3 proved
the 2.7b KD *training* geometry only as an eval_shape graph (pp4 plan,
tests/test_pp.py). This script actually runs the model on the chip:
bf16 params (~5.3 GB) fit for inference.

Two stages, cheapest compile first (remote tunnel):
  1. strided-eval forward at T=2048 (scan_layers=True -> one compiled
     layer body) with per-window PPL over the synthetic corpus;
  2. parallel prefill + greedy decode via the SCAN-body decode
     (`scan_generate_greedy`: one compiled prefill body + one compiled
     decode body — the loop path's 32 unrolled layer graphs were what
     the remote tunnel could not compile in round 4).

Run: python scripts/exp_opt27b.py [--skip-decode] [--prompt-len 256]
Prints one JSON line per stage (latency + device peak HBM).
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--prompt-len", type=int, default=256)
    p.add_argument("--decode-steps", type=int, default=16)
    p.add_argument("--skip-decode", action="store_true")
    p.add_argument("--eval-windows", type=int, default=4)
    args = p.parse_args()

    from sea_tpu.benchmarks import device_peak_bytes
    from sea_tpu.models.opt import OptForCausalLM, opt_2_7b
    from sea_tpu.data.wikitext2 import synthetic_corpus

    T = args.seq_len
    base = opt_2_7b("perlin")
    cfg_scan = dataclasses.replace(
        base, scan_layers=True, max_position_embeddings=T,
        sea=dataclasses.replace(base.sea, max_position_embeddings=T),
    )
    m_scan = OptForCausalLM(cfg_scan)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg_scan.vocab_size, (1, T)), jnp.int32)
    mask = jnp.ones_like(ids)

    # init directly cast to bf16 inside the jit so the f32 tree is never
    # resident in full (10.6 GB f32 + 5.3 GB bf16 would not fit)
    t0 = time.time()
    variables = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            m_scan.init(jax.random.key(0), ids, mask),
        )
    )()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], variables)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(json.dumps({
        "event": "init_bf16", "s": round(time.time() - t0, 1),
        "params_m": round(n_params / 1e6, 1),
        "peak_hbm_gb": round((device_peak_bytes() or 0) / 2**30, 2),
    }), flush=True)

    # ---- stage 1: strided eval PPL (scan path, benchmark forward) ----
    corpus = synthetic_corpus(
        cfg_scan.vocab_size, total_tokens=T * (args.eval_windows + 1)
    )

    @jax.jit
    def window_nll(v, w_ids):
        out = m_scan.apply(v, w_ids, jnp.ones_like(w_ids), labels=w_ids)
        return out["loss"]

    t0 = time.time()
    nll0 = float(window_nll(variables, ids))
    print(json.dumps({"event": "eval_compile", "s": round(time.time() - t0, 1),
                      "first_window_nll": round(nll0, 4)}), flush=True)
    nlls, t0 = [], time.time()
    stride = T // 2
    for i in range(args.eval_windows):
        w = jnp.asarray(corpus[i * stride : i * stride + T][None, :], jnp.int32)
        nlls.append(float(window_nll(variables, w)))
    dt = time.time() - t0
    print(json.dumps({
        "event": "strided_eval",
        "windows": args.eval_windows,
        "s_per_window": round(dt / args.eval_windows, 2),
        "ppl_synthetic_random_init": round(float(np.exp(np.mean(nlls))), 1),
        "peak_hbm_gb": round((device_peak_bytes() or 0) / 2**30, 2),
    }), flush=True)

    if args.skip_decode:
        return

    # ---- stage 2: parallel prefill + greedy decode (SCAN body) ----
    # The loop path unrolls 32 layer graphs — exactly what the remote
    # tunnel cannot compile (round-4 negative result). scan_generate_greedy
    # (VERDICT r4 #5) compiles ONE prefill body + ONE decode body.
    from sea_tpu.models.opt import scan_generate_greedy

    P, S = args.prompt_len, args.decode_steps
    cfg_dec = dataclasses.replace(
        cfg_scan,
        sea=dataclasses.replace(cfg_scan.sea, use_cache=True),
    )
    m_dec = OptForCausalLM(cfg_dec)
    prompt = jnp.asarray(rng.integers(4, base.vocab_size, (1, P)), jnp.int32)

    gen = jax.jit(
        lambda v, pr: scan_generate_greedy(m_dec, v, pr, P + S, S)
    )
    t0 = time.time()
    toks = np.asarray(gen(variables, prompt))
    print(json.dumps({"event": "decode_compile+first", "s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    toks = np.asarray(gen(variables, prompt))
    dt = time.time() - t0
    print(json.dumps({
        "event": "prefill_decode",
        "prompt_len": P,
        "decode_steps": S,
        "s_total": round(dt, 2),
        "decode_tok_s": round(S / dt, 2),
        "peak_hbm_gb": round((device_peak_bytes() or 0) / 2**30, 2),
        "tokens_tail": [int(t) for t in toks.ravel()[-4:]],
    }), flush=True)


if __name__ == "__main__":
    main()
