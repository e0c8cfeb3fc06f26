"""T=8192 task-only train step on the chip through the differentiable
fused sparse kernel (VERDICT round-1 #4 'done when'): OPT-125m-geometry
student with use_fused_train, scanned layers, CE loss only — the dense
O(T^2) train path never materialises.

    python scripts/longctx_train_step.py [--t 8192] [--layers 12]
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
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=8192)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--logit-chunk", type=int, default=0,
                   help="stream the task CE per chunk (at T=32k the full "
                        "f32 logits alone are ~6.6 GB and OOM the chip)")
    p.add_argument("--cnn-chunk", type=int, default=0,
                   help="row-chunk the predictor CausalConv2d stack "
                        "(exact; needed at T=64k where the unchunked conv's "
                        "XLA padding requests ~31 GB)")
    p.add_argument("--trace", default=None,
                   help="capture an xprof device trace of one steady step "
                        "into this logdir and print the top device ops")
    args = p.parse_args()

    from sea_tpu.config import opt_config
    from sea_tpu.models.opt import OptConfig, OptForCausalLM

    T = args.t
    sea = opt_config(
        use_fused_train=True,
        max_position_embeddings=T,
        cnn_row_chunk=args.cnn_chunk,
    )
    cfg = OptConfig(
        attention_method="perlin",
        num_layers=args.layers,
        max_position_embeddings=T,
        scan_layers=True,
        scan_remat=True,
        compute_dtype="bfloat16",
        sea=sea,
    )
    model = OptForCausalLM(cfg)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, T)), jnp.int32)
    mask = jnp.ones((1, T), jnp.int32)

    t0 = time.time()
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    tx = optax.adamw(1e-5, weight_decay=1e-2)
    opt_state = tx.init(variables["params"])

    def step(params, opt_state, ids, mask):
        def loss_fn(p):
            out = model.apply(
                {**variables, "params": p}, ids, mask, labels=ids,
                training=True, rng=jax.random.key(1),
                logit_chunk=args.logit_chunk or None,
            )
            return out["loss"] + 0.0 * out["aux_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    params = variables["params"]
    t0 = time.time()
    params, opt_state, loss = jstep(params, opt_state, ids, mask)
    print(f"compile+step1: {time.time() - t0:.1f}s loss={float(loss):.4f}", flush=True)
    times = []
    for i in range(args.steps - 1):
        t0 = time.time()
        params, opt_state, loss = jstep(params, opt_state, ids, mask)
        lv = float(loss)  # device->host forces completion
        times.append(time.time() - t0)
        print(f"step{i + 2}: {times[-1]:.2f}s loss={lv:.4f}", flush=True)
    print(json.dumps({
        "t": T, "layers": args.layers,
        "steady_step_s": round(float(np.median(times)), 3) if times else None,
        "final_loss": float(loss),
    }), flush=True)

    if args.trace:
        import glob

        from sea_tpu.utils.profiler import device_trace

        os.makedirs(args.trace, exist_ok=True)
        with device_trace(args.trace):
            params, opt_state, loss = jstep(params, opt_state, ids, mask)
            float(loss)
        produced = sorted(
            glob.glob(os.path.join(args.trace, "**", "*.xplane.pb"),
                      recursive=True),
            key=os.path.getmtime,
        )
        if produced:
            sys.path.insert(0, os.path.dirname(__file__))
            from kernel_trace import summarize_xplane

            summarize_xplane(produced[-1])


if __name__ == "__main__":
    main()
