"""Run exactly ONE LRA KD step on the chip (crash isolation).

Usage: python scripts/lra_kd_probe.py [batch] [accum]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.training.lra_trainer import LraTrainer, LraTrainerConfig
from sea_tpu.utils import enable_compile_cache


def main():
    enable_compile_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = LraTrainerConfig(
        task="listops", phase="distill", num_steps=4000,
        batch_size=B, max_length=2048, scale=0.5, n_train=32768,
        max_depth=10, warmup_steps=500, lr_decay="rsqrt",
        eval_every=250, accum_steps=A,
    )
    tr = LraTrainer(cfg)
    it = tr.train_ds.batches(B, shuffle=True, seed=1)
    micro = [next(it) for _ in range(A)]
    b = tuple(
        jnp.asarray(np.stack([m[j] for m in micro])) for j in range(4)
    )
    tr.rng, rng = jax.random.split(tr.rng)
    print("compiling + running 1 kd step...", flush=True)
    t0 = time.time()
    s_params, opt_state, loss, det = tr._kd_step(
        tr.s_params, tr.opt_state, tr.t_vars["params"], *b, rng
    )
    lv = float(loss)
    print(f"step ok: loss {lv:.4f} in {time.time()-t0:.0f}s", flush=True)
    for step in range(2, 7):
        t0 = time.time()
        tr.rng, rng = jax.random.split(tr.rng)
        micro = [next(it) for _ in range(A)]
        b = tuple(
            jnp.asarray(np.stack([m[j] for m in micro])) for j in range(4)
        )
        s_params, opt_state, loss, det = tr._kd_step(
            s_params, opt_state, tr.t_vars["params"], *b, rng
        )
        print(f"step {step} ok: loss {float(loss):.4f} in "
              f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
