"""Device-trace one LRA KD microbatch step (diagnosing the 47 s/microbatch
pathology): capture the XPlane for a single accum=1 `_kd_step` call and
summarise per-op device time with the vendored proto parser.

Run: python scripts/lra_kd_trace.py
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.training.lra_trainer import LraTrainer, LraTrainerConfig
from sea_tpu.utils import enable_compile_cache
from sea_tpu.utils.profiler import device_trace


def main():
    enable_compile_cache()
    cfg = LraTrainerConfig(
        task="listops", phase="distill", num_steps=4000,
        batch_size=4, max_length=2048, scale=0.5, n_train=32768,
        max_depth=10, warmup_steps=500, lr_decay="rsqrt",
        eval_every=250, accum_steps=1,
    )
    tr = LraTrainer(cfg)
    it = tr.train_ds.batches(4, shuffle=True, seed=1)
    micro = [next(it)]
    b = tuple(jnp.asarray(np.stack([m[j] for m in micro])) for j in range(4))
    tr.rng, rng = jax.random.split(tr.rng)
    # warm/compile outside the trace
    s_params, opt_state, loss, det = tr._kd_step(
        tr.s_params, tr.opt_state, tr.t_vars["params"], *b, rng
    )
    print("warm step loss", float(loss), flush=True)
    logdir = "saves/xprof_lra_kd"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with device_trace(logdir):
        s_params, opt_state, loss, det = tr._kd_step(
            s_params, opt_state, tr.t_vars["params"], *b, rng
        )
        lv = float(loss)
    print(f"traced step: loss {lv:.3f} wall {time.perf_counter()-t0:.1f}s",
          flush=True)
    produced = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if produced:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from kernel_trace import summarize_xplane

        summarize_xplane(produced[-1])
    else:
        print("no xplane produced")


if __name__ == "__main__":
    main()
