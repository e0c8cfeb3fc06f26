"""Compile-only memory analysis of the LRA KD step (debugging the TPU
worker crash on the first distill step): lower + compile the exact
`_kd_step_impl` graph at the run geometry and print XLA's buffer
accounting — no execution, so a too-big plan can't kill the worker.

Usage: python scripts/lra_kd_mem.py [batch] [accum]
"""
import sys

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
    T = tr.train_ds.input_ids.shape[1]
    ids = jnp.ones((A, B, T), jnp.int32)
    mask = jnp.ones((A, B, T), jnp.int32)
    tt = jnp.zeros((A, B, T), jnp.int32)
    labels = jnp.zeros((A, B), jnp.int32)
    rng = jax.random.key(0)
    lowered = jax.jit(
        tr._kd_step_impl, donate_argnums=(0, 1)
    ).lower(tr.s_params, tr.opt_state, tr.t_vars["params"],
            ids, mask, tt, labels, rng)
    compiled = lowered.compile()
    st = compiled.memory_analysis()
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(st, k, None)
        if v is not None:
            print(f"{k}: {v/2**20:.1f} MiB")
    tot = (st.temp_size_in_bytes + st.argument_size_in_bytes
           + st.output_size_in_bytes - getattr(st, "alias_size_in_bytes", 0))
    print(f"total (args+temp+out-alias): {tot/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
