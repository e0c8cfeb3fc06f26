"""OPT model decode vs full forward (reference test_perlin_opt_cache.py at
the model level): logits from incremental decode must track the full causal
forward, and greedy continuations must match."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_opt_kd import tiny_opt, make_batch
from sea_tpu.models.opt import OptForCausalLM


def test_opt_decode_matches_full_forward():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, T = 1, 12
    ids, mask = make_batch(N=N, T=T, vocab=cfg.vocab_size, seed=3)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    full = jax.jit(lambda v: model.apply(v, ids, mask)["logits"])(variables)

    states = model.apply(
        variables, N, T, method=lambda m, b, L: m.init_decode_states(b, L)
    )
    step = jax.jit(
        lambda v, tok, pos, sts: model.apply(
            v, tok, pos, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )
    logits_rows = []
    for t in range(T):
        logits, states = step(
            variables, ids[:, t : t + 1], jnp.int32(t), states
        )
        logits_rows.append(np.asarray(logits))
    dec = np.concatenate(logits_rows, axis=1)

    err = np.abs(dec - np.asarray(full)).max()
    assert err < 2e-2, err
    # greedy argmax agreement (the metric the reference cache test reports)
    agree = (dec.argmax(-1) == np.asarray(full).argmax(-1)).mean()
    assert agree == 1.0, agree
