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


def test_generate_scan_matches_python_loop():
    """On-device lax.scan generation == per-step python-loop generation."""
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 1, 6, 5, 32
    ids, mask = make_batch(N=N, T=P, vocab=cfg.vocab_size, seed=7)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    scan_tokens = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS,
                method=lambda m, p, L, s: m.generate_greedy(p, L, s),
            )
        )(variables)
    )

    # python loop reference
    states = model.apply(
        variables, N, MAXLEN, method=lambda m, b, L: m.init_decode_states(b, L)
    )
    step = jax.jit(
        lambda v, tok, pos, sts: model.apply(
            v, tok, pos, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )
    logits = None
    for t in range(P):
        logits, states = step(variables, ids[:, t : t + 1], jnp.int32(t), states)
    out = []
    for i in range(STEPS):
        nxt = int(np.asarray(logits[0, -1]).argmax())
        out.append(nxt)
        logits, states = step(
            variables, jnp.asarray([[nxt]], jnp.int32), jnp.int32(P + i), states
        )
    np.testing.assert_array_equal(scan_tokens[0], np.asarray(out))
