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


def test_beam_search_beam1_matches_greedy():
    """Beam search with beam_size=1 must reproduce greedy decoding, and
    wider beams must score at least as well (serving decode path)."""
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 1, 6, 6, 32
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(4, cfg.vocab_size, (N, P)), jnp.int32)
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.ones((N, P), jnp.int32),
            jnp.ones((N, P), jnp.int32),
        )
    )()

    greedy = model.apply(
        variables, prompt, MAXLEN, STEPS,
        method=lambda m, p, L, s: m.generate_greedy(p, L, s),
    )
    beams, scores = model.apply(
        variables, prompt, MAXLEN, STEPS,
        method=lambda m, p, L, s: m.generate_beam(p, L, s, beam_size=1),
    )
    np.testing.assert_array_equal(np.asarray(beams[:, 0]), np.asarray(greedy))

    beams4, scores4 = model.apply(
        variables, prompt, MAXLEN, STEPS,
        method=lambda m, p, L, s: m.generate_beam(p, L, s, beam_size=4),
    )
    assert beams4.shape == (N, 4, STEPS)
    # beams sorted best-first and the best beam-4 score >= beam-1 score
    s4 = np.asarray(scores4)
    assert (np.diff(s4, axis=-1) <= 1e-6).all()
    assert s4[0, 0] >= float(np.asarray(scores)[0, 0]) - 1e-6


def test_batched_beam_search():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 3, 5, 4, 24
    rng = np.random.default_rng(7)
    prompt = jnp.asarray(rng.integers(4, cfg.vocab_size, (N, P)), jnp.int32)
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.ones((N, P), jnp.int32),
            jnp.ones((N, P), jnp.int32),
        )
    )()
    beams, scores = model.apply(
        variables, prompt, MAXLEN, STEPS,
        method=lambda m, p, L, s: m.generate_beam(p, L, s, beam_size=3),
    )
    assert beams.shape == (N, 3, STEPS) and scores.shape == (N, 3)
    assert np.isfinite(np.asarray(scores)).all()
    # each batch row's beam search is independent: permuting the batch
    # permutes the outputs
    perm = jnp.asarray([2, 0, 1])
    beams_p, _ = model.apply(
        variables, prompt[perm], MAXLEN, STEPS,
        method=lambda m, p, L, s: m.generate_beam(p, L, s, beam_size=3),
    )
    np.testing.assert_array_equal(np.asarray(beams_p), np.asarray(beams)[perm])


def test_parallel_prefill_matches_sequential():
    """prefill_parallel (one batched forward) vs P sequential decode
    steps: prompt logits track the full forward, the decode states agree
    within the decode-vs-prefill tolerance class, and the greedy
    continuations are token-identical."""
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 1, 8, 6, 32
    ids, mask = make_batch(N=N, T=P, vocab=cfg.vocab_size, seed=11)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    logits_par, states_par = jax.jit(
        lambda v: model.apply(
            v, ids, MAXLEN,
            method=lambda m, p, L: m.prefill_parallel(p, L),
        )
    )(variables)
    # prefill runs the fused BENCHMARK forward (production inference path;
    # <=2e-4 from the train path per tests/test_fused_path.py)
    full_b = jax.jit(
        lambda v: model.apply(v, ids, mask, benchmarking=True)["logits"]
    )(variables)
    np.testing.assert_allclose(
        np.asarray(logits_par), np.asarray(full_b), atol=1e-4
    )
    full = jax.jit(lambda v: model.apply(v, ids, mask)["logits"])(variables)
    np.testing.assert_allclose(
        np.asarray(logits_par), np.asarray(full), atol=5e-3
    )

    # sequential prefill states for comparison
    states_seq = model.apply(
        variables, N, MAXLEN, method=lambda m, b, L: m.init_decode_states(b, L)
    )
    step = jax.jit(
        lambda v, tok, pos, sts: model.apply(
            v, tok, pos, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )
    for t in range(P):
        _, states_seq = step(variables, ids[:, t : t + 1], jnp.int32(t), states_seq)

    for li, (sp, sq) in enumerate(zip(states_par, states_seq)):
        assert int(sp.length) == int(sq.length) == P
        np.testing.assert_allclose(
            np.asarray(sp.performer_S), np.asarray(sq.performer_S),
            atol=1e-4, err_msg=f"layer {li} performer_S",
        )
        np.testing.assert_allclose(
            np.asarray(sp.performer_z), np.asarray(sq.performer_z),
            atol=1e-4, err_msg=f"layer {li} performer_z",
        )
        np.testing.assert_allclose(
            np.asarray(sp.k_cache), np.asarray(sq.k_cache),
            atol=2e-2, err_msg=f"layer {li} k_cache",
        )
        np.testing.assert_allclose(
            np.asarray(sp.cumavg_sum), np.asarray(sq.cumavg_sum),
            atol=2e-2, err_msg=f"layer {li} cumavg_sum",
        )
        # cnn window tail rows (filled region) agree within decode parity
        W = sp.cnn_window.shape[2]
        fill = min(P, W)
        np.testing.assert_allclose(
            np.asarray(sp.cnn_window[:, :, W - fill :]),
            np.asarray(sq.cnn_window[:, :, W - fill :]),
            atol=5e-2, err_msg=f"layer {li} cnn_window",
        )

    # greedy continuation: token-identical to the sequential-prefill path
    gen_seq = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS,
                method=lambda m, p, L, s: m.generate_greedy(p, L, s),
            )
        )(variables)
    )
    gen_par = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS,
                method=lambda m, p, L, s: m.generate_greedy(
                    p, L, s, parallel_prefill=True
                ),
            )
        )(variables)
    )
    assert (gen_seq == gen_par).all(), (gen_seq, gen_par)


def test_beam_parallel_prefill_matches_sequential():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    ids, _ = make_batch(N=1, T=8, vocab=cfg.vocab_size, seed=17)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), ids, jnp.ones_like(ids))
    )()
    t_seq, s_seq = jax.jit(
        lambda v: model.apply(
            v, ids, 32, 5,
            method=lambda m, p, L, s: m.generate_beam(p, L, s, beam_size=3),
        )
    )(variables)
    t_par, s_par = jax.jit(
        lambda v: model.apply(
            v, ids, 32, 5,
            method=lambda m, p, L, s: m.generate_beam(
                p, L, s, beam_size=3, parallel_prefill=True
            ),
        )
    )(variables)
    assert (np.asarray(t_seq) == np.asarray(t_par)).all()
    np.testing.assert_allclose(
        np.asarray(s_seq), np.asarray(s_par), atol=1e-4
    )


def test_scan_decode_matches_loop_decode():
    """Scan-body decode (VERDICT r4 #5: the 2.7b decode fix) must be
    token- and logit-identical to the loop-path decode: same layer
    methods, the stack driven by ONE lax.scan over the scan-layout
    stacked params instead of num_layers unrolled graph copies."""
    import dataclasses

    from sea_tpu.models.opt import (
        scan_decode_step,
        scan_generate_greedy,
        scan_prefill_parallel,
        stack_layer_params,
    )

    cfg = dataclasses.replace(tiny_opt("perlin"), num_layers=3)
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 2, 6, 5, 32
    ids, mask = make_batch(N=N, T=P, vocab=cfg.vocab_size, seed=9)
    v_loop = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    scan_model = OptForCausalLM(scan_cfg)
    v_scan = {"params": stack_layer_params(v_loop["params"], cfg.num_layers)}
    if "performer" in v_loop:
        v_scan["performer"] = stack_layer_params(
            v_loop["performer"], cfg.num_layers
        )

    # loop reference: parallel prefill + greedy scan
    toks_loop = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS,
                method=lambda m, p, L, s: m.generate_greedy(
                    p, L, s, parallel_prefill=True
                ),
            )
        )(v_loop)
    )
    toks_scan = np.asarray(
        jax.jit(
            lambda v: scan_generate_greedy(scan_model, v, ids, MAXLEN, STEPS)
        )(v_scan)
    )
    np.testing.assert_array_equal(toks_scan, toks_loop)

    # logits parity at the prefill boundary and after one decode step
    logits_loop, states_loop = jax.jit(
        lambda v: model.apply(
            v, ids, MAXLEN, True,
            method=lambda m, p, L, lo: m.prefill_parallel(p, L, last_only=lo),
        )
    )(v_loop)
    logits_scan, states_scan = jax.jit(
        lambda v: scan_prefill_parallel(scan_model, v, ids, MAXLEN)
    )(v_scan)
    np.testing.assert_allclose(
        np.asarray(logits_scan[:, -1]), np.asarray(logits_loop[:, -1]),
        atol=2e-5,
    )
    nxt = jnp.argmax(logits_loop[:, -1], -1).astype(jnp.int32)[:, None]
    l2_loop, _ = jax.jit(
        lambda v, sts: model.apply(
            v, nxt, P, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )(v_loop, states_loop)
    import jax.tree_util as jtu

    l2_scan, _ = jax.jit(
        lambda v, sts: scan_decode_step(scan_model, v, nxt, P, sts)
    )(v_scan, states_scan)
    np.testing.assert_allclose(
        np.asarray(l2_scan), np.asarray(l2_loop), atol=2e-5
    )
