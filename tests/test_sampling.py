"""Sampling ops (temperature / top-k / top-p) and the generate_sample /
serving integration. HF `generate(do_sample=True)` semantics (the path
the reference's main/opt_generate.py rides): temperature scale, then
top-k filter, then top-p filter, then categorical."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.ops.sampling import filter_logits, sample_logits
from sea_tpu.models.opt import OptForCausalLM
from tests.test_opt_kd import tiny_opt, make_batch


def test_filter_logits_top_k_oracle():
    logits = jnp.asarray(
        [[1.0, 5.0, 3.0, 2.0, 4.0], [0.0, -1.0, 2.0, 1.0, -2.0]], jnp.float32
    )
    out = np.asarray(filter_logits(logits, top_k=2))
    # row 0: keep 5.0 and 4.0; row 1: keep 2.0 and 1.0
    assert np.isfinite(out[0, [1, 4]]).all() and np.isneginf(
        out[0, [0, 2, 3]]
    ).all()
    assert np.isfinite(out[1, [2, 3]]).all() and np.isneginf(
        out[1, [0, 1, 4]]
    ).all()
    # disabled filter (top_k=0) keeps everything
    assert np.isfinite(np.asarray(filter_logits(logits, top_k=0))).all()


def test_filter_logits_top_p_oracle():
    # probs = softmax([log 0.5, log 0.3, log 0.15, log 0.05])
    p = np.asarray([0.5, 0.3, 0.15, 0.05], np.float32)
    logits = jnp.asarray(np.log(p))[None, :]
    # p=0.7: cumsum-before = [0, .5, .8, .95] < 0.7 keeps the first two
    # (the token crossing the boundary is included)
    out = np.asarray(filter_logits(logits, top_p=0.7))
    assert np.isfinite(out[0, :2]).all() and np.isneginf(out[0, 2:]).all()
    # p tiny keeps only the argmax
    out1 = np.asarray(filter_logits(logits, top_p=1e-6))
    assert np.isfinite(out1[0, 0]) and np.isneginf(out1[0, 1:]).all()
    # p=1.0 disables
    assert np.isfinite(np.asarray(filter_logits(logits, top_p=1.0))).all()
    # p=0.0 still keeps the argmax (HF min_tokens_to_keep=1), never an
    # arbitrary token
    out0 = np.asarray(filter_logits(logits, top_p=0.0))
    assert np.isfinite(out0[0, 0]) and np.isneginf(out0[0, 1:]).all()


def test_filter_logits_top_k_then_top_p_composition():
    """HF order: top-p mass is measured on the distribution renormalised
    over the top-k survivors (TopKLogitsWarper then TopPLogitsWarper).
    probs [0.4, 0.35, 0.25] with top_k=2: renormalised [0.533, 0.467] —
    top_p=0.5 keeps only the first token."""
    p = np.asarray([0.4, 0.35, 0.25], np.float32)
    logits = jnp.asarray(np.log(p))[None, :]
    out = np.asarray(filter_logits(logits, top_k=2, top_p=0.5))
    assert np.isfinite(out[0, 0]) and np.isneginf(out[0, 1:]).all()
    # without the renormalisation (measuring p on the full distribution)
    # token 1 would also survive: 0.4 < 0.5


def test_filter_logits_exact_k_under_ties():
    """Degenerate (all-equal) logits — the untrained-model case — must
    still keep EXACTLY k tokens / the exact nucleus prefix, like HF's
    position-based warpers, not every tied token."""
    logits = jnp.zeros((2, 8), jnp.float32)
    out = np.asarray(filter_logits(logits, top_k=2))
    assert (np.isfinite(out).sum(-1) == 2).all()
    out_p = np.asarray(filter_logits(logits, top_p=0.5))
    # uniform probs 1/8: prefix mass before token i is i/8 < 0.5 -> keep 4
    assert (np.isfinite(out_p).sum(-1) == 4).all()
    out_kp = np.asarray(filter_logits(logits, top_k=3, top_p=0.5))
    # renormalised over 3: csum-before = [0, 1/3, 2/3] < 0.5 -> keep 2
    assert (np.isfinite(out_kp).sum(-1) == 2).all()


def test_filter_logits_per_row_params():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)), jnp.float32)
    out = np.asarray(
        filter_logits(logits, top_k=jnp.asarray([1, 0, 4]), top_p=1.0)
    )
    assert (np.isfinite(out[0]).sum(), np.isfinite(out[1]).sum(),
            np.isfinite(out[2]).sum()) == (1, 8, 4)


def test_sample_logits_modes():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 16)) * 3, jnp.float32)
    greedy = np.asarray(logits).argmax(-1)
    # temperature <= 0 -> greedy
    ids = np.asarray(sample_logits(jax.random.key(0), logits, temperature=0.0))
    np.testing.assert_array_equal(ids, greedy)
    # top_k=1 -> greedy regardless of temperature
    ids = np.asarray(
        sample_logits(jax.random.key(1), logits, temperature=5.0, top_k=1)
    )
    np.testing.assert_array_equal(ids, greedy)
    # top_k=3 at high temperature: every draw lands in the per-row top-3
    top3 = np.argsort(np.asarray(logits), -1)[:, -3:]
    draws = jax.vmap(
        lambda k: sample_logits(k, logits, temperature=10.0, top_k=3)
    )(jax.random.split(jax.random.key(2), 64))
    for r in range(4):
        assert set(np.asarray(draws)[:, r]) <= set(top3[r])
    # nucleus: top_p=0.6 draws only from the smallest prefix reaching 0.6
    probs = jax.nn.softmax(logits, -1)
    order = np.argsort(-np.asarray(probs), -1)
    draws = jax.vmap(
        lambda k: sample_logits(k, logits, temperature=1.0, top_p=0.6)
    )(jax.random.split(jax.random.key(3), 64))
    for r in range(4):
        csum = np.cumsum(np.sort(np.asarray(probs)[r])[::-1])
        n_keep = int((csum - np.sort(np.asarray(probs)[r])[::-1] < 0.6).sum())
        assert set(np.asarray(draws)[:, r]) <= set(order[r, :n_keep])
    # mixed greedy/sampling rows in one call
    ids = np.asarray(
        sample_logits(
            jax.random.key(4), logits,
            temperature=jnp.asarray([0.0, 1.0, 0.0, 1.0]), top_k=1,
        )
    )
    np.testing.assert_array_equal(ids, greedy)


def test_generate_sample_matches_greedy_at_temp0():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 2, 6, 5, 32
    ids, mask = make_batch(N=N, T=P, vocab=cfg.vocab_size, seed=11)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    greedy = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS,
                method=lambda m, p, L, s: m.generate_greedy(p, L, s),
            )
        )(variables)
    )
    sampled_t0 = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS, jax.random.key(5),
                method=lambda m, p, L, s, r: m.generate_sample(
                    p, L, s, r, temperature=0.0
                ),
            )
        )(variables)
    )
    np.testing.assert_array_equal(sampled_t0, greedy)
    # top_k=1 pins sampling to greedy even at temperature 1
    sampled_k1 = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS, jax.random.key(6),
                method=lambda m, p, L, s, r: m.generate_sample(
                    p, L, s, r, temperature=1.0, top_k=1
                ),
            )
        )(variables)
    )
    np.testing.assert_array_equal(sampled_k1, greedy)
    # free sampling produces valid ids and is reproducible by key
    a = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS, jax.random.key(7),
                method=lambda m, p, L, s, r: m.generate_sample(
                    p, L, s, r, temperature=1.0, top_p=0.9
                ),
            )
        )(variables)
    )
    b = np.asarray(
        jax.jit(
            lambda v: model.apply(
                v, ids, MAXLEN, STEPS, jax.random.key(7),
                method=lambda m, p, L, s, r: m.generate_sample(
                    p, L, s, r, temperature=1.0, top_p=0.9
                ),
            )
        )(variables)
    )
    np.testing.assert_array_equal(a, b)
    assert ((0 <= a) & (a < cfg.vocab_size)).all()


def test_engine_top_k1_matches_greedy_request():
    """A top_k=1 sampling request through the serving engine produces the
    same tokens as a greedy (temperature 0) request — per-slot filtering
    rides the shared compiled step."""
    from tests.test_serving import _tiny_model

    _cfg, model, variables, _ids = _tiny_model()
    from sea_tpu.serving.engine import ServingEngine

    prompt = [3, 5, 7]
    eng = ServingEngine(
        model, variables, max_slots=2, page_size=8, num_pages=16,
        max_pages_per_slot=4,
    )
    rid_g = eng.submit(prompt, 6)
    rid_s = eng.submit(prompt, 6, temperature=1.0, top_k=1)
    fin = eng.run()
    assert fin[rid_g].output == fin[rid_s].output
