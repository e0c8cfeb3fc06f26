"""LLaMA model family (the reference's headline SEA-13B result,
README.md:35-39, has no public code — sea_tpu supplies the family):
RoPE math, GQA expansion, KD wrappers (loop + scan), causality,
decode-vs-prefill, scan-layers equivalence, HF weight mapping."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sea_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    apply_rope,
    llama_tiny,
    repeat_kv,
    rope_cos_sin,
)
from sea_tpu.models.opt import stack_layer_params
from sea_tpu.training.distill import SeaOptKD, SeaOptKDScan


def make_batch(N=2, T=16, vocab=256, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(4, vocab, (N, T)), jnp.int32)
    mask = jnp.ones((N, T), jnp.int32)
    return ids, mask


# ------------------------------------------------------------------ rope

def test_rope_is_relative():
    """q.k after RoPE depends only on the position difference."""
    rng = np.random.default_rng(0)
    D = 16
    q = jnp.asarray(rng.standard_normal((1, 1, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 1, D)), jnp.float32)

    def score(i, j):
        cq, sq = rope_cos_sin(jnp.asarray([i]), D)
        ck, sk = rope_cos_sin(jnp.asarray([j]), D)
        qi = apply_rope(q, cq[None, None], sq[None, None])
        kj = apply_rope(k, ck[None, None], sk[None, None])
        return float(jnp.sum(qi * kj))

    np.testing.assert_allclose(score(3, 1), score(10, 8), rtol=1e-5)
    np.testing.assert_allclose(score(7, 7), score(0, 0), rtol=1e-5)
    assert abs(score(5, 1) - score(5, 2)) > 1e-6  # but not position-blind


def test_rope_preserves_norm():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 8)), jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(5), 8)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )


# ------------------------------------------------------------------- gqa

def test_gqa_matches_expanded_mha():
    """A GQA model equals an MHA model whose K/V projections tile each KV
    head n_rep times (head-major), for the dense 'none' method."""
    gqa_cfg = llama_tiny("none", num_kv_heads=2)
    mha_cfg = llama_tiny("none", num_kv_heads=4)
    ids, mask = make_batch(N=2, T=12, vocab=gqa_cfg.vocab_size)

    gqa = LlamaForCausalLM(gqa_cfg)
    mha = LlamaForCausalLM(mha_cfg)
    gv = jax.jit(lambda: gqa.init(jax.random.key(0), ids, mask))()

    def expand_kv_kernel(kernel):  # (E, kv*D) -> (E, H*D)
        E, _ = kernel.shape
        D = gqa_cfg.head_dim
        per_head = kernel.reshape(E, 2, D)
        return jnp.repeat(per_head, 2, axis=1).reshape(E, 4 * D)

    mv = jax.tree_util.tree_map(lambda x: x, gv)
    params = jax.device_get(mv["params"])
    for i in range(gqa_cfg.num_layers):
        sa = params["model"][f"layers_{i}"]["self_attn"]
        sa["k_proj"]["kernel"] = expand_kv_kernel(jnp.asarray(sa["k_proj"]["kernel"]))
        sa["v_proj"]["kernel"] = expand_kv_kernel(jnp.asarray(sa["v_proj"]["kernel"]))
    mv = {"params": params}

    out_g = jax.jit(lambda v: gqa.apply(v, ids, mask)["logits"])(gv)
    out_m = jax.jit(lambda v: mha.apply(v, ids, mask)["logits"])(mv)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_m), atol=1e-5)


def test_repeat_kv():
    x = jnp.arange(2 * 2 * 3 * 4, dtype=jnp.float32).reshape(2, 2, 3, 4)
    y = repeat_kv(x, 3)
    assert y.shape == (2, 6, 3, 4)
    np.testing.assert_array_equal(np.asarray(y[:, 0]), np.asarray(y[:, 1]))
    np.testing.assert_array_equal(np.asarray(y[:, 3]), np.asarray(x[:, 1]))


# ------------------------------------------------------------- forwards

@pytest.fixture(scope="module")
def kd_setup():
    t_cfg = llama_tiny("none")
    s_cfg = llama_tiny("perlin")
    kd = SeaOptKD(t_cfg, s_cfg)
    ids, mask = make_batch()
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    return t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask


def test_teacher_capture_and_student_forward(kd_setup):
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    out = jax.jit(
        lambda v: kd.teacher.apply(v, ids, mask, labels=ids)
    )(t_vars)
    assert np.isfinite(float(out["loss"]))
    caps = out["teacher_captures"]
    assert len(caps) == t_cfg.num_layers
    N, T = ids.shape
    assert caps[0].attention_scores.shape == (N, t_cfg.num_heads, T, T)

    s_out = jax.jit(
        lambda v: kd.student.apply(v, ids, mask, labels=ids)
    )(s_vars)
    assert np.isfinite(float(s_out["loss"]))


def test_llama_kd_loop_scan_match(kd_setup):
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    loss_loop, det_loop = jax.jit(
        lambda tv, sv: kd.kd_loss(tv, sv, ids, mask, ids, use_remat=False)
    )(t_vars, s_vars)
    assert np.isfinite(float(loss_loop))

    kds = SeaOptKDScan(t_cfg, s_cfg)
    combined = SeaOptKDScan.combine_params(t_vars, s_vars, t_cfg.num_layers)
    loss_scan, det_scan = jax.jit(lambda cv: kds.kd_loss(cv, ids, mask, ids))(
        combined
    )
    np.testing.assert_allclose(float(loss_loop), float(loss_scan), rtol=1e-5)
    for k_ in det_loop:
        np.testing.assert_allclose(
            float(det_loop[k_]), float(det_scan[k_]), rtol=1e-4, err_msg=k_
        )


def test_llama_kd_grads_flow_to_student_only(kd_setup):
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    g = jax.jit(
        jax.grad(
            lambda sv: kd.kd_loss(t_vars, sv, ids, mask, ids, use_remat=False)[0]
        )
    )(s_vars)
    total = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["params"])
    )
    assert np.isfinite(total) and total > 0
    # the estimator subtree must receive gradient
    perlin = g["params"]["model"]["layers_0"]["self_attn"]["perlin"]
    p_total = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(perlin)
    )
    assert p_total > 0


def test_llama_causality_canary(kd_setup):
    """Perturbing token p must not change logits before p (train path)."""
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    p = 9
    poisoned = ids.at[:, p].set((ids[:, p] + 17) % s_cfg.vocab_size)
    f = jax.jit(lambda v, i: kd.student.apply(v, i, mask)["logits"])
    clean = np.asarray(f(s_vars, ids))
    poison = np.asarray(f(s_vars, poisoned))
    assert np.abs(clean[:, :p] - poison[:, :p]).max() < 1e-5
    assert np.abs(clean[:, p:] - poison[:, p:]).max() > 1e-6


def test_llama_benchmark_path_close_to_train_path(kd_setup):
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    f = jax.jit(
        lambda v, bench: kd.student.apply(v, ids, mask, benchmarking=bench)[
            "logits"
        ],
        static_argnums=1,
    )
    a = np.asarray(f(s_vars, False))
    b = np.asarray(f(s_vars, True))
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 2e-2


def test_llama_scan_layers_matches_loop(kd_setup):
    t_cfg, s_cfg, kd, t_vars, s_vars, ids, mask = kd_setup
    scan_cfg = dataclasses.replace(s_cfg, scan_layers=True)
    scan_model = LlamaForCausalLM(scan_cfg)
    sv = stack_layer_params(jax.device_get(s_vars["params"]), s_cfg.num_layers)
    v_scan = {"params": sv}
    if "performer" in s_vars:
        v_scan["performer"] = stack_layer_params(
            jax.device_get(s_vars["performer"]), s_cfg.num_layers
        )
    out_loop = jax.jit(lambda v: kd.student.apply(v, ids, mask)["logits"])(s_vars)
    out_scan = jax.jit(lambda v: scan_model.apply(v, ids, mask)["logits"])(v_scan)
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), atol=2e-5
    )


# --------------------------------------------------------------- decode

def test_llama_decode_matches_full_forward():
    # seed chosen clear of top-k tie boundaries: the FAVOR+ prefix state
    # (decode) and the chunked-scan performer (prefill) accumulate in
    # different fp orders, which can flip a near-tied top-k selection — the
    # reference's own cache test (test_perlin_opt_cache.py) ships an error
    # table for the same reason
    cfg = llama_tiny("perlin")
    cfg = dataclasses.replace(
        cfg, sea=dataclasses.replace(cfg.sea, use_cache=True)
    )
    model = LlamaForCausalLM(cfg)
    N, T = 1, 12
    ids, mask = make_batch(N=N, T=T, vocab=cfg.vocab_size, seed=0)
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
        logits, states = step(variables, ids[:, t : t + 1], jnp.int32(t), states)
        logits_rows.append(np.asarray(logits))
    dec = np.concatenate(logits_rows, axis=1)

    err = np.abs(dec - np.asarray(full)).max()
    assert err < 2e-2, err
    agree = (dec.argmax(-1) == np.asarray(full).argmax(-1)).mean()
    assert agree == 1.0, agree


def test_llama_generate_greedy_runs():
    cfg = llama_tiny("perlin")
    cfg = dataclasses.replace(
        cfg, sea=dataclasses.replace(cfg.sea, use_cache=True)
    )
    model = LlamaForCausalLM(cfg)
    ids, mask = make_batch(N=2, T=6, vocab=cfg.vocab_size, seed=5)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    toks = jax.jit(
        lambda v: model.apply(
            v, ids, 32, 4, method=lambda m, p, L, s: m.generate_greedy(p, L, s)
        )
    )(variables)
    toks = np.asarray(toks)
    assert toks.shape == (2, 4)
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()


@pytest.mark.parametrize("builder_name", ["llama_7b", "llama_13b"])
def test_large_llama_kd_graph_builds(builder_name):
    """llama-7b/13b geometry traces at full size (eval_shape: no
    FLOPs/memory) and lands at the family's parameter count; the KD loss
    graph traces too."""
    import sea_tpu.models.llama as llama_mod

    builder = getattr(llama_mod, builder_name)
    t_cfg = builder("none")
    s_cfg = builder("perlin")
    N, T = 1, 256
    ids = jnp.ones((N, T), jnp.int32)
    mask = jnp.ones((N, T), jnp.int32)

    t_shapes = jax.eval_shape(
        lambda: LlamaForCausalLM(t_cfg).init(jax.random.key(0), ids, mask)
    )
    n_params = sum(
        int(np.prod(s.shape))
        for s in jax.tree_util.tree_leaves(t_shapes["params"])
    )
    want = {"llama_7b": 6.7e9, "llama_13b": 13.0e9}[builder_name]
    assert want * 0.85 < n_params < want * 1.25, n_params

    kd = SeaOptKD(t_cfg, s_cfg)
    t_v = jax.eval_shape(lambda: kd.teacher.init(jax.random.key(0), ids, mask))
    s_v = jax.eval_shape(lambda: kd.student.init(jax.random.key(1), ids, mask))
    out = jax.eval_shape(
        lambda tv, sv: kd.kd_loss(tv, sv, ids, mask, ids, use_remat=True)[0],
        t_v,
        s_v,
    )
    assert out.shape == ()


# -------------------------------------------------------------- serving

def test_llama_serving_engine_matches_greedy():
    """The continuous-batching engine is model-agnostic: staggered LLaMA
    requests reproduce per-prompt generate_greedy exactly (RoPE positions
    are per-slot in the engine)."""
    from sea_tpu.serving import ServingEngine

    cfg = llama_tiny("perlin")
    cfg = dataclasses.replace(
        cfg, sea=dataclasses.replace(cfg.sea, use_cache=True)
    )
    model = LlamaForCausalLM(cfg)
    ids, mask = make_batch(N=1, T=12, vocab=cfg.vocab_size, seed=5)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, cfg.vocab_size, size=p).tolist() for p in (3, 5)]
    steps = 4

    expected = []
    for p in prompts:
        pids = jnp.asarray([p], jnp.int32)
        toks = model.apply(
            variables, pids, 32, steps,
            method=lambda m, a, b, c: m.generate_greedy(a, b, c),
        )
        expected.append(np.asarray(toks)[0].tolist())

    eng = ServingEngine(
        model, variables, max_slots=2, page_size=4, num_pages=32,
        max_pages_per_slot=8,
    )
    rids = [eng.submit(prompts[0], steps)]
    eng.step()
    rids.append(eng.submit(prompts[1], steps))
    out = eng.run()
    for rid, exp in zip(rids, expected):
        assert out[rid].output == exp, (rid, out[rid].output, exp)


# --------------------------------------------------------------- loader

def test_llama_hf_weight_mapping_roundtrip():
    """Invert our flax tree into an HF-style state dict, run the loader
    mapping, and demand the result is bit-identical to the original."""
    from sea_tpu.models.loader import llama_params_from_state_dict

    cfg = llama_tiny("none", num_kv_heads=2)
    model = LlamaForCausalLM(cfg)
    ids, mask = make_batch(N=1, T=8, vocab=cfg.vocab_size)
    params = jax.device_get(
        jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()["params"]
    )

    sd = {
        "model.embed_tokens.weight": np.asarray(
            params["model"]["embed_tokens"]["embedding"]
        ),
        "model.norm.weight": np.asarray(params["model"]["norm"]["scale"]),
        "lm_head.weight": np.asarray(params["lm_head"]["kernel"]).T,
    }
    for i in range(cfg.num_layers):
        L = params["model"][f"layers_{i}"]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"model.layers.{i}.self_attn.{name}.weight"] = np.asarray(
                L["self_attn"][name]["kernel"]
            ).T
        for name in ("gate_proj", "up_proj", "down_proj"):
            sd[f"model.layers.{i}.mlp.{name}.weight"] = np.asarray(
                L["mlp"][name]["kernel"]
            ).T
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            L["input_layernorm"]["scale"]
        )
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            L["post_attention_layernorm"]["scale"]
        )

    loaded = llama_params_from_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path({"params": params})
    flat_b = dict(
        jax.tree_util.tree_leaves_with_path({"params": loaded})
    )
    got = {jax.tree_util.keystr(k): v for k, v in flat_b.items()}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        assert ks in got, ks
        np.testing.assert_array_equal(np.asarray(v), np.asarray(got[ks]), err_msg=ks)


def test_llama_parallel_prefill_generation_matches_sequential():
    """generate_greedy(parallel_prefill=True) is token-identical to the
    sequential decode-prefill path for the LLaMA family too."""
    import dataclasses

    from sea_tpu.models.llama import LlamaForCausalLM, llama_tiny

    cfg = llama_tiny("perlin")
    cfg = dataclasses.replace(
        cfg, sea=dataclasses.replace(cfg.sea, use_cache=True)
    )
    model = LlamaForCausalLM(cfg)
    N, P, STEPS, MAXLEN = 1, 8, 6, 32
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (N, P)), jnp.int32)
    mask = jnp.ones((N, P), jnp.int32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

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
