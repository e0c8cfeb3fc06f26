"""Long-context parameter interpolation + extended forward."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.models.long_context import extend_opt_context, _interp_rows
from sea_tpu.models.opt import OptForCausalLM, OptConfig
from tests.test_opt_kd import tiny_opt, make_batch


def test_interp_rows_endpoints():
    t = jnp.asarray(np.arange(8, dtype=np.float32)[:, None] * np.ones((8, 3), np.float32))
    out = np.asarray(_interp_rows(t, 15))
    assert out.shape == (15, 3)
    np.testing.assert_allclose(out[0], t[0])
    np.testing.assert_allclose(out[-1], t[-1])
    assert (np.diff(out[:, 0]) >= 0).all()


def test_extended_context_forward():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    ids, mask = make_batch(N=1, T=16, vocab=cfg.vocab_size)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    new_max = cfg.max_position_embeddings * 2
    new_params = extend_opt_context(variables["params"], new_max)
    emb = new_params["model"]["embed_positions"]["embedding"]
    assert emb.shape[0] == new_max + 2
    # find v_eye tables
    def find(tree, out):
        for k, v in tree.items():
            if k == "v_eye_learned_causal":
                out.append(v)
            elif isinstance(v, dict):
                find(v, out)
    eyes = []
    find(new_params, eyes)
    assert eyes and all(e.shape[2] == new_max for e in eyes)

    # run at a longer sequence than the original window
    cfg2 = dataclasses.replace(
        cfg,
        max_position_embeddings=new_max,
        sea=dataclasses.replace(cfg.sea, max_position_embeddings=new_max),
    )
    model2 = OptForCausalLM(cfg2)
    T2 = 96  # > original max_position 64
    ids2, mask2 = make_batch(N=1, T=T2, vocab=cfg.vocab_size)
    new_vars = {**variables, "params": new_params}
    out = jax.jit(lambda v: model2.apply(v, ids2, mask2)["logits"])(new_vars)
    assert np.isfinite(np.asarray(out)).all()


def test_long_context_sweep_driver():
    """The (context x dynamic_k x query_skips) grid driver (reference
    src/main/exp_long_context.py) produces finite ppl per combo."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from exp_long_context import sweep

    res = sweep(
        model="tiny", contexts=(64, 128), dynamic_ks=(0, 4),
        query_skips=(1, 2), n_eval_batches=2,
    )
    assert len(res) == 8
    for r in res:
        assert np.isfinite(r["ppl"]) and r["ppl"] > 0
    # dynamic_k/query_skips actually change the result
    base = [r["ppl"] for r in res if r["context"] == 128]
    assert len(set(base)) > 1


def test_model_logit_chunk_matches_unchunked():
    """Task-CE with logit_chunk (streamed per-chunk logits, the T=32k
    memory plan) == the full-logits loss, values AND grads — OPT (tied
    head) and LLaMA (untied lm_head)."""
    from sea_tpu.models.llama import LlamaForCausalLM, llama_tiny

    for name in ("opt", "llama"):
        if name == "opt":
            cfg = tiny_opt("perlin")
            model = OptForCausalLM(cfg)
        else:
            cfg = llama_tiny("perlin")
            model = LlamaForCausalLM(cfg)
        ids, mask = make_batch(N=2, T=16, vocab=cfg.vocab_size)
        variables = jax.jit(lambda m=model: m.init(jax.random.key(0), ids, mask))()

        def loss(p, chunk):
            out = model.apply(
                {**variables, "params": p}, ids, mask, labels=ids,
                logit_chunk=chunk,
            )
            return out["loss"]

        l_full, g_full = jax.jit(
            jax.value_and_grad(lambda p: loss(p, None))
        )(variables["params"])
        l_chunk, g_chunk = jax.jit(
            jax.value_and_grad(lambda p: loss(p, 4))
        )(variables["params"])
        np.testing.assert_allclose(
            float(l_chunk), float(l_full), rtol=1e-6, err_msg=name
        )
        for (ka, a), (kb, b) in zip(
            sorted(
                jax.tree_util.tree_leaves_with_path(g_full),
                key=lambda kv: jax.tree_util.keystr(kv[0]),
            ),
            sorted(
                jax.tree_util.tree_leaves_with_path(g_chunk),
                key=lambda kv: jax.tree_util.keystr(kv[0]),
            ),
        ):
            assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
                err_msg=f"{name}:{jax.tree_util.keystr(ka)}",
            )
        # non-divisible chunk falls back to gcd and still matches
        l_odd = jax.jit(lambda p: loss(p, 5))(variables["params"])
        np.testing.assert_allclose(float(l_odd), float(l_full), rtol=1e-6)
