"""Reference-checkpoint bridge: export -> import round trip must restore
every mapped parameter, and the imported model must run."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.models.compat import (
    export_reference_style_state_dict,
    import_reference_opt_state_dict,
)
from sea_tpu.models.opt import OptForCausalLM
from tests.test_opt_kd import tiny_opt, make_batch


def test_roundtrip_restores_params():
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    ids, mask = make_batch(N=1, T=16, vocab=cfg.vocab_size)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()

    sd = export_reference_style_state_dict(variables, cfg)
    assert any("perlin_self_attention.attention.attention_predictor_enc" in k
               for k in sd)
    imported = import_reference_opt_state_dict(sd, cfg)

    # every imported leaf matches the original
    flat_orig = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0]
    )
    flat_imp = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            imported["params"]
        )[0]
    )
    assert len(flat_imp) > 20
    for name, leaf in flat_imp.items():
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_orig[name]), err_msg=name
        )

    # merged over a fresh init, the model runs and matches the original
    fresh = jax.jit(lambda: model.init(jax.random.key(9), ids, mask))()

    def merge(dst, src):
        out = {}
        for k_, v_ in dst.items():
            if k_ in src and isinstance(v_, dict):
                out[k_] = merge(v_, src[k_])
            elif k_ in src:
                out[k_] = src[k_]
            else:
                out[k_] = v_
        return out

    merged = {
        "params": merge(fresh["params"], imported["params"]),
        **{c: v for c, v in fresh.items() if c not in ("params",)},
    }
    if "performer" in imported:
        merged["performer"] = merge(fresh["performer"], imported["performer"])
    out_orig = jax.jit(lambda v: model.apply(v, ids, mask)["logits"])(variables)
    out_merged = jax.jit(lambda v: model.apply(v, ids, mask)["logits"])(merged)
    np.testing.assert_allclose(
        np.asarray(out_orig), np.asarray(out_merged), atol=1e-5
    )
