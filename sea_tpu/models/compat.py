"""Reference-checkpoint compatibility bridge.

Maps a trained reference (PyTorch) perlin-OPT checkpoint onto the sea_tpu
parameter tree, so models distilled with gmlwns2000/sea-attention can be
served/evaluated here. The analogue of the reference's own key-migration
shim (`perlin_bert/compat.py:1-57`), but crossing frameworks.

Key mapping (reference module paths from `perlin_opt.py` /
`self_attention.py` / `attention.py` __init__s):

  model.decoder.embed_tokens.weight              -> model/embed_tokens/embedding
  model.decoder.embed_positions.weight           -> model/embed_positions/embedding
  model.decoder.final_layer_norm.{weight,bias}   -> model/final_layer_norm
  ...layers.{i}.self_attn.{q,k,v,out}_proj       -> layers_{i}/self_attn/...
  ...layers.{i}.{self_attn_layer_norm,final_layer_norm,fc1,fc2}
  ...self_attn.perlin_self_attention.attention.  (= P below)
    P attention_predictor_enc.0                  -> perlin/enc_dense
    P attention_predictor_enc.1                  -> perlin/enc_ln
    P attention_predictor_dec_row.0              -> perlin/dec_row
    P attention_predictor_cnn.0.module           -> perlin/cnn_ln1
    P attention_predictor_cnn.1.module.net.0.module -> perlin/cnn_conv1
    P attention_predictor_cnn.1.module.net.2.module -> perlin/cnn_conv2
    P attention_predictor_cnn.1.module.net.5.module -> perlin/cnn_conv4
    P attention_predictor_cnn.2.module           -> perlin/cnn_ln2
    P attention_predictor_dec_scaler.0           -> perlin/dec_scaler
    P v_eye_learned_causal                       -> perlin/v_eye_learned_causal
    P performer... projection_matrix             -> collection 'performer'

Linear weights transpose (torch (out,in) -> flax (in,out)); conv weights
keep OIHW (our CausalConv2d uses the same layout, including the reference's
(2k-1, k) causal kernel with zeroed bottom half).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .opt import OptConfig


def _layer_map(i: int) -> Dict[str, Tuple[str, ...]]:
    """reference key prefix -> our tree path for layer i."""
    L = f"model.decoder.layers.{i}."
    A = L + "self_attn."
    P = A + "perlin_self_attention.attention."
    me = ("model", f"layers_{i}")
    sa = me + ("self_attn",)
    pe = sa + ("perlin",)
    return {
        A + "q_proj": sa + ("q_proj",),
        A + "k_proj": sa + ("k_proj",),
        A + "v_proj": sa + ("v_proj",),
        A + "out_proj": sa + ("out_proj",),
        L + "self_attn_layer_norm": me + ("self_attn_layer_norm",),
        L + "final_layer_norm": me + ("final_layer_norm",),
        L + "fc1": me + ("fc1",),
        L + "fc2": me + ("fc2",),
        P + "attention_predictor_enc.0": pe + ("enc_dense",),
        P + "attention_predictor_enc.1": pe + ("enc_ln",),
        P + "attention_predictor_dec_row.0": pe + ("dec_row",),
        P + "attention_predictor_cnn.0.module": pe + ("cnn_ln1",),
        P + "attention_predictor_cnn.1.module.net.0.module": pe + ("cnn_conv1",),
        P + "attention_predictor_cnn.1.module.net.2.module": pe + ("cnn_conv2",),
        P + "attention_predictor_cnn.1.module.net.5.module": pe + ("cnn_conv4",),
        P + "attention_predictor_cnn.2.module": pe + ("cnn_ln2",),
        P + "attention_predictor_dec_scaler.0": pe + ("dec_scaler",),
    }


def _set(tree: dict, path: Tuple[str, ...], leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = jnp.asarray(value)


_LN_OR_LINEAR = {
    # leaf name in reference -> (flax dense leaf, flax norm leaf)
    "weight": ("kernel", "scale"),
    "bias": ("bias", "bias"),
}


def import_reference_opt_state_dict(
    sd: Dict[str, np.ndarray], cfg: OptConfig
) -> Dict[str, Any]:
    """Returns variables {'params': ..., 'performer': ...} for our
    perlin-student OptForCausalLM from a reference torch state dict."""
    params: Dict[str, Any] = {"model": {}}
    performer: Dict[str, Any] = {"model": {}}

    def is_conv(ref_prefix: str) -> bool:
        return ".net." in ref_prefix or "cnn.1.module.net" in ref_prefix

    def is_norm(key_val) -> bool:
        return key_val.ndim == 1

    _set(params, ("model", "embed_tokens"), "embedding",
         sd["model.decoder.embed_tokens.weight"])
    _set(params, ("model", "embed_positions"), "embedding",
         sd["model.decoder.embed_positions.weight"])
    if "model.decoder.final_layer_norm.weight" in sd:
        _set(params, ("model", "final_layer_norm"), "scale",
             sd["model.decoder.final_layer_norm.weight"])
        _set(params, ("model", "final_layer_norm"), "bias",
             sd["model.decoder.final_layer_norm.bias"])

    for i in range(cfg.num_layers):
        mapping = _layer_map(i)
        P = f"model.decoder.layers.{i}.self_attn.perlin_self_attention.attention."
        for ref_prefix, path in mapping.items():
            for ref_leaf in ("weight", "bias"):
                key = ref_prefix + "." + ref_leaf
                if key not in sd:
                    continue
                val = np.asarray(sd[key])
                conv = "cnn_conv" in path[-1]
                if ref_leaf == "weight":
                    if conv:
                        _set(params, path, "weight", val)  # OIHW kept
                    elif val.ndim == 2:
                        _set(params, path, "kernel", val.T)
                    else:  # LayerNorm
                        _set(params, path, "scale", val)
                else:
                    _set(params, path, "bias", val)
        # direct parameters
        key = P + "v_eye_learned_causal"
        if key in sd:
            _set(
                params,
                ("model", f"layers_{i}", "self_attn", "perlin"),
                "v_eye_learned_causal",
                sd[key],
            )
        for cand in (
            P + "performer.fast_attention.projection_matrix",
            P + "performer.projection_matrix",
        ):
            if cand in sd:
                _set(
                    performer,
                    ("model", f"layers_{i}", "self_attn", "perlin"),
                    "projection",
                    sd[cand],
                )
                break
    out = {"params": params}
    if performer["model"]:
        out["performer"] = performer
    return out


def export_reference_style_state_dict(
    variables: Dict[str, Any], cfg: OptConfig
) -> Dict[str, np.ndarray]:
    """Inverse mapping (used by the round-trip test; also lets reference
    tooling consume sea_tpu checkpoints)."""
    sd: Dict[str, np.ndarray] = {}
    p = variables["params"]["model"]
    sd["model.decoder.embed_tokens.weight"] = np.asarray(
        p["embed_tokens"]["embedding"]
    )
    sd["model.decoder.embed_positions.weight"] = np.asarray(
        p["embed_positions"]["embedding"]
    )
    if "final_layer_norm" in p:
        sd["model.decoder.final_layer_norm.weight"] = np.asarray(
            p["final_layer_norm"]["scale"]
        )
        sd["model.decoder.final_layer_norm.bias"] = np.asarray(
            p["final_layer_norm"]["bias"]
        )
    for i in range(cfg.num_layers):
        mapping = _layer_map(i)
        for ref_prefix, path in mapping.items():
            node = variables["params"]
            ok = True
            for seg in path:
                if seg not in node:
                    ok = False
                    break
                node = node[seg]
            if not ok:
                continue
            conv = "cnn_conv" in path[-1]
            if conv:
                sd[ref_prefix + ".weight"] = np.asarray(node["weight"])
            elif "kernel" in node:
                sd[ref_prefix + ".weight"] = np.asarray(node["kernel"]).T
            elif "scale" in node:
                sd[ref_prefix + ".weight"] = np.asarray(node["scale"])
            if "bias" in node:
                sd[ref_prefix + ".bias"] = np.asarray(node["bias"])
        perlin = (
            variables["params"]["model"][f"layers_{i}"]["self_attn"].get("perlin", {})
        )
        P = f"model.decoder.layers.{i}.self_attn.perlin_self_attention.attention."
        if "v_eye_learned_causal" in perlin:
            sd[P + "v_eye_learned_causal"] = np.asarray(
                perlin["v_eye_learned_causal"]
            )
        perf = (
            variables.get("performer", {})
            .get("model", {})
            .get(f"layers_{i}", {})
            .get("self_attn", {})
            .get("perlin", {})
        )
        if "projection" in perf:
            sd[P + "performer.fast_attention.projection_matrix"] = np.asarray(
                perf["projection"]
            )
    return sd
