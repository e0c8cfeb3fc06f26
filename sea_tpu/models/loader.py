"""HF checkpoint -> flax parameter conversion and student bootstrap.

Replaces the reference's `from_pretrained` teacher init + student
state_dict copy with `load_ignore_keys=['perlin']`
(`src/trainer/opt_trainer.py:248-294`).

Offline-friendly: `load_opt_params` accepts a local directory containing a
HF OPT checkpoint (pytorch_model.bin / model.safetensors); network fetches
are attempted only if `allow_download=True`.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .opt import OptConfig


def _to_np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _load_state_dict(model_name_or_path: str, allow_download: bool = False):
    import glob

    if os.path.isdir(model_name_or_path):
        sd = {}
        safes = glob.glob(os.path.join(model_name_or_path, "*.safetensors"))
        bins = glob.glob(os.path.join(model_name_or_path, "*.bin"))
        if safes:
            from safetensors import safe_open

            for f in safes:
                with safe_open(f, framework="np") as fh:
                    for k in fh.keys():
                        sd[k] = fh.get_tensor(k)
            return sd
        if bins:
            import torch

            for f in bins:
                sd.update(torch.load(f, map_location="cpu", weights_only=True))
            return {k: _to_np(v) for k, v in sd.items()}
        raise FileNotFoundError(f"no checkpoint files in {model_name_or_path}")
    if not allow_download:
        raise FileNotFoundError(
            f"{model_name_or_path} is not a local dir and downloads are disabled"
        )
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    return {k: _to_np(v) for k, v in m.state_dict().items()}


def opt_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: OptConfig):
    """Map a HF OPT state dict onto our flax tree.

    HF Linear stores (out, in); flax Dense kernel is (in, out) -> transpose.
    """

    def g(key):
        for prefix in ("model.decoder.", "decoder.", ""):
            k = prefix + key
            if k in sd:
                return np.asarray(sd[k])
        raise KeyError(key)

    def dense(key):
        return {
            "kernel": jnp.asarray(g(key + ".weight").T),
            "bias": jnp.asarray(g(key + ".bias")),
        }

    def ln(key):
        return {
            "scale": jnp.asarray(g(key + ".weight")),
            "bias": jnp.asarray(g(key + ".bias")),
        }

    tree: Dict[str, Any] = {
        "embed_tokens": {"embedding": jnp.asarray(g("embed_tokens.weight"))},
        "embed_positions": {"embedding": jnp.asarray(g("embed_positions.weight"))},
    }
    if cfg.do_layer_norm_before:
        tree["final_layer_norm"] = ln("final_layer_norm")
    for i in range(cfg.num_layers):
        L = f"layers.{i}."
        tree[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense(L + "self_attn.q_proj"),
                "k_proj": dense(L + "self_attn.k_proj"),
                "v_proj": dense(L + "self_attn.v_proj"),
                "out_proj": dense(L + "self_attn.out_proj"),
            },
            "self_attn_layer_norm": ln(L + "self_attn_layer_norm"),
            "fc1": dense(L + "fc1"),
            "fc2": dense(L + "fc2"),
            "final_layer_norm": ln(L + "final_layer_norm"),
        }
    return {"model": tree}


def load_opt_params(model_name_or_path: str, cfg: OptConfig, allow_download=False):
    sd = _load_state_dict(model_name_or_path, allow_download)
    return opt_params_from_state_dict(sd, cfg)


def llama_params_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a HF LLaMA state dict (meta-llama/transformers key layout:
    `model.layers.N.self_attn.q_proj.weight`, `.mlp.gate_proj.weight`,
    `.input_layernorm.weight`, `model.norm.weight`, `lm_head.weight`)
    onto our flax tree. LLaMA linears carry no bias."""

    def g(key):
        for prefix in ("model.", ""):
            k = prefix + key
            if k in sd:
                return np.asarray(sd[k])
        raise KeyError(key)

    def dense(key):
        return {"kernel": jnp.asarray(g(key + ".weight").T)}

    def rms(key):
        return {"scale": jnp.asarray(g(key + ".weight"))}

    tree: Dict[str, Any] = {
        "embed_tokens": {"embedding": jnp.asarray(g("embed_tokens.weight"))},
        "norm": rms("norm"),
    }
    for i in range(cfg.num_layers):
        L = f"layers.{i}."
        tree[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense(L + "self_attn.q_proj"),
                "k_proj": dense(L + "self_attn.k_proj"),
                "v_proj": dense(L + "self_attn.v_proj"),
                "o_proj": dense(L + "self_attn.o_proj"),
            },
            "input_layernorm": rms(L + "input_layernorm"),
            "post_attention_layernorm": rms(L + "post_attention_layernorm"),
            "mlp": {
                "gate_proj": dense(L + "mlp.gate_proj"),
                "up_proj": dense(L + "mlp.up_proj"),
                "down_proj": dense(L + "mlp.down_proj"),
            },
        }
    return {"model": tree, "lm_head": dense("lm_head")}


def load_llama_params(model_name_or_path: str, cfg, allow_download=False):
    sd = _load_state_dict(model_name_or_path, allow_download)
    return llama_params_from_state_dict(sd, cfg)


def student_from_teacher(student_variables, teacher_params):
    """Overwrite every student param that exists in the teacher tree; keep
    the rest (the 'perlin' estimator) at fresh init — the reference's
    load_state_dict(ignore=['perlin']) bootstrap."""

    def merge(stu, tea):
        if isinstance(stu, dict):
            return {
                k: merge(v, tea[k]) if (isinstance(tea, dict) and k in tea) else v
                for k, v in stu.items()
            }
        # copy=True: the student must own distinct buffers, otherwise buffer
        # donation in the train step would invalidate the teacher's params
        return jnp.array(tea, copy=True) if tea is not None else stu

    merged = dict(student_variables)
    merged["params"] = merge(student_variables["params"], teacher_params)
    return merged
