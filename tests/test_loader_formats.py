"""Real-file-format loader proof (VERDICT round-1 #5): write OPT-shaped
model.safetensors and pytorch_model.bin fixtures with the actual HF key
names, load them through `load_opt_params`, and check the values land in
the right flax slots (with the torch->flax transpose) and that the loaded
teacher runs. Zero egress: the fixture is generated in-test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_opt_kd import tiny_opt, make_batch
from sea_tpu.models.loader import load_opt_params
from sea_tpu.models.opt import OptForCausalLM


def hf_opt_state_dict(cfg, rng):
    """An OPT state dict with the exact HF key layout (torch (out,in))."""
    E, F, V, P = cfg.hidden_size, cfg.ffn_dim, cfg.vocab_size, cfg.max_position_embeddings
    sd = {
        "model.decoder.embed_tokens.weight": rng.standard_normal((V, E)),
        "model.decoder.embed_positions.weight": rng.standard_normal((P + 2, E)),
        "model.decoder.final_layer_norm.weight": rng.standard_normal((E,)),
        "model.decoder.final_layer_norm.bias": rng.standard_normal((E,)),
    }
    for i in range(cfg.num_layers):
        L = f"model.decoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[L + f"self_attn.{proj}.weight"] = rng.standard_normal((E, E))
            sd[L + f"self_attn.{proj}.bias"] = rng.standard_normal((E,))
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[L + ln + ".weight"] = rng.standard_normal((E,))
            sd[L + ln + ".bias"] = rng.standard_normal((E,))
        sd[L + "fc1.weight"] = rng.standard_normal((F, E))
        sd[L + "fc1.bias"] = rng.standard_normal((F,))
        sd[L + "fc2.weight"] = rng.standard_normal((E, F))
        sd[L + "fc2.bias"] = rng.standard_normal((E,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


@pytest.mark.parametrize("fmt", ["safetensors", "bin"])
def test_load_opt_params_real_formats(tmp_path, fmt):
    cfg = tiny_opt("none")
    rng = np.random.default_rng(0)
    sd = hf_opt_state_dict(cfg, rng)

    if fmt == "safetensors":
        from safetensors.numpy import save_file

        save_file(sd, str(tmp_path / "model.safetensors"))
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(v) for k, v in sd.items()},
            str(tmp_path / "pytorch_model.bin"),
        )

    params = load_opt_params(str(tmp_path), cfg)
    # spot-check transpose + placement
    np.testing.assert_allclose(
        np.asarray(params["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]),
        sd["model.decoder.layers.0.self_attn.q_proj.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["model"]["embed_tokens"]["embedding"]),
        sd["model.decoder.embed_tokens.weight"],
    )
    np.testing.assert_allclose(
        np.asarray(params["model"]["layers_1"]["final_layer_norm"]["scale"]),
        sd["model.decoder.layers.1.final_layer_norm.weight"],
    )

    # the loaded teacher actually runs
    model = OptForCausalLM(cfg)
    ids, mask = make_batch(N=1, T=8, vocab=cfg.vocab_size)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    out = jax.jit(
        lambda p: model.apply({**variables, "params": p}, ids, mask)["logits"]
    )({"model": params["model"]})
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_teacher_checkpoint_real_format(tmp_path):
    """OptTrainer(teacher_checkpoint=dir) consumes the safetensors fixture."""
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig
    from sea_tpu.training.opt_trainer import tiny_configs
    from safetensors.numpy import save_file

    t_cfg, _ = tiny_configs()
    rng = np.random.default_rng(1)
    sd = hf_opt_state_dict(t_cfg, rng)
    save_file(sd, str(tmp_path / "model.safetensors"))

    tr = OptTrainer(TrainerConfig(
        model="tiny", teacher_checkpoint=str(tmp_path),
        max_seq_len=64, stride=32, batch_size=2,
        gradient_accumulation_steps=1, num_steps=1,
        eval_steps=100, log_steps=100, save_dir=str(tmp_path / "save"),
    ))
    got = np.asarray(
        tr.t_vars["params"]["model"]["embed_tokens"]["embedding"]
    )
    np.testing.assert_allclose(got, sd["model.decoder.embed_tokens.weight"])
    assert np.isfinite(tr.evaluate(max_batches=2))
