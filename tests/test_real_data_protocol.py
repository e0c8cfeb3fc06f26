"""The real-data drop-in protocol (docs/REAL_DATA.md, VERDICT r2 #9):
a fixture-sized "real" corpus (.npy token files) plus a real-format
teacher checkpoint must flow through the FULL KD recipe with zero code
edits and zero synthetic fallbacks — proving PPL parity is one scp away."""

import os

import numpy as np
import jax
import pytest

from sea_tpu.training.opt_trainer import (
    OptTrainer,
    TrainerConfig,
    tiny_configs,
)
from tests.test_loader_formats import hf_opt_state_dict


def _write_fixture_corpus(cache_dir, vocab, seed=123):
    """Deterministic NON-synthetic-shaped token files in the drop-in
    location — what the scp in docs/REAL_DATA.md §1 would deliver."""
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    tokens = {}
    for split, n in (("train", 4096), ("test", 1024)):
        t = rng.integers(4, vocab, n).astype(np.int32)
        np.save(os.path.join(cache_dir, f"wikitext2_{split}.npy"), t)
        tokens[split] = t
    return tokens


def test_full_recipe_consumes_dropped_files(tmp_path):
    from safetensors.numpy import save_file

    # the trainer's own tiny geometry (vocab must match its models)
    t_cfg, _ = tiny_configs("perlin")
    data_dir = str(tmp_path / "data")
    dropped = _write_fixture_corpus(data_dir, t_cfg.vocab_size)

    # real-format teacher checkpoint dir (docs/REAL_DATA.md §1)
    ckpt_dir = tmp_path / "teacher"
    ckpt_dir.mkdir()
    sd = hf_opt_state_dict(t_cfg, np.random.default_rng(0))
    save_file(sd, str(ckpt_dir / "model.safetensors"))

    cfg = TrainerConfig(
        model="tiny",
        num_steps=2,
        batch_size=2,
        max_seq_len=64,
        stride=32,
        gradient_accumulation_steps=1,
        log_steps=1,
        eval_steps=2,
        save_dir=str(tmp_path / "run"),
        teacher_checkpoint=str(ckpt_dir),
        data_cache_dir=data_dir,
    )
    tr = OptTrainer(cfg)

    # the corpora are EXACTLY the dropped files — no synthetic fallback
    np.testing.assert_array_equal(tr.corpus.tokens, dropped["train"])
    np.testing.assert_array_equal(tr.eval_corpus.tokens, dropped["test"])
    # the teacher is EXACTLY the checkpoint weights (spot-check one leaf)
    np.testing.assert_allclose(
        np.asarray(tr.t_vars["params"]["model"]["embed_tokens"]["embedding"]),
        sd["model.decoder.embed_tokens.weight"],
        atol=1e-6,
    )

    tr.train()
    ppl = tr.evaluate(max_batches=4)
    assert np.isfinite(ppl) and ppl > 0
    assert tr.step == 2


def test_drop_in_takes_priority_over_fallback(tmp_path):
    """get_corpus prefers the cached .npy over the synthetic fallback, and
    falls back ONLY when the file is absent."""
    from sea_tpu.data.wikitext2 import get_corpus, synthetic_corpus

    data_dir = str(tmp_path / "data")
    dropped = _write_fixture_corpus(data_dir, vocab=128)
    c = get_corpus(64, 32, "train", vocab_size=128, cache_dir=data_dir)
    np.testing.assert_array_equal(c.tokens, dropped["train"])

    empty = str(tmp_path / "empty")
    c2 = get_corpus(64, 32, "train", vocab_size=128, cache_dir=empty)
    np.testing.assert_array_equal(
        c2.tokens, synthetic_corpus(vocab_size=128, seed=0)
    )
    with pytest.raises(Exception):
        get_corpus(
            64, 32, "train", vocab_size=128, cache_dir=empty,
            synthetic_fallback=False,
        )
