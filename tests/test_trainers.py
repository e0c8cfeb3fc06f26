"""Trainer harness smoke tests (tiny models, synthetic data): train a few
steps, loss finite and decreasing-ish, checkpoint save/load roundtrip."""

import os

import numpy as np
import jax
import pytest

from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig


@pytest.fixture(scope="module")
def opt_trainer(tmp_path_factory):
    cfg = TrainerConfig(
        model="tiny",
        max_seq_len=64,
        stride=32,
        batch_size=2,
        gradient_accumulation_steps=1,
        num_steps=6,
        eval_steps=100,
        log_steps=2,
        save_dir=str(tmp_path_factory.mktemp("opt_trainer")),
    )
    return OptTrainer(cfg)


def test_opt_trainer_runs_and_improves(opt_trainer):
    tr = opt_trainer
    ppl0 = tr.evaluate(max_batches=4)
    assert np.isfinite(ppl0)
    tr.train()
    assert tr.step >= tr.cfg.num_steps
    ppl1 = tr.evaluate(max_batches=4)
    assert np.isfinite(ppl1)
    # a few KD steps on structured synthetic data should not blow up
    assert ppl1 < ppl0 * 2


def test_opt_trainer_checkpoint_roundtrip(opt_trainer):
    tr = opt_trainer
    tr.save("ckpt_test")
    before = jax.tree_util.tree_leaves(tr.s_params)[0].copy()
    # perturb then restore
    tr.s_params = jax.tree_util.tree_map(lambda x: x * 0, tr.s_params)
    assert tr.load("ckpt_test")
    after = jax.tree_util.tree_leaves(tr.s_params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_metrics_logged(opt_trainer):
    opt_trainer.log({"probe": 1.0})
    assert os.path.exists(opt_trainer.metrics_path)
    with open(opt_trainer.metrics_path) as f:
        lines = [l for l in f if l.strip()]
    assert lines, "no metrics logged"


def test_glue_trainer_smoke(tmp_path):
    from sea_tpu.training.glue_trainer import GlueTrainer, GlueTrainerConfig

    cfg = GlueTrainerConfig(
        subset="mrpc",
        model="tiny",
        num_steps=3,
        batch_size=4,
        max_length=32,
        eval_steps=100,
        save_dir=str(tmp_path),
    )
    tr = GlueTrainer(cfg)
    tr.train()
    score = tr.evaluate(max_batches=2)
    assert 0.0 <= score <= 1.0


def test_lra_trainer_smoke(tmp_path):
    from sea_tpu.training.lra_trainer import LraTrainer, LraTrainerConfig

    cfg = LraTrainerConfig(
        task="listops",
        phase="distill",
        num_steps=2,
        batch_size=4,
        max_length=64,
        n_train=32,
        scale=0.25,
        save_dir=str(tmp_path),
    )
    tr = LraTrainer(cfg)
    tr.train()
    acc = tr.evaluate("student", max_batches=2)
    assert 0.0 <= acc <= 1.0


def test_opt_trainer_scan_kd(tmp_path):
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="tiny",
        max_seq_len=64,
        stride=32,
        batch_size=2,
        gradient_accumulation_steps=1,
        num_steps=4,
        eval_steps=100,
        log_steps=2,
        scan_kd=True,
        save_dir=str(tmp_path),
    )
    tr = OptTrainer(cfg)
    tr.train()
    ppl = tr.evaluate(max_batches=2)
    assert np.isfinite(ppl)


def test_opt_trainer_data_parallel(tmp_path):
    """Data-parallel train step over the 8-device CPU mesh."""
    import jax
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    cfg = TrainerConfig(
        model="tiny",
        max_seq_len=64,
        stride=32,
        batch_size=8,
        gradient_accumulation_steps=1,
        num_steps=3,
        eval_steps=100,
        log_steps=2,
        data_parallel=True,
        save_dir=str(tmp_path),
    )
    tr = OptTrainer(cfg)
    assert tr.mesh is not None
    tr.train()
    assert np.isfinite(tr.evaluate(max_batches=2))
