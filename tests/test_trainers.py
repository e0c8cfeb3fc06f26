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


def test_lra_dense_resume_restores_full_state(tmp_path):
    """Teacher (dense) phase full-state checkpoint: a restart restores
    params, opt_state, AND step bit-exactly (the dense phase is
    restart-driven on chip like the distill phase), then trains on.
    Trajectory equality across a restart is NOT expected: the epoch
    shuffle reseeds from the resume step, so the data stream differs —
    same contract as the student resume."""
    from sea_tpu.training.lra_trainer import LraTrainer, LraTrainerConfig

    def cfg(steps):
        return LraTrainerConfig(
            task="listops", phase="dense", num_steps=steps, batch_size=4,
            max_length=64, n_train=32, scale=0.25, save_dir=str(tmp_path),
            eval_every=0, save_every=0,
        )

    first = LraTrainer(cfg(2))
    first.train()  # saves full teacher state at num_steps

    resumed = LraTrainer(cfg(4))
    assert resumed.step == 2
    for pa, pb in zip(
        jax.tree_util.tree_leaves(first.t_params_mut),
        jax.tree_util.tree_leaves(resumed.t_params_mut),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(
        jax.tree_util.tree_leaves(first.t_opt_state),
        jax.tree_util.tree_leaves(resumed.t_opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    resumed.train()
    assert resumed.step == 4


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


def test_opt_trainer_full_resume_equivalence(tmp_path):
    """train(2N) == train(N) -> save -> fresh trainer -> load -> train(N):
    optimizer moments, rng, and projections all round-trip (reference
    persists the full train state, opt_trainer.py:595-689)."""
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    def mk(num_steps, save_dir):
        return OptTrainer(TrainerConfig(
            model="tiny", max_seq_len=64, stride=32, batch_size=2,
            gradient_accumulation_steps=1, num_steps=num_steps,
            eval_steps=1000, log_steps=1000, save_dir=save_dir,
        ))

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    straight = mk(4, d1)
    straight.train()

    half = mk(2, d2)
    half.train()
    half.save("resume_test")

    resumed = mk(4, d2)
    assert resumed.load("resume_test")
    assert resumed.step == 2
    resumed.train()
    assert resumed.step == 4

    a = jax.tree_util.tree_leaves(straight.s_params)
    b = jax.tree_util.tree_leaves(resumed.s_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # optimizer moments equal too
    oa = jax.tree_util.tree_leaves(straight.opt_state)
    ob = jax.tree_util.tree_leaves(resumed.opt_state)
    for x, y in zip(oa, ob):
        if hasattr(x, "shape") and hasattr(y, "shape"):
            np.testing.assert_allclose(
                np.asarray(x, dtype=np.float64).ravel(),
                np.asarray(y, dtype=np.float64).ravel(), atol=1e-6)


def test_opt_trainer_load_only_additionals(opt_trainer):
    tr = opt_trainer
    tr.save("addl_test")
    orig = jax.tree_util.tree_flatten_with_path(tr.s_params)[0]
    # zero everything, then partial-load: only perlin modules restored
    tr.s_params = jax.tree_util.tree_map(lambda x: x * 0, tr.s_params)
    assert tr.load("addl_test", only_additionals=True)
    now = dict(jax.tree_util.tree_flatten_with_path(tr.s_params)[0])
    perlin_restored = base_kept_zero = 0
    for p, v in orig:
        is_perlin = any("perlin" in str(getattr(x, "key", x)) for x in p)
        got = np.asarray(now[p])
        if is_perlin:
            np.testing.assert_allclose(got, np.asarray(v))
            perlin_restored += 1
        else:
            np.testing.assert_allclose(got, 0.0)
            base_kept_zero += 1
    assert perlin_restored > 0 and base_kept_zero > 0
    tr.load("addl_test")  # full restore for subsequent tests


def test_opt_trainer_sharded_eval_matches(tmp_path):
    """dp-sharded eval == single-device eval (reference all-reduces nll)."""
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    kw = dict(
        model="tiny", max_seq_len=64, stride=32, batch_size=8,
        gradient_accumulation_steps=1, num_steps=1, eval_steps=100,
        log_steps=100,
    )
    tr_dp = OptTrainer(TrainerConfig(
        data_parallel=True, save_dir=str(tmp_path / "dp"), **kw))
    tr_1 = OptTrainer(TrainerConfig(save_dir=str(tmp_path / "sd"), **kw))
    ppl_dp = tr_dp.evaluate(max_batches=3)
    ppl_1 = tr_1.evaluate(max_batches=3)
    np.testing.assert_allclose(ppl_dp, ppl_1, rtol=1e-4)


def test_opt_trainer_layout_mismatch_raises(tmp_path):
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    kw = dict(model="tiny", max_seq_len=64, stride=32, batch_size=2,
              gradient_accumulation_steps=1, num_steps=1, eval_steps=100,
              log_steps=100, save_dir=str(tmp_path))
    tr = OptTrainer(TrainerConfig(**kw))
    tr.save("layout_test")
    tr2 = OptTrainer(TrainerConfig(scan_kd=True, **kw))
    with pytest.raises(Exception):
        tr2.load("layout_test")


def test_lra_real_format_pipelines(tmp_path):
    """The real IMDb/CIFAR file-format paths parse the standard on-disk
    layouts (exercised with tiny fixture files — zero-egress environment)."""
    import pickle
    from sea_tpu.data.lra import get_lra

    # aclImdb layout
    for split in ("train", "test"):
        for sub, text in (("pos", b"a great movie"), ("neg", b"terrible film")):
            d = tmp_path / "aclImdb" / split / sub
            d.mkdir(parents=True)
            for i in range(3):
                (d / f"{i}_7.txt").write_bytes(text * (i + 1))
    ds = get_lra("text", "train", n=6, max_length=64, data_dir=str(tmp_path))
    assert ds.input_ids.shape == (6, 64)
    assert set(np.asarray(ds.labels).tolist()) == {0, 1}
    assert ds.input_ids.max() < 256 and (ds.input_ids[:, 0] == 1).all()
    # byte content round-trips
    row = np.asarray(ds.input_ids)[0]
    assert row[1] in (ord("a"), ord("t"))

    # cifar-10-batches-py layout
    cdir = tmp_path / "cifar-10-batches-py"
    cdir.mkdir()
    rng = np.random.default_rng(0)
    for b in ["data_batch_1", "test_batch"]:
        data = {
            b"data": rng.integers(0, 256, (8, 3072)).astype(np.uint8),
            b"labels": rng.integers(0, 10, 8).tolist(),
        }
        (cdir / b).write_bytes(pickle.dumps(data))
    ds = get_lra("image", "train", n=8, max_length=1024, data_dir=str(tmp_path))
    assert ds.input_ids.shape == (8, 1024)
    assert 0 <= ds.input_ids.min() and ds.input_ids.max() <= 255


def test_unified_cli_builds_and_names(tmp_path):
    """sea_tpu.training.cli: dataset dispatch + format_exp name mangling
    (reference perlin_trainer.py:200-224,440-591)."""
    from sea_tpu.training.cli import build_parser, build_trainer, format_exp

    p = build_parser()
    args = p.parse_args([
        "--dataset", "wikitext2", "--model", "tiny", "--num-steps", "1",
        "--batch-size", "2", "--max-seq-len", "64",
        "--gradient-accumulation-steps", "1",
        "--k", "64", "--predictor-length", "256",
        "--performer-nb-feature-factor", "8",
        "--save-root", str(tmp_path),
    ])
    tr, exp = build_trainer(args)
    assert exp == "wikitext2_tiny_lw0_perlin_k64_full_nbf8.0"
    tr.train()
    assert tr.step == 1

    # non-defaults show up in the name
    args2 = p.parse_args([
        "--dataset", "lra", "--subset", "listops", "--layerwise",
        "--predictor-backend", "cosformer", "--k-oversample", "1.5",
        "--save-root", str(tmp_path),
    ])
    name = format_exp("lra_listops", args2)
    assert "lw1" in name and "pbecosformer" in name and "kover_1.5" in name


def test_glue_stsb_regression_smoke(tmp_path):
    """stsb (num_labels=1) exercises the regression loss/metric path."""
    from sea_tpu.training.glue_trainer import GlueTrainer, GlueTrainerConfig

    cfg = GlueTrainerConfig(
        subset="stsb", model="tiny", num_steps=2, batch_size=4,
        max_length=32, eval_steps=100, save_dir=str(tmp_path),
    )
    tr = GlueTrainer(cfg)
    tr.train()
    score = tr.evaluate(max_batches=2)
    assert np.isfinite(score)


def test_opt_launch_wrapper_presets():
    """scripts/opt.py maps models to TPU memory-plan presets (the analogue
    of the reference's per-model DeepSpeed config table)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib
    opt_launch = importlib.import_module("opt")

    argv = opt_launch.build_argv(["--model", "opt-1.3b", "--method", "perlin"])
    assert "--scan-kd" in argv and "--data-parallel" in argv
    assert argv[argv.index("--model") + 1] == "opt-1.3b"
    argv = opt_launch.build_argv(
        ["--model", "tiny", "--method", "cosformer", "--num-steps", "1"]
    )
    assert "--scan-kd" not in argv and "--num-steps" in argv


def test_opt_trainer_baseline_student_method(tmp_path):
    """--method reformer/cosformer/sinkhorn trains a baseline student under
    the same KD trainer (reference scripts/opt.py SUPPORTED_METHODS)."""
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="tiny", method="cosformer", max_seq_len=64, stride=32,
        batch_size=2, gradient_accumulation_steps=1, num_steps=2,
        eval_steps=100, log_steps=100, save_dir=str(tmp_path),
    )
    tr = OptTrainer(cfg)
    assert tr.s_cfg.attention_method == "cosformer"
    tr.train()
    assert np.isfinite(tr.evaluate(max_batches=2))


def test_opt_trainer_bf16_compute(tmp_path):
    """compute_dtype='bfloat16' (the AMP analogue) trains with f32 params
    and finite loss; the knob overrides the model-family default."""
    import jax.numpy as jnp
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="tiny", max_seq_len=64, stride=32, batch_size=2,
        gradient_accumulation_steps=1, num_steps=2, eval_steps=100,
        log_steps=100, save_dir=str(tmp_path), compute_dtype="bfloat16",
    )
    tr = OptTrainer(cfg)
    assert tr.s_cfg.compute_dtype == "bfloat16"
    assert tr.t_cfg.compute_dtype == "bfloat16"
    # master params stay f32 (mixed precision, not low-precision training)
    leaves = jax.tree_util.tree_leaves(tr.s_params)
    assert all(l.dtype == jnp.float32 for l in leaves if hasattr(l, "dtype"))
    tr.train()
    assert np.isfinite(tr.evaluate(max_batches=2))


def test_make_optimizer_accepts_schedule():
    """make_optimizer(lr=<schedule>) composes the 4-group scales with a
    callable learning rate (LRA warmup path)."""
    import jax.numpy as jnp
    import optax

    from sea_tpu.training.optimizer import make_optimizer

    sched = optax.linear_schedule(0.0, 1e-3, 10)
    tx = make_optimizer(lr=sched, wd=0.0, lr_low_scale=1.0)
    params = {"dense": {"kernel": jnp.ones((4, 4))},
              "perlin_x": {"kernel": jnp.ones((4, 4))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step 0: lr 0 -> zero update for every group
    upd, state = tx.update(grads, state, params)
    assert all(
        float(jnp.abs(u).max()) == 0.0
        for u in jax.tree_util.tree_leaves(upd)
    )
    # later steps: perlin group moves 10x the base group
    for _ in range(5):
        upd, state = tx.update(grads, state, params)
    base = float(jnp.abs(upd["dense"]["kernel"]).max())
    high = float(jnp.abs(upd["perlin_x"]["kernel"]).max())
    assert base > 0
    np.testing.assert_allclose(high / base, 10.0, rtol=1e-4)
