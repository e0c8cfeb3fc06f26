"""Failure detection / elastic recovery (training/resilience.py, SURVEY
§5.3 — the one aux subsystem the reference lacks entirely): rotating
checkpoints with an atomic LATEST pointer, newest-intact auto-resume,
divergence rollback via the in-process Supervisor, and the process-level
heartbeat supervisor."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _mk_trainer(save_dir, num_steps=4, **kw):
    from sea_tpu.training.opt_trainer import OptTrainer, TrainerConfig

    cfg = TrainerConfig(
        model="tiny", max_seq_len=64, stride=32, batch_size=2,
        gradient_accumulation_steps=1, num_steps=num_steps,
        eval_steps=2, log_steps=1, save_dir=str(save_dir),
        checkpoint_rotation=2, **kw,
    )
    return OptTrainer(cfg)


def test_rotating_checkpoints_prune_and_latest(tmp_path):
    tr = _mk_trainer(tmp_path, num_steps=6)
    tr.train()
    from sea_tpu.training.resilience import _step_tags, resolve_latest

    tags = _step_tags(str(tmp_path))
    assert len(tags) == 2, tags  # pruned to checkpoint_rotation
    assert resolve_latest(str(tmp_path)) == tags[-1]
    assert tags[-1] == "ckpt_00000006"
    # LATEST pointer resolves through trainer.load
    tr2 = _mk_trainer(tmp_path, num_steps=6)
    assert tr2.load("latest")
    assert tr2.step == 6


def test_resume_latest_skips_torn_checkpoint(tmp_path):
    tr = _mk_trainer(tmp_path, num_steps=4)
    tr.train()
    from sea_tpu.training.resilience import _step_tags, resume_latest

    tags = _step_tags(str(tmp_path))
    newest = os.path.join(str(tmp_path), tags[-1])
    # simulate a torn write: corrupt the newest checkpoint's metadata
    for root, _dirs, files in os.walk(newest):
        for f in files:
            with open(os.path.join(root, f), "w") as fh:
                fh.write("torn")
    tr2 = _mk_trainer(tmp_path, num_steps=4)
    step = resume_latest(tr2)
    assert step == int(tags[-2].split("_")[1])
    assert not os.path.exists(newest)  # quarantined


def test_torn_checkpoint_quarantined_by_rename(tmp_path):
    """A torn checkpoint is renamed (tag + '.bad'), never deleted — a
    later inspection may recover it (ADVICE r2 #1)."""
    tr = _mk_trainer(tmp_path, num_steps=4)
    tr.train()
    from sea_tpu.training.resilience import _step_tags, resume_latest

    tags = _step_tags(str(tmp_path))
    newest = os.path.join(str(tmp_path), tags[-1])
    for root, _dirs, files in os.walk(newest):
        for f in files:
            with open(os.path.join(root, f), "w") as fh:
                fh.write("torn")
    tr2 = _mk_trainer(tmp_path, num_steps=4)
    resume_latest(tr2)
    assert os.path.isdir(newest + ".bad")  # preserved, not rmtree'd
    # quarantined dirs are not candidate tags
    assert tags[-1] not in _step_tags(str(tmp_path))


def test_layout_mismatch_raises_and_preserves_checkpoints(tmp_path):
    """Resuming with a mismatched --scan-kd flag must surface
    CheckpointLayoutError and leave every checkpoint on disk (ADVICE r2:
    the old behaviour rmtree'd all valid checkpoints and silently
    restarted from scratch)."""
    tr = _mk_trainer(tmp_path, num_steps=4, scan_kd=False)
    tr.train()
    from sea_tpu.training.opt_trainer import CheckpointLayoutError
    from sea_tpu.training.resilience import _step_tags, resume_latest

    tags_before = _step_tags(str(tmp_path))
    assert tags_before
    tr2 = _mk_trainer(tmp_path, num_steps=4, scan_kd=True)
    with pytest.raises(CheckpointLayoutError):
        resume_latest(tr2)
    assert _step_tags(str(tmp_path)) == tags_before  # nothing deleted


def test_heartbeat_published(tmp_path):
    tr = _mk_trainer(tmp_path, num_steps=2)
    tr.train()
    hb_path = os.path.join(str(tmp_path), "heartbeat.json")
    assert os.path.exists(hb_path)
    hb = json.load(open(hb_path))
    assert hb["step"] == 2
    from sea_tpu.training.resilience import heartbeat_age_s

    age = heartbeat_age_s(str(tmp_path))
    assert age is not None and age < 300


def _arm_nan_bomb(tr, at_step: int):
    """Wrap the trainer's jitted step so the optimizer step `at_step`
    produces a non-finite loss exactly once."""
    real_step = tr._train_step
    bomb = {"armed": True}

    def sabotaged(params, opt_state, *args):
        p, o, loss, details = real_step(params, opt_state, *args)
        if bomb["armed"] and tr.step + 1 == at_step:
            bomb["armed"] = False
            bad = jnp.float32(np.nan)
            return p, o, bad, {k: bad for k in details}
        return p, o, loss, details

    tr._train_step = sabotaged
    return bomb


def test_divergence_raises_at_log_boundary(tmp_path):
    from sea_tpu.training.resilience import TrainingDiverged

    tr = _mk_trainer(tmp_path, num_steps=6)
    _arm_nan_bomb(tr, at_step=4)
    with pytest.raises(TrainingDiverged):
        tr.train()
    assert tr.step == 4  # raised before the step-4 save could persist NaN


def test_supervisor_recovers_from_divergence(tmp_path):
    """Poison one micro-batch window: the Supervisor catches the
    divergence at step 4, rolls back to the step-2 checkpoint, hops the
    data stream past the poison window, and completes the run."""
    from sea_tpu.training.resilience import Supervisor

    tr = _mk_trainer(tmp_path, num_steps=6)
    _arm_nan_bomb(tr, at_step=4)
    sup = Supervisor(tr, max_restarts=2)
    report = sup.run()
    assert report.completed and report.restarts == 1
    assert tr.step == 6
    # crash at step 4, restored to step 2: both intervening micro-batch
    # windows (incl. the poison one) are hopped
    assert tr.data_offset == 2 * tr.cfg.gradient_accumulation_steps
    assert report.events and "TrainingDiverged" in report.events[0]
    # the recovered state is finite everywhere
    for leaf in jax.tree_util.tree_leaves(
        tr.combined_params if tr.cfg.scan_kd else tr.s_params
    ):
        assert np.isfinite(np.asarray(leaf)).all()


def test_supervisor_budget_exhaustion(tmp_path):
    """A persistent fault (every step NaN) exhausts max_restarts and
    re-raises instead of looping forever."""
    from sea_tpu.training.resilience import Supervisor, TrainingDiverged

    tr = _mk_trainer(tmp_path, num_steps=3)
    real_step = tr._train_step

    def always_bad(params, opt_state, *args):
        p, o, loss, details = real_step(params, opt_state, *args)
        bad = jnp.float32(np.nan)
        return p, o, bad, {k: bad for k in details}

    tr._train_step = always_bad
    sup = Supervisor(tr, max_restarts=1)
    with pytest.raises(TrainingDiverged):
        sup.run()


def test_process_supervisor_restarts_stalled_child(tmp_path):
    """scripts/supervise.py kills a child whose heartbeat goes stale (by
    exact PID) and relaunches; the second incarnation finishes clean."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from supervise import run_supervised

    save_dir = str(tmp_path)
    marker = os.path.join(save_dir, "attempt")
    child_src = f"""
import json, os, sys, time
save_dir = {save_dir!r}
marker = {marker!r}
n = int(open(marker).read()) if os.path.exists(marker) else 0
open(marker, "w").write(str(n + 1))
hb = os.path.join(save_dir, "heartbeat.json")
open(hb, "w").write(json.dumps({{"step": n, "time": time.time()}}))
if n == 0:
    time.sleep(600)  # hang: no further heartbeats
sys.exit(0)
"""
    rc = run_supervised(
        [sys.executable, "-c", child_src],
        save_dir,
        # generous: under machine load the child can take seconds just to
        # start and publish its first heartbeat (observed flaky at 3.0)
        stall_timeout=10.0,
        max_restarts=2,
        poll_s=0.2,
        backoff_s=0.1,
    )
    assert rc == 0
    assert open(marker).read() == "2"  # exactly one restart


def test_process_supervisor_restarts_crashed_child(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from supervise import run_supervised

    save_dir = str(tmp_path)
    marker = os.path.join(save_dir, "attempt")
    child_src = f"""
import os, sys
marker = {marker!r}
n = int(open(marker).read()) if os.path.exists(marker) else 0
open(marker, "w").write(str(n + 1))
sys.exit(7 if n == 0 else 0)
"""
    rc = run_supervised(
        [sys.executable, "-c", child_src],
        save_dir,
        stall_timeout=60.0,
        max_restarts=2,
        poll_s=0.1,
        backoff_s=0.05,
    )
    assert rc == 0
    assert open(marker).read() == "2"
