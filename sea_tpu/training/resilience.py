"""Failure detection and elastic recovery (aux subsystem, SURVEY §5.3).

The reference has no failure-recovery story beyond the `raise_if_nan`
tripwire (`/root/reference/src/utils/__init__.py:132-147`); a production
TPU training stack needs one — pod preemptions are routine, and one
non-finite loss silently poisons all four AdamW moment groups. Built on
the trainer's full-state checkpointing (params/optimizer/rng/projections/
layout, `opt_trainer.py:_full_state`), this module adds:

  * rotating step-tagged checkpoints with an atomically-updated LATEST
    pointer (a crash mid-save can never corrupt the resume point: the
    pointer flips only after `wait_until_finished`);
  * auto-resume from the newest *intact* checkpoint — a torn/corrupt
    newest checkpoint falls back to the next older one;
  * `TrainingDiverged`, raised by the train loop at a log boundary when
    the loss goes non-finite (the device->host sync already happens
    there, so the check costs nothing extra);
  * a `Supervisor` that catches divergence / device failure, rolls back
    to the last good checkpoint, hops the data stream past the offending
    window (`trainer.data_offset`), and retries with bounded restarts;
  * process-level supervision for multi-host launches in
    `scripts/supervise.py` (heartbeat staleness -> kill the exact child
    PID -> relaunch with backoff).
"""

from __future__ import annotations

import dataclasses
import os
import re
import shutil
from typing import Any, Dict, List, Optional

_TAG_RE = re.compile(r"^ckpt_(\d{8})$")


class TrainingDiverged(RuntimeError):
    """Loss went non-finite; the current optimizer state is suspect."""


def _step_tags(save_dir: str) -> List[str]:
    """Step-tagged checkpoint dirs, oldest first."""
    if not os.path.isdir(save_dir):
        return []
    tags = [d for d in os.listdir(save_dir) if _TAG_RE.match(d)]
    return sorted(tags, key=lambda t: int(_TAG_RE.match(t).group(1)))


def save_rotating(trainer, keep: int = 2) -> str:
    """Save under `ckpt_{step:08d}`, atomically flip LATEST, prune to
    `keep` newest. Returns the tag written."""
    assert keep >= 1
    tag = f"ckpt_{trainer.step:08d}"
    # direct (non-rotating) save path: bypass the trainer.save() dispatch
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(trainer.cfg.save_dir, tag))
    if os.path.exists(path):  # re-save at the same step after a rollback
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, trainer._full_state(), force=True)
    ckptr.wait_until_finished()
    trainer._write_layout_sidecar(tag)

    latest = os.path.join(trainer.cfg.save_dir, "LATEST")
    tmp = latest + ".tmp"
    with open(tmp, "w") as f:
        f.write(tag)
    os.replace(tmp, latest)

    for old in _step_tags(trainer.cfg.save_dir)[:-keep]:
        shutil.rmtree(os.path.join(trainer.cfg.save_dir, old), ignore_errors=True)
        try:
            os.remove(os.path.join(trainer.cfg.save_dir, old + ".layout.json"))
        except OSError:
            pass
    return tag


def resolve_latest(save_dir: str) -> Optional[str]:
    """Newest resume tag: the LATEST pointer if it names an existing
    checkpoint, else the newest step tag on disk, else None."""
    latest = os.path.join(save_dir, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            tag = f.read().strip()
        if tag and os.path.isdir(os.path.join(save_dir, tag)):
            return tag
    tags = _step_tags(save_dir)
    return tags[-1] if tags else None


def resume_latest(trainer) -> Optional[int]:
    """Restore the newest intact checkpoint, walking older ones past any
    torn/corrupt restore. Returns the resumed step, or None if no
    checkpoint could be restored (trainer state is then untouched)."""
    tags = _step_tags(trainer.cfg.save_dir)
    pointed = resolve_latest(trainer.cfg.save_dir)
    ordered = [pointed] if pointed else []
    ordered += [t for t in reversed(tags) if t != pointed]
    from .opt_trainer import CheckpointLayoutError

    for tag in ordered:
        try:
            if trainer.load(tag):
                return trainer.step
        except CheckpointLayoutError:
            # deliberate layout mismatch (e.g. resuming with a different
            # --scan-kd flag): the checkpoint is intact — deleting it
            # would permanently destroy valid state. Surface the error.
            raise
        except Exception:
            # torn write: quarantine by renaming (never delete — a later
            # inspection may recover it) and try the next older one
            bad = os.path.join(trainer.cfg.save_dir, tag)
            if os.path.isdir(bad):
                quarantined = bad + ".bad"
                if os.path.exists(quarantined):
                    shutil.rmtree(quarantined, ignore_errors=True)
                try:
                    os.replace(bad, quarantined)
                except OSError:
                    pass
            continue
    return None


@dataclasses.dataclass
class SupervisorReport:
    restarts: int = 0
    events: List[str] = dataclasses.field(default_factory=list)
    completed: bool = False
    final_step: int = 0


class Supervisor:
    """In-process elastic supervisor around `trainer.train()`.

    On TrainingDiverged (or any device-side RuntimeError): roll back to
    the last good checkpoint, advance `trainer.data_offset` by one
    optimizer step's worth of micro-batches so the resumed stream hops
    the poison window, and retry — at most `max_restarts` times. The
    deterministic per-epoch batch stream (opt_trainer.train) makes the
    rollback exact: a resumed run consumes precisely the batches the
    uninterrupted run would have, minus the skipped window.
    """

    def __init__(
        self,
        trainer,
        max_restarts: int = 3,
        skip_data_on_divergence: bool = True,
    ):
        self.trainer = trainer
        self.max_restarts = max_restarts
        self.skip_data_on_divergence = skip_data_on_divergence

    def run(self) -> SupervisorReport:
        report = SupervisorReport()
        resume_latest(self.trainer)  # fresh start if None
        while True:
            try:
                self.trainer.train()
                report.completed = True
                report.final_step = self.trainer.step
                return report
            except (TrainingDiverged, FloatingPointError, RuntimeError) as e:
                report.events.append(f"{type(e).__name__}: {e}")
                if report.restarts >= self.max_restarts:
                    raise
                report.restarts += 1
                crash_step = self.trainer.step
                step = resume_latest(self.trainer)
                if step is None:
                    # no checkpoint yet: restart from scratch with the
                    # data window skipped (divergence in the first steps)
                    self._reset_to_step_zero()
                    step = 0
                if self.skip_data_on_divergence:
                    # hop every micro-batch between the restored step and
                    # the crash (the poison batch is somewhere in there)
                    self.trainer.data_offset += max(crash_step - step, 1) * (
                        self.trainer.cfg.gradient_accumulation_steps
                    )

    def _reset_to_step_zero(self):
        # the trainer keeps no pristine copy; re-init optimizer state and
        # step counter only (params keep their current values — matching
        # the reference's behaviour of restarting a run by hand)
        tr = self.trainer
        import jax

        from .opt_trainer import _dealias

        tr.step = 0
        params = tr.combined_params if tr.cfg.scan_kd else tr.s_params
        # _dealias: _train_step donates (params, opt_state); freshly-init
        # optimizer state aliases zero buffers, which breaks donation —
        # same wrap the constructor uses (opt_trainer.py:242,248).
        tr.opt_state = _dealias(tr.tx.init(params))
        tr.rng = jax.random.key(tr.cfg.seed)


def heartbeat_age_s(save_dir: str) -> Optional[float]:
    """Seconds since the trainer last published liveness, or None."""
    import time

    p = os.path.join(save_dir, "heartbeat.json")
    if not os.path.exists(p):
        return None
    return time.time() - os.path.getmtime(p)
