"""LRA trainer (reference `src/trainer/lra_trainer.py:83-304`): first train
a *dense* BERT on the task, checkpoint it, then distill a SEA student from
that teacher (KD weights: 0.1*task + 10*hidden MSE + attention distill —
reference `:141-193`, no logit KL for LRA).

Run: python -m sea_tpu.training.lra_trainer --task listops --steps 50
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import SeaConfig
from ..data.lra import LRA_TASKS, get_lra
from ..models.bert import BertConfig
from ..models.loader import student_from_teacher
from .optimizer import make_optimizer


def lra_bert_config(task: str, attention_method: str, k: int = 64,
                    predictor_length: int = 128,
                    remat_layers: bool = True) -> BertConfig:
    spec = LRA_TASKS[task]
    head_dim = spec.hidden_size // spec.num_heads
    sea = SeaConfig(
        num_heads=spec.num_heads,
        head_dim=head_dim,
        predictor_length=predictor_length,
        k=k,
        performer_nb_factor=1,
        causal=False,
    ).validate()
    return BertConfig(
        vocab_size=spec.vocab_size,
        hidden_size=spec.hidden_size,
        num_layers=spec.num_layers,
        num_heads=spec.num_heads,
        ffn_dim=spec.ffn_dim,
        max_position_embeddings=spec.max_position_embeddings,
        num_labels=spec.num_labels,
        attention_method=attention_method,
        remat_layers=remat_layers,
        sea=sea,
    )


@dataclasses.dataclass
class LraTrainerConfig:
    task: str = "listops"
    phase: str = "distill"  # 'dense' (train teacher) | 'distill' (SEA student)
    num_steps: int = 1000
    eval_steps: int = 250
    batch_size: Optional[int] = None
    max_length: Optional[int] = None
    n_train: int = 2048
    k: int = 64
    predictor_length: int = 128
    seed: int = 42
    save_dir: str = "./saves/lra_trainer"
    scale: float = 1.0  # model-size scale for smoke tests
    lr: Optional[float] = None  # override the per-task table
    wd: Optional[float] = None
    max_depth: int = 6  # listops expression depth
    # LR warmup steps (linear 0 -> lr, then constant). The LRA paper
    # trains listops with 1k warmup of 5k steps; without it the 6-layer
    # dense teacher at lr 2e-3 plateaus near chance (RESULTS.md round-3
    # mini run) — warmup is the difference between 14% and learning.
    warmup_steps: int = 0
    # 'none' (constant after warmup) | 'rsqrt' (the LRA paper's
    # linear_warmup * rsqrt_decay schedule shape)
    lr_decay: str = "none"
    log_every: int = 100
    eval_every: int = 0  # 0 = only at the end
    # gradient accumulation: LRA paper trains listops at effective batch
    # 32, which OOMs as a single dense-attention microbatch at T=2048 on
    # the 16 GB chip — accumulate instead (one update per accum batches)
    accum_steps: int = 1
    # checkpoint every N optimizer steps (0 = only at probe boundaries).
    # The environment kills long TPU processes ~40 min in; saving on a
    # step cadence (not just eval_every probes) bounds the work lost per
    # restart even when a probe interval exceeds the process lifetime.
    save_every: int = 0


class LraTrainer:
    def __init__(self, cfg: LraTrainerConfig):
        self.cfg = cfg
        spec = LRA_TASKS[cfg.task]
        self.batch_size = cfg.batch_size or spec.batch_size
        self.t_cfg = lra_bert_config(cfg.task, "none", cfg.k, cfg.predictor_length)
        self.s_cfg = lra_bert_config(cfg.task, "perlin", cfg.k, cfg.predictor_length)
        if cfg.scale != 1.0:
            self.t_cfg, self.s_cfg = (
                self._scaled(self.t_cfg), self._scaled(self.s_cfg)
            )
        kw = {"max_depth": cfg.max_depth} if cfg.task == "listops" else {}
        self.train_ds = get_lra(cfg.task, "train", cfg.n_train, cfg.max_length, **kw)
        self.eval_ds = get_lra(
            cfg.task, "valid", max(cfg.n_train // 4, 64), cfg.max_length, **kw
        )

        from .distill import SeaBertKD

        self.kd = SeaBertKD(self.t_cfg, self.s_cfg)
        T = self.train_ds.input_ids.shape[1]
        ids = jnp.ones((self.batch_size, T), jnp.int32)
        mask = jnp.ones((self.batch_size, T), jnp.int32)
        self.t_vars = self.kd.teacher.init(jax.random.key(0), ids, mask)

        spec_lr = LRA_TASKS[cfg.task]
        lr = cfg.lr if cfg.lr is not None else spec_lr.lr
        wd = cfg.wd if cfg.wd is not None else spec_lr.wd
        if cfg.warmup_steps > 0:
            if cfg.lr_decay == "rsqrt":
                peak, w = lr, cfg.warmup_steps

                def lr(s):  # noqa: F811 — linear warmup, then rsqrt decay
                    sf = jnp.asarray(s, jnp.float32)
                    return peak * jnp.minimum(
                        sf / w, jnp.sqrt(w / jnp.maximum(sf, 1.0))
                    )
            else:
                lr = optax.linear_schedule(0.0, lr, cfg.warmup_steps)
        self.tx = make_optimizer(lr=lr, wd=wd, lr_low_scale=1.0)
        self.t_params_mut = self.t_vars["params"]  # trained in 'dense' phase
        self.t_opt_state = self.tx.init(self.t_params_mut)
        self.step = 0
        if self._load_teacher_checkpoint() and cfg.phase == "dense":
            # full-state resume (params+opt_state+step) — the dense phase is
            # restart-driven across the environment's ~40-min process kills
            # just like the distill phase below
            print(f"[{cfg.task}/dense] resumed at step {self.step}", flush=True)

        s_vars = self.kd.student.init(jax.random.key(1), ids, mask)
        s_vars = student_from_teacher(s_vars, self.t_vars["params"])
        self.s_params = s_vars["params"]
        self.s_extra = {k: v for k, v in s_vars.items() if k != "params"}
        self.opt_state = self.tx.init(self.s_params)
        self.rng = jax.random.key(cfg.seed)
        if cfg.phase == "distill":
            # resume after relay stalls (the environment kills ~40-min
            # processes; with the persistent compile cache a restart costs
            # ~2 min, so probe-boundary checkpoints make long distill
            # phases restart-driven rather than single-shot)
            if self._load_student_checkpoint():
                print(f"[{cfg.task}/distill] resumed at step {self.step}",
                      flush=True)
        # donate the param/opt buffers and sync every step in train():
        # through the axon relay, async dispatch has no backpressure — an
        # unsynced loop queues hundreds of steps whose undonated buffer
        # trees pile up on device (observed RESOURCE_EXHAUSTED at runtime
        # with a compile-time-fitting step)
        self._dense_step = jax.jit(self._dense_step_impl, donate_argnums=(0, 1))
        self._kd_step = jax.jit(self._kd_step_impl, donate_argnums=(0, 1))
        self._eval_dense = jax.jit(self._eval_dense_impl)
        self._eval_student = jax.jit(self._eval_student_impl)
        os.makedirs(cfg.save_dir, exist_ok=True)

    def _scaled(self, c: BertConfig) -> BertConfig:
        s = self.cfg.scale
        sea = dataclasses.replace(
            c.sea,
            num_heads=max(int(c.num_heads * s), 1),
            head_dim=max(int(c.head_dim * s), 8),
            predictor_length=max(int(c.sea.predictor_length * s), 8),
            k=max(int(c.sea.k * s), 2),
        )
        return dataclasses.replace(
            c,
            num_heads=sea.num_heads,
            hidden_size=sea.num_heads * sea.head_dim,
            ffn_dim=max(int(c.ffn_dim * s), 16),
            num_layers=max(int(c.num_layers * s), 1),
            sea=sea,
        )

    # -- teacher pretraining ("dense" phase; reference trains the same
    #    architecture dense, then loads it as teacher, lra_trainer.py:118-140)
    def _dense_step_impl(self, params, opt_state, ids, mask, tt, labels):
        """ids/...: (A, B, T) microbatch stacks (A = accum_steps; A=1 is
        the plain step). Grads accumulate via lax.scan — one live
        microbatch of dense-attention activations at a time."""

        def loss_fn(p, mb):
            i, m, t, y = mb
            out = self.kd.teacher.apply({"params": p}, i, m, t, labels=y)
            return out["loss"]

        def body(acc, mb):
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            return (
                jax.tree_util.tree_map(jnp.add, acc[0], grads),
                acc[1] + loss,
            ), None

        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        (grads, loss), _ = jax.lax.scan(
            body, (g0, jnp.float32(0.0)), (ids, mask, tt, labels)
        )
        A = ids.shape[0]
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss / A

    def _kd_step_impl(self, s_params, opt_state, t_params, ids, mask, tt, labels, rng):
        """Microbatch stacks (A, B, T) like _dense_step_impl."""

        def loss_fn(p, mb, r):
            i, m, t, y = mb
            sv = dict(self.s_extra)
            sv["params"] = p
            loss, det = self.kd.kd_loss(
                {"params": t_params}, sv, i, m, y, t, r
            )
            return loss, {k: v for k, v in det.items() if k != "logits"}

        A = ids.shape[0]
        rngs = jax.random.split(rng, A)

        def body(acc, inp):
            mb, r = inp
            (loss, det), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                s_params, mb, r
            )
            return (
                jax.tree_util.tree_map(jnp.add, acc[0], grads),
                acc[1] + loss,
            ), det

        g0 = jax.tree_util.tree_map(jnp.zeros_like, s_params)
        (grads, loss), dets = jax.lax.scan(
            body, (g0, jnp.float32(0.0)), ((ids, mask, tt, labels), rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        det = jax.tree_util.tree_map(lambda x: x[-1], dets)
        updates, opt_state = self.tx.update(grads, opt_state, s_params)
        return optax.apply_updates(s_params, updates), opt_state, loss / A, det

    def _eval_dense_impl(self, params, ids, mask, tt):
        return self.kd.teacher.apply({"params": params}, ids, mask, tt)["logits"]

    def _eval_student_impl(self, s_params, ids, mask, tt):
        sv = dict(self.s_extra)
        sv["params"] = s_params
        return self.kd.student.apply(sv, ids, mask, tt)["logits"]

    def _teacher_ckpt_path(self):
        return os.path.abspath(
            os.path.join(self.cfg.save_dir, f"{self.cfg.task}_teacher")
        )

    def _student_ckpt_path(self):
        return os.path.abspath(
            os.path.join(self.cfg.save_dir, f"{self.cfg.task}_student_state")
        )

    def save_student(self):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            self._student_ckpt_path(),
            {"params": self.s_params, "opt_state": self.opt_state,
             "step": jnp.int32(self.step)},
            force=True,
        )
        ckptr.wait_until_finished()

    def _load_student_checkpoint(self):
        path = self._student_ckpt_path()
        if os.path.exists(path):
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(
                path,
                {"params": self.s_params, "opt_state": self.opt_state,
                 "step": jnp.int32(self.step)},
            )
            self.s_params = restored["params"]
            self.opt_state = restored["opt_state"]
            self.step = int(restored["step"])
            return True
        return False

    def _load_teacher_checkpoint(self) -> bool:
        path = self._teacher_ckpt_path()
        if not os.path.exists(path):
            return False
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(
                path,
                {"params": self.t_params_mut, "opt_state": self.t_opt_state,
                 "step": jnp.int32(0)},
            )
            self.t_vars = {**self.t_vars, "params": restored["params"]}
            self.t_params_mut = restored["params"]
            if self.cfg.phase == "dense":
                self.t_opt_state = restored["opt_state"]
                self.step = int(restored["step"])
        except (ValueError, KeyError, TypeError):
            # legacy format: bare params tree (pre-round-5 teacher ckpts)
            restored = ckptr.restore(path, self.t_vars["params"])
            self.t_vars = {**self.t_vars, "params": restored}
            self.t_params_mut = restored
        return True

    def save_teacher(self):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            self._teacher_ckpt_path(),
            {"params": self.t_params_mut, "opt_state": self.t_opt_state,
             "step": jnp.int32(self.step)},
            force=True,
        )
        ckptr.wait_until_finished()

    def evaluate(self, which="student", max_batches=None) -> float:
        correct, total = 0, 0
        for i, (ids, mask, tt, labels) in enumerate(
            self.eval_ds.batches(self.batch_size)
        ):
            if max_batches is not None and i >= max_batches:
                break
            fn = self._eval_student if which == "student" else self._eval_dense
            p = self.s_params if which == "student" else self.t_params_mut
            logits = np.asarray(fn(p, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)))
            correct += int((logits.argmax(-1) == labels).sum())
            total += len(labels)
        return correct / max(total, 1)

    def train(self, log=print):
        cfg = self.cfg
        import time as _time

        t0 = _time.time()
        A = max(cfg.accum_steps, 1)
        if cfg.phase == "distill" and self.step == 0:
            # bootstrap probe: the student starts from teacher weights
            # (student_from_teacher) — record where the drop-in SEA
            # replacement lands before any KD step
            acc = self.evaluate("student", max_batches=8)
            log(f"[{cfg.task}/distill] step 0 bootstrap student acc "
                f"(256-sample probe) {acc:.3f}")
        pending = []
        while self.step < cfg.num_steps:
            for micro in self.train_ds.batches(
                self.batch_size, shuffle=True, seed=cfg.seed + self.step
            ):
                pending.append(micro)
                if len(pending) < A:
                    continue
                b = tuple(
                    jnp.asarray(np.stack([m[j] for m in pending]))
                    for j in range(4)
                )
                pending = []
                if cfg.phase == "dense":
                    self.t_params_mut, self.t_opt_state, loss = self._dense_step(
                        self.t_params_mut, self.t_opt_state, *b
                    )
                else:
                    self.rng, rng = jax.random.split(self.rng)
                    self.s_params, self.opt_state, loss, det = self._kd_step(
                        self.s_params, self.opt_state, self.t_vars["params"], *b, rng
                    )
                self.step += 1
                lv = float(loss)  # device->host sync bounds the async queue
                if cfg.log_every and self.step % cfg.log_every == 0:
                    log(
                        f"[{cfg.task}/{cfg.phase}] step {self.step}/{cfg.num_steps} "
                        f"loss {lv:.4f} ({_time.time() - t0:.0f}s)"
                    )
                if (cfg.save_every and self.step % cfg.save_every == 0
                        and not (cfg.eval_every
                                 and self.step % cfg.eval_every == 0)):
                    if cfg.phase == "dense":
                        self.save_teacher()
                    else:
                        self.save_student()
                if cfg.eval_every and self.step % cfg.eval_every == 0:
                    which = "dense" if cfg.phase == "dense" else "student"
                    acc = self.evaluate(which, max_batches=8)
                    log(
                        f"[{cfg.task}/{cfg.phase}] step {self.step} "
                        f"{which} acc (256-sample probe) {acc:.3f}"
                    )
                    if cfg.phase == "dense":
                        # checkpoint at probe boundaries: relay stalls have
                        # killed >20-minute unsaved dense phases
                        self.save_teacher()
                    else:
                        self.save_student()
                if self.step >= cfg.num_steps:
                    if cfg.phase == "dense":
                        self.save_teacher()
                    else:
                        self.save_student()
                    return


def main():
    from ..utils import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="listops")
    p.add_argument("--phase", default="distill", choices=["dense", "distill"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-length", type=int, default=None)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--n-train", type=int, default=2048)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--lr-decay", default="none", choices=["none", "rsqrt"])
    p.add_argument("--save-every", type=int, default=0)
    args = p.parse_args()
    cfg = LraTrainerConfig(
        task=args.task, phase=args.phase, num_steps=args.steps,
        batch_size=args.batch_size, max_length=args.max_length, scale=args.scale,
        n_train=args.n_train, max_depth=args.depth, lr=args.lr,
        warmup_steps=args.warmup, eval_every=args.eval_every,
        accum_steps=args.accum, lr_decay=args.lr_decay,
        save_every=args.save_every,
    )
    tr = LraTrainer(cfg)
    tr.train()
    which = "dense" if args.phase == "dense" else "student"
    print(f"{args.task} {which} accuracy:", tr.evaluate(which))


if __name__ == "__main__":
    main()
