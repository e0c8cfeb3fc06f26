"""GLUE/BERT KD trainer (reference `src/trainer/glue_trainer.py:89-434`).

Teacher = finetuned dense BERT (loaded from a local checkpoint when
available, else freshly initialised — offline mode); student = SEA BERT
bootstrapped from teacher weights. KD recipe: 0.1*task + 10*hidden MSE +
0.1*logit KL + attention distill.

Run: python -m sea_tpu.training.glue_trainer --subset mrpc --steps 20
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import SeaConfig, bert_config
from ..data.glue import TASK_BATCH_SIZE, TASK_NUM_LABELS, get_glue
from ..models.bert import BertConfig, bert_base
from ..models.loader import student_from_teacher
from .distill import SeaBertKD
from .optimizer import make_optimizer


@dataclasses.dataclass
class GlueTrainerConfig:
    subset: str = "mrpc"
    model: str = "bert-base"  # 'tiny' | 'bert-base'
    teacher_checkpoint: Optional[str] = None
    k: int = 64
    predictor_length: int = 128
    lr: float = 1e-4
    wd: float = 1e-2
    num_steps: int = 2000
    eval_steps: int = 500
    max_length: int = 256
    batch_size: Optional[int] = None
    seed: int = 42
    save_dir: str = "./saves/glue_trainer"
    # offline mode: task-train the fresh teacher before distilling (the
    # reference downloads finetuned textattack teachers instead)
    pretrain_teacher_steps: int = 0


def tiny_bert_configs(num_labels=2):
    sea = SeaConfig(
        num_heads=2, head_dim=8, predictor_length=8, k=2,
        performer_nb_factor=1, causal=False,
    ).validate()
    kw = dict(
        vocab_size=30522, hidden_size=16, num_layers=2, num_heads=2,
        ffn_dim=32, max_position_embeddings=128, num_labels=num_labels, sea=sea,
    )
    return (
        BertConfig(attention_method="none", **kw),
        BertConfig(attention_method="perlin", **kw),
    )


class GlueTrainer:
    def __init__(self, cfg: GlueTrainerConfig):
        self.cfg = cfg
        num_labels = TASK_NUM_LABELS[cfg.subset]
        if cfg.model == "tiny":
            t_cfg, s_cfg = tiny_bert_configs(num_labels)
        else:
            sea = bert_config(k=cfg.k, predictor_length=cfg.predictor_length)
            t_cfg = bert_base("none", sea, num_labels=num_labels)
            s_cfg = bert_base("perlin", sea, num_labels=num_labels)
        self.kd = SeaBertKD(t_cfg, s_cfg)
        self.batch_size = cfg.batch_size or TASK_BATCH_SIZE[cfg.subset]
        self.num_labels = num_labels

        self.train_ds = get_glue(cfg.subset, "train", cfg.max_length)
        self.eval_ds = get_glue(cfg.subset, "validation", cfg.max_length)
        T = self.train_ds.input_ids.shape[1]

        ids = jnp.ones((self.batch_size, T), jnp.int32)
        mask = jnp.ones((self.batch_size, T), jnp.int32)
        self.t_vars = self.kd.teacher.init(jax.random.key(0), ids, mask)
        s_vars = self.kd.student.init(jax.random.key(1), ids, mask)
        s_vars = student_from_teacher(s_vars, self.t_vars["params"])
        self.s_params = s_vars["params"]
        self.s_extra = {k: v for k, v in s_vars.items() if k != "params"}

        self.tx = make_optimizer(lr=cfg.lr, wd=cfg.wd, lr_low_scale=1.0)
        if cfg.pretrain_teacher_steps > 0:
            self._pretrain_teacher(cfg.pretrain_teacher_steps)
            s_vars = student_from_teacher(
                {"params": self.s_params, **self.s_extra}, self.t_vars["params"]
            )
            self.s_params = s_vars["params"]
        self.opt_state = self.tx.init(self.s_params)
        self.step = 0
        self.rng = jax.random.key(cfg.seed)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        os.makedirs(cfg.save_dir, exist_ok=True)
        self.metrics_path = os.path.join(cfg.save_dir, f"{cfg.subset}.jsonl")

    def _pretrain_teacher(self, steps: int):
        import optax as _optax

        ttx = _optax.adamw(self.cfg.lr, weight_decay=self.cfg.wd)
        t_params = self.t_vars["params"]
        t_opt = ttx.init(t_params)

        @jax.jit
        def tstep(p, o, ids, mask, tt, labels):
            def loss_fn(pp):
                out = self.kd.teacher.apply({"params": pp}, ids, mask, tt, labels=labels)
                return out["loss"]

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o = ttx.update(g, o, p)
            return _optax.apply_updates(p, up), o, loss

        done = 0
        while done < steps:
            for ids, mask, tt, labels in self.train_ds.batches(
                self.batch_size, shuffle=True, seed=self.cfg.seed + 500 + done
            ):
                t_params, t_opt, loss = tstep(
                    t_params, t_opt,
                    jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt),
                    jnp.asarray(labels),
                )
                done += 1
                if done >= steps:
                    break
        self.t_vars = {**self.t_vars, "params": t_params}

    def evaluate_teacher(self, max_batches=None) -> float:
        correct, total = 0, 0
        for i, (ids, mask, tt, labels) in enumerate(
            self.eval_ds.batches(self.batch_size)
        ):
            if max_batches is not None and i >= max_batches:
                break
            logits = np.asarray(
                self.kd.teacher.apply(
                    self.t_vars, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
                )["logits"]
            )
            correct += int((logits.argmax(-1) == labels).sum())
            total += len(labels)
        return correct / max(total, 1)

    def _train_step_impl(self, s_params, opt_state, ids, mask, tt, labels, rng):
        def loss_fn(p):
            sv = dict(self.s_extra)
            sv["params"] = p
            return self.kd.kd_loss(self.t_vars, sv, ids, mask, labels, tt, rng)

        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(s_params)
        updates, opt_state = self.tx.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        details = {k: v for k, v in details.items() if k != "logits"}
        return s_params, opt_state, loss, details

    def _eval_step_impl(self, s_params, ids, mask, tt):
        sv = dict(self.s_extra)
        sv["params"] = s_params
        out = self.kd.student.apply(sv, ids, mask, tt)
        return out["logits"]

    def evaluate(self, max_batches=None, return_dict: bool = False):
        """Per-task GLUE metric (reference
        `glue_trainer.py:321-359` / HF `load_metric('glue', subset)`):
        Matthews for cola, accuracy+F1 for mrpc/qqp, Pearson/Spearman for
        stsb, accuracy otherwise. Returns the task's primary score (what
        the reference logs as eval/score), or the full metric dict with
        `return_dict=True`."""
        from .glue_metrics import glue_compute, primary_score

        preds, labels_all = [], []
        for i, (ids, mask, tt, labels) in enumerate(
            self.eval_ds.batches(self.batch_size)
        ):
            if max_batches is not None and i >= max_batches:
                break
            logits = np.asarray(
                self._eval_step(
                    self.s_params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
                )
            )
            if self.num_labels == 1:  # stsb regression: raw scores
                preds.append(logits[:, 0])
            else:
                preds.append(logits.argmax(-1))
            labels_all.append(labels)
        preds = np.concatenate(preds) if preds else np.zeros((0,))
        labels_all = (
            np.concatenate(labels_all) if labels_all else np.zeros((0,))
        )
        metrics = glue_compute(self.cfg.subset, preds, labels_all)
        if return_dict:
            return metrics
        return primary_score(self.cfg.subset, metrics)

    def train(self):
        cfg = self.cfg
        t0 = time.time()
        while self.step < cfg.num_steps:
            for ids, mask, tt, labels in self.train_ds.batches(
                self.batch_size, shuffle=True, seed=cfg.seed + self.step
            ):
                self.rng, rng = jax.random.split(self.rng)
                self.s_params, self.opt_state, loss, details = self._train_step(
                    self.s_params, self.opt_state,
                    jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt),
                    jnp.asarray(labels), rng,
                )
                self.step += 1
                if self.step % 20 == 0:
                    rec = {k: float(v) for k, v in details.items()}
                    rec.update(step=self.step, time=time.time() - t0)
                    with open(self.metrics_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                if self.step % cfg.eval_steps == 0 or self.step >= cfg.num_steps:
                    score = self.evaluate(max_batches=16)
                    with open(self.metrics_path, "a") as f:
                        f.write(json.dumps({"step": self.step, "eval": score}) + "\n")
                if self.step >= cfg.num_steps:
                    return


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subset", default="mrpc")
    p.add_argument("--model", default="tiny")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=None)
    args = p.parse_args()
    cfg = GlueTrainerConfig(
        subset=args.subset, model=args.model, num_steps=args.steps,
        batch_size=args.batch_size, eval_steps=max(args.steps // 2, 1),
    )
    tr = GlueTrainer(cfg)
    tr.train()
    print("eval score:", tr.evaluate(max_batches=16))


if __name__ == "__main__":
    main()
