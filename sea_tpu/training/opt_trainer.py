"""OPT wikitext2 KD trainer (TPU-native analogue of reference
`src/trainer/opt_trainer.py` + the `perlin_trainer.py` CLI).

Single jitted train step (teacher+student interleaved KD, grads, AdamW
4-group update), gradient accumulation via optax.MultiSteps, strided-window
perplexity evaluation (reference `opt_trainer.py:528-586`), orbax
checkpointing, JSON-lines metric logging (wandb analogue, §5.5).

Run:  python -m sea_tpu.training.opt_trainer --model tiny --steps 20
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import SeaConfig, opt_config
from ..data.wikitext2 import get_corpus
from ..models.opt import OptConfig, opt_125m, opt_350m, opt_1_3b, opt_2_7b
from ..models.loader import load_opt_params, student_from_teacher
from .distill import SeaOptKD
from .optimizer import make_optimizer


@dataclasses.dataclass
class TrainerConfig:
    # 'tiny' | 'opt-125m' | 'opt-350m' | 'opt-1.3b' | 'opt-2.7b'
    # | 'llama-tiny' | 'llama-7b' | 'llama-13b' (the headline SEA-13B family)
    model: str = "opt-125m"
    # student attention method (reference --method): 'perlin' or one of the
    # causal baselines 'performer' | 'reformer' | 'sinkhorn' | 'cosformer'
    method: str = "perlin"
    teacher_checkpoint: Optional[str] = None  # local dir with HF weights
    k: int = 64
    predictor_length: int = 256
    nb_factor: int = 8
    lr: float = 1e-5
    wd: float = 1e-2
    lr_high_scale: float = 10.0
    lr_low_scale: float = 0.2
    max_seq_len: int = 512
    stride: int = 256
    batch_size: int = 1
    gradient_accumulation_steps: int = 8
    num_steps: int = 10_000
    eval_steps: int = 2_000
    log_steps: int = 20
    seed: int = 42
    save_dir: str = "./saves/opt_trainer"
    use_remat: bool = True
    # FAVOR+ projection redraw interval in optimizer steps (reference
    # ProjectionUpdater every 1000 calls, attention.py:165-168)
    projection_redraw_steps: int = 1000
    # offline mode: CE-pretrain the (randomly initialised) teacher for this
    # many steps before distilling, standing in for the reference's
    # HF-hub finetuned teachers (Aalaa/opt-125m-wikitext2)
    pretrain_teacher_steps: int = 0
    # compile the teacher/student layer pair as one scanned body (large
    # models on TPU: num_layers-times smaller train-step graph)
    scan_kd: bool = False
    # shard the train step over all visible devices: batch over a 'dp' mesh
    # axis, params/optimizer replicated (XLA inserts the grad all-reduce) —
    # the DeepSpeed-DP analogue; requires batch_size % n_devices == 0
    data_parallel: bool = False
    # student CE weight (reference __TASK_LOSS env, opt_trainer.py:145-146)
    task_loss_scale: float = 0.1
    # train on the task loss alone, dropping every KD term (reference
    # IGNORE_KD_LOSS env, opt_trainer.py:177-181)
    ignore_kd_loss: bool = False
    # override the model family's compute dtype ('bfloat16'|'float32').
    # None keeps the builder default (bf16 for 1.3b+, f32 below). The TPU
    # analogue of the reference's AMP/GradScaler (opt_trainer.py:244-263):
    # bf16 activations/matmuls with f32 params, optimizer state and loss
    # islands — no loss scaling needed (bf16 keeps f32's exponent range).
    compute_dtype: Optional[str] = None
    # failure detection / elastic recovery (training/resilience.py; the
    # reference has no analogue beyond raise_if_nan, SURVEY §5.3):
    # >0 keeps that many step-tagged checkpoints with an atomic LATEST
    # pointer instead of overwriting one 'checkpoint' tag
    checkpoint_rotation: int = 0
    # raise TrainingDiverged when the loss goes non-finite at a log
    # boundary (the sync already happens there; per-step checks would
    # serialize the async dispatch pipeline)
    halt_on_divergence: bool = True
    # parameter storage dtype ('bfloat16' halves the resident param trees;
    # teacher is frozen so its cast is free of training-precision cost).
    # The single-16GB-chip memory plan for opt-1.3b KD: f32 AdamW alone
    # needs params+moments = 16 B/param = 20.8 GB — it CANNOT fit; bf16
    # params + bf16 moments (see moment_dtype) ≈ 10.4 GB + activations do.
    # Production multi-chip runs should prefer f32 + ZeRO sharding
    # (parallel/mesh.opt_state_sharding) over this.
    param_dtype: Optional[str] = None
    # AdamW first-moment dtype (optax mu_dtype); 'bfloat16' halves mu.
    moment_dtype: Optional[str] = None
    # directory holding real tokenized corpora (`wikitext2_{split}.npy`);
    # None = saves/data. See docs/REAL_DATA.md — dropping the files there
    # routes every run onto the real corpus with zero code edits.
    data_cache_dir: Optional[str] = None
    # chunk the logit CE/KL over the sequence axis (scan_kd only): bounds
    # the live (N·T, V) f32 logit tensors to one (N, chunk, V) pair —
    # part of the 1.3b+/long-T memory plan (distill.SeaOptKDScan docs)
    logit_chunk: Optional[int] = None


def _dealias(tree):
    """Freshly-initialised optimizer states can alias identical zero
    buffers, which breaks donation ("donate the same buffer twice");
    force distinct buffers."""
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if hasattr(x, "shape") else x, tree
    )


class CheckpointLayoutError(ValueError):
    """Deliberate checkpoint/trainer layout mismatch (e.g. resuming with a
    different --scan-kd flag). The checkpoint is INTACT: recovery code
    must surface this instead of quarantining the checkpoint as torn."""


def tiny_configs(method: str = "perlin") -> Tuple[OptConfig, OptConfig]:
    sea = SeaConfig(
        num_heads=2, head_dim=8, predictor_length=8, k=2,
        performer_nb_factor=1, causal=True, max_position_embeddings=128,
    ).validate()
    kw = dict(
        vocab_size=256, hidden_size=16, num_layers=2, num_heads=2,
        ffn_dim=32, max_position_embeddings=128, sea=sea,
    )
    return (
        OptConfig(attention_method="none", **kw),
        OptConfig(attention_method=method, **kw),
    )


def model_configs(cfg: TrainerConfig) -> Tuple[OptConfig, OptConfig]:
    def _dtype(pair):
        if cfg.compute_dtype is None:
            return pair
        return tuple(
            dataclasses.replace(c, compute_dtype=cfg.compute_dtype) for c in pair
        )

    if cfg.model == "tiny":
        return _dtype(tiny_configs(cfg.method))
    if cfg.model == "llama-tiny":
        from ..models.llama import llama_tiny

        return _dtype((llama_tiny("none"), llama_tiny(cfg.method)))
    # head geometry must match the model family
    heads = {"opt-125m": 12, "opt-350m": 16, "opt-1.3b": 32, "opt-2.7b": 32,
             "llama-7b": 32, "llama-13b": 40}[cfg.model]
    head_dim = {"opt-125m": 64, "opt-350m": 64, "opt-1.3b": 64, "opt-2.7b": 80,
                "llama-7b": 128, "llama-13b": 128}[cfg.model]
    sea = opt_config(
        num_heads=heads,
        head_dim=head_dim,
        k=cfg.k,
        predictor_length=cfg.predictor_length,
        performer_nb_factor=cfg.nb_factor,
    )
    from ..models.llama import llama_7b, llama_13b

    builder = {"opt-125m": opt_125m, "opt-350m": opt_350m,
               "opt-1.3b": opt_1_3b, "opt-2.7b": opt_2_7b,
               "llama-7b": llama_7b, "llama-13b": llama_13b}[cfg.model]
    return _dtype((builder("none", sea), builder(cfg.method, sea)))


class OptTrainer:
    def __init__(self, cfg: TrainerConfig):
        self.cfg = cfg
        self.t_cfg, self.s_cfg = model_configs(cfg)
        self.kd = SeaOptKD(self.t_cfg, self.s_cfg)
        self.rng = jax.random.key(cfg.seed)

        N, T = cfg.batch_size, cfg.max_seq_len

        def _cast(tree):
            if cfg.param_dtype is None:
                return tree
            dt = jnp.dtype(cfg.param_dtype)
            return jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        ids = jnp.ones((N, T), jnp.int32)
        mask = jnp.ones((N, T), jnp.int32)
        # init+cast as ONE jit: f32 initializer temporaries stay transient
        # (peak = cast tree + one f32 param), and the remote-TPU path gets
        # one compile instead of per-initializer eager dispatches
        self.t_vars = jax.jit(
            lambda: _cast(self.kd.teacher.init(jax.random.key(0), ids, mask))
        )()
        s_vars = jax.jit(
            lambda: _cast(self.kd.student.init(jax.random.key(1), ids, mask))
        )()
        self._cast_params = _cast

        if cfg.teacher_checkpoint:
            from ..models.llama import LlamaConfig
            from ..models.loader import load_llama_params

            load_fn = (
                load_llama_params
                if isinstance(self.t_cfg, LlamaConfig)
                else load_opt_params
            )
            teacher_params = load_fn(cfg.teacher_checkpoint, self.t_cfg)
            self.t_vars = {**self.t_vars, "params": _cast(
                teacher_params["params"]
                if "params" in teacher_params else teacher_params)}
        self.corpus = get_corpus(
            cfg.max_seq_len, cfg.stride, "train",
            vocab_size=self.s_cfg.vocab_size,
            cache_dir=cfg.data_cache_dir,
        )
        self.eval_corpus = get_corpus(
            cfg.max_seq_len, cfg.stride, "test",
            vocab_size=self.s_cfg.vocab_size,
            cache_dir=cfg.data_cache_dir,
        )
        os.makedirs(cfg.save_dir, exist_ok=True)
        self.metrics_path = os.path.join(cfg.save_dir, "metrics.jsonl")
        self.step = 0
        # extra micro-batches the resumed stream skips (resilience rollback)
        self.data_offset = 0

        self._teacher_step = jax.jit(self._teacher_step_impl)
        if cfg.pretrain_teacher_steps > 0:
            self.pretrain_teacher(cfg.pretrain_teacher_steps)
        # student bootstrap: teacher weights for shared modules
        s_vars = student_from_teacher(s_vars, self.t_vars["params"])
        self.s_params = s_vars["params"]
        self.s_extra = {k: v for k, v in s_vars.items() if k != "params"}

        base_tx = make_optimizer(
            lr=cfg.lr, wd=cfg.wd,
            lr_high_scale=cfg.lr_high_scale, lr_low_scale=cfg.lr_low_scale,
            mu_dtype=cfg.moment_dtype,
        )
        # MultiSteps allocates a full gradient-accumulation buffer; skip it
        # when accumulation is 1 (large models: saves a params-sized tensor)
        if cfg.gradient_accumulation_steps > 1:
            self.tx = optax.MultiSteps(base_tx, cfg.gradient_accumulation_steps)
        else:
            self.tx = base_tx
        jit_kw = {}
        self.mesh = None
        if cfg.data_parallel and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            self.mesh = Mesh(np.asarray(jax.devices()), ("dp",))
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("dp"))
            self._data_sharding = data
            # params/opt_state/t_vars replicated; batch sharded on dp
            if cfg.scan_kd:
                jit_kw = dict(
                    in_shardings=(repl, repl, data, data, data, repl),
                    out_shardings=(repl, repl, repl, repl),
                )
            else:
                jit_kw = dict(
                    in_shardings=(repl, repl, repl, data, data, data, repl),
                    out_shardings=(repl, repl, repl, repl),
                )
        # init+dealias in ONE jit: eager tx.init would materialise an
        # aliased-zeros tree that then coexists with its dealiased copy —
        # 2x the moment memory transiently (fatal at 1.3b+ on 16 GB)
        def _init_opt(params):
            return jax.jit(lambda p: _dealias(self.tx.init(p)))(params)

        if cfg.scan_kd:
            from .distill import SeaOptKDScan

            self.kds = SeaOptKDScan(
                self.t_cfg, self.s_cfg, logit_chunk=cfg.logit_chunk
            )
            s_full = dict(self.s_extra)
            s_full["params"] = self.s_params
            combined = SeaOptKDScan.combine_params(
                self.t_vars, s_full, self.t_cfg.num_layers
            )
            self.combined_params = combined.pop("params")
            self.combined_extra = combined
            # the per-layer params now live (stacked) inside combined —
            # drop the per-model trees or both copies stay resident (at
            # 1.3b that alone is ~5 GB and OOMs the chip); the shells
            # (embeds/extra) are shared references, and evaluate() rebuilds
            # s_params from combined via _sync_student_from_combined
            self.t_vars = {
                k: v for k, v in self.t_vars.items() if k != "params"
            }
            self.s_params = None
            self.opt_state = _init_opt(self.combined_params)
            # donate params/opt-state so old and new buffers never coexist
            self._train_step = jax.jit(
                self._train_step_scan_impl, donate_argnums=(0, 1), **jit_kw
            )
        else:
            self.opt_state = _init_opt(self.s_params)
            self._train_step = jax.jit(
                self._train_step_impl, donate_argnums=(0, 1), **jit_kw
            )
        if self.cfg.scan_kd:
            # scan-layout eval model: reads the student straight out of
            # combined_params (zero-copy re-nesting) instead of
            # materialising a loop-layout copy (+2.4 GB at 1.3b — OOMed
            # the step-50 eval of the 200-step chip session) and compiles
            # one scan body instead of an unrolled N-layer program
            import dataclasses as _dc

            from .distill import causal_lm_for

            self._student_scan_model = causal_lm_for(
                _dc.replace(self.s_cfg, scan_layers=True)
            )
        if self.mesh is not None:
            # dp-sharded evaluation: batch sharded over the mesh, the global
            # (nll, tokens) reduction inserted by GSPMD — the all-reduce the
            # reference does manually (opt_trainer.py:577-580)
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("dp"))
            self._eval_step = jax.jit(
                self._eval_step_impl,
                in_shardings=(repl, data, data, data),
                out_shardings=(repl, repl),
            )
            if self.cfg.scan_kd:
                self._eval_step_scan = jax.jit(
                    self._eval_step_scan_impl,
                    in_shardings=(repl, data, data, data),
                    out_shardings=(repl, repl),
                )
        else:
            self._eval_step = jax.jit(self._eval_step_impl)
            if self.cfg.scan_kd:
                self._eval_step_scan = jax.jit(self._eval_step_scan_impl)

    # ------------------------------------------------------------------
    def _train_step_impl(self, s_params, opt_state, t_vars, ids, mask, labels, rng):
        def loss_fn(p):
            sv = dict(self.s_extra)
            sv["params"] = p
            return self.kd.kd_loss(
                t_vars, sv, ids, mask, labels, rng=rng,
                use_remat=self.cfg.use_remat,
                task_scale=self.cfg.task_loss_scale,
                ignore_kd=self.cfg.ignore_kd_loss,
            )

        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(s_params)
        updates, opt_state = self.tx.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        return s_params, opt_state, loss, details

    def _train_step_scan_impl(self, c_params, opt_state, ids, mask, labels, rng):
        def loss_fn(p):
            cv = dict(self.combined_extra)
            cv["params"] = p
            return self.kds.kd_loss(
                cv, ids, mask, labels, rng=rng,
                task_scale=self.cfg.task_loss_scale,
                ignore_kd=self.cfg.ignore_kd_loss,
            )

        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(c_params)
        updates, opt_state = self.tx.update(grads, opt_state, c_params)
        c_params = optax.apply_updates(c_params, updates)
        return c_params, opt_state, loss, details

    def _sync_student_from_combined(self):
        from .distill import SeaOptKDScan

        cv = dict(self.combined_extra)
        cv["params"] = self.combined_params
        sv = SeaOptKDScan.split_student(cv, self.t_cfg.num_layers)
        self.s_params = sv["params"]

    def _teacher_step_impl(self, t_params, opt_state, ids, mask, labels):
        def loss_fn(p):
            tv = {k: v for k, v in self.t_vars.items() if k != "params"}
            tv["params"] = p
            out = self.kd.teacher.apply(tv, ids, mask, labels=labels)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(t_params)
        updates, opt_state = self._teacher_tx.update(grads, opt_state, t_params)
        return optax.apply_updates(t_params, updates), opt_state, loss

    def pretrain_teacher(self, steps: int):
        """CE-train the dense teacher on the corpus (reference obtains its
        teachers pre-finetuned from the HF hub)."""
        if "params" not in self.t_vars:
            # scan_kd dropped the per-model teacher tree after stacking it
            # into combined_params (the 1.3b memory plan); retraining the
            # teacher now would desync the stacked copy anyway
            raise RuntimeError(
                "pretrain_teacher is unavailable after scan_kd layer "
                "stacking — set TrainerConfig.pretrain_teacher_steps so "
                "the constructor pretrains before stacking"
            )
        self._teacher_tx = optax.adamw(3e-4, weight_decay=1e-2)
        t_params = self.t_vars["params"]
        opt_state = self._teacher_tx.init(t_params)
        done = 0
        while done < steps:
            for ids, mask, labels in self.corpus.batches(
                self.cfg.batch_size, shuffle=True, seed=self.cfg.seed + 1000 + done
            ):
                t_params, opt_state, loss = self._teacher_step(
                    t_params, opt_state,
                    jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
                )
                done += 1
                if done >= steps:
                    break
        self.t_vars = {**self.t_vars, "params": t_params}
        self.log({"teacher_pretrain_loss": float(loss), "teacher_steps": steps})

    def _eval_step_impl(self, s_params, ids, mask, labels):
        sv = dict(self.s_extra)
        sv["params"] = s_params
        out = self.kd.student.apply(sv, ids, mask)
        return self._eval_nll(out["logits"], labels)

    def _eval_step_scan_impl(self, sv, ids, mask, labels):
        out = self._student_scan_model.apply(sv, ids, mask)
        return self._eval_nll(out["logits"], labels)

    @staticmethod
    def _eval_nll(logits, labels):
        logits = logits[:, :-1].astype(jnp.float32)
        tgt = labels[:, 1:]
        valid = tgt != -100
        safe = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
        return jnp.where(valid, nll, 0.0).sum(), valid.sum()

    # ------------------------------------------------------------------
    def evaluate(self, max_batches: Optional[int] = None) -> float:
        if self.cfg.scan_kd:
            from .distill import SeaOptKDScan

            cv = dict(self.combined_extra)
            cv["params"] = self.combined_params
            sv_scan = SeaOptKDScan.split_student_scan(cv)
        total_nll, total_tok = 0.0, 0
        for i, (ids, mask, labels) in enumerate(
            self.eval_corpus.batches(self.cfg.batch_size)
        ):
            if max_batches is not None and i >= max_batches:
                break
            if self.cfg.scan_kd:
                nll, tok = self._eval_step_scan(
                    sv_scan, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(labels),
                )
            else:
                nll, tok = self._eval_step(
                    self.s_params, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(labels),
                )
            total_nll += float(nll)
            total_tok += int(tok)
        return float(np.exp(total_nll / max(total_tok, 1)))

    def log(self, record: Dict[str, Any]):
        record = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
                  for k, v in record.items()}
        record["step"] = self.step
        record["time"] = time.time()
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        # optional wandb mirror (reference logs to project perlin-opt,
        # opt_trainer.py:691-737); JSONL stays the source of truth offline
        try:
            import wandb

            if wandb.run is not None:
                wandb.log(record, step=self.step)
        except Exception:
            pass

    def _heartbeat(self, extra: Optional[Dict[str, Any]] = None):
        """Atomically publish liveness (scripts/supervise.py watches this
        file's mtime to detect hung processes, §5.3)."""
        hb = {"step": self.step, "time": time.time()}
        if extra:
            hb.update({k: float(v) for k, v in extra.items()})
        tmp = os.path.join(self.cfg.save_dir, ".heartbeat.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(hb))
        os.replace(tmp, os.path.join(self.cfg.save_dir, "heartbeat.json"))

    def _full_state(self):
        """Complete resumable train state (reference persists
        step/epoch/model/optimizer/scaler, `opt_trainer.py:595-622`; here:
        params, optimizer moments incl. the high-lr 'perlin' group, rng,
        FAVOR+ projections, and the scan/loop layout tag)."""
        if self.cfg.scan_kd:
            params, extra = self.combined_params, self.combined_extra
        else:
            params, extra = self.s_params, self.s_extra
        return {
            "params": params,
            "opt_state": self.opt_state,
            "rng": jax.random.key_data(self.rng),
            "extra": extra,
            "step": self.step,
            "layout": {"scan_kd": int(self.cfg.scan_kd)},
        }

    def _write_layout_sidecar(self, tag: str):
        """Tiny `<tag>.layout.json` next to the orbax dir: load() consults
        it BEFORE restore, so a layout mismatch (different --scan-kd) is a
        clean CheckpointLayoutError instead of an orbax tree-structure
        failure that recovery code could mistake for a torn write."""
        p = os.path.join(self.cfg.save_dir, tag + ".layout.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"scan_kd": int(self.cfg.scan_kd)}))
        os.replace(tmp, p)

    def _check_layout_sidecar(self, tag: str):
        p = os.path.join(self.cfg.save_dir, tag + ".layout.json")
        if not os.path.exists(p):
            return
        try:
            with open(p) as f:
                layout = json.load(f)
        except (OSError, ValueError):
            return  # unreadable sidecar: fall through to the orbax restore
        if int(layout.get("scan_kd", self.cfg.scan_kd)) != int(self.cfg.scan_kd):
            raise CheckpointLayoutError(
                "checkpoint layout mismatch: saved scan_kd="
                f"{bool(layout['scan_kd'])}, trainer scan_kd="
                f"{self.cfg.scan_kd}"
            )

    def save(self, tag: str = "checkpoint"):
        import orbax.checkpoint as ocp

        if self.cfg.checkpoint_rotation > 0 and tag == "checkpoint":
            from .resilience import save_rotating

            save_rotating(self, keep=self.cfg.checkpoint_rotation)
            return
        path = os.path.abspath(os.path.join(self.cfg.save_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self._full_state(), force=True)
        ckptr.wait_until_finished()
        self._write_layout_sidecar(tag)

    def load(self, tag: str = "checkpoint", only_additionals: bool = False) -> bool:
        """Restore a checkpoint.

        only_additionals: load only the SEA-specific ('perlin') modules and
        keep the current base weights — the reference's
        `--load-only-additionals` partial load (perlin_trainer.py:524-531);
        optimizer state and step are not restored in that mode.

        tag='latest' resolves the rotating-checkpoint LATEST pointer
        (training/resilience.py)."""
        import orbax.checkpoint as ocp

        if tag == "latest":
            from .resilience import resolve_latest

            resolved = resolve_latest(self.cfg.save_dir)
            if resolved is None:
                return False
            tag = resolved

        path = os.path.abspath(os.path.join(self.cfg.save_dir, tag))
        if not os.path.exists(path):
            return False
        self._check_layout_sidecar(tag)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, self._full_state())
        if int(restored["layout"]["scan_kd"]) != int(self.cfg.scan_kd):
            raise CheckpointLayoutError(
                "checkpoint layout mismatch: saved scan_kd="
                f"{bool(restored['layout']['scan_kd'])}, trainer scan_kd="
                f"{self.cfg.scan_kd}"
            )
        if only_additionals:
            cur = self.combined_params if self.cfg.scan_kd else self.s_params
            flat_cur = jax.tree_util.tree_flatten_with_path(cur)
            flat_new = dict(jax.tree_util.tree_flatten_with_path(restored["params"])[0])
            merged_leaves = [
                flat_new[p]
                if any("perlin" in str(getattr(x, "key", x)) for x in p)
                else v
                for p, v in flat_cur[0]
            ]
            merged = jax.tree_util.tree_unflatten(flat_cur[1], merged_leaves)
            if self.cfg.scan_kd:
                self.combined_params = merged
            else:
                self.s_params = merged
            return True
        if self.cfg.scan_kd:
            self.combined_params = restored["params"]
            self.combined_extra = restored["extra"]
        else:
            self.s_params = restored["params"]
            self.s_extra = restored["extra"]
        self.opt_state = restored["opt_state"]
        self.rng = jax.random.wrap_key_data(restored["rng"])
        self.step = int(restored["step"])
        return True

    def train(self):
        cfg = self.cfg
        micro_steps = cfg.num_steps * cfg.gradient_accumulation_steps
        # resume-aware: the batch stream is seeded per epoch and already-
        # consumed batches are skipped deterministically, so a resumed run
        # sees exactly the stream the uninterrupted run would have seen.
        # `data_offset` (set by the resilience Supervisor after a rollback)
        # additionally hops the stream past a poison data window.
        done = self.step * cfg.gradient_accumulation_steps
        consumed, epoch = 0, 0
        t0 = time.time()
        while done < micro_steps:
            for ids, mask, labels in self.corpus.batches(
                cfg.batch_size, shuffle=True, seed=cfg.seed + epoch
            ):
                if done >= micro_steps:
                    break
                if consumed < done + self.data_offset:
                    consumed += 1
                    continue
                consumed += 1
                self.rng, step_rng = jax.random.split(self.rng)
                if self.cfg.scan_kd:
                    (self.combined_params, self.opt_state, loss, details
                     ) = self._train_step(
                        self.combined_params, self.opt_state,
                        jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(labels), step_rng,
                    )
                else:
                    self.s_params, self.opt_state, loss, details = self._train_step(
                        self.s_params, self.opt_state, self.t_vars,
                        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
                        step_rng,
                    )
                done += 1
                if done % cfg.gradient_accumulation_steps == 0:
                    self.step += 1
                    if (
                        cfg.projection_redraw_steps > 0
                        and self.step % cfg.projection_redraw_steps == 0
                    ):
                        from ..ops.performer import redraw_projections

                        self.rng, r = jax.random.split(self.rng)
                        self.s_extra = redraw_projections(self.s_extra, r)
                    if self.step % cfg.log_steps == 0:
                        rec = {k: float(v) for k, v in details.items()}
                        rec["steps_per_s"] = self.step / (time.time() - t0)
                        self.log(rec)
                        self._heartbeat(rec)
                        if cfg.halt_on_divergence and not all(
                            np.isfinite(v) for v in rec.values()
                        ):
                            from .resilience import TrainingDiverged

                            raise TrainingDiverged(
                                f"non-finite loss at step {self.step}: {rec}"
                            )
                    if self.step % cfg.eval_steps == 0:
                        # re-check finiteness right before checkpointing:
                        # if log_steps does not divide eval_steps, a NaN
                        # could otherwise be saved (and LATEST-pointed)
                        # before the next log-boundary divergence check.
                        if cfg.halt_on_divergence and not np.isfinite(
                            float(loss)
                        ):
                            from .resilience import TrainingDiverged

                            raise TrainingDiverged(
                                f"non-finite loss at step {self.step} "
                                "(pre-checkpoint check)"
                            )
                        ppl = self.evaluate(max_batches=16)
                        self.log({"eval_ppl": ppl})
                        self.save()
                    if self.step >= cfg.num_steps:
                        return
                if done >= micro_steps:
                    return
            epoch += 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--predictor-length", type=int, default=256)
    p.add_argument("--teacher-checkpoint", default=None)
    p.add_argument("--eval", action="store_true")
    args = p.parse_args()

    cfg = TrainerConfig(
        model=args.model,
        num_steps=args.steps,
        batch_size=args.batch_size,
        max_seq_len=args.seq_len,
        stride=args.seq_len // 2,
        k=args.k,
        predictor_length=args.predictor_length,
        teacher_checkpoint=args.teacher_checkpoint,
        eval_steps=max(args.steps // 2, 1),
        log_steps=1,
        gradient_accumulation_steps=2,
    )
    tr = OptTrainer(cfg)
    if args.eval:
        print("ppl:", tr.evaluate(max_batches=8))
        return
    tr.train()
    ppl = tr.evaluate(max_batches=8)
    print("final ppl:", ppl)


if __name__ == "__main__":
    main()
