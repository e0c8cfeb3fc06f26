"""Knowledge-distillation loss assembly and the interleaved teacher/student
forward (TPU-native replacement for reference `opt_trainer.KDWrapperModel`,
`src/trainer/opt_trainer.py:91-199`).

Loss = 0.1 * student task CE
     + 5 * mean-over-layers hidden-state MSE (fp32)
     + 0.2 * logit KL (batchmean over N*T rows)
     + mean-over-layers attention-distill loss (calc_loss_special analogue,
       reference perlin_opt.py:1372-1398)

The reference runs the full teacher under no_grad first, offloading O(T^2)
per-layer scores to CPU (or re-running layers lazily via thunks,
`hf_opt.py:154-196`); on TPU we instead run teacher and student *interleaved
per layer inside one jit* so at most one layer's (N,H,T,T) score tensor is
live at a time, and wrap each layer pair in `jax.checkpoint` so the backward
rematerializes instead of saving dense probability tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.opt import (
    LayerTeacherOutput,
    OptConfig,
    OptForCausalLM,
    cross_entropy_shifted,
)


def causal_lm_for(cfg):
    """Build the ForCausalLM module matching a model-family config. The KD
    wrappers below are family-agnostic: they only use `model.embed` (whose
    second return — the causal mask, or LLaMA's (mask, cos, sin) position
    bundle — is threaded opaquely), `model.layers[i]`, `model.finalize`,
    and `logits`."""
    if isinstance(cfg, OptConfig):
        return OptForCausalLM(cfg)
    from ..models.llama import LlamaConfig, LlamaForCausalLM

    assert isinstance(cfg, LlamaConfig), type(cfg)
    return LlamaForCausalLM(cfg)


def decoder_layer_for(cfg):
    if isinstance(cfg, OptConfig):
        from ..models.opt import OptDecoderLayer

        return OptDecoderLayer
    from ..models.llama import LlamaDecoderLayer

    return LlamaDecoderLayer


class _KDPairScanBody(nn.Module):
    """Scan body running (teacher layer i, student layer i) as one step —
    stacked-parameter lax.scan over the pair, so the KD train step compiles
    ONE layer-pair body instead of num_layers inlined copies."""

    t_cfg: OptConfig
    s_cfg: OptConfig

    @nn.compact
    def __call__(self, carry, causal_mask):
        h_t, h_s = carry
        h_t2, _, cap = decoder_layer_for(self.t_cfg)(self.t_cfg, name="teacher")(
            h_t, causal_mask
        )
        h_t2 = jax.lax.stop_gradient(h_t2)
        cap = jax.tree_util.tree_map(jax.lax.stop_gradient, cap)
        h_s2, aux, _ = decoder_layer_for(self.s_cfg)(self.s_cfg, name="student")(
            h_s, causal_mask, cap, training=True
        )
        mse = jnp.mean(
            (h_t2.astype(jnp.float32) - h_s2.astype(jnp.float32)) ** 2
        )
        aux = aux if aux is not None else jnp.float32(0.0)
        return (h_t2, h_s2), (aux, mse)


class SeaOptKDScan:
    """Scanned variant of SeaOptKD: the teacher/student layer pair is one
    nn.scan body with layer-stacked params (see ROADMAP: KD compile time).

    The combined param tree is
      {teacher: <embeds/final>, student: <embeds/final>,
       pairs: {teacher: <stacked layers>, student: <stacked layers>}}
    built from the per-model trees with `combine_params`. Teacher gradients
    are structurally zero (stop_gradient), so optimizing the whole tree
    with the teacher subtrees frozen is equivalent to the loop variant."""

    def __init__(
        self,
        teacher_cfg: OptConfig,
        student_cfg: OptConfig,
        logit_chunk: Optional[int] = None,
    ):
        import dataclasses

        assert teacher_cfg.attention_method == "none"
        self.t_cfg = teacher_cfg
        self.s_cfg = student_cfg
        # chunk the logit CE/KL over the sequence axis: the unchunked form
        # materialises four (N·T, V) f32 tensors (~1 GB at T=1024/V=50k),
        # which is what pushed the on-chip 1.3b run from fitting at T=512
        # to OOM at T=1024. Chunking runs finalize+logits+losses per
        # row-chunk under lax.scan (mathematically identical sums; fp
        # order differs ~1e-6).
        self.logit_chunk = logit_chunk
        self.n_layers = teacher_cfg.num_layers
        t_shell = dataclasses.replace(teacher_cfg, external_layers=True)
        s_shell = dataclasses.replace(student_cfg, external_layers=True)
        self.teacher_shell = causal_lm_for(t_shell)
        self.student_shell = causal_lm_for(s_shell)
        self.pair_scan = nn.scan(
            nn.remat(_KDPairScanBody, prevent_cse=False),
            variable_axes={"params": 0, "performer": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.n_layers,
        )(teacher_cfg, student_cfg)

    @staticmethod
    def combine_params(t_vars, s_vars, num_layers: int):
        """Build the combined variables dict from loop-layout teacher and
        student variable trees."""

        def split(tree):
            # keep non-"model" siblings (e.g. LLaMA's untied lm_head) in
            # the shell
            rest = {k: v for k, v in tree.items() if k != "model"}
            model = dict(tree["model"])
            layers = [model.pop(f"layers_{i}") for i in range(num_layers)]
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=0), *layers
            )
            return {**rest, "model": model}, stacked

        out = {}
        for coll in set(t_vars) | set(s_vars):
            t_c = t_vars.get(coll)
            s_c = s_vars.get(coll)
            entry = {}
            pairs = {}
            if t_c is not None and "model" in t_c:
                shell, stacked = split(t_c)
                entry["teacher"] = shell
                pairs["teacher"] = stacked
            if s_c is not None and "model" in s_c:
                shell, stacked = split(s_c)
                entry["student"] = shell
                pairs["student"] = stacked
            if pairs:
                entry["pairs"] = pairs
            out[coll] = entry
        return out

    @staticmethod
    def split_student(combined, num_layers: int):
        """Recover the loop-layout student variables from the combined tree
        (for evaluation/checkpointing)."""
        out = {}
        for coll, v in combined.items():
            if not isinstance(v, dict):
                continue
            shell = dict(v.get("student", {}))
            model = dict(shell.pop("model", {}))
            stacked = v.get("pairs", {}).get("student")
            if stacked is not None:
                for i in range(num_layers):
                    model[f"layers_{i}"] = jax.tree_util.tree_map(
                        lambda x, _i=i: x[_i], stacked
                    )
            if model:
                out[coll] = {**shell, "model": model}
        return out

    @staticmethod
    def split_student_scan(combined):
        """SCAN-layout student variables re-nested from the combined tree —
        pure tree restructuring, ZERO parameter copies (at 1.3b the
        loop-layout `split_student` materialises a +2.4 GB unstacked copy
        on a chip that is already ~90% full; this is how evaluate() reads
        the student mid-training)."""
        out = {}
        for coll, v in combined.items():
            if not isinstance(v, dict):
                continue
            shell = dict(v.get("student", {}))
            model = dict(shell.pop("model", {}))
            stacked = v.get("pairs", {}).get("student")
            if stacked is not None:
                model["layers_scan"] = {"layer": stacked}
            if model:
                out[coll] = {**shell, "model": model}
        return out

    def _chunked_logit_losses(self, t_vars, s_vars, h_t, h_s, labels):
        """(task CE, 0.2·logit KL) computed per sequence chunk under
        lax.scan with rematerialised per-chunk logits — only one
        (N, chunk, V) logits pair is live at any point, forward AND
        backward. Identical math to the unchunked form (sum
        decomposition); the CE shift is handled by aligning labels[t+1]
        to position t before chunking."""
        C = int(self.logit_chunk)
        N, T, E = h_s.shape
        if T % C != 0:
            # largest divisor of T not exceeding the requested chunk (gcd
            # can collapse to 1 => T tiny-matmul scan steps)
            C = next(d for d in range(min(C, T), 0, -1) if T % d == 0)
        nc = T // C
        lab_next = jnp.concatenate(
            [labels[:, 1:], jnp.full((N, 1), -100, labels.dtype)], axis=1
        )
        ht_c = jnp.swapaxes(h_t.reshape(N, nc, C, E), 0, 1)
        hs_c = jnp.swapaxes(h_s.reshape(N, nc, C, E), 0, 1)
        lb_c = jnp.swapaxes(lab_next.reshape(N, nc, C), 0, 1)

        def chunk_losses(ht_i, hs_i, lb_i):
            lt = jax.lax.stop_gradient(
                self.teacher_shell.apply(
                    t_vars, ht_i,
                    method=lambda m, x: m.logits(m.model.finalize(x)),
                )
            ).astype(jnp.float32)
            ls = self.student_shell.apply(
                s_vars, hs_i,
                method=lambda m, x: m.logits(m.model.finalize(x)),
            ).astype(jnp.float32)
            logp = jax.nn.log_softmax(ls, -1)
            valid = lb_i != -100
            safe = jnp.where(valid, lb_i, 0)
            nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
            ce_sum = jnp.where(valid, nll, 0.0).sum()
            ce_cnt = valid.sum()
            tgt = jax.nn.softmax(lt, -1)
            kl_sum = (tgt * (jnp.log(tgt + 1e-12) - logp)).sum()
            return ce_sum, ce_cnt, kl_sum

        chunk_losses = jax.checkpoint(chunk_losses, prevent_cse=False)

        def body(carry, inp):
            ce_sum, ce_cnt, kl_sum = carry
            cs, cc, ks = chunk_losses(*inp)
            return (ce_sum + cs, ce_cnt + cc, kl_sum + ks), None

        (ce_sum, ce_cnt, kl_sum), _ = jax.lax.scan(
            body,
            (jnp.float32(0.0), jnp.int32(0), jnp.float32(0.0)),
            (ht_c, hs_c, lb_c),
        )
        task_loss = ce_sum / jnp.maximum(ce_cnt, 1)
        loss_logit_kl = kl_sum / jnp.float32(N * T) * 0.2
        return task_loss, loss_logit_kl

    def kd_loss(
        self,
        combined_vars,
        input_ids: jnp.ndarray,
        attention_mask_1d: jnp.ndarray,
        labels: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        task_scale: float = 0.1,
        ignore_kd: bool = False,
    ):
        def pick(coll_key, who):
            return {
                c: v[who]
                for c, v in combined_vars.items()
                if isinstance(v, dict) and who in v
            }

        t_shell_vars = pick(None, "teacher")
        s_shell_vars = pick(None, "student")
        pair_vars = {
            c: v["pairs"] for c, v in combined_vars.items()
            if isinstance(v, dict) and "pairs" in v
        }

        h_t, causal_mask = self.teacher_shell.apply(
            t_shell_vars, input_ids, attention_mask_1d,
            method=lambda m, i, a: m.model.embed(i, a),
        )
        h_s, _ = self.student_shell.apply(
            s_shell_vars, input_ids, attention_mask_1d,
            method=lambda m, i, a: m.model.embed(i, a),
        )
        h_t = jax.lax.stop_gradient(h_t)

        loss_hidden0 = jnp.mean(
            (h_t.astype(jnp.float32) - h_s.astype(jnp.float32)) ** 2
        )
        (h_t, h_s), (aux_stack, mse_stack) = self.pair_scan.apply(
            pair_vars, (h_t, h_s), causal_mask
        )
        loss_hidden = (loss_hidden0 + jnp.sum(mse_stack)) / (self.n_layers + 1) * 5.0
        loss_special = jnp.mean(aux_stack)

        if self.logit_chunk:
            task_loss, loss_logit_kl = self._chunked_logit_losses(
                t_shell_vars, s_shell_vars, h_t, h_s, labels
            )
        else:
            logits_t = jax.lax.stop_gradient(
                self.teacher_shell.apply(
                    t_shell_vars, h_t,
                    method=lambda m, x: m.logits(m.model.finalize(x)),
                )
            )
            logits_s = self.student_shell.apply(
                s_shell_vars, h_s,
                method=lambda m, x: m.logits(m.model.finalize(x)),
            )
            task_loss = cross_entropy_shifted(logits_s, labels)
            lt = logits_t.reshape(-1, logits_t.shape[-1]).astype(jnp.float32)
            ls = logits_s.reshape(-1, logits_s.shape[-1]).astype(jnp.float32)
            target = jax.nn.softmax(lt, -1)
            log_input = jax.nn.log_softmax(ls, -1)
            loss_logit_kl = (
                (target * (jnp.log(target + 1e-12) - log_input)).sum()
                / lt.shape[0] * 0.2
            )
        if ignore_kd:
            loss = task_loss
        else:
            loss = (
                task_scale * task_loss + loss_hidden + loss_logit_kl
                + loss_special
            )
        return loss, {
            "loss": loss,
            "loss_model": task_scale * task_loss,
            "loss_kd_hidden": loss_hidden,
            "loss_kd_logit": loss_logit_kl,
            "loss_sp": loss_special,
            "student_task_loss": task_loss,
        }


class SeaBertKD:
    """BERT GLUE KD wrapper (reference `glue_trainer.py:215-274`):
    loss = 0.1*task + 10*mean-layer hidden MSE + 0.1*logit KL + attention
    distill. BERT sequences are short, so the teacher runs in full first
    (its O(T^2) captures fit) and the student consumes the capture list."""

    def __init__(self, teacher_cfg, student_cfg):
        from ..models.bert import BertForSequenceClassification

        assert teacher_cfg.attention_method == "none"
        self.teacher = BertForSequenceClassification(teacher_cfg)
        self.student = BertForSequenceClassification(student_cfg)

    def kd_loss(
        self,
        teacher_variables,
        student_variables,
        input_ids,
        attention_mask_1d,
        labels,
        token_type_ids=None,
        rng=None,
    ):
        t_out = self.teacher.apply(
            teacher_variables, input_ids, attention_mask_1d, token_type_ids,
            labels=labels, output_hidden_states=True,
        )
        t_out = jax.tree_util.tree_map(jax.lax.stop_gradient, t_out)
        s_out = self.student.apply(
            student_variables, input_ids, attention_mask_1d, token_type_ids,
            labels=labels,
            teacher_outputs=t_out["teacher_captures"],
            training=True, rng=rng, output_hidden_states=True,
        )

        loss_hidden = jnp.float32(0.0)
        for ht, hs in zip(t_out["hidden_states"], s_out["hidden_states"]):
            loss_hidden += jnp.mean(
                (ht.astype(jnp.float32) - hs.astype(jnp.float32)) ** 2
            )
        loss_hidden = loss_hidden / len(t_out["hidden_states"]) * 10.0

        lt = t_out["logits"].astype(jnp.float32)
        ls = s_out["logits"].astype(jnp.float32)
        target = jax.nn.softmax(lt, -1)
        log_input = jax.nn.log_softmax(ls, -1)
        loss_logit_kl = (
            (target * (jnp.log(target + 1e-12) - log_input)).sum()
            / lt.shape[0]
        ) * 0.1

        task = s_out["loss"]
        loss = 0.1 * task + loss_hidden + loss_logit_kl + s_out["aux_loss"]
        return loss, {
            "loss": loss,
            "loss_model": 0.1 * task,
            "loss_kd_hidden": loss_hidden,
            "loss_kd_logit": loss_logit_kl,
            "loss_sp": s_out["aux_loss"],
            "student_task_loss": task,
            "logits": s_out["logits"],
        }


class SeaOptKD:
    """Functional KD wrapper around a teacher and a student OptForCausalLM.

    Teacher params are frozen by construction: gradients are taken w.r.t.
    `student_variables` only, and every teacher intermediate passes through
    `stop_gradient`."""

    def __init__(self, teacher_cfg: OptConfig, student_cfg: OptConfig):
        assert teacher_cfg.attention_method == "none"
        self.teacher = causal_lm_for(teacher_cfg)
        self.student = causal_lm_for(student_cfg)
        self.n_layers = teacher_cfg.num_layers
        assert teacher_cfg.num_layers == student_cfg.num_layers

    # -- pure per-piece applies ----------------------------------------
    def _embed(self, mdl, variables, input_ids, mask1d):
        return mdl.apply(
            variables,
            input_ids,
            mask1d,
            method=lambda m, i, a: m.model.embed(i, a),
        )

    def _finalize_logits(self, mdl, variables, h):
        return mdl.apply(
            variables, h, method=lambda m, x: m.logits(m.model.finalize(x))
        )

    def _teacher_layer(self, variables, i, h, causal_mask):
        return self.teacher.apply(
            variables,
            h,
            causal_mask,
            method=lambda m, hh, cm: m.model.layers[i](hh, cm, None),
        )

    def _student_layer(self, variables, i, h, causal_mask, capture, rng):
        return self.student.apply(
            variables,
            h,
            causal_mask,
            method=lambda m, hh, cm: m.model.layers[i](
                hh, cm, capture, training=True, rng=rng
            ),
        )

    # ------------------------------------------------------------------
    def kd_loss(
        self,
        teacher_variables,
        student_variables,
        input_ids: jnp.ndarray,
        attention_mask_1d: jnp.ndarray,
        labels: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        use_remat: bool = True,
        task_scale: float = 0.1,
        ignore_kd: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Full interleaved KD forward; returns (loss, detail dict).

        task_scale: weight of the student CE term (reference __TASK_LOSS,
        opt_trainer.py:145-146). ignore_kd: drop the KD and special terms
        entirely (reference IGNORE_KD_LOSS, opt_trainer.py:177-181)."""
        h_t, causal_mask = self._embed(
            self.teacher, teacher_variables, input_ids, attention_mask_1d
        )
        h_s, _ = self._embed(
            self.student, student_variables, input_ids, attention_mask_1d
        )
        h_t = jax.lax.stop_gradient(h_t)

        loss_hidden = jnp.mean(
            (h_t.astype(jnp.float32) - h_s.astype(jnp.float32)) ** 2
        )
        loss_special = jnp.float32(0.0)

        for i in range(self.n_layers):
            if rng is not None:
                rng, layer_rng = jax.random.split(rng)
            else:
                layer_rng = None

            def pair(h_t_in, h_s_in, cm, lrng, _i=i):
                h_t_out, _, capture = self._teacher_layer(
                    teacher_variables, _i, h_t_in, cm
                )
                h_t_out = jax.lax.stop_gradient(h_t_out)
                capture = jax.tree_util.tree_map(jax.lax.stop_gradient, capture)
                h_s_out, aux, _ = self._student_layer(
                    student_variables, _i, h_s_in, cm, capture, lrng
                )
                return h_t_out, h_s_out, aux

            if use_remat:
                pair = jax.checkpoint(pair)
            h_t, h_s, aux = pair(h_t, h_s, causal_mask, layer_rng)
            if aux is None:  # baseline students carry no attention-KD loss
                aux = jnp.float32(0.0)
            loss_hidden += jnp.mean(
                (h_t.astype(jnp.float32) - h_s.astype(jnp.float32)) ** 2
            )
            loss_special += aux

        loss_hidden = loss_hidden / (self.n_layers + 1) * 5.0
        loss_special = loss_special / self.n_layers

        logits_t = jax.lax.stop_gradient(
            self._finalize_logits(self.teacher, teacher_variables, h_t)
        )
        logits_s = self._finalize_logits(self.student, student_variables, h_s)

        task_loss = cross_entropy_shifted(logits_s, labels)

        lt = logits_t.reshape(-1, logits_t.shape[-1]).astype(jnp.float32)
        ls = logits_s.reshape(-1, logits_s.shape[-1]).astype(jnp.float32)
        target = jax.nn.softmax(lt, -1)
        log_input = jax.nn.log_softmax(ls, -1)
        loss_logit_kl = (
            (target * (jnp.log(target + 1e-12) - log_input)).sum() / lt.shape[0] * 0.2
        )

        if ignore_kd:
            loss = task_loss
        else:
            loss = (
                task_scale * task_loss + loss_hidden + loss_logit_kl
                + loss_special
            )
        return loss, {
            "loss": loss,
            "loss_model": task_scale * task_loss,
            "loss_kd_hidden": loss_hidden,
            "loss_kd_logit": loss_logit_kl,
            "loss_sp": loss_special,
            "student_task_loss": task_loss,
        }
