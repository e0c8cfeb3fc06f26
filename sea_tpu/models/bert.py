"""BERT encoder with switchable attention (dense teacher / SEA student).

TPU-native equivalent of:
  * `src/models/hf_bert.py:242-384` — dense teacher capturing per-layer
    attention scores (q.k^T / sqrt(d) + mask) and pre-output context;
  * `src/models/perlin_bert/perlin_bert.py:277-824` — the student whose
    self-attention dispatches on `attention_method`
    ('none' | 'perlin' | 'performer').

Used by the GLUE and LRA trainers. Post-LN architecture, GELU FFN,
learned absolute positions, token-type embeddings, pooler + classifier.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SeaConfig
from ..ops.masks import fp_min_for
from ..ops.performer import fast_attention, gaussian_orthogonal_random_matrix
from .attention import SeaAttention, SeaAttentionOutput, softmax_fp32
from .opt import LayerTeacherOutput


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    num_labels: int = 2
    layer_norm_eps: float = 1e-12
    attention_method: str = "perlin"
    # rematerialize each encoder layer in backward: the dense path's
    # per-layer (N, H, T, T) score tensors otherwise all stay live between
    # forward and backward — at LRA lengths (T=2048) that is the binding
    # memory term (teacher KD captures are remat OUTPUTS and stay saved)
    remat_layers: bool = False
    # ToMe token merging around the FFN (reference perlin_bert.py:826-970)
    token_merging: bool = False
    token_merging_preserve_ratio: float = 0.5
    token_merging_ratio: float = 0.5
    token_merging_score_source: str = "key"  # 'key' | 'probs' 
    sea: SeaConfig = dataclasses.field(default_factory=SeaConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def bert_base(attention_method: str = "perlin", sea: Optional[SeaConfig] = None, **kw) -> BertConfig:
    from ..config import bert_config as sea_bert_config

    return BertConfig(
        attention_method=attention_method,
        sea=sea if sea is not None else sea_bert_config(),
        **kw,
    )


class BertSelfAttention(nn.Module):
    """Attention dispatcher (reference perlin_bert.py:277-824)."""

    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.query = nn.Dense(c.hidden_size, name="query")
        self.key = nn.Dense(c.hidden_size, name="key")
        self.value = nn.Dense(c.hidden_size, name="value")
        if c.attention_method == "perlin":
            self.perlin = SeaAttention(c.sea, name="perlin")
            if c.sea.lora_enabled:
                from .lora import LoraDelta

                r = c.sea.lora_r
                self.perlin_q_lora = LoraDelta(c.hidden_size, r, name="perlin_q_lora")
                self.perlin_k_lora = LoraDelta(c.hidden_size, r, name="perlin_k_lora")
                self.perlin_v_lora = LoraDelta(c.hidden_size, r, name="perlin_v_lora")
            if c.sea.lora_in_approx_enabled:
                from .lora import LoraDelta

                r = c.sea.lora_r
                self.perlin_q_atten_lora = LoraDelta(c.hidden_size, r, name="perlin_q_atten_lora")
                self.perlin_k_atten_lora = LoraDelta(c.hidden_size, r, name="perlin_k_atten_lora")
                self.perlin_v_atten_lora = LoraDelta(c.hidden_size, r, name="perlin_v_atten_lora")
                self.perlin_q_score_lora = LoraDelta(c.hidden_size, r, name="perlin_q_score_lora")
                self.perlin_k_score_lora = LoraDelta(c.hidden_size, r, name="perlin_k_score_lora")
        elif c.attention_method == "performer":
            self.performer_proj = self.variable(
                "performer",
                "projection",
                lambda: gaussian_orthogonal_random_matrix(
                    jax.random.key(1), c.sea.nb_features, c.head_dim
                ),
            )
        elif c.attention_method == "synthesizer":
            from ..ops.baselines import SynthesizerDense

            self.synthesizer = SynthesizerDense(
                c.max_position_embeddings, name="synthesizer"
            )
        elif c.attention_method == "scatterbrain":
            self.performer_proj = self.variable(
                "performer",
                "projection",
                lambda: gaussian_orthogonal_random_matrix(
                    jax.random.key(2), c.sea.nb_features, c.head_dim
                ),
            )
        elif c.attention_method == "cosformer":
            from ..ops.cosformer import CosformerAttention

            self.cosformer = CosformerAttention(
                embed_dim=c.hidden_size,
                num_heads=c.num_heads,
                has_outproj=False,
                causal=False,
                name="cosformer",
            )

    def _heads(self, x):
        N, T, E = x.shape
        c = self.cfg
        return jnp.transpose(x.reshape(N, T, c.num_heads, c.head_dim), (0, 2, 1, 3))

    def __call__(
        self,
        hidden_states,
        attention_mask,  # (N,1,1,T) additive
        teacher: Optional[LayerTeacherOutput] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng=None,
    ):
        c = self.cfg
        N, T, E = hidden_states.shape
        q = self._heads(self.query(hidden_states))
        k = self._heads(self.key(hidden_states))
        v = self._heads(self.value(hidden_states))

        merge_sim = None
        if c.token_merging:
            if c.token_merging_score_source == "key":
                merge_sim = jnp.einsum("nhtd,nhsd->nts", k, k) / c.num_heads
            else:
                assert c.token_merging_score_source == "probs", (
                    c.token_merging_score_source
                )
                # filled from the method's attention probs below (reference
                # perlin_bert.py:836-842 reads the layer's attention_probs)

        if c.attention_method == "none":
            scores = jnp.einsum("nhtd,nhsd->nhts", q, k) / math.sqrt(c.head_dim)
            scores = scores + attention_mask
            probs = softmax_fp32(scores, -1)
            if c.token_merging and c.token_merging_score_source == "probs":
                merge_sim = probs.astype(jnp.float32).mean(1)
            ctx = jnp.einsum("nhts,nhsd->nhtd", probs, v)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, LayerTeacherOutput(scores, ctx), merge_sim

        if c.attention_method == "performer":
            out = fast_attention(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                (v * (jnp.swapaxes(attention_mask, -1, -2) > -1)).astype(jnp.float32),
                self.performer_proj.value,
                causal=False,
                generalized=False,
            ).astype(hidden_states.dtype)
            ctx = jnp.transpose(out, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, None, merge_sim

        if c.attention_method == "synthesizer":
            m = attention_mask > -1  # (N,1,1,T)
            ctx, _ = self.synthesizer(q, v, mask=m)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, None, merge_sim

        if c.attention_method == "cosformer":
            alive = jnp.swapaxes(attention_mask, -1, -2) > -1  # (N,1,T,1)
            h_seq = jnp.transpose(
                hidden_states * alive[:, 0].astype(hidden_states.dtype), (1, 0, 2)
            )
            ctx = self.cosformer(h_seq)
            return jnp.transpose(ctx, (1, 0, 2)), None, None, merge_sim

        if c.attention_method == "reformer":
            from ..ops.baselines import reformer_lsh_attention

            mask_1d = (jnp.swapaxes(attention_mask, -1, -2) > -1)[:, 0, :, 0]
            bs = max(min(max(c.sea.k, 8), T // 2), 1)
            while T % bs:
                bs -= 1
            ctx = reformer_lsh_attention(
                q, v, bucket_size=bs, n_hashes=4,
                causal=False, mask_1d=mask_1d,
            )
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, None, merge_sim

        if c.attention_method == "scatterbrain":
            from ..ops.baselines import scatterbrain_attention

            T_ = q.shape[2]
            bs = max(min(max(c.sea.k, 8), T_ // 2), 1)
            while T_ % bs:
                bs -= 1
            ctx = scatterbrain_attention(
                q, k, v, self.performer_proj.value, bucket_size=bs,
            )
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, None, merge_sim

        if c.attention_method == "sinkhorn":
            from ..ops.baselines import sinkhorn_block_attention

            mask_1d = (jnp.swapaxes(attention_mask, -1, -2) > -1)[:, 0, :, 0]
            bs = max(min(c.sea.k, T // 2), 1)
            while T % bs:
                bs -= 1
            ctx = sinkhorn_block_attention(
                q, k, v, block_size=bs, mask_1d=mask_1d
            )
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            return ctx, None, None, merge_sim

        assert c.attention_method == "perlin"
        # LoRA deltas: main q/k/v plus separate estimator-branch projections
        # (reference PerlinSelfAttention shared by BERT,
        # self_attention.py:95-175)
        q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_enabled:
            q = q + self._heads(self.perlin_q_lora(hidden_states))
            k = k + self._heads(self.perlin_k_lora(hidden_states))
            v = v + self._heads(self.perlin_v_lora(hidden_states))
            q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_in_approx_enabled:
            q_a = q + self._heads(self.perlin_q_atten_lora(hidden_states))
            k_a = k + self._heads(self.perlin_k_atten_lora(hidden_states))
            v_a = v + self._heads(self.perlin_v_atten_lora(hidden_states))
            q_s = q + self._heads(self.perlin_q_score_lora(hidden_states))
            k_s = k + self._heads(self.perlin_k_score_lora(hidden_states))
        out: SeaAttentionOutput = self.perlin(
            q, k, v, q_a, k_a, v_a, q_s, k_s,
            attention_mask,
            attention_scores_truth=teacher.attention_scores if teacher else None,
            context_layer_truth=teacher.context_layer if teacher else None,
            benchmarking=benchmarking,
            training=training,
            rng=rng,
        )
        if c.token_merging and c.token_merging_score_source == "probs":
            assert (not benchmarking) and out.partial_attention_probs is not None, (
                "'probs' merge score needs the train path's materialised "
                "attention (the reference reads the layer's attention_probs, "
                "which the fused benchmark path never builds)"
            )
            merge_sim = out.partial_attention_probs.astype(jnp.float32).mean(1)
        return out.context_layer, out.loss, None, merge_sim


class BertLayer(nn.Module):
    """Post-LN encoder layer."""

    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.attention = BertSelfAttention(c, name="attention")
        self.attention_output = nn.Dense(c.hidden_size, name="attention_output")
        self.attention_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")
        self.intermediate = nn.Dense(c.ffn_dim, name="intermediate")
        self.output = nn.Dense(c.hidden_size, name="output")
        self.output_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")

    def __call__(self, h, attention_mask, teacher=None, *, benchmarking=False,
                 training=False, rng=None):
        ctx, aux, capture, merge_sim = self.attention(
            h, attention_mask, teacher,
            benchmarking=benchmarking, training=training, rng=rng,
        )
        h = self.attention_ln(h + self.attention_output(ctx))
        if self.cfg.token_merging and merge_sim is not None:
            # reference wraps [merge -> FFN(+residual+LN) -> unmerge]
            # (TokenMergingStart before intermediate, End after output)
            from ..ops.tome import tome_merge, tome_unmerge

            h_merged, tome_state = tome_merge(
                h, merge_sim,
                self.cfg.token_merging_preserve_ratio,
                self.cfg.token_merging_ratio,
            )
            ffn = self.output(
                nn.gelu(self.intermediate(h_merged), approximate=False)
            )
            h = tome_unmerge(self.output_ln(h_merged + ffn), tome_state)
        else:
            ffn = self.output(nn.gelu(self.intermediate(h), approximate=False))
            h = self.output_ln(h + ffn)
        return h, aux, capture


class BertModel(nn.Module):
    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
        )
        self.embeddings_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")
        self.layers = [BertLayer(c, name=f"layers_{i}") for i in range(c.num_layers)]
        self.pooler = nn.Dense(c.hidden_size, name="pooler")

    def embed(self, input_ids, attention_mask_1d, token_type_ids=None):
        N, T = input_ids.shape
        h = self.word_embeddings(input_ids)
        pos = jnp.arange(T, dtype=jnp.int32)[None, :]
        h = h + self.position_embeddings(pos)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        h = h + self.token_type_embeddings(token_type_ids)
        h = self.embeddings_ln(h)
        fpmin = fp_min_for(h.dtype)
        mask = jnp.where(
            attention_mask_1d[:, None, None, :] > 0, 0.0, fpmin
        ).astype(h.dtype)
        return h, mask

    def __call__(
        self,
        input_ids,
        attention_mask_1d,
        token_type_ids=None,
        teacher_outputs: Optional[List[LayerTeacherOutput]] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng=None,
        output_hidden_states: bool = False,
    ):
        h, mask = self.embed(input_ids, attention_mask_1d, token_type_ids)
        hidden_states = [h] if output_hidden_states else None
        captures, aux_losses = [], []
        for i, layer in enumerate(self.layers):
            teacher = teacher_outputs[i] if teacher_outputs is not None else None
            if rng is not None:
                rng, layer_rng = jax.random.split(rng)
            else:
                layer_rng = None
            if self.cfg.remat_layers:
                def run_layer(mdl, h_, mask_, teacher_, rng_):
                    return mdl(
                        h_, mask_, teacher_,
                        benchmarking=benchmarking, training=training, rng=rng_,
                    )

                h, aux, capture = nn.remat(run_layer, prevent_cse=False)(
                    layer, h, mask, teacher, layer_rng
                )
            else:
                h, aux, capture = layer(
                    h, mask, teacher,
                    benchmarking=benchmarking, training=training, rng=layer_rng,
                )
            if output_hidden_states:
                hidden_states.append(h)
            if aux is not None:
                aux_losses.append(aux)
            if capture is not None:
                captures.append(capture)
        pooled = jnp.tanh(self.pooler(h[:, 0]))
        aux_loss = sum(aux_losses) / len(aux_losses) if aux_losses else jnp.float32(0.0)
        return h, pooled, hidden_states, captures, aux_loss


class BertForSequenceClassification(nn.Module):
    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg, name="bert")
        self.classifier = nn.Dense(self.cfg.num_labels, name="classifier")

    def __call__(
        self,
        input_ids,
        attention_mask_1d,
        token_type_ids=None,
        labels=None,
        teacher_outputs=None,
        *,
        benchmarking=False,
        training=False,
        rng=None,
        output_hidden_states=False,
    ):
        h, pooled, hidden_states, captures, aux_loss = self.bert(
            input_ids, attention_mask_1d, token_type_ids, teacher_outputs,
            benchmarking=benchmarking, training=training, rng=rng,
            output_hidden_states=output_hidden_states,
        )
        logits = self.classifier(pooled)
        loss = None
        if labels is not None:
            if self.cfg.num_labels == 1:
                loss = jnp.mean((logits[..., 0] - labels) ** 2)
            else:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                loss = -jnp.mean(
                    jnp.take_along_axis(logp, labels[:, None], axis=-1)
                )
        return {
            "logits": logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
            "last_hidden_state": h,
        }


class BertForQuestionAnswering(nn.Module):
    """Extractive-QA head (reference `perlin_bert.py:2350`
    BertForQuestionAnswering): a 2-unit dense over the sequence output
    split into start/end logits; loss is the mean of the two
    cross-entropies with positions clamped to [0, T] and T used as the
    ignored index (HF semantics)."""

    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg, name="bert")
        self.qa_outputs = nn.Dense(2, name="qa_outputs")

    def __call__(
        self,
        input_ids,
        attention_mask_1d,
        token_type_ids=None,
        start_positions=None,
        end_positions=None,
        teacher_outputs=None,
        *,
        benchmarking=False,
        training=False,
        rng=None,
        output_hidden_states=False,
    ):
        h, _pooled, hidden_states, captures, aux_loss = self.bert(
            input_ids, attention_mask_1d, token_type_ids, teacher_outputs,
            benchmarking=benchmarking, training=training, rng=rng,
            output_hidden_states=output_hidden_states,
        )
        logits = self.qa_outputs(h)  # (N, T, 2)
        start_logits = logits[..., 0]
        end_logits = logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            T = start_logits.shape[1]

            def span_ce(lg, pos):
                # clamp to [0, T]; index == T means "no answer in span"
                # and is ignored (HF ignored_index = seq_len)
                pos = jnp.clip(pos, 0, T)
                logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
                alive = pos != T
                safe = jnp.where(alive, pos, 0)
                nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
                return (nll * alive).sum() / jnp.maximum(alive.sum(), 1)

            loss = 0.5 * (
                span_ce(start_logits, start_positions)
                + span_ce(end_logits, end_positions)
            )
        return {
            "start_logits": start_logits,
            "end_logits": end_logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
            "last_hidden_state": h,
        }


class BertForTokenClassification(nn.Module):
    """Per-token labeling head (reference `perlin_bert.py:2435`
    BertForTokenClassification): classifier over every sequence position;
    cross-entropy with the HF -100 ignore convention."""

    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg, name="bert")
        self.classifier = nn.Dense(self.cfg.num_labels, name="classifier")

    def __call__(
        self,
        input_ids,
        attention_mask_1d,
        token_type_ids=None,
        labels=None,
        teacher_outputs=None,
        *,
        benchmarking=False,
        training=False,
        rng=None,
        output_hidden_states=False,
    ):
        h, _pooled, hidden_states, captures, aux_loss = self.bert(
            input_ids, attention_mask_1d, token_type_ids, teacher_outputs,
            benchmarking=benchmarking, training=training, rng=rng,
            output_hidden_states=output_hidden_states,
        )
        logits = self.classifier(h)  # (N, T, num_labels)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            alive = labels != -100
            safe = jnp.where(alive, labels, 0)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            loss = (nll * alive).sum() / jnp.maximum(alive.sum(), 1)
        return {
            "logits": logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
            "last_hidden_state": h,
        }


class BertForMultipleChoice(nn.Module):
    """Multiple-choice head (reference `perlin_bert.py:2256`
    BertForMultipleChoice): inputs are (N, C, T); choices are flattened
    into the batch, each choice pooled and scored with a 1-unit dense,
    and the C scores softmaxed against the gold choice index."""

    cfg: BertConfig

    def setup(self):
        self.bert = BertModel(self.cfg, name="bert")
        self.classifier = nn.Dense(1, name="classifier")

    def __call__(
        self,
        input_ids,  # (N, C, T)
        attention_mask_1d,  # (N, C, T)
        token_type_ids=None,
        labels=None,  # (N,) gold choice index
        teacher_outputs=None,
        *,
        benchmarking=False,
        training=False,
        rng=None,
        output_hidden_states=False,
    ):
        N, C, T = input_ids.shape
        flat_ids = input_ids.reshape(N * C, T)
        flat_mask = attention_mask_1d.reshape(N * C, T)
        flat_types = (
            token_type_ids.reshape(N * C, T)
            if token_type_ids is not None
            else None
        )
        h, pooled, hidden_states, captures, aux_loss = self.bert(
            flat_ids, flat_mask, flat_types, teacher_outputs,
            benchmarking=benchmarking, training=training, rng=rng,
            output_hidden_states=output_hidden_states,
        )
        logits = self.classifier(pooled).reshape(N, C)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1)
            )
        return {
            "logits": logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
            "last_hidden_state": h,
        }


class BertForMaskedLM(nn.Module):
    """MLM head (reference `perlin_bert.py:1935` BertForMaskedLM ->
    BertOnlyMLMHead: transform dense + gelu + LayerNorm, then a decoder
    tied to the word embeddings plus a free bias). Labels use the HF
    convention: -100 positions are unsupervised."""

    cfg: BertConfig

    def setup(self):
        c = self.cfg
        self.bert = BertModel(c, name="bert")
        self.transform = nn.Dense(c.hidden_size, name="transform")
        self.transform_ln = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="transform_ln"
        )
        self.decoder_bias = self.param(
            "decoder_bias", nn.initializers.zeros, (c.vocab_size,)
        )

    def __call__(
        self,
        input_ids,
        attention_mask_1d,
        token_type_ids=None,
        labels=None,
        teacher_outputs=None,
        *,
        benchmarking=False,
        training=False,
        rng=None,
        output_hidden_states=False,
    ):
        h, _pooled, hidden_states, captures, aux_loss = self.bert(
            input_ids, attention_mask_1d, token_type_ids, teacher_outputs,
            benchmarking=benchmarking, training=training, rng=rng,
            output_hidden_states=output_hidden_states,
        )
        t = self.transform_ln(nn.gelu(self.transform(h)))
        # decoder tied to the input embedding matrix (HF weight tying)
        logits = (
            t @ self.bert.word_embeddings.embedding.T + self.decoder_bias
        )
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            alive = labels != -100
            safe = jnp.where(alive, labels, 0)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            loss = (nll * alive).sum() / jnp.maximum(alive.sum(), 1)
        return {
            "logits": logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
            "last_hidden_state": h,
        }
