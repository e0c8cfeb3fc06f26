"""OPT decoder with switchable attention (dense teacher / SEA student).

TPU-native equivalent of the reference model-integration layer:
  * `src/models/hf_opt.py:124-343` — the frozen dense teacher that captures
    per-layer attention scores (q·k^T + causal mask, pre-softmax) and the
    pre-out_proj context layer for distillation;
  * `src/models/perlin_opt/perlin_opt.py:137-638` — the student whose
    self-attention dispatches on `attention_method`
    ('none' | 'perlin' | 'performer').

Architectural differences from the reference (deliberate, TPU-first):
  * teacher-score transfer is by value inside one jit — the reference's
    lazy-checkout closures + CPU offload (`hf_opt.py:154-196`) exist to fit
    O(T^2) teacher buffers in GPU VRAM; under XLA the interleaved
    teacher/student layer schedule (see training/distill.py) keeps at most
    one layer's scores live;
  * no module-global DEFAULT_METHOD — the method is a config field.

Model dims follow facebook/opt-125m (worked from the HF config, not copied).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SeaConfig
from ..ops.masks import fp_min_for
from ..ops.performer import fast_attention, gaussian_orthogonal_random_matrix
from .attention import SeaAttention, SeaAttentionOutput, softmax_fp32


@dataclasses.dataclass(frozen=True)
class OptConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 2048
    pad_token_id: int = 1
    bos_token_id: int = 2
    do_layer_norm_before: bool = True
    dropout: float = 0.0
    attention_method: str = "perlin"  # 'none' | 'perlin' | 'performer'
    # NOTE dropout defaults to 0.0 here (the reference OPT uses 0.1 during
    # KD); setting it >0 requires rngs={'dropout': key} on apply
    # compile the layer stack as one lax.scan body with stacked params
    # (12x smaller XLA graph; param trees convert with
    # stack_layer_params/unstack_layer_params)
    scan_layers: bool = False
    # activation dtype ('float32' | 'bfloat16'); params stay f32, losses and
    # fp32 islands (performer, softmaxes) are unaffected — the AMP analogue
    # of the reference's fp16 autocast (opt_trainer.py BF_16)
    compute_dtype: str = "float32"
    # build only embeddings/finalize/lm-head; the layer stack lives outside
    # (used by the scanned teacher/student KD pair in training/distill.py)
    external_layers: bool = False
    # static mode of the scanned layer body (nn.scan traces one body; a
    # per-call python flag cannot vary per trace): False = train path,
    # True = fused benchmark path
    scan_benchmarking: bool = False
    # rematerialise the scanned layer body under grad (activation memory of
    # ONE layer instead of num_layers — required for long-context training)
    scan_remat: bool = False
    sea: SeaConfig = dataclasses.field(default_factory=SeaConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def opt_125m(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> OptConfig:
    from ..config import opt_config as sea_opt_config

    return OptConfig(
        attention_method=attention_method,
        sea=sea if sea is not None else sea_opt_config(),
    )


def opt_350m(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> OptConfig:
    from ..config import opt_config as sea_opt_config

    return OptConfig(
        hidden_size=1024,
        num_layers=24,
        num_heads=16,
        ffn_dim=4096,
        attention_method=attention_method,
        sea=sea
        if sea is not None
        else sea_opt_config(num_heads=16, head_dim=64),
    )


def opt_1_3b(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> OptConfig:
    """facebook/opt-1.3b geometry (reference tunes it via
    config/ds_opt_1.3.json ZeRO-2 + offload, README.md:45). The TPU memory
    plan replacing DeepSpeed offload: scan_kd (single scanned teacher+student
    layer-pair body), per-pair jax.checkpoint remat, buffer donation, bf16
    compute_dtype, dp-sharded ZeRO-1 optimizer state (parallel/mesh.py)."""
    from ..config import opt_config as sea_opt_config

    return OptConfig(
        hidden_size=2048,
        num_layers=24,
        num_heads=32,
        ffn_dim=8192,
        attention_method=attention_method,
        compute_dtype="bfloat16",
        sea=sea
        if sea is not None
        else sea_opt_config(num_heads=32, head_dim=64),
    )


def opt_2_7b(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> OptConfig:
    """facebook/opt-2.7b geometry (reference README.md:45 24GB tuning)."""
    from ..config import opt_config as sea_opt_config

    return OptConfig(
        hidden_size=2560,
        num_layers=32,
        num_heads=32,
        ffn_dim=10240,
        attention_method=attention_method,
        compute_dtype="bfloat16",
        sea=sea
        if sea is not None
        else sea_opt_config(num_heads=32, head_dim=80),
    )


class LayerTeacherOutput(NamedTuple):
    """Per-layer distillation targets captured by the dense teacher."""

    attention_scores: jnp.ndarray  # (N, H, T, T) pre-softmax, causal-masked
    context_layer: jnp.ndarray  # (N, T, H*D) pre-out_proj


def build_causal_mask(
    attention_mask_1d: jnp.ndarray, t: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(N, T) {0,1} padding mask -> (N, 1, T, T) additive causal mask with
    FP_MIN at masked positions (0 elsewhere)."""
    fpmin = fp_min_for(dtype)
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    pad = attention_mask_1d[:, None, None, :] > 0  # (N,1,1,T)
    alive = causal[None, None] & pad
    return jnp.where(alive, 0.0, fpmin).astype(dtype)


class OptAttention(nn.Module):
    """Self-attention dispatcher (reference perlin_opt.py:137-638)."""

    cfg: OptConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(c.hidden_size, name="q_proj")
        self.k_proj = nn.Dense(c.hidden_size, name="k_proj")
        self.v_proj = nn.Dense(c.hidden_size, name="v_proj")
        self.out_proj = nn.Dense(c.hidden_size, name="out_proj")
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
        elif c.attention_method == "cosformer":
            # reference perlin_opt.py:199-210 (CosformerAttention causal)
            from ..ops.cosformer import CosformerAttention

            self.cosformer = CosformerAttention(
                embed_dim=c.hidden_size,
                num_heads=c.num_heads,
                has_outproj=False,
                causal=True,
                name="cosformer",
            )
        elif c.attention_method in ("reformer", "sinkhorn"):
            pass  # learn-free ops (reference perlin_opt.py:184-196,212-221)
        else:
            assert c.attention_method == "none", c.attention_method

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        N, T, E = x.shape
        c = self.cfg
        return jnp.transpose(
            x.reshape(N, T, c.num_heads, c.head_dim), (0, 2, 1, 3)
        )

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        causal_mask: jnp.ndarray,
        teacher: Optional[LayerTeacherOutput] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Returns (attn_output (N,T,E), aux_loss | None, teacher_capture | None)."""
        c = self.cfg
        N, T, E = hidden_states.shape
        scaling = c.head_dim ** -0.5

        q = self._heads(self.q_proj(hidden_states) * scaling)
        k = self._heads(self.k_proj(hidden_states))
        v = self._heads(self.v_proj(hidden_states))

        if c.attention_method == "none":
            scores = jnp.einsum("nhtd,nhsd->nhts", q, k) + causal_mask
            scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
            probs = softmax_fp32(scores, -1)
            ctx = jnp.einsum("nhts,nhsd->nhtd", probs, v)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            capture = LayerTeacherOutput(attention_scores=scores, context_layer=ctx)
            return self.out_proj(ctx), None, capture

        if c.attention_method == "performer":
            out = fast_attention(
                q.astype(jnp.float32),
                k.astype(jnp.float32),
                v.astype(jnp.float32),
                self.performer_proj.value,
                causal=True,
                generalized=True,
            ).astype(hidden_states.dtype)
            ctx = jnp.transpose(out, (0, 2, 1, 3)).reshape(N, T, E)
            return self.out_proj(ctx), None, None

        # causal baseline dispatches (reference perlin_opt.py:315,402,478):
        # padded value rows zeroed like the reference's
        # v * (attention_mask[:,:,:,:1] > -1)
        if c.attention_method in ("reformer", "cosformer", "sinkhorn"):
            dst_alive = causal_mask[:, :, :, :1] > -1  # (N,1,T,1)
            v = jnp.where(dst_alive, v, 0)
            if c.attention_method == "cosformer":
                # sequence-first fp32 island (reference perlin_opt.py:402-427)
                to_seq = lambda x: jnp.transpose(
                    jnp.transpose(x, (0, 2, 1, 3)).reshape(N, T, E), (1, 0, 2)
                ).astype(jnp.float32)
                t_out = self.cosformer(to_seq(q), to_seq(k), to_seq(v))
                ctx = jnp.transpose(t_out, (1, 0, 2)).astype(hidden_states.dtype)
            elif c.attention_method == "reformer":
                from ..ops.baselines import reformer_lsh_attention

                hash_rng = rng if rng is not None else jax.random.key(7)
                # shared-QK per Reformer (the reference passes qk to
                # LSHAttention, perlin_opt.py:350)
                out = reformer_lsh_attention(
                    q.astype(jnp.float32),
                    v.astype(jnp.float32),
                    rng=hash_rng,
                    causal=True,
                ).astype(hidden_states.dtype)
                ctx = jnp.transpose(out, (0, 2, 1, 3)).reshape(N, T, E)
            else:
                from ..ops.baselines import sinkhorn_causal_attention

                out = sinkhorn_causal_attention(
                    q.astype(jnp.float32),
                    k.astype(jnp.float32),
                    v.astype(jnp.float32),
                    block_size=min(c.sea.k, T),
                ).astype(hidden_states.dtype)
                ctx = jnp.transpose(out, (0, 2, 1, 3)).reshape(N, T, E)
            return self.out_proj(ctx), None, None

        assert c.attention_method == "perlin", c.attention_method  # dispatch
        # optional LoRA deltas: main q/k/v, plus separate estimator-branch
        # projections (reference PerlinSelfAttention lora_in_approx,
        # self_attention.py:95-175)
        q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_enabled:
            q = q + self._heads(self.perlin_q_lora(hidden_states) * scaling)
            k = k + self._heads(self.perlin_k_lora(hidden_states))
            v = v + self._heads(self.perlin_v_lora(hidden_states))
            q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_in_approx_enabled:
            q_a = q + self._heads(self.perlin_q_atten_lora(hidden_states) * scaling)
            k_a = k + self._heads(self.perlin_k_atten_lora(hidden_states))
            v_a = v + self._heads(self.perlin_v_atten_lora(hidden_states))
            q_s = q + self._heads(self.perlin_q_score_lora(hidden_states) * scaling)
            k_s = k + self._heads(self.perlin_k_score_lora(hidden_states))
        out: SeaAttentionOutput = self.perlin(  # noqa: F821
            q,
            k,
            v,
            q_a,
            k_a,
            v_a,
            q_s,
            k_s,
            causal_mask,
            attention_scores_truth=teacher.attention_scores if teacher else None,
            context_layer_truth=teacher.context_layer if teacher else None,
            benchmarking=benchmarking,
            training=training,
            rng=rng,
        )
        return self.out_proj(out.context_layer), out.loss, None

    def init_state(self, batch: int, max_len: int, dtype=jnp.float32):
        assert self.cfg.attention_method == "perlin"
        return self.perlin.init_state(batch, max_len, dtype)

    def decode(self, hidden_states: jnp.ndarray, state):
        """One decode step: hidden_states (N, 1, E) -> (attn_out, new_state).
        The reference threads this state as past_key_value[2]
        (`perlin_opt.py:625-626`)."""
        c = self.cfg
        N, T1, E = hidden_states.shape
        scaling = c.head_dim ** -0.5
        q = self._heads(self.q_proj(hidden_states) * scaling)
        k = self._heads(self.k_proj(hidden_states))
        v = self._heads(self.v_proj(hidden_states))
        out, new_state = self.perlin.decode(q, k, v, state)
        return self.out_proj(out), new_state

    def prefill(self, hidden_states: jnp.ndarray, causal_mask, max_len: int):
        """Parallel prompt prefill: the standard SEA forward for the
        output (one MXU-batched pass) plus the decode cache built in
        parallel (`SeaAttention.prefill_state`) — replaces P sequential
        `decode` steps for prompt ingestion. Plain q/k/v like `decode`
        (the decode path carries no LoRA deltas)."""
        c = self.cfg
        N, T, E = hidden_states.shape
        scaling = c.head_dim ** -0.5
        q = self._heads(self.q_proj(hidden_states) * scaling)
        k = self._heads(self.k_proj(hidden_states))
        v = self._heads(self.v_proj(hidden_states))
        # fused benchmark path for the prefill outputs: same mask
        # semantics as the train path (<=2e-4, tests/test_fused_path.py)
        # and O(T*k) instead of the dense O(T^2) resize — the speedup
        # grows with prompt length
        out = self.perlin(
            q, k, v, q, k, v, q, k, causal_mask,
            benchmarking=self.cfg.sea.use_pallas
        )
        state = self.perlin.prefill_state(q, k, v, max_len)
        return self.out_proj(out.context_layer), state

    def decode_paged(self, hidden_states, state, pool_k, pool_v, pages):
        """Paged-pool decode step (serving path): K/V live in this layer's
        page pool instead of a per-sequence contiguous cache."""
        c = self.cfg
        scaling = c.head_dim ** -0.5
        q = self._heads(self.q_proj(hidden_states) * scaling)
        k = self._heads(self.k_proj(hidden_states))
        v = self._heads(self.v_proj(hidden_states))
        out, new_state, pool_k, pool_v = self.perlin.decode_paged(
            q, k, v, state, pool_k, pool_v, pages
        )
        return self.out_proj(out), new_state, pool_k, pool_v


class OptDecoderLayer(nn.Module):
    """Pre-LN decoder layer (reference perlin_opt.py:638-820)."""

    cfg: OptConfig

    def setup(self):
        c = self.cfg
        self.self_attn = OptAttention(c, name="self_attn")
        self.self_attn_layer_norm = nn.LayerNorm(name="self_attn_layer_norm")
        self.fc1 = nn.Dense(c.ffn_dim, name="fc1")
        self.fc2 = nn.Dense(c.hidden_size, name="fc2")
        self.final_layer_norm = nn.LayerNorm(name="final_layer_norm")
        self.drop = nn.Dropout(rate=c.dropout)

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        causal_mask: jnp.ndarray,
        teacher: Optional[LayerTeacherOutput] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        c = self.cfg
        in_dtype = hidden_states.dtype
        if c.sea.layerwise and training:
            # layerwise training: every layer optimises its own distillation
            # loss; gradients do not cross layer boundaries (reference
            # perlin_opt.py:706-715 detaches the layer input)
            hidden_states = jax.lax.stop_gradient(hidden_states)
        residual = hidden_states
        h = hidden_states
        if c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        h, aux_loss, capture = self.self_attn(
            h,
            causal_mask,
            teacher,
            benchmarking=benchmarking,
            training=training,
            rng=rng,
        )
        h = self.drop(h, deterministic=not training)
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)

        residual = h
        if c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        h = nn.relu(self.fc1(h))
        h = self.fc2(h)
        h = self.drop(h, deterministic=not training)
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        # inter-layer activations stay in compute_dtype (f32 islands inside
        # the attention/scaler paths would otherwise promote the residual)
        return h.astype(in_dtype), aux_loss, capture

    def decode(self, hidden_states: jnp.ndarray, state):
        c = self.cfg
        residual = hidden_states
        h = hidden_states
        if c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        h, new_state = self.self_attn.decode(h, state)
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        residual = h
        if c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        h = self.fc2(nn.relu(self.fc1(h)))
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        return h, new_state

    def prefill(self, hidden_states: jnp.ndarray, causal_mask, max_len: int):
        """Parallel-prefill twin of `decode`: one batched pass over the
        prompt producing (layer_out, decode_state)."""
        c = self.cfg
        residual = hidden_states
        h = hidden_states
        if c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        h, state = self.self_attn.prefill(h, causal_mask, max_len)
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        residual = h
        if c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        h = self.fc2(nn.relu(self.fc1(h)))
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        return h, state

    def decode_paged(self, hidden_states, state, pool_k, pool_v, pages):
        c = self.cfg
        residual = hidden_states
        h = hidden_states
        if c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        h, new_state, pool_k, pool_v = self.self_attn.decode_paged(
            h, state, pool_k, pool_v, pages
        )
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.self_attn_layer_norm(h)
        residual = h
        if c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        h = self.fc2(nn.relu(self.fc1(h)))
        h = residual + h
        if not c.do_layer_norm_before:
            h = self.final_layer_norm(h)
        return h, new_state, pool_k, pool_v


class _LayerScanBody(nn.Module):
    """Scan body wrapping one decoder layer: (carry=h, broadcast=mask) ->
    (h', aux). Used when cfg.scan_layers compiles the stack as one
    lax.scan with layer-stacked params."""

    cfg: OptConfig

    @nn.compact
    def __call__(self, carry, causal_mask):
        h, aux, _ = OptDecoderLayer(self.cfg, name="layer")(
            carry, causal_mask, benchmarking=self.cfg.scan_benchmarking
        )
        return h, (aux if aux is not None else jnp.float32(0.0))


class OptModel(nn.Module):
    """OPT decoder stack. Exposes `embed` / `layer` / `finalize` so the KD
    driver can interleave teacher and student layer-by-layer."""

    cfg: OptConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        # OPT learned positions carry a +2 offset (HF OPTLearnedPositionalEmbedding)
        self.embed_positions = nn.Embed(
            c.max_position_embeddings + 2, c.hidden_size, name="embed_positions"
        )
        if c.external_layers:
            self.layers = []
        elif c.scan_layers:
            body = (
                nn.remat(_LayerScanBody, prevent_cse=False)
                if c.scan_remat
                else _LayerScanBody
            )
            self.scanned_layers = nn.scan(
                body,
                variable_axes={"params": 0, "performer": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=c.num_layers,
            )(c, name="layers_scan")
        else:
            self.layers = [
                OptDecoderLayer(c, name=f"layers_{i}") for i in range(c.num_layers)
            ]
        if c.do_layer_norm_before:
            self.final_layer_norm = nn.LayerNorm(name="final_layer_norm")

    def embed(self, input_ids: jnp.ndarray, attention_mask_1d: jnp.ndarray):
        c = self.cfg
        N, T = input_ids.shape
        h = self.embed_tokens(input_ids)
        positions = jnp.cumsum(attention_mask_1d, axis=1) * attention_mask_1d - 1
        pos_emb = self.embed_positions((positions + 2).astype(jnp.int32))
        h = (h + pos_emb).astype(jnp.dtype(c.compute_dtype))
        if c.attention_method == "perlin" and c.sea.use_fused_train:
            # thin dst-column mask (N, 1, T, 1): the fused train kernel
            # derives causality itself; materializing the (T, T) additive
            # mask costs T^2 HBM (8 GB bf16 at T=65536 — the last single-
            # chip blocker after cnn_row_chunk, docs/kernel_design.md)
            fpmin = fp_min_for(h.dtype)
            thin = jnp.where(
                attention_mask_1d[:, None, :, None] > 0, 0.0, fpmin
            ).astype(h.dtype)
            return h, thin
        causal_mask = build_causal_mask(attention_mask_1d, T, h.dtype)
        return h, causal_mask

    def finalize(self, h: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.do_layer_norm_before:
            h = self.final_layer_norm(h)
        return h

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask_1d: jnp.ndarray,
        teacher_outputs: Optional[List[LayerTeacherOutput]] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
    ):
        h, causal_mask = self.embed(input_ids, attention_mask_1d)
        if self.cfg.scan_layers:
            assert teacher_outputs is None and not output_hidden_states, (
                "scan_layers path supports plain forward only; use the loop "
                "path for KD/introspection"
            )
            h, aux_stack = self.scanned_layers(h, causal_mask)
            h = self.finalize(h)
            return h, None, [], jnp.mean(aux_stack)
        hidden_states = [h] if output_hidden_states else None
        captures = []
        aux_losses = []
        for i, layer in enumerate(self.layers):
            teacher = teacher_outputs[i] if teacher_outputs is not None else None
            if rng is not None:
                rng, layer_rng = jax.random.split(rng)
            else:
                layer_rng = None
            h, aux, capture = layer(
                h,
                causal_mask,
                teacher,
                benchmarking=benchmarking,
                training=training,
                rng=layer_rng,
            )
            if output_hidden_states:
                hidden_states.append(h)
            if aux is not None:
                aux_losses.append(aux)
            if capture is not None:
                captures.append(capture)
        h = self.finalize(h)
        aux_loss = (
            sum(aux_losses) / len(aux_losses) if aux_losses else jnp.float32(0.0)
        )
        return h, hidden_states, captures, aux_loss


class OptForCausalLM(nn.Module):
    """LM head tied to the input embedding (OPT convention)."""

    cfg: OptConfig

    def setup(self):
        self.model = OptModel(self.cfg, name="model")

    def init_decode_states(self, batch: int, max_len: int, dtype=jnp.float32):
        return [
            layer.self_attn.init_state(batch, max_len, dtype)
            for layer in self.model.layers
        ]

    def prefill_parallel(
        self, prompt_ids: jnp.ndarray, max_len: int, last_only: bool = False
    ):
        """Ingest the whole prompt in ONE batched forward (MXU-efficient,
        O(P) parallel work) instead of P sequential `decode_step`s,
        returning (logits (N, P, V), per-layer decode states positioned at
        P). The decode-vs-prefill parity class is the same as
        `decode_step` vs the full forward (each layer's state is built
        from the batched forward's hidden states; fp summation order in
        the prefix sums differs from the sequential loop).

        last_only: project only the final position's logits (N, 1, V) —
        the generation loops need just the next-token distribution, and
        the full (N, P, V) tensor is ~200 MB at P=1024/V=50k."""
        N, P = prompt_ids.shape
        mask1d = jnp.ones((N, P), jnp.int32)
        h, causal_mask = self.model.embed(prompt_ids, mask1d)
        states = []
        for layer in self.model.layers:
            h, st = layer.prefill(h, causal_mask, max_len)
            states.append(st)
        h = self.model.finalize(h)
        if last_only:
            h = h[:, -1:]
        return self.logits(h), states

    def _prefill(self, prompt_ids, max_len: int, parallel: bool):
        """Shared prompt-ingestion step for the generation loops: returns
        (states positioned at P, last-position logits (N, V))."""
        N, P = prompt_ids.shape
        if parallel:
            logits, states = self.prefill_parallel(
                prompt_ids, max_len, last_only=True
            )
            return states, logits[:, -1]
        states = self.init_decode_states(N, max_len, jnp.float32)

        def prefill_body(carry, t):
            states = carry
            logits, states = self.decode_step(
                jax.lax.dynamic_slice(prompt_ids, (0, t), (N, 1)), t, states
            )
            return states, logits[:, 0]

        states, prefill_logits = jax.lax.scan(
            prefill_body, states, jnp.arange(P, dtype=jnp.int32)
        )
        return states, prefill_logits[-1]

    def decode_step(self, token_ids: jnp.ndarray, position: jnp.ndarray, states):
        """One autoregressive step (reference §3.4 opt_generate path).

        token_ids: (N, 1); position: () int32 (0-based, all rows in
        lockstep) or (N,) (per-slot, serving); states: per-layer
        SeaDecodeState list. Returns (logits (N, 1, V), new_states)."""
        h = self.model.embed_tokens(token_ids)
        h = h + self.model.embed_positions(self._decode_pos(position) + 2)
        new_states = []
        for layer, st in zip(self.model.layers, states):
            h, st2 = layer.decode(h, st)
            new_states.append(st2)
        h = self.model.finalize(h)
        return self.logits(h), new_states

    @staticmethod
    def _decode_pos(position):
        position = jnp.asarray(position)
        return position[None, None] if position.ndim == 0 else position[:, None]

    def decode_step_paged(
        self, token_ids, position, states, pool_k, pool_v, pages
    ):
        """One serving decode step over paged KV pools.

        pool_k/pool_v: (L, P, page_size, H, D) — per-layer page pools;
        pages: (N, max_pages) int32, shared by all layers (a page id
        addresses the same slot range in every layer's pool). Returns
        (logits, new_states, pool_k, pool_v)."""
        h = self.model.embed_tokens(token_ids)
        h = h + self.model.embed_positions(self._decode_pos(position) + 2)
        new_states = []
        for li, (layer, st) in enumerate(zip(self.model.layers, states)):
            h, st2, new_pk, new_pv = layer.decode_paged(
                h, st, pool_k[li], pool_v[li], pages
            )
            pool_k = pool_k.at[li].set(new_pk)
            pool_v = pool_v.at[li].set(new_pv)
            new_states.append(st2)
        h = self.model.finalize(h)
        return self.logits(h), new_states, pool_k, pool_v

    def generate_greedy(
        self,
        prompt_ids: jnp.ndarray,  # (N, P)
        max_len: int,
        num_steps: int,
        parallel_prefill: bool = False,
    ):
        """Whole generation loop on device: prefill the prompt through the
        decode cache, then lax.scan greedy steps (no per-token host round
        trips — the TPU-native answer to the reference's HF `generate`
        python loop).

        parallel_prefill: ingest the prompt with ONE batched forward
        (`prefill_parallel`) instead of P sequential decode steps —
        prompt latency drops from P matvec-dominated steps to one
        MXU-batched pass."""
        N, P = prompt_ids.shape
        states, last_logits = self._prefill(prompt_ids, max_len, parallel_prefill)

        def gen_body(carry, i):
            states, last_logits = carry
            nxt = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)[:, None]
            logits, states = self.decode_step(nxt, P + i, states)
            return (states, logits[:, 0]), nxt[:, 0]

        (states, _), tokens = jax.lax.scan(
            gen_body, (states, last_logits), jnp.arange(num_steps, dtype=jnp.int32)
        )
        return jnp.swapaxes(tokens, 0, 1)  # (N, num_steps)

    def generate_sample(
        self,
        prompt_ids: jnp.ndarray,  # (N, P)
        max_len: int,
        num_steps: int,
        rng,
        temperature=1.0,
        top_k=0,
        top_p=1.0,
        parallel_prefill: bool = False,
    ):
        """Stochastic generation (temperature / top-k / top-p) — the
        TPU-native analogue of HF `generate(do_sample=True)` used by the
        reference's `main/opt_generate.py`; the whole loop is one
        lax.scan on device. temperature/top_k/top_p are scalars or (N,)
        per-row arrays; temperature <= 0 rows decode greedily (so one
        compiled program serves mixed batches)."""
        from ..ops.sampling import sample_logits

        N, P = prompt_ids.shape
        states, last_logits = self._prefill(prompt_ids, max_len, parallel_prefill)

        def gen_body(carry, i):
            states, last_logits = carry
            key = jax.random.fold_in(rng, i)
            nxt = sample_logits(
                key, last_logits, temperature, top_k, top_p
            )[:, None]
            logits, states = self.decode_step(nxt, P + i, states)
            return (states, logits[:, 0]), nxt[:, 0]

        (states, _), tokens = jax.lax.scan(
            gen_body, (states, last_logits), jnp.arange(num_steps, dtype=jnp.int32)
        )
        return jnp.swapaxes(tokens, 0, 1)  # (N, num_steps)

    def generate_beam(
        self,
        prompt_ids: jnp.ndarray,  # (N, P)
        max_len: int,
        num_steps: int,
        beam_size: int = 4,
        length_penalty: float = 1.0,
        parallel_prefill: bool = False,
    ):
        """On-device beam search over the SEA decode cache (serving path;
        the reference leans on HF `generate`'s beam machinery —
        `main/opt_generate.py` — which loops on the host; here the whole
        search is one lax.scan). Fixed step count, no EOS early exit.

        Returns (tokens (N, beam_size, num_steps), scores (N, beam_size))
        sorted best-first per batch row."""
        N, P = prompt_ids.shape
        B = beam_size
        V = self.cfg.vocab_size

        # prefill once at batch N, then replicate states across beams
        states, last_logits = self._prefill(prompt_ids, max_len, parallel_prefill)
        logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), -1)
        top0 = jax.lax.top_k(logp0, B)  # (N, B) values, indices
        beam_logp = top0[0]  # (N, B)
        first_tok = top0[1].astype(jnp.int32)  # (N, B)

        def rep(x):  # (N, ...) -> (N*B, ...) repeating each row B times
            return jnp.repeat(x, B, axis=0)

        states = jax.tree_util.tree_map(
            lambda x: rep(x) if hasattr(x, "ndim") and x.ndim > 0 else x, states
        )
        last_tok = first_tok.reshape(N * B, 1)

        def gen_body(carry, i):
            states, beam_logp, last_tok = carry
            logits, states = self.decode_step(last_tok, P + i, states)
            logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
            total = beam_logp.reshape(N, B, 1) + logp.reshape(N, B, V)
            vals, flat_idx = jax.lax.top_k(total.reshape(N, B * V), B)
            parent = (flat_idx // V).astype(jnp.int32)  # (N, B)
            tok = (flat_idx % V).astype(jnp.int32)
            # reorder decode states by surviving parent beams
            gather_idx = (
                jnp.arange(N, dtype=jnp.int32)[:, None] * B + parent
            ).reshape(-1)
            states = jax.tree_util.tree_map(
                lambda x: jnp.take(x, gather_idx, axis=0)
                if hasattr(x, "ndim") and x.ndim > 0
                else x,
                states,
            )
            return (states, vals, tok.reshape(N * B, 1)), (tok, parent)

        (states, beam_logp, last_tok), (toks, parents) = jax.lax.scan(
            gen_body,
            (states, beam_logp, last_tok),
            jnp.arange(0, num_steps - 1, dtype=jnp.int32),
        )

        # backtrack beam paths: toks/parents are (num_steps-1, N, B)
        def backtrack(carry, tp):
            beam_ptr = carry  # (N, B) which beam each final beam was at t+1
            tok_t, parent_t = tp
            tok_here = jnp.take_along_axis(tok_t, beam_ptr, axis=-1)
            beam_ptr = jnp.take_along_axis(parent_t, beam_ptr, axis=-1)
            return beam_ptr, tok_here

        init_ptr = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (N, B)
        )
        beam_ptr, rev_toks = jax.lax.scan(
            backtrack, init_ptr, (toks, parents), reverse=True
        )
        first = jnp.take_along_axis(first_tok, beam_ptr, axis=-1)  # (N, B)
        seq = jnp.concatenate(
            [first[None], rev_toks], axis=0
        )  # (num_steps, N, B)
        seq = jnp.transpose(seq, (1, 2, 0))  # (N, B, num_steps)
        scores = beam_logp / (num_steps ** length_penalty)
        return seq, scores

    def logits(self, h: jnp.ndarray) -> jnp.ndarray:
        embedding = self.model.embed_tokens.embedding
        return h @ embedding.T

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask_1d: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        teacher_outputs: Optional[List[LayerTeacherOutput]] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
        logit_chunk: Optional[int] = None,
    ):
        h, hidden_states, captures, aux_loss = self.model(
            input_ids,
            attention_mask_1d,
            teacher_outputs,
            benchmarking=benchmarking,
            training=training,
            rng=rng,
            output_hidden_states=output_hidden_states,
        )
        loss = None
        if labels is not None and logit_chunk:
            # long-context memory plan: never materialise (N, T, V)
            # logits — the task CE streams per chunk (forward AND
            # backward, remat); logits are not returned in this mode
            loss = chunked_cross_entropy_shifted(
                h, self.model.embed_tokens.embedding.T, labels, logit_chunk
            )
            logits = None
        else:
            logits = self.logits(h)
            if labels is not None:
                loss = cross_entropy_shifted(logits, labels)
        return {
            "logits": logits,
            "loss": loss,
            "hidden_states": hidden_states,
            "teacher_captures": captures,
            "aux_loss": aux_loss,
        }


def stack_layer_params(params: dict, num_layers: int) -> dict:
    """Convert loop-layout params (model/layers_{i}/...) to the scan layout
    (model/layers_scan/layer/... stacked on axis 0)."""
    model = dict(params["model"])
    per_layer = [model.pop(f"layers_{i}") for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer
    )
    model["layers_scan"] = {"layer": stacked}
    return {**params, "model": model}


def unstack_layer_params(params: dict, num_layers: int) -> dict:
    """Inverse of `stack_layer_params`."""
    model = dict(params["model"])
    stacked = model.pop("layers_scan")["layer"]
    for i in range(num_layers):
        model[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda x, _i=i: x[_i], stacked
        )
    return {**params, "model": model}


def chunked_cross_entropy_shifted(
    h: jnp.ndarray,  # (N, T, E) finalized hidden states
    proj: jnp.ndarray,  # (E, V) LM-head projection (embedding.T if tied)
    labels: jnp.ndarray,
    chunk: int,
    ignore_index: int = -100,
) -> jnp.ndarray:
    """`cross_entropy_shifted` computed per sequence chunk under lax.scan
    with rematerialised per-chunk logits — only one (N, chunk, V) logits
    block is live at any point, forward AND backward (the same recipe as
    distill._chunked_logit_losses; at T=32k/V=50k the full f32 logits
    alone are ~6.6 GB). Identical math by sum decomposition; the shift is
    handled by aligning labels[t+1] to position t before chunking."""
    N, T, E = h.shape
    C = int(chunk)
    if T % C != 0:
        # largest divisor of T not exceeding the requested chunk (gcd can
        # collapse to 1 and turn the scan into T tiny-matmul steps)
        C = next(d for d in range(min(C, T), 0, -1) if T % d == 0)
    nc = T // C
    lab_next = jnp.concatenate(
        [labels[:, 1:], jnp.full((N, 1), ignore_index, labels.dtype)], axis=1
    )
    h_c = jnp.swapaxes(h.reshape(N, nc, C, E), 0, 1)
    l_c = jnp.swapaxes(lab_next.reshape(N, nc, C), 0, 1)

    def chunk_loss(h_i, l_i):
        logits = (h_i @ proj).astype(jnp.float32)
        valid = l_i != ignore_index
        safe = jnp.where(valid, l_i, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, nll, 0.0).sum(), valid.sum()

    chunk_loss = jax.checkpoint(chunk_loss, prevent_cse=False)

    def body(carry, inp):
        s, c = chunk_loss(*inp)
        return (carry[0] + s, carry[1] + c), None

    (tot, cnt), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (h_c, l_c)
    )
    return tot / jnp.maximum(cnt, 1)


def cross_entropy_shifted(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Next-token cross entropy with -100 masking (torch CE semantics)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# ---------------------------------------------------------------------------
# Scan-body decode (VERDICT r4 #5): the loop-path decode unrolls num_layers
# copies of the layer graph — at 2.7b (32 layers) that graph is what the
# remote-compile tunnel cannot compile (RESULTS.md round-4). These drive the
# SAME OptDecoderLayer methods through ONE lax.scan over the scan-layout
# stacked params (the fix that saved entry() in round 1 and the 1.3b/65k
# training paths), at the param level like parallel/pp.py — no Flax
# transform surgery, so the variables are exactly the scan-layout trees.
# ---------------------------------------------------------------------------

def _scan_layer_vars(variables):
    """{collection: stacked layer tree} + the non-layer remainder —
    delegates to the one scan-layout splitter (function-level import:
    parallel.pp imports models lazily, so there is no cycle)."""
    from ..parallel.pp import split_scan_vars

    return split_scan_vars(variables)


def scan_decode_step(model, variables, token_ids, position, states):
    """One autoregressive step with the layer stack as ONE scan body.

    model: OptForCausalLM with cfg.scan_layers=True (scan-layout
    variables); states: the per-layer decode-state pytree STACKED on a
    leading layer axis (as produced by `scan_prefill_parallel`, or by
    tree-stacking `init_decode_states`). Returns (logits (N, 1, V),
    new stacked states)."""
    layer_vars, rest = _scan_layer_vars(variables)
    assert layer_vars, "variables are not in scan layout (no layers_scan)"
    layer_mod = OptDecoderLayer(model.cfg)

    h = model.apply(
        rest, token_ids, position,
        method=lambda m, t, p: m.model.embed_tokens(t)
        + m.model.embed_positions(OptForCausalLM._decode_pos(p) + 2),
    )

    def body(carry, xs):
        lv, st = xs
        h2, st2 = layer_mod.apply(
            lv, carry, st, method=lambda mod, hh, ss: mod.decode(hh, ss)
        )
        return h2, st2

    h, new_states = jax.lax.scan(body, h, (layer_vars, states))
    h = model.apply(rest, h, method=lambda m, x: m.model.finalize(x))
    return model.apply(rest, h, method=lambda m, x: m.logits(x)), new_states


def scan_prefill_parallel(model, variables, prompt_ids, max_len: int,
                          last_only: bool = True):
    """`prefill_parallel` with the layer stack as ONE scan body: ingest
    the whole prompt in one batched pass per layer, building the decode
    caches as the scan's per-layer outputs (stacked on axis 0). Returns
    (logits, stacked states)."""
    layer_vars, rest = _scan_layer_vars(variables)
    assert layer_vars, "variables are not in scan layout (no layers_scan)"
    layer_mod = OptDecoderLayer(model.cfg)
    N, P = prompt_ids.shape
    mask1d = jnp.ones((N, P), jnp.int32)
    h, causal_mask = model.apply(
        rest, prompt_ids, mask1d,
        method=lambda m, i, a: m.model.embed(i, a),
    )

    def body(carry, lv):
        h2, st = layer_mod.apply(
            lv, carry, causal_mask, max_len,
            method=lambda mod, hh, cm, ml: mod.prefill(hh, cm, ml),
        )
        return h2, st

    h, states = jax.lax.scan(body, h, layer_vars)
    h = model.apply(rest, h, method=lambda m, x: m.model.finalize(x))
    if last_only:
        h = h[:, -1:]
    logits = model.apply(rest, h, method=lambda m, x: m.logits(x))
    return logits, states


def scan_generate_greedy(model, variables, prompt_ids, max_len: int,
                         num_steps: int):
    """Greedy generation with scanned prefill + scanned decode steps —
    the whole loop on device (one compile of ONE layer body; the 32-layer
    2.7b decode graph compiles where the unrolled loop path cannot).
    Returns (N, num_steps) generated token ids."""
    N, P = prompt_ids.shape
    logits, states = scan_prefill_parallel(
        model, variables, prompt_ids, max_len, last_only=True
    )
    last = logits[:, -1]

    def gen_body(carry, i):
        states, last = carry
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]
        logits, states = scan_decode_step(
            model, variables, nxt, P + i, states
        )
        return (states, logits[:, 0]), nxt[:, 0]

    (_, _), toks = jax.lax.scan(
        gen_body, (states, last), jnp.arange(num_steps, dtype=jnp.int32)
    )
    return toks.T
