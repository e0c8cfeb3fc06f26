"""LLaMA decoder with switchable attention (dense teacher / SEA student).

The reference's *public* repo contains no LLaMA code, but its headline
result is SEA distilled into LLaMA-13B (`/root/reference/README.md:35-39`:
wikitext2 ppl 4.682 dense vs 5.446 SEA-13B; MMLU 54.87 vs 47.93 — produced
on a private branch). This module supplies that model family TPU-natively,
mirroring the OPT integration (`sea_tpu/models/opt.py`, reference
`src/models/perlin_opt/perlin_opt.py:137-638`) with LLaMA architecture:
RMSNorm, rotary position embeddings, SwiGLU MLP, untied LM head, optional
grouped-query attention (num_kv_heads < num_heads).

Design decisions (no reference counterpart exists — these are ours):
  * RoPE is applied to q/k *before* the SEA module, so the FAVOR+ estimator
    and the sparse attention both operate on position-mixed projections —
    the exact analogue of OPT, where learned positions enter through the
    hidden states. The estimated compressed map therefore targets the roped
    score map, and train-vs-benchmark consistency carries over unchanged.
  * q is pre-scaled by 1/sqrt(D) after RoPE (rotation commutes with
    scaling), matching the SEA kernels' no-sqrt(d) contract
    (SURVEY Appendix A.2).
  * GQA keys/values are expanded to the full head count before SEA — the
    per-head mask budget k is per *query* head. The decode cache stores the
    expanded (roped) keys.
  * position bundle: `LlamaModel.embed` returns (h, (causal_mask, cos,
    sin)); decoder layers unpack it, while the generic KD drivers
    (training/distill.py) thread it opaquely — the same wrappers train OPT
    and LLaMA students.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SeaConfig
from ..ops.performer import fast_attention, gaussian_orthogonal_random_matrix
from .attention import SeaAttention, SeaAttentionOutput, softmax_fp32
from .opt import (
    LayerTeacherOutput,
    OptForCausalLM,
    build_causal_mask,
    cross_entropy_shifted,
)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    # grouped-query attention: number of distinct K/V heads (None = MHA)
    num_kv_heads: Optional[int] = None
    intermediate_size: int = 11008
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    attention_method: str = "perlin"
    compute_dtype: str = "float32"
    # see OptConfig for these three (same semantics)
    scan_layers: bool = False
    scan_benchmarking: bool = False
    scan_remat: bool = False
    external_layers: bool = False
    sea: SeaConfig = dataclasses.field(default_factory=SeaConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads


def _sea_llama(num_heads: int, head_dim: int, **kw) -> SeaConfig:
    from ..config import opt_config

    return opt_config(num_heads=num_heads, head_dim=head_dim, **kw)


def llama_tiny(
    attention_method: str = "perlin",
    sea: Optional[SeaConfig] = None,
    num_kv_heads: Optional[int] = None,
) -> LlamaConfig:
    """Test-scale geometry (2 layers, 4 heads, optional GQA)."""
    sea = sea or SeaConfig(
        num_heads=4, head_dim=8, predictor_length=8, k=2,
        performer_nb_factor=1, causal=True, max_position_embeddings=128,
    ).validate()
    return LlamaConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=num_kv_heads, intermediate_size=64,
        max_position_embeddings=128,
        attention_method=attention_method, sea=sea,
    )


def llama_7b(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> LlamaConfig:
    return LlamaConfig(
        attention_method=attention_method,
        compute_dtype="bfloat16",
        sea=sea if sea is not None else _sea_llama(32, 128),
    )


def llama_13b(attention_method: str = "perlin", sea: Optional[SeaConfig] = None) -> LlamaConfig:
    """The headline SEA-13B geometry (reference README.md:35-39)."""
    return LlamaConfig(
        hidden_size=5120,
        num_layers=40,
        num_heads=40,
        intermediate_size=13824,
        attention_method=attention_method,
        compute_dtype="bfloat16",
        sea=sea if sea is not None else _sea_llama(40, 128),
    )


# ---------------------------------------------------------------- rotary

def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for rotary embeddings (HF half-split convention).

    positions: int array of any shape P. Returns (cos, sin) of shape
    P + (head_dim,) in float32, where the second half duplicates the first
    (emb = concat(freqs, freqs))."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # P + (D/2,)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate x (..., T, D) by cos/sin broadcastable to (..., T, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos.astype(x.dtype) + rotated * sin.astype(x.dtype)


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(N, Hkv, T, D) -> (N, Hkv*n_rep, T, D), GQA head expansion."""
    if n_rep == 1:
        return x
    N, H, T, D = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (N, H, n_rep, T, D)
    ).reshape(N, H * n_rep, T, D)


# ------------------------------------------------------------- modules

class LlamaMLP(nn.Module):
    """SwiGLU: down(silu(gate(x)) * up(x))."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        gate = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj")(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj")(x)
        return nn.Dense(c.hidden_size, use_bias=False, name="down_proj")(
            nn.silu(gate) * up
        )


class LlamaAttention(nn.Module):
    """Self-attention dispatcher, structured like OptAttention
    (reference dispatcher perlin_opt.py:137-638) with RoPE + GQA."""

    cfg: LlamaConfig

    def setup(self):
        c = self.cfg
        kv_width = c.kv_heads * c.head_dim
        self.q_proj = nn.Dense(c.hidden_size, use_bias=False, name="q_proj")
        self.k_proj = nn.Dense(kv_width, use_bias=False, name="k_proj")
        self.v_proj = nn.Dense(kv_width, use_bias=False, name="v_proj")
        self.o_proj = nn.Dense(c.hidden_size, use_bias=False, name="o_proj")
        if c.attention_method == "perlin":
            self.perlin = SeaAttention(c.sea, name="perlin")
            if c.sea.lora_enabled:
                from .lora import LoraDelta

                r = c.sea.lora_r
                self.perlin_q_lora = LoraDelta(c.hidden_size, r, name="perlin_q_lora")
                self.perlin_k_lora = LoraDelta(kv_width, r, name="perlin_k_lora")
                self.perlin_v_lora = LoraDelta(kv_width, r, name="perlin_v_lora")
            if c.sea.lora_in_approx_enabled:
                from .lora import LoraDelta

                r = c.sea.lora_r
                self.perlin_q_atten_lora = LoraDelta(c.hidden_size, r, name="perlin_q_atten_lora")
                self.perlin_k_atten_lora = LoraDelta(kv_width, r, name="perlin_k_atten_lora")
                self.perlin_v_atten_lora = LoraDelta(kv_width, r, name="perlin_v_atten_lora")
                self.perlin_q_score_lora = LoraDelta(c.hidden_size, r, name="perlin_q_score_lora")
                self.perlin_k_score_lora = LoraDelta(kv_width, r, name="perlin_k_score_lora")
        elif c.attention_method == "performer":
            self.performer_proj = self.variable(
                "performer",
                "projection",
                lambda: gaussian_orthogonal_random_matrix(
                    jax.random.key(1), c.sea.nb_features, c.head_dim
                ),
            )
        elif c.attention_method == "cosformer":
            from ..ops.cosformer import CosformerAttention

            self.cosformer = CosformerAttention(
                embed_dim=c.hidden_size,
                num_heads=c.num_heads,
                has_outproj=False,
                causal=True,
                name="cosformer",
            )
        elif c.attention_method in ("reformer", "sinkhorn"):
            pass
        else:
            assert c.attention_method == "none", c.attention_method

    def _q_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        N, T, _ = x.shape
        c = self.cfg
        return jnp.transpose(x.reshape(N, T, c.num_heads, c.head_dim), (0, 2, 1, 3))

    def _kv_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        N, T, _ = x.shape
        c = self.cfg
        return jnp.transpose(x.reshape(N, T, c.kv_heads, c.head_dim), (0, 2, 1, 3))

    def _qkv(self, hidden_states, cos, sin):
        """Projections + RoPE + GQA expansion + q pre-scaling."""
        c = self.cfg
        n_rep = c.num_heads // c.kv_heads
        scaling = c.head_dim ** -0.5
        q = apply_rope(self._q_heads(self.q_proj(hidden_states)), cos, sin) * scaling
        k = repeat_kv(
            apply_rope(self._kv_heads(self.k_proj(hidden_states)), cos, sin), n_rep
        )
        v = repeat_kv(self._kv_heads(self.v_proj(hidden_states)), n_rep)
        return q, k, v

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        bundle,  # (causal_mask (N,1,T,T), cos (N,1,T,D), sin (N,1,T,D))
        teacher: Optional[LayerTeacherOutput] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        c = self.cfg
        causal_mask, cos, sin = bundle
        N, T, E = hidden_states.shape
        n_rep = c.num_heads // c.kv_heads
        scaling = c.head_dim ** -0.5

        q, k, v = self._qkv(hidden_states, cos, sin)

        if c.attention_method == "none":
            scores = jnp.einsum("nhtd,nhsd->nhts", q, k) + causal_mask
            scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
            probs = softmax_fp32(scores, -1)
            ctx = jnp.einsum("nhts,nhsd->nhtd", probs, v)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(N, T, E)
            capture = LayerTeacherOutput(attention_scores=scores, context_layer=ctx)
            return self.o_proj(ctx), None, capture

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
            return self.o_proj(ctx), None, None

        if c.attention_method in ("reformer", "cosformer", "sinkhorn"):
            dst_alive = causal_mask[:, :, :, :1] > -1
            v = jnp.where(dst_alive, v, 0)
            if c.attention_method == "cosformer":
                to_seq = lambda x: jnp.transpose(
                    jnp.transpose(x, (0, 2, 1, 3)).reshape(N, T, E), (1, 0, 2)
                ).astype(jnp.float32)
                t_out = self.cosformer(to_seq(q), to_seq(k), to_seq(v))
                ctx = jnp.transpose(t_out, (1, 0, 2)).astype(hidden_states.dtype)
            elif c.attention_method == "reformer":
                from ..ops.baselines import reformer_lsh_attention

                hash_rng = rng if rng is not None else jax.random.key(7)
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
            return self.o_proj(ctx), None, None

        assert c.attention_method == "perlin", c.attention_method
        q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_enabled:
            q = q + apply_rope(
                self._q_heads(self.perlin_q_lora(hidden_states)), cos, sin
            ) * scaling
            k = k + repeat_kv(
                apply_rope(self._kv_heads(self.perlin_k_lora(hidden_states)), cos, sin),
                n_rep,
            )
            v = v + repeat_kv(self._kv_heads(self.perlin_v_lora(hidden_states)), n_rep)
            q_a, k_a, v_a, q_s, k_s = q, k, v, q, k
        if c.sea.lora_in_approx_enabled:
            q_a = q + apply_rope(
                self._q_heads(self.perlin_q_atten_lora(hidden_states)), cos, sin
            ) * scaling
            k_a = k + repeat_kv(
                apply_rope(
                    self._kv_heads(self.perlin_k_atten_lora(hidden_states)), cos, sin
                ),
                n_rep,
            )
            v_a = v + repeat_kv(
                self._kv_heads(self.perlin_v_atten_lora(hidden_states)), n_rep
            )
            q_s = q + apply_rope(
                self._q_heads(self.perlin_q_score_lora(hidden_states)), cos, sin
            ) * scaling
            k_s = k + repeat_kv(
                apply_rope(
                    self._kv_heads(self.perlin_k_score_lora(hidden_states)), cos, sin
                ),
                n_rep,
            )
        out: SeaAttentionOutput = self.perlin(
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
        return self.o_proj(out.context_layer), out.loss, None

    def init_state(self, batch: int, max_len: int, dtype=jnp.float32):
        assert self.cfg.attention_method == "perlin"
        return self.perlin.init_state(batch, max_len, dtype)

    def decode(self, hidden_states: jnp.ndarray, state, cos, sin):
        """One decode step; cos/sin are this step's rotary tables
        ((N,1,D)-broadcastable). The cache stores roped, GQA-expanded keys."""
        q, k, v = self._qkv(hidden_states, cos, sin)
        out, new_state = self.perlin.decode(q, k, v, state)
        return self.o_proj(out), new_state

    def decode_paged(self, hidden_states, state, pool_k, pool_v, pages, cos, sin):
        q, k, v = self._qkv(hidden_states, cos, sin)
        out, new_state, pool_k, pool_v = self.perlin.decode_paged(
            q, k, v, state, pool_k, pool_v, pages
        )
        return self.o_proj(out), new_state, pool_k, pool_v

    def prefill(self, hidden_states: jnp.ndarray, bundle, max_len: int):
        """Parallel prompt prefill (see OptAttention.prefill): one batched
        SEA forward for the output + the decode cache built in parallel.
        The cache stores roped, GQA-expanded keys, same as `decode`."""
        causal_mask, cos, sin = bundle
        q, k, v = self._qkv(hidden_states, cos, sin)
        # fused benchmark path for the prefill outputs: same mask
        # semantics as the train path (<=2e-4, tests/test_fused_path.py)
        # and O(T*k) instead of the dense O(T^2) resize — the speedup
        # grows with prompt length
        out = self.perlin(
            q, k, v, q, k, v, q, k, causal_mask,
            benchmarking=self.cfg.sea.use_pallas
        )
        state = self.perlin.prefill_state(q, k, v, max_len)
        return self.o_proj(out.context_layer), state


class LlamaDecoderLayer(nn.Module):
    """Pre-RMSNorm decoder layer (input_layernorm -> attn -> residual ->
    post_attention_layernorm -> SwiGLU -> residual)."""

    cfg: LlamaConfig

    def setup(self):
        c = self.cfg
        self.self_attn = LlamaAttention(c, name="self_attn")
        self.input_layernorm = nn.RMSNorm(epsilon=c.rms_norm_eps, name="input_layernorm")
        self.post_attention_layernorm = nn.RMSNorm(
            epsilon=c.rms_norm_eps, name="post_attention_layernorm"
        )
        self.mlp = LlamaMLP(c, name="mlp")

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        bundle,
        teacher: Optional[LayerTeacherOutput] = None,
        *,
        benchmarking: bool = False,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        c = self.cfg
        in_dtype = hidden_states.dtype
        if c.sea.layerwise and training:
            hidden_states = jax.lax.stop_gradient(hidden_states)
        residual = hidden_states
        h, aux_loss, capture = self.self_attn(
            self.input_layernorm(hidden_states),
            bundle,
            teacher,
            benchmarking=benchmarking,
            training=training,
            rng=rng,
        )
        h = residual + h
        h = h + self.mlp(self.post_attention_layernorm(h))
        return h.astype(in_dtype), aux_loss, capture

    def decode(self, hidden_states: jnp.ndarray, state, cos, sin):
        residual = hidden_states
        h, new_state = self.self_attn.decode(
            self.input_layernorm(hidden_states), state, cos, sin
        )
        h = residual + h
        h = h + self.mlp(self.post_attention_layernorm(h))
        return h, new_state

    def decode_paged(self, hidden_states, state, pool_k, pool_v, pages, cos, sin):
        residual = hidden_states
        h, new_state, pool_k, pool_v = self.self_attn.decode_paged(
            self.input_layernorm(hidden_states), state, pool_k, pool_v, pages, cos, sin
        )
        h = residual + h
        h = h + self.mlp(self.post_attention_layernorm(h))
        return h, new_state, pool_k, pool_v

    def prefill(self, hidden_states: jnp.ndarray, bundle, max_len: int):
        residual = hidden_states
        h, state = self.self_attn.prefill(
            self.input_layernorm(hidden_states), bundle, max_len
        )
        h = residual + h
        h = h + self.mlp(self.post_attention_layernorm(h))
        return h, state


class _LlamaScanBody(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, carry, bundle):
        h, aux, _ = LlamaDecoderLayer(self.cfg, name="layer")(
            carry, bundle, benchmarking=self.cfg.scan_benchmarking
        )
        return h, (aux if aux is not None else jnp.float32(0.0))


class LlamaModel(nn.Module):
    """LLaMA decoder stack; exposes `embed`/`layer`/`finalize` with the
    position bundle so the generic KD drivers interleave teacher and
    student layer-by-layer exactly as for OPT."""

    cfg: LlamaConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        if c.external_layers:
            self.layers = []
        elif c.scan_layers:
            body = (
                nn.remat(_LlamaScanBody, prevent_cse=False)
                if c.scan_remat
                else _LlamaScanBody
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
                LlamaDecoderLayer(c, name=f"layers_{i}") for i in range(c.num_layers)
            ]
        self.norm = nn.RMSNorm(epsilon=c.rms_norm_eps, name="norm")

    def embed(self, input_ids: jnp.ndarray, attention_mask_1d: jnp.ndarray):
        c = self.cfg
        N, T = input_ids.shape
        h = self.embed_tokens(input_ids).astype(jnp.dtype(c.compute_dtype))
        causal_mask = build_causal_mask(attention_mask_1d, T, h.dtype)
        # left-padding-aware positions, like OPT's cumsum positions
        positions = jnp.maximum(
            jnp.cumsum(attention_mask_1d, axis=1) * attention_mask_1d - 1, 0
        )
        cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta)
        # (N, T, D) -> (N, 1, T, D) broadcasting over heads
        return h, (causal_mask, cos[:, None], sin[:, None])

    def finalize(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.norm(h)

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
        h, bundle = self.embed(input_ids, attention_mask_1d)
        if self.cfg.scan_layers:
            assert teacher_outputs is None and not output_hidden_states
            h, aux_stack = self.scanned_layers(h, bundle)
            return self.finalize(h), None, [], jnp.mean(aux_stack)
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
                bundle,
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


class LlamaForCausalLM(nn.Module):
    """Separate (untied) LM head, LLaMA convention."""

    cfg: LlamaConfig

    def setup(self):
        self.model = LlamaModel(self.cfg, name="model")
        self.lm_head = nn.Dense(self.cfg.vocab_size, use_bias=False, name="lm_head")

    def logits(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.lm_head(h)

    def init_decode_states(self, batch: int, max_len: int, dtype=jnp.float32):
        return [
            layer.self_attn.init_state(batch, max_len, dtype)
            for layer in self.model.layers
        ]

    def _step_rope(self, position):
        pos = OptForCausalLM._decode_pos(position)[..., 0]  # () -> (1,) | (N,)
        cos, sin = rope_cos_sin(
            jnp.atleast_1d(pos), self.cfg.head_dim, self.cfg.rope_theta
        )
        # (N|1, D) -> (N|1, 1, 1, D) broadcasting over (N, H, 1, D)
        return cos[:, None, None], sin[:, None, None]

    def decode_step(self, token_ids: jnp.ndarray, position: jnp.ndarray, states):
        """One autoregressive step; position () or (N,) 0-based drives RoPE
        (OPT uses it for its learned positional embedding instead)."""
        h = self.model.embed_tokens(token_ids)
        cos, sin = self._step_rope(position)
        new_states = []
        for layer, st in zip(self.model.layers, states):
            h, st2 = layer.decode(h, st, cos, sin)
            new_states.append(st2)
        return self.logits(self.model.finalize(h)), new_states

    def prefill_parallel(
        self, prompt_ids: jnp.ndarray, max_len: int, last_only: bool = False
    ):
        """One batched forward over the prompt -> (logits, decode states)
        (see OptForCausalLM.prefill_parallel)."""
        N, P = prompt_ids.shape
        mask1d = jnp.ones((N, P), jnp.int32)
        h, bundle = self.model.embed(prompt_ids, mask1d)
        states = []
        for layer in self.model.layers:
            h, st = layer.prefill(h, bundle, max_len)
            states.append(st)
        h = self.model.finalize(h)
        if last_only:
            h = h[:, -1:]
        return self.logits(h), states

    def decode_step_paged(self, token_ids, position, states, pool_k, pool_v, pages):
        h = self.model.embed_tokens(token_ids)
        cos, sin = self._step_rope(position)
        new_states = []
        for li, (layer, st) in enumerate(zip(self.model.layers, states)):
            h, st2, new_pk, new_pv = layer.decode_paged(
                h, st, pool_k[li], pool_v[li], pages, cos, sin
            )
            pool_k = pool_k.at[li].set(new_pk)
            pool_v = pool_v.at[li].set(new_pv)
            new_states.append(st2)
        return self.logits(self.model.finalize(h)), new_states, pool_k, pool_v

    # the generation loops only touch cfg.vocab_size / init_decode_states /
    # decode_step / prefill_parallel, which this class provides with
    # identical signatures — reuse OPT's lax.scan drivers directly
    _prefill = OptForCausalLM._prefill
    generate_greedy = OptForCausalLM.generate_greedy
    generate_beam = OptForCausalLM.generate_beam
    generate_sample = OptForCausalLM.generate_sample

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
            from .opt import chunked_cross_entropy_shifted

            # materialise the (untied) head params without the full
            # (N, T, V) projection, then stream the CE per chunk
            _ = self.lm_head(h[:, :1])
            proj = self.lm_head.variables["params"]["kernel"]  # (E, V)
            loss = chunked_cross_entropy_shifted(h, proj, labels, logit_chunk)
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
