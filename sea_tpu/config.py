"""Immutable configuration for SEA attention on TPU.

Replaces the reference's process-global registry
(`/root/reference/src/models/perlin_attention/config.py:12-61`) with a frozen
dataclass that is passed explicitly and hashed as a static argument under
`jax.jit`.  All reference knobs that affect the published configs are kept;
GPU-only or dead knobs (reformer_n_hashs, random_lookup, compile) are dropped
or stubbed.  TPU-specific fields (static nnz budget, block sizes) are new.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SeaConfig:
    """Static configuration of a SEA (perlin) attention module.

    Mirrors `PerlinAttentionConfig` (reference `config.py:12-41`) where the
    knob is load-bearing; defaults follow the reference defaults.
    """

    # --- core attention geometry -------------------------------------------------
    num_heads: int = 12
    head_dim: int = 64
    # compressed predictor width T_M (reference: attention_predictor_length)
    predictor_length: int = 128
    # per-query retained budget k (reference: k)
    k: int = 7
    k_oversample: float = 1.0
    # 'causal_batch' | 'batch' | 'head' | 'query'  (reference: k_flatten_dim)
    k_flatten_dim: str = "causal_batch"
    causal: bool = False

    # --- predictor ----------------------------------------------------------------
    # 'mlp' | 'comp' (reference: attention_predictor_method)
    predictor_method: str = "mlp"
    # 'performer' | 'cosformer' (reference: attention_predictor_backend)
    predictor_backend: str = "performer"
    performer_nb_factor: int = 1
    enc_per_layer: bool = False
    # number of channel splits feeding the CNN (reference: dec_row_splits;
    # 4 for non-causal, PERLIN_HOTFIX_OPT_INNER_CH=2 for causal)
    # chosen automatically from `causal` when None
    dec_row_splits: Optional[int] = None
    # codebook predictor ('comp') knobs
    comp_book_size: int = 8
    comp_patch_size: int = 16
    comp_patch_count: int = 16
    # deeper 3-conv causal CNN stack (reference env PERLIN_HOTFIX_OPT_DEEPER,
    # attention.py:252-271)
    cnn_deeper: bool = False
    # run the causal predictor CNN in row chunks of this size (0 = whole T):
    # the stack's causal receptive field is 4 rows per dilated conv, so
    # overlap-discard chunking is exact; at T >= 64k the unchunked conv's
    # XLA small-channel padding requests ~31 GB HBM (docs/kernel_design.md
    # "Sequence-length ceiling") while chunks bound it by chunk/T
    cnn_row_chunk: int = 0
    # distill against the student's own detached dense scores instead of a
    # teacher (reference env KD_SELF_TEACHER, attention.py:370-377)
    kd_self_teacher: bool = False

    # --- output mixing --------------------------------------------------------
    partial_attention_scaler: bool = True
    context_output_method: str = "mix"  # 'mix' | 'norm'
    out_norm: bool = False
    out_add_performer_context: bool = False

    # --- lora / layerwise (reference: lora_*, layerwise) ----------------------
    lora_enabled: bool = False
    lora_in_approx_enabled: bool = False
    lora_r: int = 32
    layerwise: bool = False

    # --- decode cache ---------------------------------------------------------
    use_cache: bool = False

    # --- runtime-k override (reference env DYNAMIC_K, attention.py:348-351) ----
    dynamic_k: int = 0
    # predictor query subsampling (reference env QUERY_SKIPS, attention.py:598-644)
    query_skips: int = 1

    # --- TPU-specific ---------------------------------------------------------
    # max sequence for learned causal identity-value embedding
    # (reference: v_eye_learned_causal sized max_position_embeddings)
    max_position_embeddings: int = 2048
    # static nnz budget per query row in the uniform-CSR sparse path; when None
    # derived from k/predictor_length/seq at trace time (see `max_nnz_for`)
    max_nnz: Optional[int] = None
    # fused-kernel query block size override; None = auto (largest of
    # 512/256/128 dividing the padded sequence)
    block_q: Optional[int] = None
    # use the fused pallas sparse kernels. False routes benchmarking through
    # the uniform-CSR jnp chain — bit-parity with the reference's Triton
    # expansion semantics, but gather-bound on TPU: a DEBUG/PARITY path,
    # never a production fallback (no config silently lands here; the fused
    # path covers every canonical configuration)
    use_pallas: bool = True
    # task-only training (no KD truth tensors) through the differentiable
    # fused kernel (custom_vjp flash backward) instead of the dense O(T^2)
    # resize+softmax — the long-context fine-tuning path
    use_fused_train: bool = False

    @property
    def effective_k(self) -> int:
        return self.dynamic_k if self.dynamic_k > 0 else self.k

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def nb_features(self) -> int:
        """FAVOR+ feature count (reference attention.py:156-158)."""
        d = self.head_dim
        return int(d * math.log(d) / self.performer_nb_factor)

    @property
    def splits(self) -> int:
        if self.dec_row_splits is not None:
            return self.dec_row_splits
        return 2 if self.causal else 4

    @property
    def dec_row_down_scale(self) -> int:
        # reference attention.py:201 (non-causal: 2), :243 (causal: 4)
        return 4 if self.causal else 2

    def max_nnz_for(self, t_src: int) -> int:
        """Static per-row nnz budget of the uniform CSR mask.

        The reference's ragged bound is H*(k + ceil(T_SRC/T_M))
        (`causal_resize_m_to_t.py:947-950`); we pad with one extra run per
        head and round up to a lane multiple so block shapes stay aligned.
        """
        if self.max_nnz is not None:
            return self.max_nnz
        k = math.ceil(self.effective_k * self.k_oversample)
        t_m = self.predictor_length
        # Worst case over rows of width w: alive pixels <= round(H*k*T_M/w)
        # and run length <= min(ceil(w/T_M), k), giving
        # min(H*w, H*k*(1 + T_M/w)*...) — maximized near w = sqrt(k*T_M) at
        # H*sqrt(k*T_M), and bounded by H*(2k + ceil(T_SRC/T_M)) for w >= T_M.
        raw = self.num_heads * max(
            math.ceil(math.sqrt(k * t_m)) + 1,
            2 * k + math.ceil(t_src / t_m) + 1,
        )
        return ((raw + 127) // 128) * 128

    def validate(self) -> "SeaConfig":
        if self.causal:
            assert self.k_flatten_dim == "causal_batch", (
                "causal SEA requires k_flatten_dim='causal_batch' "
                "(reference config.py:44-47)"
            )
        assert self.predictor_method in ("mlp", "comp")
        assert self.predictor_backend in ("performer", "cosformer")
        assert self.context_output_method in ("mix", "norm")
        assert self.k_flatten_dim in ("causal_batch", "batch", "head", "query")
        if self.out_add_performer_context:
            # the performer context has 2D channels and cannot be added to
            # the D-channel output — the reference raises the same way
            # (attention.py:1301-1305 'performer context hidden size is
            # modified')
            raise ValueError(
                "out_add_performer_context is rejected for the same reason "
                "the reference raises: the performer context carries 2*D "
                "channels (identity ‖ v) and cannot be residually added"
            )
        return self


# Canonical configs from BASELINE.md / reference README.md:59,73
def opt_config(**kw) -> SeaConfig:
    base = dict(
        num_heads=12,
        head_dim=64,
        predictor_length=256,
        k=64,
        performer_nb_factor=8,
        causal=True,
        k_flatten_dim="causal_batch",
        max_position_embeddings=2048,
    )
    base.update(kw)
    return SeaConfig(**base).validate()


def bert_config(**kw) -> SeaConfig:
    base = dict(
        num_heads=12,
        head_dim=64,
        predictor_length=128,
        k=64,
        performer_nb_factor=1,
        causal=False,
        k_flatten_dim="causal_batch",
    )
    base.update(kw)
    return SeaConfig(**base).validate()
