"""SEA-TPU sparse attention ops.

Mirror of the reference export surface (`ops/__init__.py:1-7`), TPU-native.
"""

from .masks import (
    causal_topk_masking,
    fp_min_for,
    per_item_top_k,
    resize_from_m_to_t,
    round_half_away,
    topk_mask,
)
from .flat_csr import (
    UniformCsr,
    flat_csr_elmul,
    flat_csr_masked_bmm,
    flat_csr_sdbmm,
    flat_csr_softmax,
    flat_csr_to_dense,
    resize_from_m_to_t_csr,
)

__all__ = [
    "causal_topk_masking",
    "fp_min_for",
    "per_item_top_k",
    "resize_from_m_to_t",
    "round_half_away",
    "topk_mask",
    "UniformCsr",
    "flat_csr_elmul",
    "flat_csr_masked_bmm",
    "flat_csr_sdbmm",
    "flat_csr_softmax",
    "flat_csr_to_dense",
    "resize_from_m_to_t_csr",
]
