"""Pallas TPU kernels (the reference's Triton/Numba layer, redesigned)."""

from .block_sparse import (
    active_tile_lists,
    dense_reference,
    pack_alive_bits,
    sea_block_sparse_attention,
)

__all__ = [
    "active_tile_lists",
    "dense_reference",
    "pack_alive_bits",
    "sea_block_sparse_attention",
]
