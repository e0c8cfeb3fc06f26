"""Model integration layer: SEA attention core + student/teacher models."""

from .attention import SeaAttention, SeaAttentionOutput

__all__ = ["SeaAttention", "SeaAttentionOutput"]
