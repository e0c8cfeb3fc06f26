"""LoRA adapters (reference `src/models/common/lora.py:6-97`):
delta = x @ A @ B with A kaiming-initialised, B zero-initialised, so the
adapted projection starts exactly at the frozen base. The reference splits
`lora_forward_linear` / `lora_forward_lora` so the frozen linear output is
computed once and shared between the main and estimator branches
(`self_attention.py:95-155`) — here the same sharing falls out of XLA CSE,
so a single module suffices.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class LoraDelta(nn.Module):
    """The low-rank delta alone: x (..., in) -> (..., out)."""

    features: int
    rank: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        bound = float(np.sqrt(6.0 / in_dim))  # kaiming-uniform fan_in
        a = self.param(
            "lora_a",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (in_dim, self.rank),
        )
        b = self.param(
            "lora_b", nn.initializers.zeros, (self.rank, self.features)
        )
        return ((x @ a) @ b).astype(x.dtype)


class LoraDense(nn.Module):
    """Dense + optional LoRA delta (enabled => base output + x A B)."""

    features: int
    rank: int = 32
    enabled: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.features, name="base")(x)
        if self.enabled:
            y = y + LoraDelta(self.features, self.rank, name="lora")(x)
        return y
