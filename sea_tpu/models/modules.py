"""Predictor CNN building blocks (TPU/flax).

Reimplements the semantics of reference
`src/models/perlin_attention/modules.py:12-193`:
  * `interpolate` — bilinear upscale / area (adaptive-average) downscale;
  * `CausalConv2d` — a (2k-1, k) kernel whose bottom half is masked to zero
    plus symmetric height padding of (k-1)*dilation, so convolution along
    the query-time axis never reads the future (`modules.py:96-192`);
  * `KeepRes` — run a stack then resize back to (H_in, output_width);
  * `UpsampleFP32` — nearest-neighbour integer upsample computed in fp32
    (`modules.py:77-92`);
  * `ResBlock` / `Residual`.

The fp16/fp32 dtype islands of the reference exist to dodge CUDA op support
holes; on TPU we simply compute resizes in fp32 and cast back.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Adaptive-average-pooling matrix (out_size, in_size): row i averages
    input cells [floor(i*in/out), ceil((i+1)*in/out)) uniformly — the
    semantics of torch F.interpolate(mode='area')."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        s = int(np.floor(i * in_size / out_size))
        e = int(np.ceil((i + 1) * in_size / out_size))
        w[i, s:e] = 1.0 / (e - s)
    return w


def interpolate(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize the last two axes of (..., H, W) to `size`.

    Upscale -> bilinear (half-pixel, align_corners=False); downscale -> area.
    Matches reference `modules.py:12-31` mode selection. Always computed in
    fp32 and cast back."""
    *lead, H, W = x.shape
    H2, W2 = size
    if (H, W) == (H2, W2):
        return x
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if H2 != H:
        if H2 < H:
            m = jnp.asarray(_area_matrix(H, H2))
            y = jnp.einsum("oh,...hw->...ow", m, y)
        else:
            y = jax.image.resize(y, (*lead, H2, W), method="linear")
    if W2 != W:
        if W2 < W:
            m = jnp.asarray(_area_matrix(W, W2))
            y = jnp.einsum("ow,...hw->...ho", m, y)
        else:
            y = jax.image.resize(y, (*y.shape[:-1], W2), method="linear")
    return y.astype(dtype)


def upsample_nearest(x: jnp.ndarray, scale: Tuple[int, int]) -> jnp.ndarray:
    """Nearest integer upsample of the last two axes, computed in fp32
    (reference UpsampleFP32, `modules.py:77-92`)."""
    sh, sw = scale
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if sh != 1:
        y = jnp.repeat(y, sh, axis=-2)
    if sw != 1:
        y = jnp.repeat(y, sw, axis=-1)
    return y.astype(dtype)


class CausalConv2d(nn.Module):
    """Conv over (N, C, T, W) maps; when `causal`, output row t only reads
    input rows <= t (kernel height 2k-1, bottom half zeroed, height padding
    (k-1)*dilation both sides — reference `modules.py:96-192`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: Any = 1
    padding: int = 0
    dilation: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kh = 2 * k - 1 if self.causal else k
        d = self.dilation if isinstance(self.dilation, int) else self.dilation[0]
        # torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
        fan_in = self.in_channels * k * k
        bound = 1.0 / np.sqrt(fan_in)
        init = lambda key, shape, dtype: jax.random.uniform(
            key, shape, dtype, -bound, bound
        )
        weight = self.param(
            "weight", init, (self.out_channels, self.in_channels, kh, k), jnp.float32
        )
        bias = self.param("bias", init, (self.out_channels,), jnp.float32)
        if self.causal:
            mask = jnp.concatenate(
                [
                    jnp.ones((1, 1, k, k), jnp.float32),
                    jnp.zeros((1, 1, k - 1, k), jnp.float32),
                ],
                axis=2,
            )
            weight = weight * mask
            pad_h = (k - 1) * d
        else:
            pad_h = self.padding
        pad_w = self.padding
        stride = (
            self.stride if isinstance(self.stride, tuple) else (self.stride, self.stride)
        )
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            weight,
            window_strides=stride,
            padding=((pad_h, pad_h), (pad_w, pad_w)),
            rhs_dilation=(d, d),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return (y + bias.reshape(1, -1, 1, 1)).astype(x.dtype)


class KeepRes(nn.Module):
    """Run `layers`, then resize back to the input height and `output_width`
    (reference `modules.py:42-55`)."""

    layers: Sequence[Callable]
    output_width: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h_in = x.shape[-2]
        y = x
        for layer in self.layers:
            y = layer(y)
        w = self.output_width if self.output_width is not None else x.shape[-1]
        return interpolate(y, (h_in, w))


class ChannelSplit(nn.Module):
    """(N, C, H, W) -> (N, C*split, H, W//split) (reference attention.py:124-131)."""

    split: int

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, C, H, W = x.shape
        s = self.split
        y = x.reshape(N, C, H, s, W // s)
        y = jnp.transpose(y, (0, 1, 3, 2, 4))
        return y.reshape(N, C * s, H, W // s)
