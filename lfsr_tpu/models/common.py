"""Shared flax building blocks for the LF-SR model zoo.

All models work in NHWC (TPU-native layout); the engine converts at the
boundary. Convolutions use explicit torch-style symmetric padding so
receptive fields match the reference architectures exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

lrelu = partial(nn.leaky_relu, negative_slope=0.1)
lrelu02 = partial(nn.leaky_relu, negative_slope=0.2)


def conv(
    features: int,
    kernel: int | Sequence[int] = 3,
    stride: int | Sequence[int] = 1,
    dilation: int | Sequence[int] = 1,
    padding: int | Sequence[int] | None = None,
    use_bias: bool = True,
    groups: int = 1,
    name: str | None = None,
    dtype=None,
) -> nn.Conv:
    """nn.Conv with torch Conv2d-style integer padding semantics."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if padding is None:
        padding = (0, 0)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(int(p), int(p)) for p in padding]
    return nn.Conv(
        features,
        kernel_size=tuple(kernel),
        strides=tuple(stride),
        kernel_dilation=tuple(dilation),
        padding=pad,
        use_bias=use_bias,
        feature_group_count=groups,
        name=name,
        dtype=dtype,
    )


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle on NHWC: [B,H,W,C*r^2] -> [B,H*r,W*r,C].

    Channel ordering follows torch (out channel c reads input channel
    c*r*r + i*r + j) so reparameterized/ported weights stay compatible.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def pixel_shuffle_1d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """1-D pixel shuffle on the W axis (DistgSSR.py:114-131 semantics):
    NHWC [B,H,W,r*C] -> [B,H,W*r,C] with channel index = f*C + c."""
    b, h, w, rc = x.shape
    c = rc // r
    return x.reshape(b, h, w, r, c).reshape(b, h, w * r, c)


class ChannelAttention(nn.Module):
    """Squeeze-excite channel attention (RCAN CALayer, RCAN.py:57-73)."""

    hidden: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv(self.hidden, 1, dtype=self.dtype)(y)
        y = lrelu(y)
        y = conv(c, 1, dtype=self.dtype)(y)
        return x * nn.sigmoid(y)
