"""Convolution wrappers for the (B, T, V, C) channels-last layout.

The reference's temporal units are kx1 Conv2d over (T, V) grids (reference
model/architecture/aagcn/agcn.py:36-50); here they map onto
`lax.conv_general_dilated` in NHWC so XLA tiles them onto the MXU directly.
1x1 convs are expressed as Dense matmuls — on TPU a pointwise conv IS a
matmul, and writing it as one lets XLA fuse epilogues into it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from agcn_tpu.ops import initializers as init


class PointwiseConv(nn.Module):
    """1x1 convolution == per-position dense projection on channels."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = init.kaiming_normal_fan_out
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class TemporalConv(nn.Module):
    """kx1 convolution along time for (B, T, V, C) tensors.

    Matches reference unit_tcn's conv (agcn.py:40-41): kernel (k, 1),
    stride (s, 1), symmetric time padding (k-1)/2 when `pad`.
    """

    features: int
    kernel_size: int = 9
    stride: int = 1
    pad: bool = True
    use_bias: bool = True
    kernel_init: Callable = init.kaiming_normal_fan_out
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NOTE: stride-1-then-subsample is 12x faster than the strided
        # conv in ISOLATED vjp benches (43 -> 3.5 ms) but LOSES in the
        # full train step (278.5 -> 262.7 seq/s) — XLA already fuses the
        # in-model strided backward well; keep the native strided conv
        # (PERF.md round 2).
        padding = ((self.kernel_size - 1) // 2,) * 2 if self.pad else (0, 0)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding=(padding, (0, 0)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
