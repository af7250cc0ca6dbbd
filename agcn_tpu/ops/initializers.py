"""Parameter initializers matching the reference's training dynamics.

The reference relies on specific inits for convergence (reference
model/architecture/aagcn/agcn.py:17-33, aagcn.py:23-39): He-normal fan-out
for convs, a branch-scaled normal for the per-subset output projections,
constant-scale BN (including the 1e-6 last-BN trick), and a class-scaled
normal for the classifier head.

Flax kernel layouts: conv kernels are (kh, kw, in, out); dense kernels are
(in, out). PyTorch fan conventions are mapped onto those layouts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import random


def _conv_fans(shape):
    if len(shape) == 2:  # dense (in, out)
        receptive = 1
        fan_in, fan_out = shape
    else:  # conv (spatial..., in, out)
        receptive = int(np.prod(shape[:-2]))
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    return fan_in, fan_out, receptive


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """He normal, fan_out mode (reference agcn.py:26-28 conv_init)."""
    _, fan_out, _ = _conv_fans(shape)
    std = float(np.sqrt(2.0 / fan_out))
    return random.normal(key, shape, dtype) * std


def conv_branch_init(branches: int):
    """Branch-scaled normal for subset output projections.

    std = sqrt(2 / (out * in * kh * branches)), matching reference
    agcn.py:17-23 where the fan product is weight.size(0)*size(1)*size(2).
    """

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:
            fan_in, fan_out = shape
            kh = 1
        else:
            fan_in, fan_out = shape[-2], shape[-1]
            kh = shape[0]
        std = float(np.sqrt(2.0 / (fan_out * fan_in * kh * branches)))
        return random.normal(key, shape, dtype) * std

    return init


def fc_init(num_class: int):
    """Classifier init: normal(0, sqrt(2/num_class)) (reference agcn.py:157)."""

    def init(key, shape, dtype=jnp.float32):
        std = float(np.sqrt(2.0 / num_class))
        return random.normal(key, shape, dtype) * std

    return init


def torch_default_kernel(key, shape, dtype=jnp.float32):
    """PyTorch's default Conv/Linear kernel init.

    kaiming_uniform(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    fan_in, _, _ = _conv_fans(shape)
    bound = float(1.0 / np.sqrt(fan_in))
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in: int):
    """PyTorch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = float(1.0 / np.sqrt(fan_in))
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal(key, shape, dtype=jnp.float32):
    """Glorot normal (reference aagcn.py:68 SpatialAttention)."""
    fan_in, fan_out, _ = _conv_fans(shape)
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return random.normal(key, shape, dtype) * std


def kaiming_normal_fan_in(key, shape, dtype=jnp.float32):
    """He normal, fan_in mode (reference aagcn.py:104 ChannelAttention fc1)."""
    fan_in, _, _ = _conv_fans(shape)
    std = float(np.sqrt(2.0 / fan_in))
    return random.normal(key, shape, dtype) * std


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
