"""Normalization layers: BatchNorm (+cross-replica sync, +Ghost splits).

A single BatchNorm implementation covers the reference's three variants:

- plain BatchNorm1d/2d (torch semantics: biased batch var for
  normalization, unbiased var folded into running stats, momentum 0.1),
- SyncBatchNorm under data parallelism (reference utils/processor.py:295)
  via `axis_name` — batch statistics are psum-reduced across the mesh axis
  instead of NCCL SyncBN,
- GhostBatchNorm (reference model/layers/module/ghostbatchnorm.py) via
  `splits` — per-split statistics at train time, merged running stats.

Channels-last: statistics reduce over every axis except the last. This is
the TPU-native layout (C maps to vector lanes; the affine transform fuses
into neighboring matmuls under XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Torch-semantics batch normalization over the trailing channel axis.

    Attributes:
      momentum: torch convention — running = (1-m)*running + m*batch.
      scale_init_value: initial gamma (the reference initializes the last
        GCN BN to 1e-6, agcn.py:88).
      axis_name: if set, sync batch statistics across this mesh axis.
      splits: if >1, Ghost BatchNorm with this many virtual batches.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init_value: float = 1.0
    axis_name: Optional[str] = None
    splits: int = 1
    dtype: Optional[jnp.dtype] = None
    # BN-folding support (utils/bn_fold.py): the fold absorbs this BN's
    # eval affine into the adjacent conv and neutralizes the stats; with
    # this flag the op is skipped entirely at eval so the compiled
    # program carries zero BN work (params stay declared so the folded
    # variables tree matches). Training is unaffected.
    identity_at_eval: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param(
            "scale", lambda k, s: jnp.full(s, self.scale_init_value,
                                           jnp.float32), (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        if not train and self.identity_at_eval:
            return x

        def affine_apply(mean, var):
            # Folded per-channel affine: y = x*a + b with fp32 a/b.
            # One pass over the (possibly bf16) activation — the
            # upcast happens in-register inside the fused loop instead
            # of materializing an fp32 copy (round-3 PERF.md).
            a = scale * jax.lax.rsqrt(var + self.epsilon)
            b = bias - mean * a
            return (x * a + b).astype(x.dtype)

        if not train:
            return affine_apply(ra_mean.value, ra_var.value)

        compute = x.astype(jnp.float32)
        red_axes = tuple(range(x.ndim - 1))

        if self.splits > 1:
            # Ghost BN: virtual batches with STRIDED membership — split s
            # holds samples {s, S+s, 2S+s, ...}, matching the reference's
            # view(-1, C*splits, ...) trick (ghostbatchnorm.py:100-105).
            n = x.shape[0]
            assert n % self.splits == 0, (
                f"batch {n} not divisible by gbn splits {self.splits}")
            xs = compute.reshape((n // self.splits, self.splits)
                                 + x.shape[1:])
            g_axes = (0,) + tuple(a + 1 for a in red_axes[1:])
            mean_s = jnp.mean(xs, axis=g_axes)          # (S, C)
            mean2_s = jnp.mean(jnp.square(xs), axis=g_axes)
            var_s = mean2_s - jnp.square(mean_s)
            count = xs.size // (self.splits * xs.shape[-1])
            # normalize each split with its own stats
            stat_shape = ((1, self.splits) + (1,) * (x.ndim - 2)
                          + (xs.shape[-1],))
            mean_b = mean_s.reshape(stat_shape)
            var_b = var_s.reshape(stat_shape)
            y = (xs - mean_b) * jax.lax.rsqrt(var_b + self.epsilon)
            y = y.reshape(x.shape)
            # merged running stats = mean over splits (reference
            # ghostbatchnorm.py:26-38 merges per-split stats at eval)
            mean = jnp.mean(mean_s, axis=0)
            var = jnp.mean(var_s, axis=0)
            unbiased = var * count / max(count - 1, 1)
        else:
            if self.axis_name is None:
                # dtype=f32 accumulates the reductions in fp32 without a
                # materialized fp32 activation copy
                mean = jnp.mean(x, axis=red_axes, dtype=jnp.float32)
                mean2 = jnp.mean(jnp.square(compute), axis=red_axes)
                count = x.size // x.shape[-1]
            else:
                # SyncBN: reduce sums and counts across the mesh axis.
                local_sum = jnp.sum(compute, axis=red_axes)
                local_sum2 = jnp.sum(jnp.square(compute), axis=red_axes)
                local_count = jnp.array(x.size // x.shape[-1], jnp.float32)
                total = jax.lax.psum(
                    jnp.concatenate([local_sum, local_sum2,
                                     local_count[None]]),
                    axis_name=self.axis_name)
                count = total[-1]
                mean = total[:x.shape[-1]] / count
                mean2 = total[x.shape[-1]:-1] / count
            var = mean2 - jnp.square(mean)
            unbiased = var * count / jnp.maximum(count - 1, 1)

            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
            return affine_apply(mean, var)

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased

        return (y * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis (torch nn.LayerNorm semantics)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
