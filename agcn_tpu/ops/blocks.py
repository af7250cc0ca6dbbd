"""Auxiliary layer blocks: ASPP, BiFPN, series decomposition.

Parity targets: reference model/layers/module/aspp.py (atrous spatial
pyramid pooling over time), bifpn.py (EfficientDet-style weighted
bidirectional FPN over the 3 GCN feature levels),
series_decomposition.py (Autoformer moving-average trend/seasonal split).
All operate on (B, T, V, C) channels-last tensors.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from agcn_tpu.ops.norm import BatchNorm
from agcn_tpu.ops import initializers as init


class ASPP(nn.Module):
    """Atrous pyramid over the time axis: parallel dilated 3x1 convs (+1x1
    and global-pool branches), concatenated and projected."""

    out_channels: int
    dilations: Sequence[int] = (1, 3, 5)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        branches = []
        # 1x1 branch
        y = nn.Dense(self.out_channels, use_bias=self.use_bias,
                     kernel_init=init.kaiming_normal_fan_out,
                     name="branch_1x1")(x)
        branches.append(nn.relu(BatchNorm(name="bn_1x1")(y, train)))
        for d in self.dilations:
            k = 1 if d == 1 else 3
            y = nn.Conv(self.out_channels, kernel_size=(k, 1),
                        kernel_dilation=(d, 1), padding="SAME",
                        use_bias=self.use_bias,
                        kernel_init=init.kaiming_normal_fan_out,
                        name=f"branch_d{d}")(x)
            branches.append(nn.relu(BatchNorm(name=f"bn_d{d}")(y, train)))
        # global pooling branch over time
        g = x.mean(axis=1, keepdims=True)
        g = nn.Dense(self.out_channels, use_bias=self.use_bias,
                     kernel_init=init.kaiming_normal_fan_out,
                     name="branch_pool")(g)
        g = nn.relu(g)
        branches.append(jnp.broadcast_to(
            g, branches[0].shape[:1] + (x.shape[1],) + branches[0].shape[2:]))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Dense(self.out_channels, use_bias=self.use_bias,
                     kernel_init=init.kaiming_normal_fan_out,
                     name="project")(y)
        return nn.relu(BatchNorm(name="bn_out")(y, train))


class BiFPNBlock(nn.Module):
    """One weighted bidirectional fusion pass over L feature levels."""

    dim: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        n = len(feats)
        w_td = self.param("w_td", nn.initializers.ones, (n - 1, 2))
        w_bu = self.param("w_bu", nn.initializers.ones, (n - 1, 3))

        def conv(name, x):
            y = nn.Dense(self.dim, use_bias=False,
                         kernel_init=init.kaiming_normal_fan_out,
                         name=name)(x)
            return nn.relu(BatchNorm(name=f"{name}_bn")(y, train))

        # top-down
        td = [None] * n
        td[-1] = feats[-1]
        for i in range(n - 2, -1, -1):
            w = nn.relu(w_td[i])
            w = w / (w.sum() + self.eps)
            td[i] = conv(f"td{i}", w[0] * feats[i] + w[1] * td[i + 1])
        # bottom-up
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            w = nn.relu(w_bu[i - 1])
            w = w / (w.sum() + self.eps)
            skip = feats[i] if i < n - 1 else feats[i]
            out[i] = conv(f"bu{i}",
                          w[0] * feats[i] + w[1] * td[i] + w[2] * out[i - 1])
        return out


class BiFPN(nn.Module):
    """Project L levels to a common width, then stacked BiFPN blocks
    (reference bifpn.py)."""

    dim: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        feats = [
            nn.relu(BatchNorm(name=f"in_bn{i}")(
                nn.Dense(self.dim, use_bias=False,
                         kernel_init=init.kaiming_normal_fan_out,
                         name=f"in_proj{i}")(f), train))
            for i, f in enumerate(feats)
        ]
        for l in range(self.num_layers):
            feats = BiFPNBlock(self.dim, name=f"block{l + 1}")(feats, train)
        return feats


class SeriesDecomposition(nn.Module):
    """Moving-average trend/seasonal split along time
    (reference series_decomposition.py)."""

    kernel_size: int = 3

    def __call__(self, x: jnp.ndarray):
        k = self.kernel_size
        pad_front = (k - 1) // 2
        pad_back = k - 1 - pad_front
        padded = jnp.concatenate(
            [jnp.repeat(x[:, :1], pad_front, axis=1), x,
             jnp.repeat(x[:, -1:], pad_back, axis=1)], axis=1)
        # moving average via cumulative sums (exact, no conv needed)
        cs = jnp.cumsum(padded, axis=1)
        zeros = jnp.zeros_like(cs[:, :1])
        cs = jnp.concatenate([zeros, cs], axis=1)
        trend = (cs[:, k:] - cs[:, :-k]) / k
        seasonal = x - trend
        return seasonal, trend
