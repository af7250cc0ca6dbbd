"""Original SGN (microsoft/SGN), TPU-native.

Functional parity target: reference model/architecture/sgn/archiv/sgn.py
(the verbatim microsoft/SGN model) — the one archived version still
referenced by SHIPPED recipes (config/openpose-b25-j15-nturgbd-cross-view/
train_joint_sgn.yaml and train_joint_aagcn_preprocess_sgn_model.yaml use
`model: model.sgn.SGN`), so it gets a faithful standalone implementation
rather than an approximation through the configurable SGN.

Architecture (archiv/sgn.py:15-105):
- joint ("pos") + velocity ("dif") embeddings: DataNorm over (C*V)
  features, then 1x1 conv (in->64) -> ReLU -> 1x1 (64->c1) -> ReLU
  (:119-143); velocity is the backward difference with a zero at t=0
  (:73-76)
- semantic one-hot embeddings: joint id -> c1 (concatenated with the
  dynamic representation, :84) and frame id -> c3 (added AFTER the GCN
  stack, :89); both are 2-layer MLPs without the input norm (:44-45)
- ONE dense attention matrix G = softmax_w(g1(x) @ g2(x)^T) computed from
  the concatenated input and shared by all three GCN layers (:85-88,
  :199-215)
- gcn_spa: x = W(G @ x) + W1(x), BN, ReLU; the aggregated branch W is
  zero-initialized (:62-64, :184-197)
- frame-level: spatial maxpool, 1x3 temporal conv, BN, ReLU,
  Dropout2d(0.2), 1x1 conv to 2*c3, BN, ReLU (:155-178)
- temporal maxpool -> FC (:92-96)

Layout is channels-last (B, T, V, C) as everywhere in this framework:
the 1x1 convs are MXU matmuls and the one-hot embeddings are computed
once as (V, c1) / (T, c3) tables and broadcast — the reference
materializes (N, V, V, T) one-hot tensors per batch (:40-43); here they
are constants folded by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from agcn_tpu.ops import BatchNorm
from agcn_tpu.ops import initializers as init
from agcn_tpu.ops.gcn import frame_aggregate

C1, C2, C3 = 64, 128, 256


class _Dense(nn.Module):
    """1x1 conv as a Dense matmul with torch Conv2d init semantics:
    kaiming-normal fan-out weights (the reference's init loop,
    archiv/sgn.py:57-60) and torch-default uniform bias."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=init.kaiming_normal_fan_out,
            bias_init=init.torch_default_bias(x.shape[-1])
            if self.use_bias else nn.initializers.zeros,
            name="conv")(x)


class _Embed(nn.Module):
    """embed block (archiv/sgn.py:119-143): [DataNorm] -> 1x1 (in->64) ->
    ReLU -> 1x1 (64->out) -> ReLU. The hidden width is FIXED at 64 in the
    original regardless of the output width."""

    features: int
    use_bias: bool = True
    in_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_norm:
            # norm_data (archiv/sgn.py:108-116): BN1d over the flattened
            # (C*V) features, stats over (B, T); torch feature order is
            # (c, v) because the (B, C, V, T) tensor is viewed as
            # (B, C*V, T).
            b, t, v, c = x.shape
            y = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * v)
            y = BatchNorm(name="in_norm")(y, train)
            x = jnp.transpose(y.reshape(b, t, c, v), (0, 1, 3, 2))
        x = nn.relu(_Dense(64, self.use_bias, name="cnn1")(x))
        x = nn.relu(_Dense(self.features, self.use_bias, name="cnn2")(x))
        return x


class _GCNSpa(nn.Module):
    """gcn_spa (archiv/sgn.py:184-197): W(G @ x) + W1(x) -> BN -> ReLU.
    W is bias-less and ZERO-initialized (:62-64) so each layer starts as
    a pure 1x1 projection of its input."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, g, train: bool = False):
        agg = frame_aggregate(x, g)
        y = nn.Dense(self.features, use_bias=False,
                     kernel_init=nn.initializers.zeros,
                     name="w")(agg)
        y = y + _Dense(self.features, self.use_bias, name="w1")(x)
        return nn.relu(BatchNorm(name="norm")(y, train))


class SGNOriginal(nn.Module):
    """The original microsoft/SGN (reference archiv/sgn.py:14-105)."""

    num_class: int = 60
    num_point: int = 25
    in_channels: int = 3
    seg: int = 20
    use_bias: bool = True
    dropout: float = 0.2  # the reference hardcodes Dropout2d(0.2)
    #                       (archiv/sgn.py:168); knob kept for dynamics
    #                       tests and ablations

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b = x.shape[0]
        if x.ndim == 3:  # (B, T, V*C), joints-major (archiv/sgn.py:70-72)
            x = x.reshape(b, x.shape[1], self.num_point, self.in_channels)
        t, v = x.shape[1], x.shape[2]

        # dynamic representation: position + velocity embeddings
        # (archiv/sgn.py:68-82); velocity zero-padded at the FRONT (:73-76)
        dif = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, 1:] - x[:, :-1]], axis=1)
        pos = _Embed(C1, self.use_bias, in_norm=True,
                     name="pos_embed")(x, train)
        dif = _Embed(C1, self.use_bias, in_norm=True,
                     name="dif_embed")(dif, train)
        dy = pos + dif

        # semantic one-hot embeddings, computed once on identity tables
        # and broadcast (the reference repeats (N, V, V, T) one-hots,
        # archiv/sgn.py:40-45,79-80)
        spa_tab = _Embed(C1, self.use_bias, name="spa_embed")(
            jnp.eye(v)[None, None], train)[0, 0]            # (V, C1)
        tem_tab = _Embed(C3, self.use_bias, name="tem_embed")(
            jnp.eye(t)[None, None], train)[0, 0]            # (T, C3)
        spa = jnp.broadcast_to(spa_tab, (b, t, v, C1))
        tem = jnp.broadcast_to(tem_tab[None, :, None, :], (b, t, v, C3))

        # joint-level module: ONE shared G for all three layers
        # (archiv/sgn.py:84-88); softmax over the SOURCE axis w of
        # out[v] = sum_w G[v, w] x[w] (dim=-1 in compute_g_spa:215)
        y = jnp.concatenate([dy, spa], axis=-1)  # (B, T, V, c2)
        g1 = _Dense(C3, self.use_bias, name="g1")(y)
        g2 = _Dense(C3, self.use_bias, name="g2")(y)
        logits = jnp.einsum("btvc,btwc->btvw", g1, g2)
        g = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        g = g.astype(y.dtype)
        y = _GCNSpa(C2, self.use_bias, name="gcn1")(y, g, train)
        y = _GCNSpa(C3, self.use_bias, name="gcn2")(y, g, train)
        y = _GCNSpa(C3, self.use_bias, name="gcn3")(y, g, train)

        # frame-level module (archiv/sgn.py:90-91, local :155-178)
        y = y + tem
        y = jnp.max(y, axis=2, keepdims=True)  # spatial maxpool (B,T,1,C)
        if t != self.seg:
            # AdaptiveMaxPool2d((1, seg)) window semantics for T != seg
            # (torch window i = [floor(i*T/s), ceil((i+1)*T/s))). The
            # reference CRASHES before reaching this case (seg-sized
            # one-hot tables, archiv/sgn.py:83 — regression-pinned in
            # tests), so this is a graceful generalization, not parity.
            y = jnp.stack(
                [jnp.max(y[:, (i * t) // self.seg:
                           -(-((i + 1) * t) // self.seg)], axis=1)
                 for i in range(self.seg)], axis=1)
        y = nn.Conv(C3, kernel_size=(3, 1), padding=((1, 1), (0, 0)),
                    use_bias=self.use_bias,
                    kernel_init=init.kaiming_normal_fan_out,
                    bias_init=init.torch_default_bias(3 * C3),
                    name="t_cnn1")(y)
        y = nn.relu(BatchNorm(name="t_norm1")(y, train))
        if train and self.dropout > 0.0:
            # Dropout2d: whole channels dropped per sample (:168,175)
            y = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=False, name="t_drop")(y)
        y = _Dense(2 * C3, self.use_bias, name="t_cnn2")(y)
        y = nn.relu(BatchNorm(name="t_norm2")(y, train))

        # classification (archiv/sgn.py:92-96)
        y = jnp.max(y, axis=(1, 2))
        logits = nn.Dense(self.num_class,
                          kernel_init=init.torch_default_kernel,
                          bias_init=init.torch_default_bias(2 * C3),
                          name="fc")(y)
        return logits, g
