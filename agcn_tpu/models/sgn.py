"""SGN — Semantics-Guided Network, TPU-native (v14-style configurable).

Functional parity target: reference model/architecture/sgn/sgn_v14.py and
model/architecture/sgn/blocks/{feature_extractor,semantic,spatial,
temporal}.py. The shipped recipe (config/nturgbd-cross-view/
train_sgn_v14.yaml) plus the common option axes are supported:

- input embeddings: position/velocity MLPs (modes 1-4, 11, 12) with input
  BatchNorm (blocks/feature_extractor.py:75-103, blocks/semantic.py:34-125)
- semantic one-hot joint/frame/class embeddings with concat/sum fusion and
  pre/post-GCN frame-embedding location (blocks/semantic.py:128-190,
  sgn_v14.py:855-933)
- spatial GCN stack with data-dependent per-frame attention G (gt_mode 0,
  blocks/spatial.py:193-240) or the GT temporal-mixing variant (gt_mode 1,
  blocks/spatial.py:243-322), shared or per-layer G, optional prenorm,
  per-layer residuals and FFN (blocks/spatial.py:846-1013)
- multi-kernel temporal conv branches per GCN level with inter-level
  sharing (sgn_v14.py:583-658, blocks/temporal.py:99-160,274-397)
- spatial/temporal max pooling modes 0/1 and the classifier head
  (sgn_v14.py:663-786)

Layout is channels-last (B, T, V, C): all 1x1 convs are MXU matmuls, the
per-frame V x V attention is a small batched einsum fully resident in
VMEM, and the one-hot semantic embeddings are computed once as (V, C) /
(T, C) tables and broadcast — the reference materializes (N, V, V, T)
one-hot tensors per batch; here they are constants folded by XLA.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.ops import BatchNorm
from agcn_tpu.ops import initializers as init
from agcn_tpu.ops.gcn import frame_aggregate

# channel constants c1..c4 (reference model/resource/common_ntu.py:1-6)
C1, C2, C3, C4 = 64, 128, 256, 512

EMB_MODES = {
    # mode: (num_layers, kernel_sizes, residual)
    1: (2, (1, 1), 0),
    2: (2, (1, 1), 1),
    3: (3, (1, 1, 1), 0),
    4: (4, (1, 1, 1, 1), 0),
    11: (2, (1, 3), 0),
    12: (2, (3, 3), 0),
}


def infogcn_latent_sample(mu: jnp.ndarray, logvar: jnp.ndarray,
                          eps: jnp.ndarray, noise_ratio: float
                          ) -> jnp.ndarray:
    """Train-time reparameterized latent draw (reference
    sgn_v12.py:814-824): std = clamp(exp(noise_ratio * logvar), max=100),
    z = eps * std + mu."""
    std = jnp.minimum(jnp.exp(noise_ratio * logvar), 100.0)
    return eps * std + mu


def _dropout2d(x, rate, train, module, name):
    """Torch Dropout2d semantics: drop whole channels, per (batch, C)."""
    if rate <= 0.0:
        return x
    return module(nn.Dropout(rate, broadcast_dims=tuple(range(1, x.ndim - 1)),
                             deterministic=not train, name=name))(x)


class TConv(nn.Module):
    """1xk conv along T of a (B, T, V, C) tensor (reference Conv1xN,
    model/layers/module/block.py:154-189). k=1 lowers to a Dense matmul."""

    features: int
    kernel_size: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == 1:
            return nn.Dense(self.features, use_bias=self.use_bias,
                            kernel_init=init.kaiming_normal_fan_out,
                            bias_init=nn.initializers.zeros
                            if not self.use_bias else
                            init.torch_default_bias(x.shape[-1]),
                            name="conv")(x)
        return nn.Conv(self.features, kernel_size=(self.kernel_size, 1),
                       padding=((self.padding, self.padding), (0, 0)),
                       use_bias=self.use_bias,
                       kernel_init=init.kaiming_normal_fan_out,
                       bias_init=init.torch_default_bias(
                           x.shape[-1] * self.kernel_size)
                       if self.use_bias else nn.initializers.zeros,
                       name="conv")(x)


class ConvNormAct(nn.Module):
    """conv -> [norm] -> [act] -> [dropout] block (reference Conv,
    block.py:192-227; prenorm moves norm first)."""

    features: int
    kernel_size: int = 1
    padding: int = 0
    use_bias: bool = False
    use_norm: bool = False
    use_act: bool = True
    dropout: float = 0.0
    prenorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_norm and self.prenorm:
            x = BatchNorm(name="norm")(x, train)
        x = TConv(self.features, self.kernel_size, self.padding,
                  self.use_bias, name="cnn")(x)
        if self.use_norm and not self.prenorm:
            x = BatchNorm(name="norm")(x, train)
        if self.use_act:
            x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train, name="drop")(x)
        return x


class SGNEmbedding(nn.Module):
    """Input/semantic embedding MLP (reference blocks/semantic.py:34-125)."""

    out_channels: int
    mode: int = 1
    use_bias: bool = True
    in_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_norm:
            # DataNorm: BN1d over (C*V) features, stats over (B, T)
            # (blocks/semantic.py:21-31); torch feature order is (c, v).
            b, t, v, c = x.shape
            y = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * v)
            y = BatchNorm(name="in_norm")(y, train)
            x = jnp.transpose(y.reshape(b, t, c, v), (0, 1, 3, 2))
        num_layers, kernels, residual = EMB_MODES[self.mode]
        for i in range(num_layers):
            k = kernels[i]
            y = ConvNormAct(self.out_channels, kernel_size=k, padding=k // 2,
                            use_bias=self.use_bias,
                            name=f"cnn{i + 1}")(x, train)
            if residual == 1:
                if x.shape[-1] == self.out_channels:
                    y = y + x
                else:
                    y = y + nn.Dense(self.out_channels, use_bias=self.use_bias,
                                     kernel_init=init.torch_default_kernel,
                                     name=f"res{i + 1}")(x)
            x = y
        return x


#: NTU-25 body-part groups for the segment embedding
#: (reference blocks/feature_extractor.py:11-19)
SEGMENTS = ((2, 3), (0, 1, 20), (4, 5, 6), (8, 9, 10),
            (16, 17, 18, 19), (12, 13, 14, 15), (7, 21, 22), (11, 23, 24))
SEGMENT_PERIOD = 4


class SegmentEmbedding(nn.Module):
    """Body-part segment embedding: 8 part groups x PERIOD-frame windows.

    Each (part, window) token flattens (window-position, joint, channel)
    into one feature vector and is embedded with its own per-part MLP;
    the output sequence has V'=8 part nodes and T'=T//PERIOD frames.
    Parity: reference blocks/feature_extractor.py:23-33
    (embedding_per_segment), engaged when input_position/velocity > 1000
    (feature_extractor.py:50-70, mode %= 1000).
    """

    out_channels: int
    mode: int               # full mode (> 1000); % 1000 picks the MLP
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, v, c = x.shape
        tw = t // SEGMENT_PERIOD
        outs = []
        for idx, seg in enumerate(SEGMENTS):
            xs = x[:, : tw * SEGMENT_PERIOD, list(seg), :]
            xs = xs.reshape(b, tw, SEGMENT_PERIOD, len(seg), c)
            xs = xs.reshape(b, tw, 1, SEGMENT_PERIOD * len(seg) * c)
            emb = SGNEmbedding(self.out_channels, mode=self.mode % 1000,
                               use_bias=self.use_bias, in_norm=True,
                               name=f"seg{idx}")(xs, train)
            outs.append(emb)
        return jnp.concatenate(outs, axis=2)  # (B, T', 8, C')


class GCNSpatialG(nn.Module):
    """Per-frame attention G = softmax(g1 g2^T) (blocks/spatial.py:193-240,
    gt_mode 0)."""

    proj_dim: int
    use_bias: bool = True
    proj_shared: bool = False
    activation: str = "softmax"
    g_kernel: int = 1   # temporal kernel of g1/g2 (sgcn_g_kernel)

    @nn.compact
    def __call__(self, x, g_prior=None):
        g1 = TConv(self.proj_dim, self.g_kernel, self.g_kernel // 2,
                   use_bias=self.use_bias, name="g1")(x)
        if self.proj_shared:
            g2 = g1
        else:
            g2 = TConv(self.proj_dim, self.g_kernel, self.g_kernel // 2,
                       use_bias=self.use_bias, name="g2")(x)
        logits = jnp.einsum("btvc,btwc->btvw", g1, g2)
        if self.activation == "softmax":
            g = jax.nn.softmax(logits, axis=-1)
        elif self.activation == "sigmoid":
            g = jax.nn.sigmoid(logits)
        else:
            g = logits
        if g_prior is not None:
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            g = (g_prior * alpha + g) / (alpha + 1)
        else:
            # parameter exists in the reference regardless of use
            self.param("alpha", nn.initializers.zeros, (1,))
        return g, None


class GCNSpatialGT(nn.Module):
    """G mixed through a T x T temporal attention (blocks/spatial.py:243-322,
    gt_mode 1)."""

    proj_dim: int
    use_bias: bool = True
    proj_shared: bool = False
    activation: str = "softmax"
    gt_activation: int = 1  # 1: softmax, 2: sigmoid
    g_kernel: int = 1

    @nn.compact
    def __call__(self, x, g_prior=None):
        gk, gp = self.g_kernel, self.g_kernel // 2
        g1 = TConv(self.proj_dim, gk, gp, use_bias=self.use_bias,
                   name="g1")(x)
        g3 = TConv(self.proj_dim, gk, gp, use_bias=self.use_bias,
                   name="g3")(x)
        if self.proj_shared:
            g2, g4 = g1, g3
        else:
            g2 = TConv(self.proj_dim, gk, gp, use_bias=self.use_bias,
                       name="g2")(x)
            g4 = TConv(self.proj_dim, gk, gp, use_bias=self.use_bias,
                       name="g4")(x)
        b, t, v, _ = x.shape
        g12 = jnp.einsum("btvc,btwc->btvw", g1, g2)  # (B,T,V,V)
        # max over joints -> frame descriptors (reference g3p/g4p pooling)
        g3p = jnp.max(g3, axis=2)  # (B,T,C)
        g4p = jnp.max(g4, axis=2)
        g34 = jax.nn.softmax(jnp.einsum("bic,bjc->bij", g3p, g4p), axis=-1)
        g12 = jnp.einsum("bij,bjvw->bivw", g34, g12)
        if self.gt_activation == 1:
            g12 = jax.nn.softmax(g12, axis=-1)
        else:
            g12 = jax.nn.sigmoid(g12)
        if g_prior is not None:
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            g12 = (g_prior * alpha + g12) / (alpha + 1)
        else:
            self.param("alpha", nn.initializers.zeros, (1,))
        return g12, g34


class FrameScalarMLP(nn.Module):
    """Per-frame scalar gate from flattened joint features.

    Used by GT modes 3/4 (blocks/spatial.py GCNSpatialGT3/GT4): an
    MLPTemporal with channels [C*V, C, ..., 1] over time producing one
    scalar per frame.
    """

    hidden: int
    depth: int = 2       # g3_idx
    kernel_size: int = 3
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x_flat, train: bool = False):
        # x_flat: (B, T, 1, C*V)
        y = x_flat
        for i in range(self.depth - 1):
            y = ConvNormAct(self.hidden, kernel_size=self.kernel_size,
                            padding=self.kernel_size // 2,
                            use_bias=self.use_bias, use_norm=True,
                            dropout=self.dropout if i == 0 else 0.0,
                            name=f"cnn{i + 1}")(y, train)
        y = TConv(1, use_bias=self.use_bias,
                  name=f"cnn{self.depth}")(y)
        return y[..., 0, 0]  # (B, T)


class GCNSpatialGTScalar(nn.Module):
    """GT modes 2/3/4: per-frame attention scaled (or gated) by a
    per-frame scalar (blocks/spatial.py GCNSpatialGT2 :325-388, GT3
    :391-467, GT4 :470-545)."""

    proj_dim: int
    gt_mode: int = 2
    use_bias: bool = True
    proj_shared: bool = False
    activation: str = "softmax"
    gt_activation: int = 1
    g3_idx: int = 2
    g_kernel: int = 1

    @nn.compact
    def __call__(self, x, g_prior=None, train: bool = False):
        b, t, v, c = x.shape
        g1 = TConv(self.proj_dim, self.g_kernel, self.g_kernel // 2,
                   use_bias=self.use_bias, name="g1")(x)
        g2 = g1 if self.proj_shared else TConv(
            self.proj_dim, self.g_kernel, self.g_kernel // 2,
            use_bias=self.use_bias, name="g2")(x)
        logits = jnp.einsum("btvc,btwc->btvw", g1, g2)
        g12 = jax.nn.softmax(logits, axis=-1) \
            if self.activation == "softmax" else jax.nn.sigmoid(logits)

        flat = x.reshape(b, t, 1, v * c)
        if self.gt_mode == 2:
            s = nn.Dense(1, use_bias=self.use_bias,
                         kernel_init=init.torch_default_kernel,
                         name="g3")(flat)[..., 0, 0]  # (B, T)
        else:
            # GT3 keeps the C*V width through the MLP; GT4 narrows to C
            # (blocks/spatial.py GT3 :100-106 vs GT4 :183-189)
            hidden = v * c if self.gt_mode == 3 else c
            s = FrameScalarMLP(hidden, depth=self.g3_idx,
                               use_bias=self.use_bias,
                               name="g3")(flat, train)
        if self.gt_activation == 1:
            s = jax.nn.softmax(s, axis=-1)
        else:
            s = jax.nn.sigmoid(s)
        s = s[:, :, None, None]  # (B, T, 1, 1)

        if self.gt_mode in (2, 3):
            g12 = s * g12
            if g_prior is not None:
                alpha = self.param("alpha", nn.initializers.zeros, (1,))
                g12 = (g_prior * alpha + g12) / (alpha + 1)
            else:
                self.param("alpha", nn.initializers.zeros, (1,))
            return g12, s
        # gt_mode 4: scalar gates the unit input instead
        self.param("alpha", nn.initializers.zeros, (1,))
        return g12, s


class GCNSpatialGTMap(nn.Module):
    """GT modes 5/6 (blocks/spatial.py GCNSpatialGT5 :547-632, GT6
    :633-700): per-frame attention G plus a second output g3 built from
    the flattened attention maps added to a one-hot temporal embedding.
    GT5 pushes the sum through an MLPTemporal head ([V*V]+[out2]*idx
    channels, spatial.py:585-595); GT6 returns the raw sum (the model
    gives it its own temporal branch, sgn_v14.py:584-588,955-956)."""

    proj_dim: int
    gt_mode: int = 5
    out_channels2: int = 512   # gt5 head width (gt_out_channels2)
    use_bias: bool = True
    proj_shared: bool = False
    activation: str = "softmax"
    gt_activation: int = 1     # accepted-but-unused, as in the reference
    g3_idx: int = 2
    g_kernel: int = 1

    @nn.compact
    def __call__(self, x, g_prior=None, train: bool = False):
        b, t, v, c = x.shape
        g1 = TConv(self.proj_dim, self.g_kernel, self.g_kernel // 2,
                   use_bias=self.use_bias, name="g1")(x)
        g2 = g1 if self.proj_shared else TConv(
            self.proj_dim, self.g_kernel, self.g_kernel // 2,
            use_bias=self.use_bias, name="g2")(x)
        logits = jnp.einsum("btvc,btwc->btvw", g1, g2)
        g12 = jax.nn.softmax(logits, axis=-1) \
            if self.activation == "softmax" else jax.nn.sigmoid(logits)

        # flattened maps (B, T, 1, V*V): channel (i, j) == reference's
        # rearrange 'n t i j -> n (i j) t' (spatial.py:624-626)
        maps = g12.reshape(b, t, 1, v * v)
        # one-hot temporal embedding: Embedding(T -> V*V, mode=1) of
        # eye(T) (spatial.py:602-613, OneHotTensor mode=1)
        onehot = jnp.broadcast_to(
            jnp.eye(t, dtype=x.dtype)[None, :, None, :], (b, t, 1, t))
        tem = SGNEmbedding(v * v, mode=1, use_bias=self.use_bias,
                           name="tem_embedding")(onehot, train)
        y = maps + tem
        if self.gt_mode == 5:
            # MLPTemporal head: channels [V*V] + [out2]*idx, kernels
            # [3]*(idx-1) + [1]; each layer conv -> BN -> ReLU, with
            # Dropout2d (p=0.5) only after the first (temporal.py:99-161)
            for i in range(self.g3_idx):
                k = 3 if i < self.g3_idx - 1 else 1
                y = ConvNormAct(self.out_channels2, kernel_size=k,
                                padding=k // 2, use_bias=self.use_bias,
                                use_norm=True,
                                dropout=0.5 if i == 0 else 0.0,
                                name=f"g3_cnn{i + 1}")(y, train)
        self.param("alpha", nn.initializers.zeros, (1,))
        return g12, y  # y: (B, T, 1, out_channels2 | V*V)


class GCNSpatialUnit(nn.Module):
    """One SGN graph conv: x -> norm(w1(G @ x) + res_alpha * w2(x)) -> relu
    -> dropout (blocks/spatial.py:702-843, attn_mode 0). w1 is zero-init
    per the reference's init_weight (sgn_v14.py:817-827)."""

    out_channels: int
    use_bias: bool = True
    dropout: float = 0.0
    prenorm: bool = False
    res_alpha: float = 1.0
    gt_mode: int = 0
    attn_mode: int = 0  # 0 G-aggregate | 1 no-G | 2 SE | 3 w2-only
    kernel_size: int = 1   # w2 temporal kernel (sgcn_kernel)
    padding: int = 0       # w2 temporal padding (sgcn_padding)
    v_kernel: int = 0      # w0 pre-aggregation conv (sgcn_v_kernel)

    @nn.compact
    def __call__(self, x, g, train: bool = False, g_aux=None, y=None):
        # res_alpha < 0 selects a LEARNABLE scalar ("varalpha" in the
        # reference ledger): -1 -> ones(1), -2 -> zeros(1)
        # (blocks/spatial.py:728-733)
        if self.res_alpha == -1:
            res_alpha = self.param("res_alpha", nn.initializers.ones,
                                   (1,))
        elif self.res_alpha == -2:
            res_alpha = self.param("res_alpha", nn.initializers.zeros,
                                   (1,))
        else:
            res_alpha = self.res_alpha
        if self.gt_mode == 4 and g_aux is not None:
            # per-frame scalar gates the unit input
            # (blocks/spatial.py:791-794)
            x = g_aux * x

        # optional temporal conv BEFORE aggregation (spatial.py:739-746);
        # the w2 residual still consumes the raw input xg
        x0 = x if self.v_kernel <= 0 else TConv(
            x.shape[-1], self.v_kernel, self.v_kernel // 2,
            use_bias=self.use_bias, name="w0")(x)

        def w1(inp):
            return nn.Dense(self.out_channels, use_bias=self.use_bias,
                            kernel_init=nn.initializers.zeros,
                            bias_init=init.torch_default_bias(
                                inp.shape[-1]),
                            name="w1")(inp)

        def w2(inp):
            return TConv(self.out_channels, self.kernel_size,
                         self.padding, use_bias=self.use_bias,
                         name="w2")(inp)

        if self.attn_mode in (0, 10):
            # original SGN: x -> w1(G @ w0(x)) + res_alpha * w2(x)
            # (attn_mode 10 feeds the w2 residual from the injected
            # feature y instead — spatial.py:806-812; plain mode 0
            # IGNORES y, matching Block2's shipped default)
            x2 = frame_aggregate(x0, g)  # dest = row of G
            x4 = w1(x2)
            x5 = w2(y if self.attn_mode == 10 and y is not None
                    else x) * res_alpha
            x6 = x4 + x5
        elif self.attn_mode == 1:
            # two linear projections, no G (blocks/spatial.py:813-820)
            x6 = w1(x0) + w2(x) * res_alpha
        elif self.attn_mode == 2:
            # squeeze-excite instead of G (blocks/spatial.py:821-830)
            se = x0.mean(axis=2, keepdims=True)  # (B,T,1,C)
            se = nn.relu(TConv(self.out_channels // 2,
                               use_bias=self.use_bias, name="w3")(se))
            se = jax.nn.sigmoid(w1(se))
            x6 = se + w2(x) * res_alpha
        elif self.attn_mode == 3:
            # single projection (blocks/spatial.py:831-838)
            x6 = w2(x)
        else:
            raise NotImplementedError(f"attn_mode {self.attn_mode}")
        if not self.prenorm:
            x6 = BatchNorm(name="norm")(x6, train)
        x6 = nn.relu(x6)
        if self.dropout > 0.0:
            x6 = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                            deterministic=not train, name="drop")(x6)
        return x6


class GCNSpatialFFN(nn.Module):
    """Conv FFN with residual (blocks/spatial.py:36-117). postnorm moves
    the normalization to AFTER the residual (GCNSpatialFFNPostNorm
    :78-117); the reference's "Linear" FFN variants (modes 2xx/3xx) are
    numerically identical to the conv ones at kernel 1 (LinearLayer
    transposes channels around nn.Linear, block.py:120-125)."""

    out_channels: int
    multiplier: float = 4.0
    use_bias: bool = True
    postnorm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = int(x.shape[-1] * self.multiplier)
        y = ConvNormAct(inter, use_bias=self.use_bias,
                        use_norm=not self.postnorm,
                        name="ffn1")(x, train)
        y = ConvNormAct(self.out_channels, use_bias=self.use_bias,
                        use_norm=not self.postnorm,
                        name="ffn2")(y, train)
        y = y + x
        if self.postnorm:
            y = BatchNorm(name="norm")(y, train)
        return y


class GCNSpatialBlock(nn.Module):
    """Stack of GCN units with shared-or-per-layer G
    (blocks/spatial.py:846-1013)."""

    dims: Sequence[int]           # per-unit output dims, e.g. (128, 256, 256)
    g_proj_dim: Any = 256         # int => shared G; list => per-layer G
    g_proj_shared: bool = False
    g_kernel: int = 1             # sgcn_g_kernel
    kernel_size: int = 1          # sgcn_kernel (unit w2)
    padding: int = 0              # sgcn_padding
    v_kernel: int = 0             # sgcn_v_kernel (unit w0)
    g_activation: str = "softmax"
    g_weighted: bool = False
    gt_mode: int = 0
    gt_act: int = 1
    res_alpha: float = 1.0
    residual: Sequence[int] = (0, 0, 0)
    prenorm: bool = False
    ffn: Optional[float] = None
    dropout: float = 0.0
    use_bias: bool = True
    attn_mode: int = 0
    gt_out_channels2: int = 512

    g3_idx: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, inject=None, g_fixed=None):
        """inject: per-unit features for the w2 residual; g_fixed: reuse
        an externally computed G (GCNSpatialBlock2, spatial.py:1017+)."""
        g_shared = isinstance(self.g_proj_dim, int)
        g_list: List[Any] = []
        x_list: List[jnp.ndarray] = []
        for i, dim in enumerate(self.dims):
            x1 = x
            if self.prenorm:
                x1 = BatchNorm(name=f"prenorm{i + 1}")(x1, train)
            if g_fixed is not None:
                if not g_list:
                    g_list.append((g_fixed, None))
            elif i == 0 or not g_shared:
                proj = (self.g_proj_dim if g_shared
                        else self.g_proj_dim[i])
                g_prior = g_list[-1][0] if (self.g_weighted and g_list) \
                    else None
                common = dict(use_bias=self.use_bias,
                              proj_shared=self.g_proj_shared,
                              activation=self.g_activation,
                              g_kernel=self.g_kernel,
                              name=f"g{i + 1}")
                if self.gt_mode == 0:
                    g_out = GCNSpatialG(proj, **common)(x1, g_prior)
                elif self.gt_mode == 1:
                    g_out = GCNSpatialGT(proj, gt_activation=self.gt_act,
                                         **common)(x1, g_prior)
                elif self.gt_mode in (2, 3, 4):
                    g_out = GCNSpatialGTScalar(
                        proj, gt_mode=self.gt_mode,
                        gt_activation=self.gt_act, g3_idx=self.g3_idx,
                        **common)(x1, g_prior, train)
                elif self.gt_mode in (5, 6):
                    g_out = GCNSpatialGTMap(
                        proj, gt_mode=self.gt_mode,
                        gt_activation=self.gt_act, g3_idx=self.g3_idx,
                        out_channels2=self.gt_out_channels2,
                        **common)(x1, g_prior, train)
                else:
                    raise NotImplementedError(f"gt_mode {self.gt_mode}")
                g_list.append(g_out)
            z = GCNSpatialUnit(dim, use_bias=self.use_bias,
                               dropout=self.dropout, prenorm=self.prenorm,
                               res_alpha=self.res_alpha,
                               gt_mode=self.gt_mode,
                               attn_mode=self.attn_mode,
                               kernel_size=self.kernel_size,
                               padding=self.padding,
                               v_kernel=self.v_kernel,
                               name=f"gcn{i + 1}")(
                x1, g_list[-1][0], train, g_aux=g_list[-1][1],
                y=None if inject is None else inject[i])
            if self.residual[i] == 1:
                if x.shape[-1] == dim:
                    z = z + x
                else:
                    z = z + TConv(dim, use_bias=self.use_bias,
                                  name=f"res{i + 1}")(x)
            x = z
            if self.ffn is not None:
                # gcn_ffn value encodes variant // 100 and multiplier
                # % 100 (sgn_v14.py:943-960): 0/2 pre-norm, 1/3 post-norm
                fmode, fmult = divmod(float(self.ffn), 100.0)
                fmult = float(self.ffn) if int(fmode) == 0 else fmult
                x = GCNSpatialFFN(dim, multiplier=fmult,
                                  use_bias=self.use_bias,
                                  postnorm=int(fmode) in (1, 3),
                                  name=f"ffn{i + 1}")(x, train)
            x_list.append(x)
        return x, g_list, x_list


class TemporalBranchMLP(nn.Module):
    """Two-layer temporal conv MLP (blocks/temporal.py:99-160 via
    TemporalBranch t_mode 1/2, :274-397)."""

    out_channels: int
    kernel_size: int = 3
    t_mode: int = 1  # 1: plain, 2: +residual per layer
    dropout: float = 0.0
    prenorm: bool = False
    use_bias: bool = True
    maxpool_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.maxpool_kwargs:
            # pre-branch temporal max pool (blocks/temporal.py:116-119,
            # torch MaxPool2d over the time axis)
            ks = self.maxpool_kwargs.get("kernel_size", [1, 1])
            st = self.maxpool_kwargs.get("stride", ks)
            kt = ks[-1] if isinstance(ks, (list, tuple)) else ks
            stt = st[-1] if isinstance(st, (list, tuple)) else st
            x = nn.max_pool(x, window_shape=(kt, 1), strides=(stt, 1))
        in_c = x.shape[-1]
        resid = 1 if self.t_mode == 2 else 0
        y = ConvNormAct(in_c, kernel_size=self.kernel_size,
                        padding=self.kernel_size // 2,
                        use_bias=self.use_bias, use_norm=True,
                        dropout=self.dropout, prenorm=self.prenorm,
                        name="cnn1")(x, train)
        if resid:
            y = y + x
        z = ConvNormAct(self.out_channels, use_bias=self.use_bias,
                        use_norm=True, prenorm=self.prenorm,
                        name="cnn2")(y, train)
        if resid:
            if y.shape[-1] == self.out_channels:
                z = z + y
            else:
                z = z + TConv(self.out_channels, use_bias=self.use_bias,
                              name="res2")(y)
        return z


class TemporalBranch(nn.Module):
    """Full temporal branch dispatcher (blocks/temporal.py:274-397):
    optional ASPP, then t_mode 0 (skip) / 1-2 (conv MLP) / 3 (transformer)
    / 4 (series-decomposition x3 MLPs) / 5 (multi-scale avg-pool MLPs).
    Returns a LIST of outputs (modes 4/5 emit several)."""

    out_channels: int
    kernel_size: int = 3
    t_mode: int = 1
    dropout: float = 0.0
    prenorm: bool = False
    use_bias: bool = True
    aspp_rates: Optional[Sequence[int]] = None
    mha_kwargs: Optional[dict] = None
    maxpool_kwargs: Optional[dict] = None
    decomp_kernel_size: int = 3
    pool_kernel_sizes: Sequence[int] = (3, 5, 7, 9)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from agcn_tpu.ops.blocks import ASPP, SeriesDecomposition
        from agcn_tpu.ops.attention import TransformerEncoder

        if self.aspp_rates:
            x = ASPP(x.shape[-1], dilations=tuple(self.aspp_rates),
                     use_bias=bool(self.use_bias), name="aspp")(x, train)
        if self.t_mode == 0:
            return [x]
        if self.t_mode in (1, 2):
            return [TemporalBranchMLP(
                self.out_channels, self.kernel_size, self.t_mode,
                self.dropout, self.prenorm, self.use_bias,
                maxpool_kwargs=self.maxpool_kwargs,
                name="cnn")(x, train)]
        if self.t_mode == 3:
            kw = dict(self.mha_kwargs or {})
            b, t, v, c = x.shape
            y = x.reshape(b, t, v * c)
            num_layers = kw.get("num_layers", 1)
            nhead = kw.get("nhead", 1)
            nhead = nhead[0] if isinstance(nhead, (list, tuple)) else nhead
            dff = kw.get("dim_feedforward", 256)
            dff = dff[0] if isinstance(dff, (list, tuple)) else dff
            y, _ = TransformerEncoder(
                num_layers=num_layers, num_heads=nhead,
                dim_feedforward=dff, dropout=kw.get("dropout", 0.1),
                activation=kw.get("activation", "relu"),
                pos_enc=kw.get("pos_enc"), max_len=t,
                name="mha")(y, train)
            return [y.reshape(b, t, 1, -1)]
        if self.t_mode == 4:
            seasonal, trend = SeriesDecomposition(
                self.decomp_kernel_size)(x)
            outs = []
            for name, part in (("raw", x), ("season", seasonal),
                               ("trend", trend)):
                outs.append(TemporalBranchMLP(
                    self.out_channels, self.kernel_size, 2, self.dropout,
                    self.prenorm, self.use_bias,
                    name=f"cnn_{name}")(part, train))
            return outs
        if self.t_mode == 5:
            outs = []
            for k in self.pool_kernel_sizes:
                pad = (k - 1) // 2
                padded = jnp.concatenate(
                    [jnp.repeat(x[:, :1], pad, axis=1), x,
                     jnp.repeat(x[:, -1:], k - 1 - pad, axis=1)], axis=1)
                cs = jnp.cumsum(padded, axis=1)
                cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs],
                                     axis=1)
                pooled = (cs[:, k:] - cs[:, :-k]) / k
                outs.append(TemporalBranchMLP(
                    self.out_channels, 1, 2, self.dropout, self.prenorm,
                    self.use_bias, name=f"cnn_p{k}")(pooled, train))
            return outs
        raise NotImplementedError(f"t_mode {self.t_mode}")


class SGN(nn.Module):
    """Full SGN classifier.

    Input: (B, T, M*V*C) segment tensors (the SGN data contract,
    sgn_v14.py:829-846); persons are flattened into T by the loader.
    Output: (logits, aux) with aux = {"g": attention list}.
    """

    num_class: int = 60
    num_point: int = 25
    num_segment: int = 20
    in_channels: int = 3
    use_bias: bool = True
    dropout: float = 0.0      # classifier
    dropout2d: float = 0.0    # everywhere else
    c_multiplier: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    input_position: int = 1
    input_velocity: int = 1
    semantic_joint: int = 1
    semantic_frame: int = 1
    semantic_class: int = 0
    semantic_jdiff: int = 0          # joint embedding fused into velocity
    semantic_joint_smp: int = 0      # joint embedding concat before smp
    semantic_joint_fusion: int = 0   # 0 concat, 1 sum
    semantic_frame_location: int = 0  # 0 post-GCN, 1 pre-GCN
    xem_projection: int = 0          # pre-GCN projection embedding mode

    sgcn_dims: Optional[Sequence[int]] = None  # default (c2, c3, c3)
    sgcn_residual: Sequence[int] = (0, 0, 0)
    sgcn_prenorm: bool = False
    sgcn_ffn: Optional[float] = None
    sgcn_dropout: float = 0.0
    sgcn_g_proj_dim: Optional[Any] = None  # default c3
    sgcn_g_proj_shared: bool = False
    sgcn_g_activation: str = "softmax"
    sgcn_g_weighted: bool = False
    sgcn_g_res_alpha: float = 1.0
    sgcn_kernel: int = 1       # unit w2 temporal kernel
    sgcn_padding: int = 0
    sgcn_g_kernel: int = 1     # g1/g2 temporal kernel
    sgcn_v_kernel: int = 0     # unit w0 pre-aggregation conv
    sgcn_gt_mode: int = 1
    sgcn_gt_act: int = 1
    sgcn_gt_g3_idx: int = 2
    sgcn_gt_out_channels2: int = 512
    sgcn_attn_mode: int = 0

    gcn_fpn_output_merge: int = 1  # 0/1 mean features | 2 per-branch fc
    gcn_fpn_shared: int = 0        # 1: share the fpn projection
    gcn_fpn: int = -1       # -1 none | 0 parallel | 1 proj+sum | 7 (k=3)
    #                         | 8 BiFPN | 10 second GCN stack (sgcn2)
    sgcn2_dims: Optional[Sequence[int]] = None  # dims for gcn_fpn=10
    sgcn2_kernel: int = 1
    sgcn2_padding: int = 0
    sgcn2_dropout: float = 0.0
    sgcn2_residual: Optional[Sequence[int]] = None
    sgcn2_prenorm: bool = False
    sgcn2_ffn: Optional[float] = None
    sgcn2_v_kernel: int = 0
    sgcn2_attn_mode: int = 0   # 10 = w2 residual from the injected level
    gcn_fpn_kernel: int = 1
    bifpn_dim: int = 256
    bifpn_layers: int = 1

    spatial_maxpool: int = 1
    temporal_maxpool: int = 1
    multi_t: Sequence[Sequence[int]] = ((), (), (3,))
    multi_t_shared: int = 0  # 0 none, 2 inter-layer share
    t_mode: int = 1
    # InfoGCN latent head (SGN v12): fc_mu/fc_logvar over the pooled
    # feature, reparameterized sampling at train time, model-owned
    # orthogonal z_prior (reference sgn_v12.py:620-630,791-794,812-824)
    infogcn_noise_ratio: Optional[float] = None
    infogcn_gain: Optional[float] = None
    t_mha_kwargs: Optional[dict] = None
    t_maxpool_kwargs: Optional[dict] = None
    aspp_rates: Optional[Sequence[int]] = None
    decomp_kernel_size: int = 3
    pool_kernel_sizes: Sequence[int] = (3, 5, 7, 9)

    @property
    def channels(self):
        m = self.c_multiplier
        return (int(C1 * m[0]), int(C2 * m[1]), int(C3 * m[2]),
                int(C4 * m[3]))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        c1, c2, c3, c4 = self.channels
        b, t, dim = x.shape
        v = self.num_point
        x = x.reshape(b, t, v, dim // v)
        if x.shape[-1] > self.in_channels:
            x = x[..., :self.in_channels]

        # Dynamic representation ----------------------------------------
        # velocity: dif padded with a leading zero frame
        # (blocks/feature_extractor.py:75-79 + torch_utils.pad_zeros)
        dif = x[:, 1:] - x[:, :-1]
        dif = jnp.concatenate([jnp.zeros_like(x[:, :1]), dif], axis=1)
        pos = vel = None
        if self.input_position > 1000 and self.input_velocity > 1000:
            # body-part segment embedding: both streams embed x (the
            # reference feeds x, not dif, to the velocity branch here —
            # feature_extractor.py:81-83); sequence becomes 8 part nodes
            # x T//4 windows
            pos = SegmentEmbedding(c1, mode=self.input_position,
                                   use_bias=self.use_bias,
                                   name="pos_embed")(x, train)
            vel = SegmentEmbedding(c1, mode=self.input_velocity,
                                   use_bias=self.use_bias,
                                   name="vel_embed")(x, train)
            t, v = pos.shape[1], pos.shape[2]
        else:
            if self.input_position > 0:
                pos = SGNEmbedding(c1, mode=self.input_position,
                                   use_bias=self.use_bias, in_norm=True,
                                   name="pos_embed")(x, train)
            if self.input_velocity > 0:
                vel = SGNEmbedding(c1, mode=self.input_velocity,
                                   use_bias=self.use_bias, in_norm=True,
                                   name="vel_embed")(dif, train)
        # Semantic embeddings -------------------------------------------
        # one-hot tables embedded once, broadcast over batch/time
        # (blocks/semantic.py:128-190) — constants folded by XLA.
        def onehot_joint_embedding(mode, name):
            joint_tab = jnp.eye(v)[None, None]  # (1,1,V,V)
            emb = SGNEmbedding(c1, mode=mode, use_bias=self.use_bias,
                               name=name)(
                jnp.broadcast_to(joint_tab, (1, t, v, v)), train)
            return jnp.broadcast_to(emb, (b, t, v, c1))

        def fuse(a, b_, mode):
            return jnp.concatenate([a, b_], axis=-1) if mode == 0 else a + b_

        if self.semantic_jdiff > 0 and pos is not None and vel is not None \
                and self.semantic_joint > 0:
            # jdiff: joint embedding fused into position AND a separate
            # joint-diff embedding fused into velocity
            # (sgn_v14.py:855-880 semantic_jdiff branch)
            spa = onehot_joint_embedding(self.semantic_joint, "joint_embed")
            spa_diff = onehot_joint_embedding(self.semantic_jdiff,
                                              "jdiff_embed")
            feat = fuse(pos, spa, self.semantic_joint_fusion) \
                + fuse(vel, spa_diff, self.semantic_joint_fusion)
        else:
            if pos is not None and vel is not None:
                feat = pos + vel
            else:
                feat = pos if pos is not None else vel
            if self.semantic_joint > 0:
                spa = onehot_joint_embedding(self.semantic_joint,
                                             "joint_embed")
                feat = fuse(feat, spa, self.semantic_joint_fusion)

        if self.xem_projection > 0:
            # projection layer pre-GCN (sgn_v14.py:309-318)
            feat = SGNEmbedding(feat.shape[-1], mode=self.xem_projection,
                                use_bias=self.use_bias,
                                name="x_emb_projection")(feat, train)

        gcn_in_ch = feat.shape[-1]
        sgcn_dims = tuple(self.sgcn_dims or (c2, c3, c3))
        if self.semantic_frame_location == 1:
            tem_out_ch = gcn_in_ch
        elif self.gcn_fpn == 8:
            tem_out_ch = self.bifpn_dim
        else:
            tem_out_ch = sgcn_dims[-1]
        tem_emb = None
        if self.semantic_frame > 0:
            frame_tab = jnp.eye(t)[None, :, None, :]  # (1,T,1,T)
            tem_emb = SGNEmbedding(tem_out_ch, mode=self.semantic_frame,
                                   use_bias=self.use_bias,
                                   name="frame_embed")(
                jnp.broadcast_to(frame_tab, (1, t, v, t)), train)
        if tem_emb is not None and self.semantic_frame_location == 1:
            feat = feat + tem_emb

        # Spatial GCN ----------------------------------------------------
        g_proj = self.sgcn_g_proj_dim if self.sgcn_g_proj_dim is not None \
            else c3
        x_out, g_list, x_list = GCNSpatialBlock(
            dims=sgcn_dims,
            g_proj_dim=g_proj,
            g_proj_shared=self.sgcn_g_proj_shared,
            g_activation=self.sgcn_g_activation,
            g_weighted=self.sgcn_g_weighted,
            g_kernel=self.sgcn_g_kernel,
            kernel_size=self.sgcn_kernel,
            padding=self.sgcn_padding,
            v_kernel=self.sgcn_v_kernel,
            gt_mode=self.sgcn_gt_mode,
            gt_act=self.sgcn_gt_act,
            g3_idx=self.sgcn_gt_g3_idx,
            attn_mode=self.sgcn_attn_mode,
            gt_out_channels2=self.sgcn_gt_out_channels2,
            res_alpha=self.sgcn_g_res_alpha,
            residual=tuple(self.sgcn_residual),
            prenorm=self.sgcn_prenorm,
            ffn=self.sgcn_ffn,
            dropout=self.sgcn_dropout,
            use_bias=self.use_bias,
            name="sgcn")(feat, train)

        # GCN-FPN: which levels feed the temporal module and how they are
        # merged (reference sgn_v14.py:862-929, modes doc :58-71)
        def fpn_proj(dim, k, suffix=""):
            if self.gcn_fpn_shared:
                # one projection shared across every level
                # (sgn_v14.py:449-458, :894-895 fall back to fpn_proj1)
                shared = TConv(dim, kernel_size=k, padding=k // 2,
                               use_bias=self.use_bias,
                               name=f"fpn_proj1{suffix}")
                return [shared(xl) for xl in x_list]
            return [TConv(dim, kernel_size=k, padding=k // 2,
                          use_bias=self.use_bias,
                          name=f"fpn_proj{i + 1}{suffix}")(xl)
                    for i, xl in enumerate(x_list)]

        if self.gcn_fpn == 0:
            feats: List[Optional[jnp.ndarray]] = list(x_list)
        elif self.gcn_fpn in (1, 7):
            k = 3 if self.gcn_fpn == 7 else self.gcn_fpn_kernel
            proj = fpn_proj(sgcn_dims[-1], k)
            feats = [sum(proj[i:]) for i in range(len(proj))]
        elif self.gcn_fpn == 2:
            proj = fpn_proj(sgcn_dims[0], self.gcn_fpn_kernel)
            feats = [sum(proj[i:]) for i in range(len(proj))]
        elif self.gcn_fpn == 3:
            feats = fpn_proj(sgcn_dims[-1], self.gcn_fpn_kernel)
        elif self.gcn_fpn == 4:
            # proj then concat (post spatial pooling) into the last level
            feats = fpn_proj(sgcn_dims[-1], self.gcn_fpn_kernel)
        elif self.gcn_fpn == 5:
            feats = fpn_proj(sgcn_dims[-1] // 4, self.gcn_fpn_kernel)
        elif self.gcn_fpn == 6:
            proj = fpn_proj(64, self.gcn_fpn_kernel)
            feats = [sum(proj[i:]) for i in range(len(proj))]
        elif self.gcn_fpn == 9:
            # multi-kernel projections summed (reference mode 9)
            kernels = (1, 3) if self.gcn_fpn_kernel == 1 \
                else (self.gcn_fpn_kernel,)
            proj = None
            for k in kernels:
                p = fpn_proj(sgcn_dims[-1], k, suffix=f"_k{k}")
                proj = p if proj is None else [a + b
                                               for a, b in zip(proj, p)]
            feats = [sum(proj[i:]) for i in range(len(proj))]
        elif self.gcn_fpn == 8:
            from agcn_tpu.ops.blocks import BiFPN

            feats = BiFPN(self.bifpn_dim, self.bifpn_layers,
                          name="bifpn")(list(x_list), train)
        elif self.gcn_fpn == 10:
            # second GCN stack over the last output with earlier features
            # injected high-to-low (sgn_v14.py:920-927 + GCNSpatialBlock2)
            dims2 = tuple(self.sgcn2_dims or sgcn_dims)
            # injected levels are [the pre-sgcn embedded input] +
            # earlier unit outputs, reversed high-to-low
            # (sgn_v14.py:920-923: `x` there is still the sgcn INPUT —
            # the sgcn call does not reassign it)
            inject = [feat] + list(x_list[:-1])
            inject.reverse()
            _, _, x_list2 = GCNSpatialBlock(
                dims=dims2,
                g_proj_dim=g_proj,
                g_proj_shared=self.sgcn_g_proj_shared,
                g_activation=self.sgcn_g_activation,
                gt_mode=0,
                kernel_size=self.sgcn2_kernel,
                padding=self.sgcn2_padding,
                v_kernel=self.sgcn2_v_kernel,
                attn_mode=self.sgcn2_attn_mode,
                ffn=self.sgcn2_ffn,
                residual=tuple(self.sgcn2_residual)
                if self.sgcn2_residual is not None
                else (0,) * len(dims2),
                prenorm=self.sgcn2_prenorm,
                dropout=self.sgcn2_dropout,
                use_bias=self.use_bias,
                name="sgcn2")(x_list[-1], train, inject=inject,
                              g_fixed=g_list[-1][0])
            feats = [None] * (len(x_list) - 1) + [x_list2[-1]]
        else:
            # default: only the last level feeds the temporal module
            feats = [None] * (len(x_list) - 1) + [x_list[-1]]

        if tem_emb is not None and self.semantic_frame_location == 0:
            # add the frame embedding wherever the channel widths agree
            # (FPN modes that change widths skip incompatible levels,
            # matching the reference's constraint that those modes pair
            # with location=1 or equal dims)
            feats = [f + tem_emb
                     if f is not None and f.shape[-1] == tem_emb.shape[-1]
                     else f for f in feats]

        # spatial pooling (modes 0/1/3/4/5, sgn_v14.py:663-722) ---------
        def vconv(feat_in, features, kernel, name):
            """conv over the joint axis (valid padding)."""
            y = nn.Conv(features, kernel_size=(1, kernel),
                        padding="VALID", use_bias=bool(self.use_bias),
                        kernel_init=init.kaiming_normal_fan_out,
                        name=f"{name}_conv")(feat_in)
            y = BatchNorm(name=f"{name}_bn")(y, train)
            return nn.relu(y)

        def smp(f, idx):
            if f is None:
                return None
            if self.spatial_maxpool == 0:
                return f
            if self.spatial_maxpool == 1:
                return jnp.max(f, axis=2, keepdims=True)
            if self.spatial_maxpool == 3:
                return vconv(f, c3, v, f"smp{idx}_k")
            if self.spatial_maxpool == 4:
                y = vconv(f, c3, 1, f"smp{idx}_1x1")
                return vconv(y, c3, v, f"smp{idx}_k")
            if self.spatial_maxpool == 5:
                y = vconv(f, c3, v, f"smp{idx}_k")
                return vconv(y, c3, 1, f"smp{idx}_1x1")
            raise NotImplementedError("spatial_maxpool mode")

        if self.semantic_joint_smp > 0:
            # joint one-hot embedding concatenated on channels before the
            # spatial pool (sgn_v14.py:623-641, forward :938-941)
            smp_tab = jnp.broadcast_to(jnp.eye(v)[None, None],
                                       (1, t, v, v))
            smp_emb = SGNEmbedding(sgcn_dims[-1],
                                   mode=self.semantic_joint_smp,
                                   use_bias=self.use_bias,
                                   name="joint_smp_embed")(smp_tab, train)
            smp_emb = jnp.broadcast_to(smp_emb,
                                       (b, t, v, sgcn_dims[-1]))
            feats = [jnp.concatenate([f, smp_emb], axis=-1)
                     if f is not None else None for f in feats]

        feats = [smp(f, i) for i, f in enumerate(feats)]

        if self.gcn_fpn in (4, 5):
            # channel-concat all pooled levels into the last feature
            # (sgn_v14.py forward :950-952)
            feats = [None] * (len(feats) - 1) + [
                jnp.concatenate([f for f in feats if f is not None],
                                axis=-1)]

        if self.sgcn_gt_mode == 6:
            # attention-map feature level gets its own temporal branch;
            # appended AFTER smp and the fpn-4/5 concat so it bypasses
            # both, exactly like the reference (sgn_v14.py forward
            # :950-956); multi_t must carry one extra entry
            feats = feats + [g_list[0][1]]

        # temporal branches ---------------------------------------------
        outs: List[jnp.ndarray] = []
        shared_names = {}
        shared_branches = {}
        if self.multi_t_shared == 2:
            # shared branch is named after the FIRST level declaring this
            # (slot, kernel) pair — matching the reference's __init__-time
            # module creation order (sgn_v14.py:614-636), independent of
            # which levels actually produce features
            for i0, kernels0 in enumerate(self.multi_t):
                for j0, k0 in enumerate(kernels0):
                    shared_names.setdefault(
                        (j0, k0), f"tem{i0 + 1}_{j0 + 1}_k{k0}")
        for i, kernels in enumerate(self.multi_t):
            for j, k in enumerate(kernels):
                if feats[i] is None:
                    continue
                name = f"tem{i + 1}_{j + 1}_k{k}"
                if self.multi_t_shared == 2:
                    # inter-layer sharing: one module instance reused
                    # (reference multi_t_shared==2, sgn_v14.py:614-636)
                    name = shared_names[(j, k)]
                if name in shared_branches:
                    branch = shared_branches[name]
                else:
                    branch = TemporalBranch(
                        c4, kernel_size=k, t_mode=self.t_mode,
                        dropout=self.dropout2d, prenorm=self.sgcn_prenorm,
                        use_bias=self.use_bias,
                        aspp_rates=self.aspp_rates,
                        mha_kwargs=self.t_mha_kwargs,
                        maxpool_kwargs=self.t_maxpool_kwargs,
                        decomp_kernel_size=self.decomp_kernel_size,
                        pool_kernel_sizes=tuple(self.pool_kernel_sizes),
                        name=name)
                    if self.multi_t_shared == 2:
                        shared_branches[name] = branch
                outs.extend(branch(feats[i], train))
        if self.sgcn_gt_mode == 5:
            # attention-map head joins the prediction branches
            # (sgn_v14.py forward :988-989); like the reference, the head
            # width (gt_out_channels2) must equal the temporal width
            if outs and g_list[0][1].shape[-1] != outs[0].shape[-1]:
                raise ValueError(
                    f"gt_mode 5 needs sgcn_gt_out_channels2 == temporal "
                    f"output width ({g_list[0][1].shape[-1]} vs "
                    f"{outs[0].shape[-1]})")
            outs.append(g_list[0][1])
        y = jnp.mean(jnp.stack(outs, 0), 0) if len(outs) > 1 else outs[0]

        # temporal pooling + classifier ---------------------------------
        # pooling modules are created ONCE and applied per branch when
        # gcn_fpn_output_merge == 2 (reference sgn_v14.py:1004-1008
        # applies the shared self.tmp to every branch)
        # the reference keeps the branch LIST under merge mode 2 even
        # when it has a single element — classification then goes
        # through fc1, not fc (sgn_v14.py:996-999,1026-1034); gating on
        # len(outs) would silently mis-route single-branch checkpoints
        merge2 = self.gcn_fpn_output_merge == 2
        if merge2 and self.infogcn_noise_ratio is not None:
            raise ValueError(
                "gcn_fpn_output_merge=2 has per-branch classifier heads "
                "and cannot host the InfoGCN latent head")
        ys = outs if merge2 else [y]
        ch, tlen = ys[0].shape[-1], ys[0].shape[1]
        if self.temporal_maxpool == 2:
            tmp_proj = ConvNormAct(ch, use_bias=self.use_bias,
                                   name="tmp_ind_projection")
        if self.temporal_maxpool in (3, 4, 5):
            conv_k = nn.Conv(ch, kernel_size=(tlen, 1), padding="VALID",
                             use_bias=bool(self.use_bias),
                             kernel_init=init.kaiming_normal_fan_out,
                             name="tmp_k_conv")
            bn_k = BatchNorm(name="tmp_k_bn")
        if self.temporal_maxpool in (4, 5):
            conv_1 = nn.Conv(ch, kernel_size=(1, 1), padding="VALID",
                             use_bias=bool(self.use_bias),
                             kernel_init=init.kaiming_normal_fan_out,
                             name="tmp_1x1_conv")
            bn_1 = BatchNorm(name="tmp_1x1_bn")

        def pool(y):
            if self.temporal_maxpool == 0:
                return y
            if self.temporal_maxpool == 1:
                return jnp.max(y, axis=1, keepdims=True)
            if self.temporal_maxpool == 2:
                # max pool + argmax-index re-embedding projection
                # (sgn_v14.py:726-731, :1010-1016)
                idx = jnp.argmax(y, axis=1,
                                 keepdims=True).astype(jnp.float32)
                y = jnp.max(y, axis=1, keepdims=True)
                return y + tmp_proj(idx, train)
            if self.temporal_maxpool == 3:
                return nn.relu(bn_k(conv_k(y), train))
            if self.temporal_maxpool == 4:
                y = nn.relu(bn_1(conv_1(y), train))
                return nn.relu(bn_k(conv_k(y), train))
            if self.temporal_maxpool == 5:
                y = nn.relu(bn_k(conv_k(y), train))
                return nn.relu(bn_1(conv_1(y), train))
            raise NotImplementedError("temporal_maxpool mode")

        ys = [pool(o) for o in ys]

        if self.semantic_class > 0:
            cls_tab = jnp.ones((1, 1, 1, 1))
            cls_emb = SGNEmbedding(c4, mode=self.semantic_class,
                                   use_bias=self.use_bias,
                                   name="class_embed")(cls_tab, train)
            ys = [y_ + cls_emb for y_ in ys]

        ys = [y_.reshape(b, -1) for y_ in ys]
        y = ys[0]
        # branch outputs for the cosine feature-similarity loss in torch
        # (N, C, T) layout so CosineLoss dim=1 = channels
        # (processor.py:583-599, utils/loss.py:7-21)
        branch_outs = [jnp.transpose(o.reshape(b, o.shape[1], -1),
                                     (0, 2, 1)) for o in outs]
        aux = {"g": g_list, "branch_outputs": branch_outs}
        if self.infogcn_noise_ratio is not None \
                and self.infogcn_gain is not None:
            # SGN v12 InfoGCN head: the classifier consumes the latent z
            # (sgn_v12.py:791-798), which is mu + eps*std at train time
            # and mu at eval (latent_sample, sgn_v12.py:814-824); the
            # class prior is a fixed orthogonally-initialized buffer
            # (sgn_v12.py:626,812) exposed for the trainer's MMD loss.
            d = y.shape[-1]
            mu = nn.Dense(d, kernel_init=init.torch_default_kernel,
                          bias_init=init.torch_default_bias(d),
                          name="fc_mu")(y)
            logvar = nn.Dense(d, kernel_init=init.torch_default_kernel,
                              bias_init=init.torch_default_bias(d),
                              name="fc_logvar")(y)
            if train:
                eps = jax.random.normal(self.make_rng("dropout"),
                                        logvar.shape, logvar.dtype)
                y = infogcn_latent_sample(mu, logvar, eps,
                                          self.infogcn_noise_ratio)
            else:
                y = mu
            gain = float(self.infogcn_gain)
            z_prior = self.variable(
                "batch_stats", "z_prior",
                lambda: nn.initializers.orthogonal(scale=gain)(
                    self.make_rng("params"), (self.num_class, d),
                    jnp.float32))
            aux["z_prior"] = jax.lax.stop_gradient(z_prior.value)
        aux["z"] = y
        drop = nn.Dropout(self.dropout, deterministic=not train,
                          name="fc_drop") if self.dropout > 0.0 else None
        if merge2:
            # per-branch classifier heads, logits averaged
            # (sgn_v14.py:1026-1034, gcn_fpn_output_merge == 2)
            logit_list = []
            for i, y_i in enumerate(ys):
                if drop is not None:
                    y_i = drop(y_i)
                logit_list.append(nn.Dense(
                    self.num_class,
                    kernel_init=init.torch_default_kernel,
                    bias_init=init.torch_default_bias(y_i.shape[-1]),
                    name=f"fc{i + 1}")(y_i))
            return jnp.mean(jnp.stack(logit_list, 0), 0), aux
        if drop is not None:
            y = drop(y)
        logits = nn.Dense(self.num_class,
                          kernel_init=init.torch_default_kernel,
                          bias_init=init.torch_default_bias(y.shape[-1]),
                          name="fc")(y)
        return logits, aux
