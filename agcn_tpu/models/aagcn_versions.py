"""Version-faithful AAGCN transformer variants (checkpoint-migration tier).

These models reproduce specific reference experiment versions exactly —
same math, same quirks — so their PyTorch checkpoints transplant and
verify. The TPU-idiomatic generic model (models/aagcn_transformer.py)
remains the performance path; these exist for per-version parity.

Implemented (runnable in the mounted reference):
- AAGCNv17 — temporal transformer over (N, M*T'+CLS, V*C) tokens
  (reference model/architecture/aagcn/aagcn_v17.py:154-318): backbone
  with stride=kernel_size patchify, learned/cos-sin positional encoding
  (v17's cos-sin uses log(100), aagcn_v17.py:116-122), optional
  forward/backward additive masks applied to the LAST layer only
  (:274-309), CLS/GAP readout.
- AAGCNv31 (also covering v32 via version='v32') — interleaved
  spatial/temporal transformer layers with s-t / sa-t / sa-t-res / t-s
  orderings, per-subset PA attention masks, and v32's per-layer alphas,
  post-softmax attention injection ('attn-a' modes) and its accidental
  bias-less encoder layers (aagcn_v31.py / aagcn_v32.py).
- AAGCNv30 — interleaved GCN-spatial / transformer-temporal stack
  (aagcn_v30.py:389-516): per-layer GCNUnitLocal with AdaptiveGCNV2
  (per-sample attention, :22-58) or AdaptiveGCNV3 (per-FRAME attention,
  :61-99 — including the reference's raw-layout `.view(N*T, -1, V)` on
  the un-permuted phi tensor, reproduced bit-exactly), then a torch-style
  transformer layer over (N, M*T+CLS, V*C) tokens.

Also implemented: AAGCNv24 (per-frame spatial transformer with
block-diagonal PA masks and the bug-compatible CLS_MASK readout) and
AAGCNv34 (per-person temporal/spatial interleave with plain/forked MHA,
shared relative position bias, and the v2/v3 mode family).

NOT implementable — broken as shipped in the reference (verified by
construction/forward attempts against the mounted tree):
- aagcn_v29.py: references `TCNUnit` without importing/defining it
  (aagcn_v29.py:233) -> NameError on construction.
- aagcn_v33.py: its CLS token is repeated per-sample while the tokens
  are per-person -> concat size mismatch RuntimeError on every config.
- aagcn_v35.py: its relative-position tables are sized `length` while
  the token sequences are 2x longer -> skew reshape RuntimeError.
- aagcn_v36.py / aagcn_v37.py: their CrossTransformer builds Attention
  with the default output_dim=-1 (crossattention.py:112,126) ->
  "negative dimension" RuntimeError on construction; no config avoids it.
The capability those versions describe (dual spatial/temporal streams +
CLS cross-fusion) is provided by models/aagcn_transformer.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.models.aagcn import TCNGCNUnit, layer_plan
from agcn_tpu.ops import BatchNorm, LayerNorm, PointwiseConv
from agcn_tpu.ops import initializers as init
from agcn_tpu.ops.attention import TransformerEncoderLayer


def _cossin_table(d_model: int, max_len: int, base: float) -> np.ndarray:
    """Reference CosSinPositionalEncoding table; v17 uses base=100
    (aagcn_v17.py:119), v29/v30 use base=10000 (aagcn_v29.py:43)."""
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(base) / d_model))
    pe = np.zeros((1, max_len, d_model), np.float32)
    pe[0, :, 0::2] = np.sin(position * div)
    pe[0, :, 1::2] = np.cos(position * div)
    return pe


class PosEncoding(nn.Module):
    """Learned (BERT-style) or fixed cos-sin positional encoding."""

    kind: str              # 'learned' | 'cossin' | 'none'
    d_model: int
    max_len: int = 601
    base: float = 10000.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "none":
            return x
        if self.kind == "learned":
            pe = self.param("pe", nn.initializers.normal(0.02),
                            (1, self.max_len, self.d_model))
        else:
            pe = jnp.asarray(_cossin_table(self.d_model, self.max_len,
                                           self.base))
        return x + pe[:, : x.shape[1], :]


def _subsequent_additive_mask(sz: int, backward: bool) -> jnp.ndarray:
    """torch generate_square_subsequent_mask (+optional transpose):
    0 where allowed, -inf where disallowed (aagcn_v17.py:132-137)."""
    allow = np.tril(np.ones((sz, sz), bool))
    if backward:
        allow = allow.T
    return jnp.asarray(np.where(allow, 0.0, -1e9), jnp.float32)


def _preprocess(x, data_norm, sync_axis, train):
    """BaseModel.forward_preprocess (aagcn.py:480-495): data BN/LN then
    persons folded into batch; returns (y, (n, c, t, v, m))."""
    n, c, t, v, m = x.shape
    if data_norm == "bn":
        y = jnp.transpose(x, (0, 2, 4, 3, 1)).reshape(n, t, m * v * c)
        y = BatchNorm(axis_name=sync_axis, name="data_bn")(y, train)
        y = y.reshape(n, t, m, v, c)
        y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
    elif data_norm == "ln":
        y = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(n * m, t, v * c)
        y = LayerNorm(name="data_bn")(y)
        y = y.reshape(n * m, t, v, c)
    else:
        raise ValueError(f"unknown data_norm {data_norm!r}")
    return y, (n, c, t, v, m)


def _backbone(y, adj, model_layers, output_channel, kernel_size, stride,
              pad, adaptive, attention, sync_axis, train):
    """Backbone where every unit uses the version's fixed stride
    (the v17/v29/v30 closures pass stride=kernel_size for every layer,
    e.g. aagcn_v17.py:206-218, ignoring the plan's strides)."""
    plan = layer_plan(model_layers, output_channel)
    for name in [f"l{i}" for i in range(1, 11)]:
        if name not in plan:
            continue
        ch, _, residual, _ = plan[name]
        y = TCNGCNUnit(ch, adj, stride=stride, residual=residual,
                       adaptive=adaptive, attention=attention,
                       kernel_size=kernel_size, pad=pad,
                       sync_axis=sync_axis, name=name)(y, train)
    return y


def _classify(mod, feat, train):
    """drop_out -> fc head shared by every version (the reference
    BaseModel's forward_classifier, aagcn.py:522-524, runs for all
    variants via the base forward)."""
    if mod.drop_out > 0.0:
        feat = nn.Dropout(mod.drop_out, deterministic=not train,
                          name="drop_out")(feat)
    return nn.Dense(mod.num_class, kernel_init=init.fc_init(mod.num_class),
                    name="fc")(feat)


class AAGCNv17(nn.Module):
    """Reference aagcn_v17.py Model: AAGCN patchify backbone + temporal
    transformer encoder with optional causal/anticausal masking."""

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    adaptive: bool = True
    attention: bool = True
    data_norm: str = "bn"
    kernel_size: int = 9
    pad: bool = True
    attn_masking: str = "False"   # 'False' | 'forward' | 'backward'
    trans_num_heads: int = 2
    trans_model_dim: int = 16
    trans_ffn_dim: int = 64
    trans_dropout: float = 0.2
    trans_activation: str = "gelu"
    trans_prenorm: bool = False
    trans_num_layers: int = 1
    pos_enc: str = "True"         # 'True' | 'cossin' | other -> none
    classifier_type: str = "CLS"
    drop_out: float = 0.0    # BaseModel forward_classifier dropout
    model_layers: int = 10
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        y, (n, c, t, v, m) = _preprocess(x, self.data_norm, self.sync_axis,
                                         train)
        y = _backbone(y, self.adj, self.model_layers, self.trans_model_dim,
                      self.kernel_size, self.kernel_size, self.pad,
                      self.adaptive, self.attention, self.sync_axis, train)
        nm, t2, v2, ch = y.shape
        # tokens (N, M*T', V*C) with CLS (aagcn_v17.py:290-298)
        tokens = y.reshape(n, m * t2, v2 * ch)
        if self.classifier_type == "CLS":
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, v2 * ch))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n, 1, v2 * ch)), tokens], axis=1)
        kind = "learned" if self.pos_enc in ("True", "original") else (
            "cossin" if self.pos_enc == "cossin" else "none")
        tokens = PosEncoding(kind, v2 * ch, base=100.0,
                             name="pos_encoder")(tokens)

        mask = None
        if self.attn_masking in ("forward", "backward"):
            mask = _subsequent_additive_mask(
                tokens.shape[1], backward=self.attn_masking == "backward")
        attn_list = []
        for i in range(self.trans_num_layers):
            layer_mask = mask if i == self.trans_num_layers - 1 else None
            tokens, a = TransformerEncoderLayer(
                num_heads=self.trans_num_heads,
                dim_feedforward=self.trans_ffn_dim * self.num_point,
                dropout=self.trans_dropout,
                activation=self.trans_activation,
                pre_norm=self.trans_prenorm,
                name=f"layer{i}")(tokens, train, additive_mask=layer_mask)
            attn_list.append(a)

        if self.classifier_type == "CLS":
            feat = tokens[:, 0]
        elif self.classifier_type == "GAP":
            feat = tokens.mean(axis=1)
        else:
            raise ValueError("Unknown classifier_type")
        logits = _classify(self, feat, train)
        return logits, attn_list


class AAGCNv24(nn.Module):
    """Reference aagcn_v24.py Model: a per-FRAME spatial transformer over
    (N*T', M*V+CLS, C) tokens after the patchify backbone.

    add_A builds a block-diagonal two-person mask over the 51 token slots
    (ones elsewhere): 'single' = (51, 51) from A[0], 'triple' =
    (3, 51, 51) applied per head (requires num_heads == 3), scaled by a
    shared learned alpha and ADDED to the attention logits
    (aagcn_v24.py:233-247, 295-303). classifier 'CLS' mean-pools the
    per-frame CLS tokens; 'CLS_MASK' reproduces the reference's masked
    mean VERBATIM — including its inverted mask (aagcn_v24.py:311-320
    multiplies by the empty-frame indicator, so only CLS tokens of
    all-zero frames survive).
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    adaptive: bool = True
    attention: bool = True
    kernel_size: int = 9
    pad: bool = True
    add_A: str = "False"          # 'False' | 'single' | 'triple'
    s_num_heads: int = 3
    s_model_dim: int = 24
    s_ffn_dim: int = 96
    dropout: float = 0.0
    activation: str = "gelu"
    prenorm: bool = False
    num_layers: int = 3
    pos_enc: str = "True"
    classifier_type: str = "CLS"  # 'CLS' | 'CLS_MASK'
    drop_out: float = 0.0    # BaseModel forward_classifier dropout
    model_layers: int = 101
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        n, c, t, v, m = x.shape
        if self.classifier_type == "CLS_MASK":
            # empty-frame indicator, windowed by the patchify stride
            # (aagcn_v24.py:276-281)
            empty = (jnp.sum(x, axis=(1, 3, 4)) == 0.0).astype(jnp.float32)
            empty = empty[:, ::self.kernel_size]  # (N, T')
        y, _ = _preprocess(x, "bn", self.sync_axis, train)
        y = _backbone(y, self.adj, self.model_layers, self.s_model_dim,
                      self.kernel_size, self.kernel_size, self.pad,
                      self.adaptive, self.attention, self.sync_axis, train)
        nm, t2, v2, ch = y.shape
        # (NM, T', V, C) -> (N, T', M, V, C) -> (N*T', M*V, C)
        z = y.reshape(n, m, t2, v2, ch)
        z = jnp.transpose(z, (0, 2, 1, 3, 4)).reshape(n * t2, m * v2, ch)
        cls = self.param("s_cls_token", nn.initializers.normal(1.0),
                         (1, 1, ch))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n * t2, 1, ch)), z], axis=1)
        kind = "learned" if self.pos_enc in ("True", "original") else (
            "cossin" if self.pos_enc == "cossin" else "none")
        tokens = PosEncoding(kind, ch, max_len=100,
                             name="s_pos_encoder")(tokens)

        mask = None
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        num_subset = self.adj.shape[0]
        tok = m * v2 + 1
        if self.add_A in ("single", "triple"):
            base = np.ones((num_subset, tok, tok), np.float32) \
                if self.add_A == "triple" else np.ones((tok, tok),
                                                       np.float32)
            if self.add_A == "triple":
                base[:, 1:v2 + 1, 1:v2 + 1] = self.adj
                base[:, v2 + 1:, v2 + 1:] = self.adj
            else:
                base[1:v2 + 1, 1:v2 + 1] = self.adj[0]
                base[v2 + 1:, v2 + 1:] = self.adj[0]

        attn = []
        for i in range(self.num_layers):
            layer_mask = None
            if self.add_A in ("single", "triple"):
                pa = self.param(f"s_layer{i}_PA",
                                lambda k, s: jnp.asarray(base, jnp.float32),
                                base.shape)
                layer_mask = pa * alpha
                if self.add_A == "triple":
                    # (K, L, L) applied per head (requires heads == K,
                    # aagcn_v24.py:302-303)
                    layer_mask = layer_mask[None]  # (1, H, L, L)
            tokens, a = TransformerEncoderLayer(
                num_heads=self.s_num_heads,
                dim_feedforward=self.s_ffn_dim,
                dropout=self.dropout, activation=self.activation,
                pre_norm=self.prenorm,
                name=f"s_layer{i}")(tokens, train,
                                    additive_mask=layer_mask)
            attn.append(a)

        frame_cls = tokens[:, 0].reshape(n, t2, ch)
        if self.classifier_type == "CLS":
            feat = frame_cls.mean(axis=1)
        elif self.classifier_type == "CLS_MASK":
            # bug-compatible: multiply by the EMPTY-frame indicator
            # (aagcn_v24.py:317-318) and mean over all frames
            feat = (frame_cls * empty[:, :, None]).mean(axis=1)
        else:
            raise ValueError("Unknown classifier_type")
        logits = _classify(self, feat, train)
        return logits, attn


class AAGCNv31(nn.Module):
    """Reference aagcn_v31.py / aagcn_v32.py Models: interleaved
    spatial/temporal transformer layers over patchified AAGCN features.

    Spatial tokens are joints with (T*C) features; temporal tokens are
    frames with (V*C) features and a CLS slot. trans_seq orders the two
    per layer:
    - 's-t' (aagcn_v31.py:339-356): one spatial encoder over
      (N, M*V, T*C), then temporal.
    - 'sa-t' (:365-394): per-subset spatial encoders over (NM, V, T*C)
      with additive PA masks (PA initialized from the graph A, scaled by
      the shared alpha when add_Aa for v31, or each layer's OWN alpha
      for v32 — aagcn_v32.py:373-377), outputs summed onto x, LayerNorm.
    - 'sa-t-res' (:396-430): as sa-t with dropout + a residual around
      the temporal encoder and a second LayerNorm (v32 passes PA*alpha
      as post-softmax global_attn instead, aagcn_v32.py:436).
    - 't-s' (:432-449): temporal first, then spatial.
    - v32-only 'sa-t-attn-a' / 'sa-t-res-attn-a' (aagcn_v32.py:396-425,
      461-490): the spatial layers INJECT attention post-softmax —
      applied weights = softmax(..)*alpha + PA (the forked MHA's
      global_attn/alpha path, multiheadattention.py:49-54).
    Set version='v32' for per-layer alphas + the attn-a modes.
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    adaptive: bool = True
    attention: bool = True
    kernel_size: int = 9
    pad: bool = True
    backbone_dim: int = 16
    add_A: bool = False
    add_Aa: bool = False
    version: str = "v31"          # 'v31' | 'v32'
    trans_seq: str = "s-t"
    multi_trans_dropout: float = 0.0
    res_dropout: float = 0.2
    t_num_heads: int = 2
    t_model_dim: int = 16     # per-joint dim; token dim = dim * V
    t_ffn_dim: int = 64       # per-joint ffn dim; scaled by V
    s_num_heads: int = 2
    s_model_dim: int = 16     # per-frame dim; token dim = dim * T'
    s_ffn_dim: int = 64       # per-frame ffn; scaled by T' (=100 ref)
    dropout: float = 0.0
    activation: str = "gelu"
    prenorm: bool = False
    num_layers: int = 3
    pos_enc: str = "True"
    classifier_type: str = "CLS"
    drop_out: float = 0.0    # BaseModel forward_classifier dropout
    model_layers: int = 101
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        y, (n, c, t, v, m) = _preprocess(x, "bn", self.sync_axis, train)
        y = _backbone(y, self.adj, self.model_layers, self.backbone_dim,
                      self.kernel_size, self.kernel_size, self.pad,
                      self.adaptive, self.attention, self.sync_axis, train)
        nm, t2, v2, ch = y.shape
        t_dim = v2 * ch
        s_dim = t2 * ch
        tokens = y.reshape(n, m * t2, t_dim)
        has_cls = self.classifier_type == "CLS"
        if has_cls:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, t_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n, 1, t_dim)), tokens], axis=1)
        kind = "learned" if self.pos_enc in ("True", "original") else (
            "cossin" if self.pos_enc == "cossin" else "none")
        tokens = PosEncoding(kind, t_dim, name="t_pos_encoder")(tokens)

        num_subset = self.adj.shape[0]
        alpha = self.param("sa_alpha", nn.initializers.zeros, (1,)) \
            if (self.add_A and self.add_Aa) else None

        def drop(z, rate, name):
            if rate > 0.0:
                return nn.Dropout(rate, deterministic=not train,
                                  name=name)(z)
            return z

        enc_bias = self.version != "v32"  # v32 layers lost their
        # linear/norm biases to a positional-arg slip (aagcn_v32.py:77-78)

        def t_layer(z, i):
            out, _ = TransformerEncoderLayer(
                num_heads=self.t_num_heads,
                dim_feedforward=self.t_ffn_dim * self.num_point,
                dropout=self.dropout, activation=self.activation,
                pre_norm=self.prenorm, bias=enc_bias,
                name=f"t_layer{i}")(z, train)
            return out

        def body_to_joints(body):
            z = body.reshape(n, m, t2, v2, ch)
            z = jnp.transpose(z, (0, 1, 3, 2, 4))
            return z

        def joints_to_body(z):
            z = jnp.transpose(z, (0, 1, 3, 2, 4))
            return z.reshape(n, m * t2, t_dim)

        def spatial_plain(body, i):
            z = body_to_joints(body).reshape(n, m * v2, s_dim)
            z, _ = TransformerEncoderLayer(
                num_heads=self.s_num_heads,
                dim_feedforward=self.s_ffn_dim * t2,
                dropout=self.dropout, activation=self.activation,
                pre_norm=self.prenorm, bias=enc_bias,
                name=f"s_layer{i}")(z, train)
            return joints_to_body(z.reshape(n, m, v2, t2, ch))

        # sa_norm is ONE shared LayerNorm when add_A, identity otherwise
        # (aagcn_v31.py:119-122 constructor); res_norm likewise for the
        # '-res' sequences
        sa_norm = nn.LayerNorm(name="sa_norm") if self.add_A else None
        res_norm = nn.LayerNorm(name="res_norm") \
            if "res" in self.trans_seq else None

        def spatial_attn(body, i):
            """'sa' step: per-subset encoders with PA-derived attention
            when add_A, else a single unmasked encoder; returns the
            (NM, V, S) tokens and the summed outputs. The PA application
            depends on version/mode (see class docstring)."""
            z = body_to_joints(body).reshape(n * m, v2, s_dim)
            outs = []
            if self.add_A:
                for a_i in range(num_subset):
                    pa = self.param(f"s_layer{i}_PA{a_i}",
                                    lambda k, s, a_i=a_i: jnp.asarray(
                                        self.adj[a_i], jnp.float32),
                                    (v2, v2))
                    add_mask = g_attn = a_scale = None
                    if self.version == "v32":
                        la = self.param(f"s_layer{i}_alpha{a_i}",
                                        nn.initializers.zeros, (1,))
                        if self.trans_seq == "sa-t":
                            add_mask = pa * la
                        elif self.trans_seq == "sa-t-res":
                            g_attn = pa * la
                        else:  # 'sa-t-attn-a' / 'sa-t-res-attn-a'
                            g_attn, a_scale = pa, la
                    else:
                        add_mask = pa * (alpha if alpha is not None
                                         else 1.0)
                    out, _ = TransformerEncoderLayer(
                        num_heads=self.s_num_heads,
                        dim_feedforward=self.s_ffn_dim * t2,
                        dropout=self.dropout, activation=self.activation,
                        pre_norm=self.prenorm, bias=enc_bias,
                        name=f"s_layer{i}_subset{a_i}")(
                        z, train, additive_mask=add_mask,
                        alpha=a_scale, global_attn=g_attn)
                    outs.append(out)
            else:
                out, _ = TransformerEncoderLayer(
                    num_heads=self.s_num_heads,
                    dim_feedforward=self.s_ffn_dim * t2,
                    dropout=self.dropout, activation=self.activation,
                    pre_norm=self.prenorm, bias=enc_bias,
                    name=f"s_layer{i}")(z, train)
                outs.append(out)
            return z, sum(outs)

        def reattach(z):
            body = joints_to_body(z.reshape(n, m, v2, t2, ch))
            return jnp.concatenate([tokens[:, :1], body], axis=1) \
                if has_cls else body

        attn: list = []
        for i in range(self.num_layers):
            if self.trans_seq == "s-t":
                body = tokens[:, 1:] if has_cls else tokens
                body = spatial_plain(body, i)
                tokens = jnp.concatenate([tokens[:, :1], body], axis=1) \
                    if has_cls else body
                tokens = t_layer(tokens, i)
            elif self.trans_seq in ("sa-t", "sa-t-attn-a"):
                body = tokens[:, 1:] if has_cls else tokens
                z, s_sum = spatial_attn(body, i)
                z = z + s_sum  # aagcn_v31.py:383
                if sa_norm is not None:
                    z = sa_norm(z)
                tokens = reattach(z)
                tokens = t_layer(tokens, i)
            elif self.trans_seq in ("sa-t-res",
                                    "sa-t-res-attn-a"):
                body = tokens[:, 1:] if has_cls else tokens
                z, s_sum = spatial_attn(body, i)
                z = z + drop(s_sum, self.multi_trans_dropout,
                             f"mt_drop{i}")
                if sa_norm is not None:
                    z = sa_norm(z)
                x2 = reattach(z)
                x2 = t_layer(x2, i)
                tokens = tokens + drop(x2, self.res_dropout,
                                       f"res_drop{i}")
                tokens = res_norm(tokens)
            elif self.trans_seq == "t-s":
                tokens = t_layer(tokens, i)
                body = tokens[:, 1:] if has_cls else tokens
                body = spatial_plain(body, i)
                tokens = jnp.concatenate([tokens[:, :1], body], axis=1) \
                    if has_cls else body
            else:
                raise ValueError(f"unknown trans_seq {self.trans_seq!r}")

        if self.classifier_type == "CLS":
            feat = tokens[:, 0]
        elif self.classifier_type == "GAP":
            feat = tokens.mean(axis=1)
        else:
            raise ValueError("Unknown classifier_type")
        logits = _classify(self, feat, train)
        return logits, attn


class AAGCNv34(nn.Module):
    """Reference aagcn_v34.py Model: per-PERSON temporal/spatial
    transformer interleave over (N*M, T'(+CLS), V*C) tokens.

    trans_seq: 's-t' / 't-s' (plain layers — the positional-arg slip
    leaves even the torch MHA bias-less here), 'sa-t[-res]' (per-subset
    spatial layers, PA*alpha injected POST-softmax via global_attn,
    summed residually + shared sa_norm, aagcn_v34.py:402-441), and the
    '-v2'/'-v3' variants which switch to the forked MHA with a shared
    1D relative position bias ('rel-shared'); 'v3' REPLACES the spatial
    tokens with the dropped sum normalized by a per-layer sa_norm
    (:432-435) instead of adding them. '-res' wraps the temporal output
    in dropout + residual + res_norm. Readout takes token 0 of the
    flattened (N, M*(T'+1), V*C) sequence — person 0's CLS
    (aagcn_v34.py:509-517); CLS-POOL adds fc+tanh.
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    adaptive: bool = True
    attention: bool = True
    kernel_size: int = 9
    pad: bool = True
    backbone_dim: int = 16
    trans_len: int = 100
    add_A: bool = False
    add_Aa: str = "None"          # 'None'|'False'|'True'|'zero'|'one'
    trans_seq: str = "s-t"
    multi_trans_dropout: float = 0.0
    res_dropout: float = 0.2
    t_num_heads: int = 2
    t_model_dim: int = 16         # token dim = dim * V
    t_ffn_dim: int = 64
    t_length: int = 101
    s_num_heads: int = 2
    s_model_dim: int = 16         # token dim = dim * trans_len
    s_ffn_dim: int = 64
    s_length: int = 25
    pos_emb: str = "rel-shared"
    dropout: float = 0.0
    activation: str = "gelu"
    prenorm: bool = False
    num_layers: int = 3
    pos_enc: str = "True"
    classifier_type: str = "CLS"
    drop_out: float = 0.0    # BaseModel forward_classifier dropout
    model_layers: int = 101
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        y, (n, c, t, v, m) = _preprocess(x, "bn", self.sync_axis, train)
        y = _backbone(y, self.adj, self.model_layers, self.backbone_dim,
                      self.kernel_size, self.kernel_size, self.pad,
                      self.adaptive, self.attention, self.sync_axis, train)
        nm, t2, v2, ch = y.shape
        t_dim = v2 * ch
        s_dim = t2 * ch

        use_fork = "v2" in self.trans_seq or "v3" in self.trans_seq
        rel_t = self.t_length if use_fork and "rel" in self.pos_emb else 0
        rel_s = self.s_length if use_fork and "rel" in self.pos_emb else 0
        # plain modes keep torch's own MHA, which the bias slip also
        # strips; the fork MHA replaces it WITH biases in v2/v3 modes
        attn_bias = use_fork

        tokens = y.reshape(n * m, t2, t_dim)
        has_cls = "CLS" in self.classifier_type
        if has_cls:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, t_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n * m, 1, t_dim)), tokens], axis=1)
        kind = "learned" if self.pos_enc in ("True", "original") else (
            "cossin" if self.pos_enc == "cossin" else "none")
        tokens = PosEncoding(kind, t_dim, name="t_pos_encoder")(tokens)

        num_subset = self.adj.shape[0]
        res_norm = nn.LayerNorm(name="res_norm") \
            if "res" in self.trans_seq else None
        shared_sa_norm = None
        if self.add_A and "v3" not in self.trans_seq \
                and self.trans_seq.startswith("sa"):
            shared_sa_norm = nn.LayerNorm(name="sa_norm")

        def drop(z, rate, name):
            if rate > 0.0:
                return nn.Dropout(rate, deterministic=not train,
                                  name=name)(z)
            return z

        def t_layer(z, i):
            out, _ = TransformerEncoderLayer(
                num_heads=self.t_num_heads,
                dim_feedforward=self.t_ffn_dim * self.num_point,
                dropout=self.dropout, activation=self.activation,
                pre_norm=self.prenorm, bias=False, attn_bias=attn_bias,
                rel_pos_len=rel_t, name=f"t_layer{i}")(z, train)
            return out

        def strip(z):
            return z[:, 1:] if has_cls else z

        def to_joints(body):
            z = body.reshape(n * m, t2, v2, ch)
            z = jnp.transpose(z, (0, 2, 1, 3)).reshape(n * m, v2, s_dim)
            return z

        def from_joints(z):
            z = z.reshape(n * m, v2, t2, ch)
            return jnp.transpose(z, (0, 2, 1, 3)).reshape(n * m, t2,
                                                          t_dim)

        def reattach(body, prev):
            return jnp.concatenate([prev[:, :1], body], axis=1) \
                if has_cls else body

        def spatial_plain(z, i):
            out, _ = TransformerEncoderLayer(
                num_heads=self.s_num_heads,
                dim_feedforward=self.s_ffn_dim * self.trans_len,
                dropout=self.dropout, activation=self.activation,
                pre_norm=self.prenorm, bias=False, attn_bias=attn_bias,
                rel_pos_len=rel_s, name=f"s_layer{i}")(z, train)
            return out

        def spatial_subsets(z, i):
            """Per-subset spatial layers -> list of outputs."""
            outs = []
            for a_i in range(num_subset):
                pa = self.param(f"s_layer{i}_PA{a_i}",
                                lambda k, s, a_i=a_i: jnp.asarray(
                                    self.adj[a_i], jnp.float32),
                                (v2, v2))
                la = None
                if self.add_Aa in ("True", "zero"):
                    la = self.param(f"s_layer{i}_alpha{a_i}",
                                    nn.initializers.zeros, (1,))
                elif self.add_Aa == "one":
                    la = self.param(f"s_layer{i}_alpha{a_i}",
                                    nn.initializers.ones, (1,))
                if not use_fork:
                    # bug-compatible: with the plain torch MHA the
                    # isinstance guard (aagcn_v34.py:115-117) silently
                    # drops alpha/global_attn — the masks have NO effect
                    g_attn = a_scale = None
                elif "v3" in self.trans_seq:
                    g_attn, a_scale = pa, la
                else:
                    g_attn = pa * (la if la is not None else 1.0)
                    a_scale = None
                out, _ = TransformerEncoderLayer(
                    num_heads=self.s_num_heads,
                    dim_feedforward=self.s_ffn_dim * self.trans_len,
                    dropout=self.dropout, activation=self.activation,
                    pre_norm=self.prenorm, bias=False,
                    attn_bias=attn_bias, rel_pos_len=rel_s,
                    name=f"s_layer{i}_subset{a_i}")(
                    z, train, alpha=a_scale, global_attn=g_attn)
                outs.append(out)
            return outs

        seq = self.trans_seq.replace("-v2", "").replace("-v3", "")
        for i in range(self.num_layers):
            if seq == "t-s":
                x1 = t_layer(tokens, i)
                z = spatial_plain(to_joints(strip(x1)), i)
                x2 = reattach(from_joints(z), x1)
            elif seq == "s-t" or (seq == "s-t-res" and use_fork):
                # plain 's-t-res' (no v2/v3) is NOT dispatched by the
                # reference (aagcn_v34.py:452-503 elif chain) and would
                # NameError there; only 's-t-res-v2' is valid.
                z = spatial_plain(to_joints(strip(tokens)), i)
                x1 = reattach(from_joints(z), tokens)
                x2 = t_layer(x1, i)
            elif seq in ("sa-t", "sa-t-res"):
                z = to_joints(strip(tokens))
                if self.add_A:
                    outs = spatial_subsets(z, i)
                elif "v3" in self.trans_seq:
                    # reference: add_A=False leaves a plain ModuleList;
                    # the v3 path's list(_layers)[:-1] is then empty and
                    # torch.stack([]) crashes (aagcn_v34.py:411-417,431)
                    raise ValueError(
                        "trans_seq 'sa-t*-v3' requires add_A=True "
                        "(broken-as-shipped upstream otherwise)")
                else:
                    # reference ctor else-branch (aagcn_v34.py:344-353):
                    # a single PA-less spatial layer, mask=None
                    outs = [spatial_plain(z, i)]
                ssum = sum(outs)
                if "v3" in self.trans_seq:
                    # v3: REPLACE with the dropped sum, per-layer sa_norm
                    z = drop(ssum, self.multi_trans_dropout,
                             f"mt_drop{i}")
                    z = nn.LayerNorm(name=f"sa_norm{i}")(z)
                else:
                    z = z + drop(ssum, self.multi_trans_dropout,
                                 f"mt_drop{i}")
                    if shared_sa_norm is not None:
                        z = shared_sa_norm(z)
                x1 = reattach(from_joints(z), tokens)
                x2 = t_layer(x1, i)
            else:
                raise ValueError(f"unknown trans_seq {self.trans_seq!r}")
            if "res" in self.trans_seq:
                tokens = tokens + drop(x2, self.res_dropout,
                                       f"res_drop{i}")
                tokens = res_norm(tokens)
            else:
                tokens = x2

        flat = tokens.reshape(n, -1, t_dim)
        if self.classifier_type in ("CLS", "CLS-POOL"):
            feat = flat[:, 0]
            if "POOL" in self.classifier_type:
                feat = nn.tanh(nn.Dense(t_dim, name="cls_pool_fc")(feat))
        elif self.classifier_type == "GAP":
            feat = flat.mean(axis=1)
        else:
            raise ValueError("Unknown classifier_type")
        logits = _classify(self, feat, train)
        return logits, None


class AdaptiveGCNv3(nn.Module):
    """Per-frame adaptive attention GCN (reference aagcn_v30.py:61-99).

    The phi path reproduces the reference's raw `.view(N*T, -1, V)` on
    the (N, C, T, V)-ordered tensor — a layout quirk that interleaves
    channel and time — exactly.
    """

    out_channels: int
    inter_channels: int
    adj: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # x: (NM, T, V, C) channels-last
        num_subset = self.adj.shape[0]
        nm, t, v, c = x.shape
        pa = self.param("PA", lambda k, s: jnp.asarray(self.adj,
                                                       jnp.float32),
                        self.adj.shape)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        y = None
        for k in range(num_subset):
            theta = PointwiseConv(self.inter_channels,
                                  name=f"conv_a{k}")(x)  # (NM,T,V,Ci)
            phi = PointwiseConv(self.inter_channels,
                                name=f"conv_b{k}")(x)
            theta = theta.reshape(nm * t, v, self.inter_channels)
            # reference: conv_b out in (N, Ci, T, V) order viewed as
            # (N*T, Ci, V) WITHOUT permuting — reproduce that layout
            phi_nchw = jnp.transpose(phi, (0, 3, 1, 2))  # (NM, Ci, T, V)
            phi = phi_nchw.reshape(nm * t, self.inter_channels, v)
            logits = jnp.einsum("bvc,bcw->bvw", theta, phi) \
                / self.inter_channels
            att = jax.nn.softmax(logits, axis=-2)
            a1 = pa[k][None] + att * alpha  # (NM*T, V, V)
            a1 = a1.reshape(nm, t, v, v)
            agg = jnp.einsum("btvc,btvw->btwc", x, a1)
            z = PointwiseConv(self.out_channels, name=f"conv_d{k}")(agg)
            y = z if y is None else y + z
        return y


class AdaptiveGCNv2(nn.Module):
    """Per-sample adaptive attention GCN (reference aagcn_v30.py:22-58;
    mathematically the base AdaptiveGCN with attention-output plumbing)."""

    out_channels: int
    inter_channels: int
    adj: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        num_subset = self.adj.shape[0]
        nm, t, v, c = x.shape
        pa = self.param("PA", lambda k, s: jnp.asarray(self.adj,
                                                       jnp.float32),
                        self.adj.shape)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        y = None
        for k in range(num_subset):
            theta = PointwiseConv(self.inter_channels,
                                  name=f"conv_a{k}")(x)
            phi = PointwiseConv(self.inter_channels,
                                name=f"conv_b{k}")(x)
            logits = jnp.einsum("btvc,btwc->bvw", theta, phi) \
                / (self.inter_channels * t)
            att = jax.nn.softmax(logits, axis=-2)
            a1 = pa[k][None] + att * alpha  # (NM, V, V)
            agg = jnp.einsum("btvc,bvw->btwc", x, a1)
            z = PointwiseConv(self.out_channels, name=f"conv_d{k}")(agg)
            y = z if y is None else y + z
        return y


class GCNUnitLocal(nn.Module):
    """GCNUnit wrapper used as the v30 'spatial transformer' layer
    (aagcn_v30.py:102-124): agcn -> BN(+1e-6 init) + identity residual
    -> ReLU, attention off."""

    dim: int
    adj: Any
    gcn_version: str = "v3"    # 'v2' | 'v3'
    coff_embedding: int = 4
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        inter = self.dim // self.coff_embedding
        cls = AdaptiveGCNv2 if self.gcn_version == "v2" else AdaptiveGCNv3
        y = cls(self.dim, inter, self.adj, name="agcn")(x, train)
        y = BatchNorm(scale_init_value=1e-6, axis_name=self.sync_axis,
                      name="bn")(y, train)
        return nn.relu(y + x)


class AAGCNv30(nn.Module):
    """Reference aagcn_v30.py Model: interleaved GCN-spatial /
    transformer-temporal layers over patchified AAGCN features."""

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    adaptive: bool = True
    attention: bool = True
    kernel_size: int = 9
    pad: bool = True
    backbone_dim: int = 64
    gcn_trans_unit: str = "v3"
    t_num_heads: int = 2
    t_model_dim: int = 64       # per-joint dim; token dim = dim * V
    t_ffn_dim: int = 256
    t_dropout: float = 0.0
    t_activation: str = "gelu"
    t_prenorm: bool = False
    num_layers: int = 3
    pos_enc: str = "True"
    classifier_type: str = "CLS"
    drop_out: float = 0.0    # BaseModel forward_classifier dropout
    model_layers: int = 101
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        y, (n, c, t, v, m) = _preprocess(x, "bn", self.sync_axis, train)
        y = _backbone(y, self.adj, self.model_layers, self.backbone_dim,
                      self.kernel_size, self.kernel_size, self.pad,
                      self.adaptive, self.attention, self.sync_axis, train)
        nm, t2, v2, ch = y.shape
        t_dim = self.t_model_dim * self.num_point
        tokens = y.reshape(n, m * t2, v2 * ch)
        if self.classifier_type == "CLS":
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, t_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (n, 1, t_dim)), tokens], axis=1)
        kind = "learned" if self.pos_enc in ("True", "original") else (
            "cossin" if self.pos_enc == "cossin" else "none")
        tokens = PosEncoding(kind, t_dim, name="t_pos_encoder")(tokens)

        has_cls = self.classifier_type == "CLS"
        attn = []
        for i in range(self.num_layers):
            # spatial: non-CLS tokens -> (NM, T, V, C) -> GCNUnitLocal
            body = tokens[:, 1:] if has_cls else tokens
            x0 = body.reshape(n, m, t2, v2, ch).reshape(n * m, t2, v2, ch)
            x0 = GCNUnitLocal(ch, self.adj,
                              gcn_version=self.gcn_trans_unit,
                              sync_axis=self.sync_axis,
                              name=f"s_layer{i}")(x0, train)
            body = x0.reshape(n, m * t2, v2 * ch)
            tokens = jnp.concatenate([tokens[:, :1], body], axis=1) \
                if has_cls else body
            # temporal: torch transformer layer over all tokens
            tokens, a = TransformerEncoderLayer(
                num_heads=self.t_num_heads,
                dim_feedforward=self.t_ffn_dim,
                dropout=self.t_dropout,
                activation=self.t_activation,
                pre_norm=self.t_prenorm,
                name=f"t_layer{i}")(tokens, train)
            attn.append(a)

        if self.classifier_type == "CLS":
            feat = tokens[:, 0]
        elif self.classifier_type == "GAP":
            feat = tokens.mean(axis=1)
        else:
            raise ValueError("Unknown classifier_type")
        logits = _classify(self, feat, train)
        return logits, attn
