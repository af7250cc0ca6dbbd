"""AAGCNTransformer — transformer heads over a (partial) AAGCN backbone.

Functional parity target: the reference's active AAGCN experiment family
(model/architecture/aagcn/aagcn_v17,v24,v29-v37.py): a shallow AAGCN
backbone (model_layers 101/102/103) produces (B, T, V, C) features that
are re-tokenized into sequences for transformer encoders —

- mode 'temporal' (v29-style): tokens are frames, joints folded into the
  feature dim; one encoder + mean/CLS readout.
- mode 'spatial'  : tokens are joints, frames folded into batch; frame
  features pooled afterwards.
- mode 'dual'     (v36/v37-style, aagcn_v37.py:96-154): separate spatial
  and temporal encoders, each with a CLS token, fused for classification.

Built from the same TransformerEncoder as the SGN variants (pre-LN
option, per-head attention outputs).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.models.aagcn import TCNGCNUnit, layer_plan
from agcn_tpu.ops import BatchNorm
from agcn_tpu.ops import initializers as init
from agcn_tpu.ops.attention import TransformerEncoder


class AAGCNTransformer(nn.Module):
    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    model_layers: int = 101
    backbone_channels: int = 64
    adaptive: bool = True
    attention: bool = False
    kernel_size: int = 9
    stride: int = 1

    mode: str = "temporal"        # 'temporal' | 'spatial' | 'dual'
    num_layers: int = 3
    num_heads: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1
    pre_norm: bool = True
    pos_enc: str = "abs"          # 'abs' | 'cos' | 'none'
    use_cls_token: bool = True
    cross_fusion: bool = False    # v37-style CLS cross-attention (dual)
    drop_out: float = 0.0         # BaseModel classifier dropout (aagcn.py:523),
                                  # distinct from the transformer layer dropout
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _encode(self, tokens, name, train):
        return TransformerEncoder(
            num_layers=self.num_layers, num_heads=self.num_heads,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            pre_norm=self.pre_norm,
            pos_enc=None if self.pos_enc == "none" else self.pos_enc,
            max_len=tokens.shape[1] + 1, name=name)(tokens, train)

    def _with_cls(self, tokens, name):
        if not self.use_cls_token:
            return tokens
        cls = self.param(name, nn.initializers.normal(0.02),
                         (1, 1, tokens.shape[-1]))
        return jnp.concatenate(
            [jnp.broadcast_to(cls, (tokens.shape[0], 1, tokens.shape[-1])),
             tokens], axis=1)

    def _readout(self, encoded):
        if self.use_cls_token:
            return encoded[:, 0]
        return encoded.mean(axis=1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        n, c, t, v, m = x.shape
        # data BN + person fold (reference BaseModel.forward_preprocess)
        y = jnp.transpose(x, (0, 2, 4, 3, 1)).reshape(n, t, m * v * c)
        y = BatchNorm(axis_name=self.sync_axis, name="data_bn")(y, train)
        y = y.reshape(n, t, m, v, c)
        y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
        if self.dtype is not None:
            y = y.astype(self.dtype)

        plan = layer_plan(self.model_layers, self.backbone_channels)
        for name in [f"l{i}" for i in range(1, 11)]:
            if name not in plan:
                continue
            ch, stride, residual, pad = plan[name]
            y = TCNGCNUnit(ch, self.adj,
                           stride=self.stride if stride is None else stride,
                           residual=residual,
                           adaptive=self.adaptive,
                           attention=self.attention,
                           kernel_size=self.kernel_size,
                           pad=True if pad is None else pad,
                           sync_axis=self.sync_axis, dtype=self.dtype,
                           name=name)(y, train)
        y = y.astype(jnp.float32)
        bm, t2, v2, ch = y.shape

        aux = {}
        if self.mode == "temporal":
            tokens = y.reshape(bm, t2, v2 * ch)
            tokens = self._with_cls(tokens, "cls_token")
            enc, attn = self._encode(tokens, "encoder", train)
            feat = self._readout(enc)
            aux["attn"] = attn
        elif self.mode == "spatial":
            tokens = y.mean(axis=1)  # (BM, V, C) frame-pooled joint tokens
            tokens = self._with_cls(tokens, "cls_token")
            enc, attn = self._encode(tokens, "encoder", train)
            feat = self._readout(enc)
            aux["attn"] = attn
        elif self.mode == "dual":
            # temporal stream: frame tokens (joints max-pooled)
            t_tokens = jnp.max(y, axis=2)  # (BM, T, C)
            t_tokens = self._with_cls(t_tokens, "cls_token_t")
            t_enc, t_attn = self._encode(t_tokens, "temporal_encoder",
                                         train)
            # spatial stream: joint tokens (frames max-pooled)
            s_tokens = jnp.max(y, axis=1)  # (BM, V, C)
            s_tokens = self._with_cls(s_tokens, "cls_token_s")
            s_enc, s_attn = self._encode(s_tokens, "spatial_encoder",
                                         train)
            if self.cross_fusion and self.use_cls_token:
                from agcn_tpu.ops.attention import CrossTransformer

                t_enc, s_enc = CrossTransformer(
                    num_heads=self.num_heads,
                    name="cross_fusion")(t_enc, s_enc)
            feat = jnp.concatenate(
                [self._readout(t_enc), self._readout(s_enc)], axis=-1)
            aux["attn"] = {"temporal": t_attn, "spatial": s_attn}
        else:
            raise ValueError(f"unknown mode {self.mode!r}")

        # person mean (reference forward_postprocess person average)
        feat = feat.reshape(n, m, -1).mean(axis=1)
        if self.drop_out > 0.0:
            feat = nn.Dropout(self.drop_out, deterministic=not train,
                              name="fc_drop")(feat)
        logits = nn.Dense(self.num_class,
                          kernel_init=init.fc_init(self.num_class),
                          name="fc")(feat)
        return logits, aux
