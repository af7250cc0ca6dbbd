"""SGNTransformer — the pure-transformer SGN variant (v15-style).

Functional parity target: reference model/architecture/sgn/sgn_v15.py:
position/velocity + semantic embeddings as in SGN, then a *spatial*
transformer over joints within each frame, spatial max-pool, a *temporal*
transformer over frames, temporal max-pool, classifier. The reference's
best v15 recipe reaches 95.31% NTU-60 x-view (model/readme.yaml:1028-1048).

TPU notes: the spatial attention's (B*T, V, C) batch folds frames into
the batch axis so QK^T is a big batched matmul; both transformers run in
channels-last with LayerNorm, mapping directly onto MXU + fused epilogues.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from agcn_tpu.models.sgn import C1, SGNEmbedding
from agcn_tpu.ops.attention import TransformerEncoder
from agcn_tpu.ops import initializers as init


class SGNTransformer(nn.Module):
    """Pure spatial-MHA + temporal-MHA skeleton classifier."""

    num_class: int = 60
    num_point: int = 25
    num_segment: int = 20
    in_channels: int = 3
    use_bias: bool = True
    dropout: float = 0.0

    input_position: int = 1
    input_velocity: int = 1
    semantic_joint: int = 1
    semantic_frame: int = 1
    semantic_class: int = 0
    semantic_joint_fusion: int = 0
    semantic_frame_location: int = 0

    spatial_mha: Dict[str, Any] = None
    temporal_mha: Dict[str, Any] = None

    spatial_maxpool: int = 1
    temporal_maxpool: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        c1 = C1
        b, t, dim = x.shape
        v = dim // self.in_channels
        x = x.reshape(b, t, v, self.in_channels)

        dif = x[:, 1:] - x[:, :-1]
        dif = jnp.concatenate([jnp.zeros_like(x[:, :1]), dif], axis=1)
        pos = vel = None
        if self.input_position > 0:
            pos = SGNEmbedding(c1, mode=self.input_position,
                               use_bias=self.use_bias, in_norm=True,
                               name="pos_embed")(x, train)
        if self.input_velocity > 0:
            vel = SGNEmbedding(c1, mode=self.input_velocity,
                               use_bias=self.use_bias, in_norm=True,
                               name="vel_embed")(dif, train)
        feat = (pos + vel) if (pos is not None and vel is not None) \
            else (pos if pos is not None else vel)

        if self.semantic_joint > 0:
            joint_tab = jnp.broadcast_to(jnp.eye(v)[None, None],
                                         (1, t, v, v))
            spa = SGNEmbedding(c1, mode=self.semantic_joint,
                               use_bias=self.use_bias,
                               name="joint_embed")(joint_tab, train)
            spa = jnp.broadcast_to(spa, (b, t, v, c1))
            if self.semantic_joint_fusion == 0:
                feat = jnp.concatenate([feat, spa], axis=-1)
            else:
                feat = feat + spa

        smha = dict(self.spatial_mha or {})
        tmha = dict(self.temporal_mha or {})
        d_model = feat.shape[-1]

        tem_out_ch = d_model if self.semantic_frame_location == 1 \
            else d_model
        tem_emb = None
        if self.semantic_frame > 0:
            frame_tab = jnp.broadcast_to(
                jnp.eye(t)[None, :, None, :], (1, t, v, t))
            tem_emb = SGNEmbedding(tem_out_ch, mode=self.semantic_frame,
                                   use_bias=self.use_bias,
                                   name="frame_embed")(frame_tab, train)
        if tem_emb is not None and self.semantic_frame_location == 1:
            feat = feat + tem_emb

        # spatial transformer over joints, frames folded into batch
        y = feat.reshape(b * t, v, d_model)
        y, spa_attn = TransformerEncoder(
            num_layers=smha.get("num_layers", 1),
            num_heads=smha.get("nhead", 1),
            dim_feedforward=smha.get("dim_feedforward", d_model * 2),
            dropout=smha.get("dropout", 0.1),
            activation=smha.get("activation", "relu"),
            pre_norm=smha.get("pre_norm", False),
            name="spatial_mha")(y, train)
        feat = y.reshape(b, t, v, -1)

        if tem_emb is not None and self.semantic_frame_location == 0:
            feat = feat + tem_emb

        if self.spatial_maxpool == 1:
            feat = jnp.max(feat, axis=2)  # (B, T, C)
        else:
            feat = feat.reshape(b, t, -1)

        y, tem_attn = TransformerEncoder(
            num_layers=tmha.get("num_layers", 1),
            num_heads=tmha.get("nhead", 1),
            dim_feedforward=tmha.get("dim_feedforward",
                                     feat.shape[-1] * 2),
            dropout=tmha.get("dropout", 0.1),
            activation=tmha.get("activation", "relu"),
            pre_norm=tmha.get("pre_norm", False),
            name="temporal_mha")(feat, train)

        if self.temporal_maxpool == 1:
            y = jnp.max(y, axis=1)  # (B, C)
        else:
            y = y.reshape(b, -1)

        if self.semantic_class > 0:
            cls_emb = SGNEmbedding(y.shape[-1], mode=self.semantic_class,
                                   use_bias=self.use_bias,
                                   name="class_embed")(
                jnp.ones((1, 1, 1, 1)), train)
            y = y + cls_emb.reshape(1, -1)

        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout, deterministic=not train,
                           name="fc_drop")(y)
        logits = nn.Dense(self.num_class,
                          kernel_init=init.torch_default_kernel,
                          bias_init=init.torch_default_bias(y.shape[-1]),
                          name="fc")(y)
        return logits, {"spatial_attn": spa_attn, "temporal_attn": tem_attn}
