"""SGNTransformer — the pure-transformer SGN variant (v15).

Parity target: reference model/architecture/sgn/sgn_v15.py:
position/velocity + semantic embeddings as in SGN, then a *spatial*
transformer over joints within each frame, spatial max-pool, a *temporal*
transformer over frames, temporal max-pool, classifier. The reference's
best v15 recipe reaches 95.31% NTU-60 x-view (model/readme.yaml:1028-1048).

Two MHA backends, mirroring the reference's branch at sgn_v15.py:444-471:
when the mha kwargs carry ``norm`` the lucidrains-style CrossViT
``Transformer`` is used (per-layer d_model/d_head/d_out/ffn-out dims,
BN or LN channel PreNorm, residual projections — crossattention.py:202-304;
this is the branch every v15 ledger run uses, and the one with exact
weight-transplant parity); otherwise a torch
``nn.TransformerEncoderLayer``-style stack runs (constant width — on this
branch the temporal embedding is sized to the running feature dim, a
working superset of the reference whose torch-encoder branch would crash
when c3 differs from d_model).

TPU notes: the spatial attention's (B*T, V, C) batch folds frames into
the batch axis so QK^T is a big batched matmul; both transformers run in
channels-last, mapping directly onto MXU + fused epilogues.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from agcn_tpu.models.sgn import C1, C2, C3, C4, SGNEmbedding
from agcn_tpu.ops.attention import LucidTransformer, TransformerEncoder
from agcn_tpu.ops import initializers as init


class SGNTransformer(nn.Module):
    """Pure spatial-MHA + temporal-MHA skeleton classifier."""

    num_class: int = 60
    num_point: int = 25
    num_segment: int = 20
    in_channels: int = 3
    use_bias: bool = True
    dropout: float = 0.0
    c_multiplier: Any = 1

    input_position: int = 1
    input_velocity: int = 1
    semantic_joint: int = 1
    semantic_frame: int = 1
    semantic_class: int = 0
    input_emb_fusion: int = 1
    semantic_joint_fusion: int = 0
    semantic_frame_location: int = 0

    spatial_mha: Dict[str, Any] = None
    temporal_mha: Dict[str, Any] = None

    spatial_maxpool: int = 1
    temporal_maxpool: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cm = self.c_multiplier
        if isinstance(cm, (int, float)):
            cm = [cm] * 4
        c1, c2, c3, c4 = (int(c * m) for c, m in
                          zip((C1, C2, C3, C4), cm))
        b, t, dim = x.shape
        v = dim // self.in_channels
        x = x.reshape(b, t, v, self.in_channels)

        smha = dict(self.spatial_mha or {})
        tmha = dict(self.temporal_mha or {})
        # reference branch point (sgn_v15.py:441-446): 'norm' in the
        # kwargs selects the lucidrains CrossViT transformer — decided
        # PER ENCODER (SpatialMHA and TemporalMHA each branch on their
        # own kwargs), so a mixed config is legal upstream
        s_lucid = "norm" in smha
        t_lucid = "norm" in tmha

        # Dynamic representation (blocks/feature_extractor.py:74-103) ----
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
        if pos is not None and vel is not None:
            # input_emb_fusion: 0 concat, 1 sum (sgn_v15.py:125-126)
            feat = jnp.concatenate([pos, vel], axis=-1) \
                if self.input_emb_fusion == 0 else pos + vel
        else:
            feat = pos if pos is not None else vel

        # Semantic joint embedding: out dim follows the fused input width
        # (sgn_v15.py:165-168)
        sem_out = c2 if self.input_emb_fusion == 0 else c1
        if self.semantic_joint > 0:
            joint_tab = jnp.broadcast_to(jnp.eye(v)[None, None],
                                         (1, t, v, v))
            spa = SGNEmbedding(sem_out, mode=self.semantic_joint,
                               use_bias=self.use_bias,
                               name="joint_embed")(joint_tab, train)
            spa = jnp.broadcast_to(spa, (b, t, v, sem_out))
            if self.semantic_joint_fusion == 0:
                feat = jnp.concatenate([feat, spa], axis=-1)
            else:
                feat = feat + spa

        d_model = feat.shape[-1]

        # Temporal (frame) embedding: the reference sizes it to c3
        # unconditionally (sgn_v15.py:186-188); the generic branch keeps
        # the running width so location-0 addition stays shape-valid
        tem_emb = None
        if self.semantic_frame > 0:
            # size the embedding to the width of the tensor it is added
            # to: pre-spatial (location 1) that is d_model; post-spatial
            # (location 0) it is the spatial encoder's output — c3 for
            # the lucid stack (per-layer d_out), d_model for the generic
            # width-preserving encoder. (The reference uses c3
            # unconditionally, sgn_v15.py:186-188 — equal to these on
            # every config that is runnable upstream.)
            tem_out_ch = c3 if (s_lucid and
                                self.semantic_frame_location == 0) \
                else d_model
            frame_tab = jnp.broadcast_to(
                jnp.eye(t)[None, :, None, :], (1, t, v, t))
            tem_emb = SGNEmbedding(tem_out_ch, mode=self.semantic_frame,
                                   use_bias=self.use_bias,
                                   name="frame_embed")(frame_tab, train)
        if tem_emb is not None and self.semantic_frame_location == 1:
            feat = feat + tem_emb

        # Spatial transformer over joints, frames folded into batch
        # (sgn_v15.py:487-495)
        y = feat.reshape(b * t, v, d_model)
        if s_lucid:
            y, spa_attn = LucidTransformer.from_mha_kwargs(
                smha, name="spatial_mha")(y, train)
        else:
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

        # Temporal transformer over frames (sgn_v15.py:502-510)
        if t_lucid:
            y, tem_attn = LucidTransformer.from_mha_kwargs(
                tmha, name="temporal_mha")(feat, train)
        else:
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
            cls_emb = SGNEmbedding(c4 if t_lucid else y.shape[-1],
                                   mode=self.semantic_class,
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
