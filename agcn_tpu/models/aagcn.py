"""AAGCN — attention-augmented adaptive graph conv network, TPU-native.

Functional parity target: reference model/architecture/aagcn/aagcn.py
(SpatialAttention :59-76, TemporalAttention :79-96, ChannelAttention
:99-116, NonAdaptiveGCN :119-142, AdaptiveGCN :145-177, TCNUnit :184-207,
GCNUnit :210-271, TCNGCNUnit :274-322, BaseModel/Model :328-577).

Differences from AGCN (agcn.py): the learned adjacency PA replaces (rather
than perturbs) the static A in the adaptive path, the data-dependent
attention is gated by a learned scalar alpha, and each block can append
SE-style spatial/temporal/channel attention. Layout and fusion strategy are
identical to models/agcn.py: channels-last (B, T, V, C), dense V<=25
adjacency in VMEM, pointwise convs as MXU matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.ops import BatchNorm, LayerNorm, PointwiseConv, TemporalConv
from agcn_tpu.ops import gcn as gcn_ops
from agcn_tpu.ops import initializers as init


class SpatialAttention(nn.Module):
    """SE attention over joints (reference aagcn.py:59-76)."""

    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        se = x.mean(axis=1)  # (B, V, C)
        pad = (self.kernel_size - 1) // 2
        se = nn.Conv(1, kernel_size=(self.kernel_size,),
                     padding=[(pad, pad)],
                     kernel_init=init.xavier_normal,
                     name="conv_sa")(se)
        se = nn.sigmoid(se)  # (B, V, 1)
        return x * se[:, None, :, :] + x


class TemporalAttention(nn.Module):
    """SE attention over frames (reference aagcn.py:79-96); zero-init conv."""

    kernel_size: int = 9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        se = x.mean(axis=2)  # (B, T, C)
        pad = (self.kernel_size - 1) // 2
        se = nn.Conv(1, kernel_size=(self.kernel_size,),
                     padding=[(pad, pad)],
                     kernel_init=nn.initializers.zeros,
                     name="conv_ta")(se)
        se = nn.sigmoid(se)  # (B, T, 1)
        return x * se[:, :, None, :] + x


class ChannelAttention(nn.Module):
    """SE attention over channels (reference aagcn.py:99-116)."""

    reduction: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        se = x.mean(axis=(1, 2))  # (B, C)
        se = nn.relu(nn.Dense(c // self.reduction,
                              kernel_init=init.kaiming_normal_fan_in,
                              name="fc1c")(se))
        se = nn.sigmoid(nn.Dense(c, kernel_init=nn.initializers.zeros,
                                 name="fc2c")(se))
        return x * se[:, None, None, :] + x


class AdaptiveGCN(nn.Module):
    """Learned adjacency + alpha-gated embedding attention + projections.

    z = sum_k W_k ( x @ (PA_k + alpha * C_k(x)) )   (aagcn.py:145-177)
    """

    out_channels: int
    inter_channels: int
    adj: Any  # (K, V, V) initial value for PA
    dtype: Optional[jnp.dtype] = None
    formulation: str = "agg_packed"  # ops/gcn.apply_gcn
    attn_form: str = "transposed"    # ops/gcn.attention_logits
    edge_mesh: Any = None  # Mesh with 'edge' axis: in-model edge partition
    eval_formulation: Optional[str] = None  # override the eval-mode form

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_subset = self.adj.shape[0]
        in_c = x.shape[-1]
        inter_c = self.inter_channels
        pa = self.param("PA",
                        lambda k, s: jnp.asarray(self.adj, jnp.float32),
                        self.adj.shape)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))

        # per-subset params applied as wide fused GEMMs (see
        # models/agcn.py UnitGCN) — numerically identical to the
        # reference's per-subset loop (aagcn.py:164-177)
        k_a = [self.param(f"conv_a{k}_kernel", init.kaiming_normal_fan_out,
                          (in_c, inter_c)) for k in range(num_subset)]
        b_a = [self.param(f"conv_a{k}_bias", nn.initializers.zeros,
                          (inter_c,)) for k in range(num_subset)]
        k_b = [self.param(f"conv_b{k}_kernel", init.kaiming_normal_fan_out,
                          (in_c, inter_c)) for k in range(num_subset)]
        b_b = [self.param(f"conv_b{k}_bias", nn.initializers.zeros,
                          (inter_c,)) for k in range(num_subset)]
        k_d = [self.param(f"conv_d{k}_kernel",
                          init.conv_branch_init(num_subset),
                          (in_c, self.out_channels))
               for k in range(num_subset)]
        b_d = [self.param(f"conv_d{k}_bias", nn.initializers.zeros,
                          (self.out_channels,)) for k in range(num_subset)]

        compute = x if self.dtype is None else x.astype(self.dtype)
        emb_w = jnp.concatenate(k_a + k_b, axis=-1)
        emb_b = jnp.concatenate(b_a + b_b)
        if self.dtype is not None:
            emb_w = emb_w.astype(self.dtype)
            emb_b = emb_b.astype(self.dtype)
        emb = compute @ emb_w + emb_b
        # selectable logits formulation shared with UnitGCN
        # (ops/gcn.attention_logits; 'transposed' is the round-2 winner)
        logits = gcn_ops.attention_logits(emb, num_subset, inter_c,
                                          self.attn_form)
        # softmax in fp32 for bf16 stability, result back in compute dtype
        att = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        att = att.astype(compute.dtype)  # (B, K, V, V)
        a1 = pa[None].astype(att.dtype) + att * alpha.astype(att.dtype)
        # live-demo visualization hook (see models/agcn.py UnitGCN)
        self.sow("intermediates", "g", a1)

        out_b = sum(b_d)
        w_stack = jnp.stack(k_d)  # (K, C, Co)
        if self.dtype is not None:
            w_stack = w_stack.astype(self.dtype)
            out_b = out_b.astype(self.dtype)
        if self.edge_mesh is not None \
                and self.edge_mesh.shape.get("edge", 1) > 1:
            # north-star path: adjacency subsets partitioned over the
            # 'edge' mesh axis, partials combined by an overlapped
            # time-chunked ring (parallel/edge_partition.model_edge_gcn)
            from agcn_tpu.parallel.edge_partition import model_edge_gcn

            return model_edge_gcn(compute, a1, w_stack,
                                  self.edge_mesh) + out_b
        # training: 'agg' fuses best in the full step; inference: 'agg'
        # also wins on the current toolchain (+5% over the round-2 'pf'
        # pick at batch 64 AND 256 — round-5 eval-forms sweep on the
        # shared kernel, tools/bench_eval_study.py --forms)
        form = self.formulation if train else \
            (self.eval_formulation or "agg")
        return gcn_ops.apply_gcn(compute, a1, w_stack, form) + out_b


class NonAdaptiveGCN(nn.Module):
    """Fixed-adjacency aggregation + projections (aagcn.py:119-142).

    The K-subset aggregate+project+sum folds into ONE (V*Cin, V*Cout)
    matmul via the fused static operator — the whole graph conv is a
    single large MXU op.
    """

    out_channels: int
    inter_channels: int  # unused; kept for signature parity
    adj: Any
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_subset = self.adj.shape[0]
        in_c = x.shape[-1]
        kernels = [
            self.param(f"conv_d{k}_kernel", init.conv_branch_init(num_subset),
                       (in_c, self.out_channels))
            for k in range(num_subset)
        ]
        biases = [
            self.param(f"conv_d{k}_bias", nn.initializers.zeros,
                       (self.out_channels,))
            for k in range(num_subset)
        ]
        operator = gcn_ops.fused_static_operator(
            jnp.asarray(self.adj, x.dtype), jnp.stack(kernels).astype(x.dtype))
        y = gcn_ops.apply_fused_static(x, operator, self.adj.shape[-1])
        return y + sum(biases)


class GCNUnit(nn.Module):
    """Graph conv + BN + residual + ReLU + optional STC attention.

    Parity: reference aagcn.py:210-271.
    """

    out_channels: int
    adj: Any
    coff_embedding: int = 4
    adaptive: bool = True
    attention: bool = True
    gbn_split: int = 1
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    formulation: str = "agg_packed"
    attn_form: str = "transposed"    # ops/gcn.attention_logits
    edge_mesh: Any = None
    fold_bn: bool = False  # BNs skipped at eval (folded variables only)
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_c = x.shape[-1]
        inter_c = self.out_channels // self.coff_embedding
        gcn_cls = AdaptiveGCN if self.adaptive else NonAdaptiveGCN
        if self.adaptive:
            y = gcn_cls(self.out_channels, inter_c, self.adj,
                        dtype=self.dtype, formulation=self.formulation,
                        attn_form=self.attn_form,
                        edge_mesh=self.edge_mesh,
                        eval_formulation=self.eval_formulation,
                        name="agcn")(x, train)
        else:
            y = gcn_cls(self.out_channels, inter_c, self.adj,
                        dtype=self.dtype, name="agcn")(x)
        y = BatchNorm(scale_init_value=1e-6, axis_name=self.sync_axis,
                      splits=self.gbn_split,
                      identity_at_eval=self.fold_bn, name="bn")(y, train)
        if in_c != self.out_channels:
            down = PointwiseConv(self.out_channels, dtype=self.dtype,
                                 name="down_conv")(x)
            down = BatchNorm(axis_name=self.sync_axis,
                             splits=self.gbn_split,
                             identity_at_eval=self.fold_bn,
                             name="down_bn")(down, train)
        else:
            down = x
        y = nn.relu(y + down)
        if self.attention:
            v = self.adj.shape[-1]
            ker_jpt = v if v % 2 else v - 1
            y = SpatialAttention(ker_jpt, name="attn_s")(y)
            y = TemporalAttention(name="attn_t")(y)
            y = ChannelAttention(name="attn_c")(y)
        return y


class TCNUnit(nn.Module):
    """Temporal conv + BN (reference aagcn.py:184-207)."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    pad: bool = True
    gbn_split: int = 1
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = TemporalConv(self.out_channels, kernel_size=self.kernel_size,
                         stride=self.stride, pad=self.pad, dtype=self.dtype,
                         name="conv")(x)
        return BatchNorm(axis_name=self.sync_axis, splits=self.gbn_split,
                         identity_at_eval=self.fold_bn,
                         name="bn")(x, train)


class TCNGCNUnit(nn.Module):
    """GCN -> TCN -> +residual -> ReLU (reference aagcn.py:274-322)."""

    out_channels: int
    adj: Any
    stride: int = 1
    residual: bool = True
    adaptive: bool = True
    attention: bool = True
    kernel_size: int = 9
    pad: bool = True
    gbn_split: int = 1
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    formulation: str = "agg_packed"
    attn_form: str = "transposed"    # ops/gcn.attention_logits
    edge_mesh: Any = None
    fold_bn: bool = False
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_c = x.shape[-1]
        y = GCNUnit(self.out_channels, self.adj, adaptive=self.adaptive,
                    attention=self.attention, gbn_split=self.gbn_split,
                    sync_axis=self.sync_axis, dtype=self.dtype,
                    formulation=self.formulation,
                    attn_form=self.attn_form,
                    edge_mesh=self.edge_mesh,
                    fold_bn=self.fold_bn,
                    eval_formulation=self.eval_formulation,
                    name="gcn1")(x, train)
        y = TCNUnit(self.out_channels, kernel_size=self.kernel_size,
                    stride=self.stride, pad=self.pad,
                    gbn_split=self.gbn_split, sync_axis=self.sync_axis,
                    dtype=self.dtype, fold_bn=self.fold_bn,
                    name="tcn1")(y, train)
        if not self.residual:
            res = 0.0
        elif in_c == self.out_channels and self.stride == 1:
            res = x
        else:
            res = TCNUnit(self.out_channels, kernel_size=1,
                          stride=self.stride, gbn_split=self.gbn_split,
                          sync_axis=self.sync_axis, dtype=self.dtype,
                          fold_bn=self.fold_bn,
                          name="residual")(x, train)
        return nn.relu(y + res)


# model_layers -> {layer name: (out_channels, stride, residual, pad)}
# (reference aagcn.py:407-474). Input channel for l1 is the data dim.
# stride/pad of None defer to the model's defaults (relevant for the
# transformer variants whose units use stride=kernel_size, pad=False).
_LAYER_PLANS: Dict[int, Dict[str, Tuple[int, Optional[int], bool,
                                        Optional[bool]]]] = {
    0: {},
    3: {"l1": (64, 1, False, None), "l5": (128, 2, True, None),
        "l8": (256, 2, True, None)},
    6: {"l1": (64, 1, False, None), "l4": (64, 1, True, None),
        "l5": (128, 2, True, None), "l7": (128, 1, True, None),
        "l8": (256, 2, True, None), "l10": (256, 1, True, None)},
    7: {"l1": (64, 1, False, None), "l3": (64, 1, True, None),
        "l4": (64, 1, True, None), "l5": (128, 2, True, None),
        "l7": (128, 1, True, None), "l8": (256, 2, True, None),
        "l10": (256, 1, True, None)},
    10: {"l1": (64, 1, False, None), "l2": (64, 1, True, None),
         "l3": (64, 1, True, None), "l4": (64, 1, True, None),
         "l5": (128, 2, True, None), "l6": (128, 1, True, None),
         "l7": (128, 1, True, None), "l8": (256, 2, True, None),
         "l9": (256, 1, True, None), "l10": (256, 1, True, None)},
}


def layer_plan(model_layers: int,
               output_channel: int = 64
               ) -> Dict[str, Tuple[int, Optional[int], bool,
                                    Optional[bool]]]:
    if model_layers in _LAYER_PLANS:
        return dict(_LAYER_PLANS[model_layers])
    c = output_channel
    if model_layers in (101, 102, 103):
        # stride/pad defer to the model defaults (aagcn.py:451-461)
        n = model_layers - 100
        plan = {"l1": (c, None, False, None)}
        for i in range(2, n + 1):
            plan[f"l{i}"] = (c, None, True, None)
        return plan
    if model_layers == 1002:
        # leading layer forced to stride-1 padded conv, second layer at
        # model defaults (aagcn.py:464-467; the reference spells the
        # keyword `padding=` which its units don't accept — implemented
        # here as the documented intent, pad=True)
        return {"l1": (c, 1, False, True), "l2": (c, None, True, None)}
    if model_layers == 1003:
        return {"l1": (c, 1, False, True), "l2": (c, 1, True, True),
                "l3": (c, None, True, None)}
    raise ValueError(f"Model with {model_layers} layers is not supported.")


class AAGCN(nn.Module):
    """Full AAGCN classifier (reference aagcn.py:328-577).

    Input: (N, C, T, V, M); output: (logits, aux) where aux is None (the
    reference's attention output slot, kept for API parity).
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None
    drop_out: float = 0.0
    adaptive: bool = True
    attention: bool = True
    gbn_split: int = 1
    fc_cv: bool = False
    data_norm: str = "bn"
    model_layers: int = 10
    kernel_size: int = 9
    stride: int = 1          # default unit stride (plan may override)
    pad: bool = True         # default temporal-conv padding
    backbone_dim: Optional[int] = None  # channel width for plans >= 101
    formulation: str = "agg_packed"  # GCN formulation (ops/gcn.apply_gcn)
    attn_form: str = "transposed"    # logits form (ops/gcn.attention_logits)
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    edge_mesh: Any = None  # Mesh with 'edge' axis: in-model edge partition
    # eval-only: use with utils/bn_fold.fold_aagcn_bn_eval'd variables —
    # every unit BN (not data_bn) is skipped in the compiled program
    fold_bn: bool = False
    # eval-only GCN formulation override (default 'agg', the round-5
    # sweep winner on the shared kernel)
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        n, c, t, v, m = x.shape
        if self.data_norm == "bn":
            # (N,C,T,V,M) -> (N,T,(M,V,C)) feature order matches reference
            # forward_preprocess (aagcn.py:483-487)
            x = jnp.transpose(x, (0, 2, 4, 3, 1)).reshape(n, t, m * v * c)
            x = BatchNorm(axis_name=self.sync_axis, splits=self.gbn_split,
                          name="data_bn")(x, train)
            x = x.reshape(n, t, m, v, c)
            x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
        elif self.data_norm == "ln":
            # LayerNorm over (V, C) per frame (aagcn.py:489-492)
            x = jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(n * m, t, v * c)
            x = LayerNorm(name="data_bn")(x)
            x = x.reshape(n * m, t, v, c)
        else:
            raise ValueError("Unknown data_norm")
        if self.dtype is not None:
            x = x.astype(self.dtype)

        plan = layer_plan(self.model_layers, self.backbone_dim or 64)
        last_c = c
        for name in [f"l{i}" for i in range(1, 11)]:
            if name not in plan:
                continue
            ch, stride, residual, pad = plan[name]
            x = TCNGCNUnit(ch, self.adj,
                           stride=self.stride if stride is None else stride,
                           residual=residual,
                           adaptive=self.adaptive, attention=self.attention,
                           kernel_size=self.kernel_size,
                           pad=self.pad if pad is None else pad,
                           gbn_split=self.gbn_split,
                           formulation=self.formulation,
                           attn_form=self.attn_form,
                           edge_mesh=self.edge_mesh,
                           sync_axis=self.sync_axis, dtype=self.dtype,
                           fold_bn=self.fold_bn,
                           eval_formulation=self.eval_formulation,
                           name=name)(x, train)
            last_c = ch

        x = x.astype(jnp.float32)
        if self.fc_cv:
            # per-joint pooling: mean over T and persons, flatten (C, V)
            # (aagcn.py:513-516)
            x = x.mean(axis=1).reshape(n, m, v, last_c).mean(axis=1)
            x = jnp.transpose(x, (0, 2, 1)).reshape(n, last_c * v)
        else:
            x = x.mean(axis=(1, 2)).reshape(n, m, last_c).mean(axis=1)
        if self.drop_out:
            x = nn.Dropout(self.drop_out, deterministic=not train)(x)
        x = nn.Dense(self.num_class,
                     kernel_init=init.fc_init(self.num_class),
                     name="fc")(x)
        return x, None
