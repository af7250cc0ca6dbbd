"""AGCN — the original 2s-AGCN model (CVPR'19), TPU-native.

Functional parity target: reference model/architecture/aagcn/agcn.py
(unit_tcn :36-50, unit_gcn :53-109, TCN_GCN_unit :112-129, Model :132-183).

Design notes (TPU-first, not a port):
- Internal layout is channels-last (B, T, V, C): C rides the vector lanes,
  every projection is a plain matmul on the MXU, and XLA fuses BN/ReLU
  epilogues into the matmuls.
- The adaptive adjacency A + PA + C(x) splits into a static part (A + PA,
  shared across the batch) and a data-dependent part (the theta/phi softmax
  attention). Both are applied as dense einsums over V <= 25 — dense is the
  speed-of-light layout at this size; the COO/edge path exists only for
  multi-host edge partitioning.
- BatchNorm supports a mesh `axis_name` (SyncBN equivalent) and is computed
  in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.ops import BatchNorm, PointwiseConv, TemporalConv
from agcn_tpu.ops import gcn as gcn_ops
from agcn_tpu.ops import initializers as init


class UnitGCN(nn.Module):
    """Adaptive graph convolution over K spatial subsets.

    y = BN( sum_k W_k ( x @ (A_k + PA_k + C_k(x)) ) ) + down(x), then ReLU.
    Parity: reference agcn.py:53-109.
    """

    out_channels: int
    adj: np.ndarray  # (K, V, V) static spatial partition stack
    coff_embedding: int = 4
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    formulation: str = "agg_packed"  # 'pf' | 'custom' | 'agg' (ops/gcn.apply_gcn)
    attn_form: str = "transposed"    # ops/gcn.attention_logits
    edge_mesh: Any = None  # Mesh with 'edge' axis: in-model edge partition
    fold_bn: bool = False  # BNs skipped at eval (folded variables only)
    eval_formulation: Optional[str] = None  # override the eval-mode form

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        num_subset = self.adj.shape[0]
        inter_c = self.out_channels // self.coff_embedding
        in_c = x.shape[-1]

        pa = self.param("PA", init.constant(1e-6), self.adj.shape)
        adj = jnp.asarray(self.adj) + pa  # (K, V, V)

        # The K subsets' theta/phi/output projections are separate
        # parameters (reference layout, agcn.py:63-69) but are applied as
        # single wide matmuls: one (C, 2*K*Ce) embedding GEMM, one
        # K-batched attention einsum, one (K*C, Co) output GEMM —
        # numerically identical to the per-subset loop with far better
        # MXU utilization than K tiny GEMMs.
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
        emb = compute @ emb_w + emb_b  # (B, T, V, 2*K*Ce)
        # per-subset attention: softmax over the source joint axis
        # (agcn.py:99-101; divisor Ce * T). Default 'transposed' packs
        # (T, Ce) per (B, K) batch element — ~30x faster than the naive
        # einsum lowering on TPU (PERF.md round 2)
        logits = gcn_ops.attention_logits(emb, num_subset, inter_c,
                                          self.attn_form)
        # softmax in fp32 for bf16 stability, result back in compute dtype
        att = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        att = att.astype(compute.dtype)  # (B, K, V, V)
        a1 = att + adj[None].astype(att.dtype)
        # expose the combined adjacency for live-demo visualization
        # (reference infer/inference_220802.py:518-560); only collected
        # when callers apply with mutable=["intermediates"]
        self.sow("intermediates", "g", a1)

        out_b = sum(b_d)
        if self.use_pallas:
            # fused aggregation+projection kernel: the (B,T,V,K*C)
            # intermediate never leaves VMEM (ops/pallas/gcn_kernel.py)
            from agcn_tpu.ops.pallas.gcn_kernel import fused_gcn

            w_stack = jnp.stack(k_d)  # (K, C, Co)
            if self.dtype is not None:
                w_stack = w_stack.astype(self.dtype)
                out_b = out_b.astype(self.dtype)
            y = fused_gcn(compute, a1, w_stack) + out_b
        elif self.edge_mesh is not None \
                and self.edge_mesh.shape.get("edge", 1) > 1:
            # north-star path: adjacency subsets partitioned over the
            # 'edge' mesh axis, partials combined by an overlapped
            # time-chunked ring (parallel/edge_partition.model_edge_gcn)
            from agcn_tpu.parallel.edge_partition import model_edge_gcn

            w_stack = jnp.stack(k_d)  # (K, C, Co)
            if self.dtype is not None:
                w_stack = w_stack.astype(self.dtype)
                out_b = out_b.astype(self.dtype)
            y = model_edge_gcn(compute, a1, w_stack,
                               self.edge_mesh) + out_b
        else:
            # training: 'agg' fuses best in the full step; inference:
            # 'agg' also wins on the current toolchain (+5% over the
            # round-2 'pf' pick at batch 64 AND 256 — round-5 eval-forms
            # sweep, tools/bench_eval_study.py --forms), while the
            # pallas formulations keep their fused forward kernel at
            # eval too
            if train or self.formulation.startswith("pallas"):
                form = self.formulation
            else:
                form = self.eval_formulation or "agg"
            w_stack = jnp.stack(k_d)  # (K, C, Co)
            if self.dtype is not None:
                w_stack = w_stack.astype(self.dtype)
                out_b = out_b.astype(self.dtype)
            y = gcn_ops.apply_gcn(compute, a1, w_stack, form) + out_b

        y = BatchNorm(scale_init_value=1e-6, axis_name=self.sync_axis,
                      identity_at_eval=self.fold_bn, name="bn")(y, train)

        if in_c != self.out_channels:
            down = PointwiseConv(self.out_channels, dtype=self.dtype,
                                 name="down_conv")(x)
            down = BatchNorm(axis_name=self.sync_axis,
                             identity_at_eval=self.fold_bn,
                             name="down_bn")(down, train)
        else:
            down = x
        return nn.relu(y + down)


class UnitTCN(nn.Module):
    """kx1 temporal conv + BN (no activation). Parity: agcn.py:36-50."""

    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = TemporalConv(self.out_channels, kernel_size=self.kernel_size,
                         stride=self.stride, dtype=self.dtype,
                         name="conv")(x)
        return BatchNorm(axis_name=self.sync_axis,
                         identity_at_eval=self.fold_bn,
                         name="bn")(x, train)


class STGCNBlock(nn.Module):
    """GCN -> TCN with residual and ReLU. Parity: agcn.py:112-129."""

    out_channels: int
    adj: np.ndarray
    stride: int = 1
    residual: bool = True
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    formulation: str = "agg_packed"
    attn_form: str = "transposed"
    edge_mesh: Any = None
    fold_bn: bool = False
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_c = x.shape[-1]
        y = UnitGCN(self.out_channels, self.adj, sync_axis=self.sync_axis,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    formulation=self.formulation,
                    attn_form=self.attn_form,
                    edge_mesh=self.edge_mesh,
                    fold_bn=self.fold_bn,
                    eval_formulation=self.eval_formulation,
                    name="gcn1")(x, train)
        y = UnitTCN(self.out_channels, stride=self.stride,
                    sync_axis=self.sync_axis, dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name="tcn1")(y, train)
        if not self.residual:
            res = 0.0
        elif in_c == self.out_channels and self.stride == 1:
            res = x
        else:
            res = UnitTCN(self.out_channels, kernel_size=1,
                          stride=self.stride, sync_axis=self.sync_axis,
                          dtype=self.dtype, fold_bn=self.fold_bn,
                          name="residual")(x, train)
        return nn.relu(y + res)


# 10-block channel/stride plan of the original model (agcn.py:145-154).
BACKBONE_PLAN: Tuple[Tuple[int, int, bool], ...] = (
    (64, 1, False), (64, 1, True), (64, 1, True), (64, 1, True),
    (128, 2, True), (128, 1, True), (128, 1, True),
    (256, 2, True), (256, 1, True), (256, 1, True),
)


class _ScanBlockBody(nn.Module):
    """Adapter making STGCNBlock scannable: (carry, train) -> (carry, None)."""

    out_channels: int
    adj: Any
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    formulation: str = "agg_packed"
    attn_form: str = "transposed"
    edge_mesh: Any = None
    fold_bn: bool = False
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, carry, train):
        y = STGCNBlock(self.out_channels, self.adj, stride=1, residual=True,
                       sync_axis=self.sync_axis, dtype=self.dtype,
                       use_pallas=self.use_pallas,
                       formulation=self.formulation,
                       attn_form=self.attn_form,
                       edge_mesh=self.edge_mesh,
                       fold_bn=self.fold_bn,
                       eval_formulation=self.eval_formulation,
                       name="block")(carry, train)
        return y, None


def _scan_blocks(n: int, name: str, **block_kwargs):
    """n homogeneous STGCN blocks compiled once via nn.scan.

    The XLA program contains ONE block body instead of n unrolled copies —
    a large compile-time saving in this environment's minutes-long remote
    compiles. Parameters carry a leading stacked axis (layout differs from
    the unrolled model, so checkpoints are not interchangeable).
    """
    return nn.scan(
        _ScanBlockBody,
        # 'intermediates' too: without it the per-block adjacencies sown
        # for the live demo (UnitGCN 'g') are silently dropped inside
        # the scan; stacked along a leading scan axis instead
        variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast,),
        length=n,
    )(name=name, **block_kwargs)


class AGCN(nn.Module):
    """The full AGCN classifier. Parity: reference agcn.py:132-183.

    Input: (N, C, T, V, M) skeleton sequences (the on-disk data contract).
    Output: (N, num_class) logits.
    """

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    in_channels: int = 3
    adj: Any = None  # (K, V, V) np.ndarray
    sync_axis: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    formulation: str = "agg_packed"  # GCN formulation (ops/gcn.apply_gcn)
    attn_form: str = "transposed"    # logits form (ops/gcn.attention_logits)
    edge_mesh: Any = None  # Mesh with 'edge' axis: in-model edge partition
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    scan_blocks: bool = False  # scan homogeneous block groups (fast compile)
    # eval-only: use with utils/bn_fold.fold_agcn_bn_eval'd variables —
    # every block BN (not data_bn) is skipped in the compiled program
    fold_bn: bool = False
    # eval-only GCN formulation override (default 'agg', the round-5
    # sweep winner; tools/bench_eval_study.py --forms re-measures)
    eval_formulation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, c, t, v, m = x.shape
        # (N, C, T, V, M) -> (N, T, M, V, C): channel order (m, v, c)
        # matches the reference's data_bn channel layout (agcn.py:163-165).
        x = jnp.transpose(x, (0, 2, 4, 3, 1))
        x = x.reshape(n, t, m * v * c)
        x = BatchNorm(axis_name=self.sync_axis, name="data_bn")(x, train)
        x = x.reshape(n, t, m, v, c)
        # fold persons into batch: (N*M, T, V, C)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        common = dict(sync_axis=self.sync_axis, dtype=self.dtype,
                      use_pallas=self.use_pallas,
                      formulation=self.formulation,
                      attn_form=self.attn_form,
                      edge_mesh=self.edge_mesh,
                      fold_bn=self.fold_bn,
                      eval_formulation=self.eval_formulation)
        if self.scan_blocks:
            # l1 / scan(l2-l4) / l5 / scan(l6-l7) / l8 / scan(l9-l10)
            x = STGCNBlock(64, self.adj, stride=1, residual=False,
                           name="l1", **common)(x, train)
            x, _ = _scan_blocks(3, "l2_4", out_channels=64, adj=self.adj,
                                **common)(x, train)
            x = STGCNBlock(128, self.adj, stride=2, residual=True,
                           name="l5", **common)(x, train)
            x, _ = _scan_blocks(2, "l6_7", out_channels=128, adj=self.adj,
                                **common)(x, train)
            x = STGCNBlock(256, self.adj, stride=2, residual=True,
                           name="l8", **common)(x, train)
            x, _ = _scan_blocks(2, "l9_10", out_channels=256, adj=self.adj,
                                **common)(x, train)
        else:
            block_cls = nn.remat(STGCNBlock, static_argnums=(2,)) \
                if self.remat else STGCNBlock
            for i, (ch, stride, residual) in enumerate(BACKBONE_PLAN):
                x = block_cls(ch, self.adj, stride=stride,
                              residual=residual, name=f"l{i + 1}",
                              **common)(x, train)

        # global pooling: mean over (T, V), then persons (agcn.py:178-182)
        x = x.astype(jnp.float32)
        x = x.mean(axis=(1, 2)).reshape(n, m, -1).mean(axis=1)
        x = nn.Dense(self.num_class,
                     kernel_init=init.fc_init(self.num_class),
                     name="fc")(x)
        return x
