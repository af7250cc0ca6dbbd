#!/usr/bin/env python
"""Does storing per-subset GCN weights STACKED (one (K,C,Ce)/(K,C,Co)
param) remove the per-step concat/stack/convert copy storm seen in the
round-3 profile gaps? Bench-only monkeypatch; product layout unchanged
unless this wins."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import agcn_tpu.models.agcn as M
from agcn_tpu.graph import build_adjacency
from agcn_tpu.ops import BatchNorm, PointwiseConv
from agcn_tpu.ops import gcn as gcn_ops
from agcn_tpu.ops import initializers as init
from agcn_tpu.train import TrainState, losses, make_train_step, optim

BATCH, C, T, V, NUM_CLASS = 64, 3, 300, 25, 60


class StackedUnitGCN(nn.Module):
    out_channels: int
    adj: np.ndarray
    coff_embedding: int = 4
    sync_axis: object = None
    dtype: object = jnp.bfloat16
    use_pallas: bool = False
    formulation: str = "agg_packed"
    attn_form: str = "transposed"
    edge_mesh: object = None

    @nn.compact
    def __call__(self, x, train):
        k = self.adj.shape[0]
        inter_c = self.out_channels // self.coff_embedding
        in_c = x.shape[-1]
        pa = self.param("PA", init.constant(1e-6), self.adj.shape)
        adj = jnp.asarray(self.adj) + pa
        # ONE param for the whole embedding GEMM and one stacked output
        # projection: no per-step concat/stack ops
        emb_w = self.param("emb_kernel", init.kaiming_normal_fan_out,
                           (in_c, 2 * k * inter_c))
        emb_b = self.param("emb_bias", nn.initializers.zeros,
                           (2 * k * inter_c,))
        w_stack = self.param("out_kernel", init.conv_branch_init(k),
                             (k, in_c, self.out_channels))
        out_b = self.param("out_bias", nn.initializers.zeros,
                           (self.out_channels,))
        compute = x.astype(self.dtype)
        emb = compute @ emb_w.astype(self.dtype) + emb_b.astype(self.dtype)
        logits = gcn_ops.attention_logits(emb, k, inter_c, self.attn_form)
        att = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        att = att.astype(compute.dtype)
        a1 = att + adj[None].astype(att.dtype)
        y = gcn_ops.apply_gcn(compute, a1, w_stack.astype(self.dtype),
                              self.formulation if train else "pf")
        y = y + out_b.astype(self.dtype)
        y = BatchNorm(scale_init_value=1e-6, name="bn")(y, train)
        if in_c != self.out_channels:
            down = PointwiseConv(self.out_channels, dtype=self.dtype,
                                 name="down_conv")(x)
            down = BatchNorm(name="down_bn")(down, train)
        else:
            down = x
        return nn.relu(y + down)


def bench(stacked: bool, steps: int = 15) -> float:
    orig = M.UnitGCN
    if stacked:
        M.UnitGCN = StackedUnitGCN
    try:
        adj = build_adjacency("ntu_rgb_d")
        model = M.AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((BATCH, C, T, V, 2)),
                        jnp.float32)
        y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
        state = TrainState.create(model.apply, variables["params"],
                                  variables["batch_stats"], tx)
        step = jax.jit(make_train_step(losses.cross_entropy),
                       donate_argnums=0)
        key = jax.random.PRNGKey(0)
        state, m = step(state, x, y, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, x, y, key)
        _ = float(m["loss"])
        return BATCH * steps / (time.perf_counter() - t0)
    finally:
        M.UnitGCN = orig


if __name__ == "__main__":
    for stacked in (True, False):
        print(f"stacked={stacked}: {bench(stacked):.1f} seq/s", flush=True)
