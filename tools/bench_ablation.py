#!/usr/bin/env python
"""Where does the AGCN train step spend its time? Full-step throughput
with individual components disabled (batch 64, TPU, host-fetch timing).

Ablation switches are monkeypatched into the model modules for the bench
only — production code paths are untouched.
"""

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
from agcn_tpu.ops import BatchNorm, PointwiseConv, TemporalConv
from agcn_tpu.ops import gcn as gcn_ops
from agcn_tpu.ops import initializers as init
from agcn_tpu.train import TrainState, losses, make_train_step, optim

BATCH, C, T, V, NUM_CLASS = 64, 3, 300, 25, 60

ABLATE = set()


class AblatableUnitGCN(nn.Module):
    """UnitGCN clone with component kill-switches (bench only)."""

    out_channels: int
    adj: np.ndarray
    coff_embedding: int = 4
    sync_axis: object = None
    dtype: object = jnp.bfloat16
    use_pallas: bool = False
    formulation: str = "agg"
    edge_mesh: object = None

    @nn.compact
    def __call__(self, x, train):
        num_subset = self.adj.shape[0]
        inter_c = self.out_channels // self.coff_embedding
        in_c = x.shape[-1]
        pa = self.param("PA", init.constant(1e-6), self.adj.shape)
        adj = jnp.asarray(self.adj) + pa
        k_d = [self.param(f"conv_d{k}_kernel",
                          init.conv_branch_init(num_subset),
                          (in_c, self.out_channels))
               for k in range(num_subset)]
        b_d = [self.param(f"conv_d{k}_bias", nn.initializers.zeros,
                          (self.out_channels,)) for k in range(num_subset)]
        compute = x.astype(jnp.bfloat16)

        if "attn" in ABLATE:
            a1 = jnp.broadcast_to(adj[None].astype(compute.dtype),
                                  (x.shape[0],) + self.adj.shape)
        else:
            k_a = [self.param(f"conv_a{k}_kernel",
                              init.kaiming_normal_fan_out,
                              (in_c, inter_c)) for k in range(num_subset)]
            b_a = [self.param(f"conv_a{k}_bias", nn.initializers.zeros,
                              (inter_c,)) for k in range(num_subset)]
            k_b = [self.param(f"conv_b{k}_kernel",
                              init.kaiming_normal_fan_out,
                              (in_c, inter_c)) for k in range(num_subset)]
            b_b = [self.param(f"conv_b{k}_bias", nn.initializers.zeros,
                              (inter_c,)) for k in range(num_subset)]
            emb_w = jnp.concatenate(k_a + k_b, axis=-1).astype(jnp.bfloat16)
            emb_b = jnp.concatenate(b_a + b_b).astype(jnp.bfloat16)
            emb = compute @ emb_w + emb_b
            b, t, v, _ = emb.shape
            emb = emb.reshape(b, t, v, 2, num_subset, inter_c)
            theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
            if "logits" in ABLATE:
                att = jnp.broadcast_to(
                    jnp.zeros((1, num_subset, v, v), compute.dtype),
                    (b, num_subset, v, v)) + theta.mean() * 0
            else:
                th = jnp.transpose(theta, (0, 3, 2, 1, 4)).reshape(
                    b, num_subset, v, t * inter_c)
                ph = jnp.transpose(phi, (0, 3, 2, 1, 4)).reshape(
                    b, num_subset, v, t * inter_c)
                logits = jnp.einsum("bkvx,bkwx->bkvw", th, ph) \
                    / (inter_c * t)
                if "softmax32" in ABLATE:
                    att = jax.nn.softmax(logits, axis=-2)
                else:
                    att = jax.nn.softmax(logits.astype(jnp.float32),
                                         axis=-2)
                    att = att.astype(compute.dtype)
            a1 = att + adj[None].astype(att.dtype)

        w_stack = jnp.stack(k_d).astype(jnp.bfloat16)
        out_b = sum(b_d).astype(jnp.bfloat16)
        if "gcnapply" in ABLATE:
            y = compute @ jnp.concatenate(k_d, axis=-1).astype(
                jnp.bfloat16).reshape(in_c, -1)[:, :self.out_channels] \
                + out_b + a1.sum() * 0
        else:
            y = gcn_ops.apply_gcn(compute, a1, w_stack, "agg") + out_b

        if "gcnbn" not in ABLATE:
            y = BatchNorm(scale_init_value=1e-6, name="bn")(y, train)
        if in_c != self.out_channels:
            down = PointwiseConv(self.out_channels, dtype=jnp.bfloat16,
                                 name="down_conv")(x)
            down = BatchNorm(name="down_bn")(down, train)
        else:
            down = x
        return nn.relu(y + down)


class AblatableUnitTCN(nn.Module):
    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    sync_axis: object = None
    dtype: object = jnp.bfloat16
    edge_mesh: object = None

    @nn.compact
    def __call__(self, x, train):
        if "tcn" in ABLATE and self.kernel_size > 1:
            x = TemporalConv(self.out_channels, kernel_size=1,
                             stride=self.stride, dtype=jnp.bfloat16,
                             name="conv")(x)
        else:
            x = TemporalConv(self.out_channels,
                             kernel_size=self.kernel_size,
                             stride=self.stride, dtype=jnp.bfloat16,
                             name="conv")(x)
        if "tcnbn" in ABLATE:
            return x
        return BatchNorm(name="bn")(x, train)


def bench(ablate, steps=15):
    global ABLATE
    ABLATE = set(ablate)
    orig_gcn, orig_tcn = M.UnitGCN, M.UnitTCN
    M.UnitGCN, M.UnitTCN = AblatableUnitGCN, AblatableUnitTCN
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
        dt = (time.perf_counter() - t0) / steps
        return dt * 1e3, BATCH * steps / (dt * steps)
    finally:
        M.UnitGCN, M.UnitTCN = orig_gcn, orig_tcn


if __name__ == "__main__":
    cases = [
        ("full (new logits)", []),
        ("no-attn (static adj only)", ["attn"]),
        ("no-logits (emb GEMM kept)", ["logits"]),
        ("bf16 softmax", ["softmax32"]),
        ("no-gcn-bn", ["gcnbn"]),
        ("no-gcn-bn no-tcn-bn", ["gcnbn", "tcnbn"]),
    ]
    for name, ab in cases:
        ms, rate = bench(ab)
        print(f"{name:28} {ms:7.1f} ms/step {rate:8.1f} seq/s", flush=True)
