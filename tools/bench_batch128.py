#!/usr/bin/env python
"""Batch-scaling experiment: batch 128 (scan_blocks and unrolled) vs the
batch-64 baseline, agg_packed formulation. Round 1's batch-128 attempt
was rejected by the remote compiler (non-scan) or lost to remat; this
retries with the round-2 program."""

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

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.train import TrainState, losses, make_train_step, optim

C, T, V, M, NUM_CLASS = 3, 300, 25, 2, 60


def bench(batch, scan_blocks, steps=15):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                 scan_blocks=scan_blocks)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, C, T, V, M)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (batch,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    state, m = step(state, x, y, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


if __name__ == "__main__":
    for batch, scan in ((64, False), (128, True), (128, False)):
        try:
            r = bench(batch, scan)
            print(f"batch {batch} scan={scan}: {r:.1f} seq/s", flush=True)
        except Exception as e:
            print(f"batch {batch} scan={scan}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
