#!/usr/bin/env python
"""Batch-size scaling of the full AGCN train step with scan_blocks=True.

The remote-compile relay rejects large UNROLLED programs (batch 128,
PERF.md); a scanned backbone compiles to one block body, so larger
batches may pass. Larger batch raises the M dim of every V=25-bound
matmul (the structural MFU ceiling at batch 64).

Timing ends with a real host fetch (block_until_ready alone can report
dispatch time on this backend - PERF.md)."""

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


def bench(batch: int, scan: bool, steps: int = 20) -> float:
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                 scan_blocks=scan)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, C, T, V, M)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (batch,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30, 40]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)

    state, m = step(state, x, y, key)
    _ = float(m["loss"])  # host fetch: compile + settle
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == "__main__":
    specs = sys.argv[1:] or ["64:scan", "96:scan", "128:scan"]
    for spec in specs:
        b, _, mode = spec.partition(":")
        try:
            r = bench(int(b), mode == "scan")
            print(f"batch {b} ({mode or 'unrolled'}): {r:.1f} seq/s",
                  flush=True)
        except Exception as e:  # relay rejections are expected findings
            print(f"batch {b} ({mode or 'unrolled'}): FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
