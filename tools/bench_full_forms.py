#!/usr/bin/env python
"""Full AGCN train-step throughput per GCN formulation (TPU, batch 64).

Timing ends with a real host fetch (block_until_ready alone can report
dispatch time on this backend — PERF.md)."""

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

BATCH, C, T, V, M, NUM_CLASS = 64, 3, 300, 25, 2, 60


def bench(formulation: str, attn_form: str = "transposed",
          steps: int = 20) -> float:
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                 formulation=formulation, attn_form=attn_form)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, T, V, M)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
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
    _ = float(m["loss"])  # host fetch forces completion
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


if __name__ == "__main__":
    # spec: "<gcn_form>" or "<gcn_form>:<attn_form>"
    forms = sys.argv[1:] or ["pf", "custom", "agg"]
    for spec in forms:
        f, _, a = spec.partition(":")
        a = a or "transposed"
        print(f"{spec}: {bench(f, a):.1f} seq/s", flush=True)
