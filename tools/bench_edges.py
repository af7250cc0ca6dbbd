#!/usr/bin/env python
"""Single-chip edges/s for BASELINE, derived from the full AGCN train
step: semantic edge-messages (directed graph edges incl. self loops
applied per frame, per person, per block) divided by measured step time.

Standalone-op timings on this backend are lowering-artifact-prone
(PERF.md), so the figure comes from the production train step itself.
"""

import json
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

from agcn_tpu.graph import build_adjacency, spatial_edge_sets
from agcn_tpu.models import AGCN
from agcn_tpu.train import TrainState, losses, make_train_step, optim

BATCH, C, T, V, M, NUM_CLASS = 64, 3, 300, 25, 2, 60
# frames seen by each block's aggregation (strides at l5/l8)
BLOCK_FRAMES = [300] * 5 + [150] * 3 + [75] * 2


def main():
    edges = sum(es.num_edges for es in spatial_edge_sets("ntu_rgb_d"))
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, T, V, M)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    state, m = step(state, x, y, key)
    _ = float(m["loss"])
    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps

    frames_per_seq = sum(BLOCK_FRAMES) * M
    edges_per_seq = edges * frames_per_seq
    eps = edges_per_seq * BATCH / dt
    print(json.dumps({
        "metric": "train_edges_per_sec_single_chip",
        "value": round(eps / 1e6, 1), "unit": "Medges/s",
        "seq_per_sec": round(BATCH / dt, 1),
        "edges_per_seq": edges_per_seq,
        "note": "semantic forward edge-messages through the 10-block "
                "AGCN train step (fwd+bwd+update included in time)"}))


if __name__ == "__main__":
    main()
