#!/usr/bin/env python
"""Edge-partitioned aggregation scaling measurement.

Measures batched-edge throughput (edges/s) of the edge-partitioned
K-subset aggregation (agcn_tpu/parallel/edge_partition.py) at 1, 2, 4, 8
edge shards and reports scaling efficiency. With one physical chip this
runs on the virtual host-CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count) — it validates the partitioning,
collective machinery and the measurement itself. NOTE: on the virtual CPU
mesh all "devices" share one CPU, so total throughput cannot scale and
the efficiency figure is a lower bound with no hardware meaning; on a
real pod slice (BENCH_SCALING_CPU=0) the same script measures ICI-backed
scaling, which is the number the >=85% target refers to.

Prints one JSON line per shard count plus a summary efficiency line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("BENCH_SCALING_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from agcn_tpu.graph import build_adjacency, spatial_edge_sets
from agcn_tpu.parallel import make_mesh
from agcn_tpu.parallel.edge_partition import make_hybrid_partitioned_gcn


def main():
    adj = build_adjacency("ntu_rgb_d")
    edges_per_instance = sum(es.num_edges
                             for es in spatial_edge_sets("ntu_rgb_d"))
    b, t, v, c, co = 32, 64, 25, 64, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, v, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, c, co)).astype(np.float32))
    total_edges = edges_per_instance * b * t

    n_dev = len(jax.devices())
    results = {}
    for shards in (1, 2, 4, 8):
        if shards > n_dev:
            break
        mesh = make_mesh(data=1, edge=shards)
        fn, parts = make_hybrid_partitioned_gcn(adj, mesh)
        run = jax.jit(lambda x, p, w: fn(x, p, w))
        out = run(x, parts, w)
        jax.block_until_ready(out)
        steps = 30
        t0 = time.perf_counter()
        for _ in range(steps):
            out = run(x, parts, w)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        eps = total_edges * steps / dt
        results[shards] = eps
        print(json.dumps({"metric": "edge_partition_edges_per_sec",
                          "shards": shards, "value": round(eps / 1e6, 2),
                          "unit": "Medges/s"}))

    if 1 in results:
        for s, eps in results.items():
            if s == 1:
                continue
            eff = eps / (results[1] * s)
            print(json.dumps({"metric": "edge_scaling_efficiency",
                              "shards": s, "value": round(eff, 3)}))


if __name__ == "__main__":
    main()
