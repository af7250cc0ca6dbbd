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

Besides the per-shard JSON lines, `--out FILE` writes a single scaling
artifact (SCALING_r*.json) containing the per-shard rates, the
efficiencies, and the per-device FLOP-division check: the compiled
program's own cost model must show each device executing ~1/P of the
1-shard FLOPs (the partitioning divides work, not replicates it).
"""

import argparse
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
from agcn_tpu.parallel.hlo_stats import program_comm_stats


def _program_flops(lowered_compiled):
    try:
        cost = lowered_compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            return float(cost.get("flops", 0.0))
    except Exception:
        pass
    return 0.0


def run(steps: int = 30, out: str = None):
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
    flops = {}
    rows = []
    for shards in (1, 2, 4, 8):
        if shards > n_dev:
            break
        mesh = make_mesh(data=1, edge=shards)
        fn, parts = make_hybrid_partitioned_gcn(adj, mesh)
        jfn = jax.jit(lambda x, p, w: fn(x, p, w))
        compiled = jfn.lower(x, parts, w).compile()
        flops[shards] = _program_flops(compiled)
        # machine-independent comm evidence: bytes the compiler
        # scheduled through collectives (per device per step) and the
        # compute/comm ratio — the overlap-quality proxy a pod would
        # realize over ICI (VERDICT r4 next #5)
        comm = program_comm_stats(compiled)
        out_arr = jfn(x, parts, w)
        jax.block_until_ready(out_arr)
        t0 = time.perf_counter()
        for _ in range(steps):
            out_arr = jfn(x, parts, w)
        jax.block_until_ready(out_arr)
        dt = time.perf_counter() - t0
        eps = total_edges * steps / dt
        results[shards] = eps
        rows.append({"shards": shards,
                     "medges_per_sec": round(eps / 1e6, 2),
                     "per_device_flops": flops[shards],
                     "collective_bytes_per_step": comm["total_bytes"],
                     "collective_breakdown": {
                         k: comm[k] for k in
                         ("all-reduce", "all-gather", "reduce-scatter",
                          "collective-permute", "all-to-all")
                         if comm[k] > 0},
                     "flops_per_comm_byte": round(
                         comm["flops_per_comm_byte"], 2)})
        print(json.dumps({"metric": "edge_partition_edges_per_sec",
                          "shards": shards, "value": round(eps / 1e6, 2),
                          "unit": "Medges/s"}))

    efficiency = {}
    for s, eps in results.items():
        if s == 1:
            continue
        eff = eps / (results[1] * s)
        efficiency[str(s)] = round(eff, 3)
        print(json.dumps({"metric": "edge_scaling_efficiency",
                          "shards": s, "value": round(eff, 3)}))

    # FLOP-division check: each device's program should carry ~1/P of
    # the 1-shard FLOPs (collective overhead allowed; replication — a
    # ratio near 1.0 — is the failure this guards against)
    flop_division = {}
    flop_division_ok = True
    base = flops.get(1, 0.0)
    for s, f in flops.items():
        if s == 1 or base <= 0 or f <= 0:
            continue
        ratio = f / base
        flop_division[str(s)] = round(ratio, 4)
        # ideal 1/s; accept up to 1.6/s for halo/collective overhead
        if ratio > 1.6 / s:
            flop_division_ok = False

    # hybrid (data=4, edge=2) FULL train step — the dryrun's production
    # mesh: record what the compiler scheduled through collectives per
    # device per optimizer step (grad all-reduce over 'data' + the
    # edge-partition ring over 'edge')
    hybrid = None
    if n_dev >= 8:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from agcn_tpu.models import AGCN
        from agcn_tpu.parallel import replicate_state
        from agcn_tpu.train import (TrainState, losses, make_train_step,
                                    optim)

        mesh = make_mesh(data=4, edge=2)
        model = AGCN(num_class=60, adj=adj, edge_mesh=mesh)
        bt, tt = 8, 32
        rng = np.random.default_rng(0)
        xt = jnp.asarray(rng.standard_normal(
            (bt, 3, tt, 25, 2)).astype(np.float32))
        yt = jnp.asarray(rng.integers(0, 60, (bt,)))
        variables = model.init(jax.random.PRNGKey(0), xt, train=False)
        tx = optim.sgd_nesterov(
            optim.warmup_step_schedule(0.1, 1, [30, 40]))
        state = replicate_state(mesh, TrainState.create(
            model.apply, variables["params"], variables["batch_stats"],
            tx))
        x_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        step = jax.jit(make_train_step(losses.cross_entropy),
                       in_shardings=(rep, x_sh, x_sh, rep))
        compiled = step.lower(state, xt, yt,
                              jax.random.PRNGKey(0)).compile()
        comm = program_comm_stats(compiled)
        hybrid = {
            "mesh": {"data": 4, "edge": 2},
            "shape": {"batch": bt, "t": tt, "v": v},
            "per_device_flops": comm["flops"],
            "collective_bytes_per_step": comm["total_bytes"],
            "collective_breakdown": {
                k: comm[k] for k in
                ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all") if comm[k] > 0},
            "flops_per_comm_byte": round(comm["flops_per_comm_byte"], 2),
        }
        print(json.dumps({"metric": "hybrid_step_comm_bytes",
                          "value": comm["total_bytes"],
                          "flops_per_comm_byte": hybrid[
                              "flops_per_comm_byte"]}))

    artifact = {
        "metric": "edge_partition_scaling",
        "platform": jax.default_backend(),
        "n_devices": n_dev,
        "virtual_cpu_mesh": os.environ.get("BENCH_SCALING_CPU", "1")
        == "1",
        "shape": {"batch": b, "t": t, "v": v, "c": c, "co": co,
                  "edges_per_instance": edges_per_instance},
        "steps": steps,
        "shards": rows,
        "efficiency": efficiency,
        "per_device_flop_ratio_vs_1shard": flop_division,
        "flop_division_ok": flop_division_ok,
        "hybrid_train_step": hybrid,
        "note": ("virtual CPU mesh shares one physical CPU: efficiency "
                 "has no hardware meaning there; the FLOP-division "
                 "check is the machine-independent signal. On a pod "
                 "slice the same artifact records real ICI scaling "
                 "(target >=0.85)."),
    }
    if out:
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# wrote {out}", file=sys.stderr)
    return artifact


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", type=str, default=None,
                    help="write the scaling artifact JSON here")
    args = ap.parse_args(argv)
    run(steps=args.steps, out=args.out)


if __name__ == "__main__":
    main()
