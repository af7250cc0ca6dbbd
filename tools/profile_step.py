#!/usr/bin/env python
"""Profile the full AGCN train step on the TPU and print an op-time
bucket table (parsed from the xplane.pb, PERF.md method).

Usage: python tools/profile_step.py [batch] [formulation]
"""

import os
import sys
import time
from collections import defaultdict

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


def classify(name: str) -> str:
    n = name.lower()
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "dot"
    if "fusion" in n:
        return "fusion(elementwise/bn)"
    if "reduce" in n:
        return "reduce"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main(batch=64, formulation="agg_packed"):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                 formulation=formulation)
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
    _ = float(m["loss"])

    trace_dir = "/tmp/agcn_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            state, m = step(state, x, y, key)
        _ = float(m["loss"])

    # newest xplane.pb under trace_dir
    pbs = []
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                p = os.path.join(root, f)
                pbs.append((os.path.getmtime(p), p))
    pb = sorted(pbs)[-1][1]

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(pb, "rb").read())
    buckets = defaultdict(float)
    names = defaultdict(float)
    spans = []          # (start, end) of leaf ops for timeline union
    copy_spans = []
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m_.id: m_.name for m_ in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if not name.startswith("%"):
                    continue  # skip module umbrella events (jit_train_step)
                dur = ev.duration_ps / 1e9  # ms
                s = ev.offset_ps / 1e9
                cat = classify(name.split(" = ")[0])
                buckets[cat] += dur
                names[name] += dur
                total += dur
                (copy_spans if cat == "copy/transpose" else spans).append(
                    (s, s + dur))

    def union(sp):
        if not sp:
            return 0.0
        sp = sorted(sp)
        out, (cs, ce) = 0.0, sp[0]
        for a, b in sp[1:]:
            if a > ce:
                out += ce - cs
                cs, ce = a, b
            else:
                ce = max(ce, b)
        return out + (ce - cs)

    print(f"\n== bucket table (5 steps, batch {batch}, {formulation}; "
          f"summed op durations) ==")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v/5:8.2f} ms/step  {100*v/total:5.1f}%")
    print(f"  {'TOTAL (summed)':28s} {total/5:8.2f} ms/step")
    print(f"  compute timeline union      {union(spans)/5:8.2f} ms/step")
    print(f"  copy timeline union         {union(copy_spans)/5:8.2f} "
          f"ms/step")
    print(f"  all-ops timeline union      "
          f"{union(spans + copy_spans)/5:8.2f} ms/step")
    print("\n== top 20 ops ==")
    for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v/5:8.3f} ms  {k[:160]}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    f = sys.argv[2] if len(sys.argv) > 2 else "agg_packed"
    main(b, f)
