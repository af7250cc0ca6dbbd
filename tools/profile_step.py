#!/usr/bin/env python
"""Profile the full AGCN train step on the TPU and print an op-time
bucket table (parsed from the xplane.pb, PERF.md method), plus an
op-level attribution of the COPY-ONLY windows: for every copy/transpose
op, the portion of its runtime not overlapped by any compute op, ranked
— and the matching HLO instructions (with layouts) from the compiled
module, so each copy can be traced to the producer/consumer layout pair
that forced it (VERDICT r3 next #1).

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
    if "copy-start" in n or "copy-done" in n:
        # async parameter-prefetch copies: the -start event's span covers
        # the whole in-flight window and overlaps compute by design —
        # bucketing them as copies would dwarf the real relayout copies
        return "async-prefetch"
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


def main(batch=64, formulation="agg_packed", eval_mode=False):
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
    key = jax.random.PRNGKey(0)
    if eval_mode:
        # forward-only attribution (VERDICT r4 next #4): same xplane
        # machinery over the jitted eval program
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])

        def step(state, x, y, key):
            return state, {"loss": fwd(variables, x).sum()}
    else:
        step = jax.jit(make_train_step(losses.cross_entropy),
                       donate_argnums=0)
    # compiled HLO text: maps %op names from the trace back to the
    # instruction (operands, layouts) that produced them
    hlo_text = ""
    try:
        if eval_mode:
            hlo_text = fwd.lower(variables, x).compile().as_text()
        else:
            hlo_text = step.lower(state, x, y, key).compile().as_text()
    except Exception as e:
        print(f"# HLO text unavailable: {e}", file=sys.stderr)
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
    copy_by_op = defaultdict(list)   # op name -> [(start, end)]
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
                if cat == "copy/transpose":
                    copy_spans.append((s, s + dur))
                    copy_by_op[name].append((s, s + dur))
                else:
                    spans.append((s, s + dur))

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

    # --- copy-only attribution (VERDICT r3 next #1) -------------------
    # For each copy op, the part of its runtime NOT overlapped by any
    # compute op = its exclusive contribution to the copy-only windows.
    def merged(sp):
        sp = sorted(sp)
        out = []
        for a, b in sp:
            if out and a <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], b))
            else:
                out.append((a, b))
        return out

    comp = merged(spans)

    def exclusive(sp):
        """Total time of sp outside the compute union."""
        tot = 0.0
        ci = 0
        for a, b in merged(sp):
            cur = a
            while ci < len(comp) and comp[ci][1] <= cur:
                ci += 1
            j = ci
            while cur < b:
                if j >= len(comp) or comp[j][0] >= b:
                    tot += b - cur
                    break
                ca, cb = comp[j]
                if ca > cur:
                    tot += ca - cur
                cur = max(cur, cb)
                j += 1
        return tot

    copy_only_total = exclusive(copy_spans)
    print(f"\n== copy-only window attribution "
          f"(total {copy_only_total/5:.2f} ms/step) ==")
    rows = sorted(((exclusive(v), sum(b - a for a, b in v), k)
                   for k, v in copy_by_op.items()), reverse=True)
    shown = 0.0
    hlo_lines = {ln.split(" = ")[0].strip(): ln.strip()
                 for ln in hlo_text.splitlines() if " = " in ln}
    for excl, tot, name in rows:
        if excl < copy_only_total * 0.01:
            break
        shown += excl
        short = name.split(" = ")[0]
        print(f"  {excl/5:8.3f} ms excl / {tot/5:7.3f} ms total  "
              f"{name[:140]}")
        hlo = hlo_lines.get(short.lstrip("%"),
                            hlo_lines.get(short, ""))
        if hlo:
            print(f"      HLO: {hlo[:240]}")
    print(f"  (attributed {100 * shown / max(copy_only_total, 1e-9):.1f}% "
          f"of copy-only time to the ops above)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--eval"]
    b = int(args[0]) if args else 64
    f = args[1] if len(args) > 1 else "agg_packed"
    main(b, f, eval_mode="--eval" in sys.argv[1:])
