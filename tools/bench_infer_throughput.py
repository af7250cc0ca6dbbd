#!/usr/bin/env python
"""Inference (forward-only, eval mode) throughput for the serving story:
AGCN uses the project-first formulation at eval (2.6x faster forward,
ops/gcn.apply_gcn), SGN its standard forward. Host-fetch timing."""

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
from agcn_tpu.models import AGCN, SGN


def bench_agcn(batch, steps=30):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=60, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 3, 300, 25, 2)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    o = fwd(variables, x)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(steps):
        o = fwd(variables, x + o[0, 0])  # chain to defeat caching
    _ = float(jnp.sum(o))
    return batch * steps / (time.perf_counter() - t0)


def bench_sgn(batch, steps=50):
    model = SGN(num_class=60)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 20, 75)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    o = fwd(variables, x)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(steps):
        o = fwd(variables, x + o[0, 0])
    _ = float(jnp.sum(o))
    return batch * steps / (time.perf_counter() - t0)


if __name__ == "__main__":
    # optional CLI specs: `agcn:512 sgn:2048` (default: the PERF.md table)
    specs = []
    for s in sys.argv[1:]:
        kind, _, batch = s.partition(":")
        if kind not in ("agcn", "sgn") or not batch.isdigit():
            sys.exit(f"bad spec {s!r}: expected agcn:<batch> or "
                     f"sgn:<batch>")
        specs.append((kind, int(batch)))
    specs = specs or [("agcn", 64), ("agcn", 256),
                      ("sgn", 256), ("sgn", 1024)]
    for kind, b in specs:
        fn = bench_agcn if kind == "agcn" else bench_sgn
        print(f"{kind} infer batch {b}: {fn(b):.0f} seq/s", flush=True)
