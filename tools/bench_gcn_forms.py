#!/usr/bin/env python
"""Micro-bench: GCN aggregation formulations, forward AND backward, on the
real TPU at the model's production shapes.

Chained timing (PERF.md): each iteration feeds the previous output back in
so the device cannot overlap iterations, and the loop ends with a host
fetch. Run: timeout 2400 python tools/bench_gcn_forms.py [--shapes small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from agcn_tpu.ops import gcn as gcn_ops

K = 3
V = 25


def timed(fn, args, iters=30):
    """Chained timing with a REAL host fetch at the end: on this backend
    block_until_ready can report dispatch time, not device time (PERF.md);
    only a device->host copy reliably waits for execution."""
    fn = jax.jit(fn)
    out = fn(*args)
    _ = np.asarray(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # chain on-device: next input depends on the previous output, so
        # iterations cannot overlap
        chain = jnp.sum(out).astype(args[0].dtype) * 0.0
        args = (args[0] + chain,) + args[1:]
    _ = np.asarray(jnp.sum(args[0].astype(jnp.float32)))  # host fetch
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    shapes = [
        ("l1 c3->64 T300", 128, 300, 3, 64),
        ("l2-4 c64 T300", 128, 300, 64, 64),
        ("l5 c64->128 T300", 128, 300, 64, 128),
        ("l6-7 c128 T150", 128, 150, 128, 128),
        ("l8 c128->256 T150", 128, 150, 128, 256),
        ("l9-10 c256 T75", 128, 75, 256, 256),
    ]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"{'shape':22} {'fwd_agg':>8} {'fwd_pf':>8} "
          f"{'vjp_agg':>8} {'vjp_pf':>8} {'vjp_custom':>10}")
    for name, b, t, c, co in shapes:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), dt)
        a1 = jnp.asarray(rng.standard_normal((b, K, V, V)), dt)
        w = jnp.asarray(rng.standard_normal((K, c, co)), dt)

        def agg_form(x, a1, w):
            return gcn_ops.adaptive_gcn_reference(x, a1, w)

        def pf_form(x, a1, w):
            return gcn_ops._adaptive_gcn_fwd_impl(x, a1, w)

        def custom(x, a1, w):
            return gcn_ops.adaptive_gcn(x, a1, w)

        def g(f):
            def h(x, a1, w):
                loss, grads = jax.value_and_grad(
                    lambda *a: jnp.sum(f(*a).astype(jnp.float32)),
                    argnums=(0, 1, 2))(x, a1, w)
                return grads[0]
            return h

        r = [timed(agg_form, (x, a1, w)),
             timed(pf_form, (x, a1, w)),
             timed(g(agg_form), (x, a1, w)),
             timed(g(pf_form), (x, a1, w)),
             timed(g(custom), (x, a1, w))]
        print(f"{name:22} " + " ".join(f"{v:8.2f}" for v in r[:4])
              + f" {r[4]:10.2f}", flush=True)


if __name__ == "__main__":
    main()
