#!/usr/bin/env python
"""Probe: does the (V=25, C=64) minormost-tile padding tax elementwise
bandwidth, and how do cv-packed GCN/conv formulations time?

TPU XLA tiles the two minormost dims ((8,128) fp32 / (16,128) bf16);
a (..., 25, 64) activation pads to (32, 128) = 2.56x the true bytes.
If real, a persistent (B, T, C*V) packed layout is the round-3 lever
for the 46% BN/elementwise + 30% layout-copy step-time buckets.

Timing: chained data dependency + host fetch (PERF.md method).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, T, V, C = 64, 300, 25, 64
ITERS = 30


def timeit(fn, *args):
    out = fn(*args)
    out = jax.tree.map(lambda a: a, out)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    x = args[0]
    rest = args[1:]
    for _ in range(ITERS):
        x = fn(x, *rest)
        if isinstance(x, tuple):
            x = x[0]
    _ = float(jnp.sum(x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def probe_elementwise():
    """relu(x*a+b) chained: rank-4 (B,T,V,C) vs packed (B,T,V*C)."""
    key = jax.random.PRNGKey(0)
    for name, shape in [("r4 (B,T,V,C)", (B, T, V, C)),
                        ("r3 (B,T,V*C)", (B, T, V * C)),
                        ("r2 (B*T,V*C)", (B * T, V * C)),
                        ("r4 (B,T,C,V)", (B, T, C, V))]:
        x = jax.random.normal(key, shape, jnp.bfloat16)

        @jax.jit
        def f(x):
            return jax.nn.relu(x * 1.0001 + 0.001) - 0.001

        print(f"  elementwise {name}: {timeit(f, x):.3f} ms", flush=True)


def probe_bn():
    """train-mode BN fwd+bwd: c-last rank4 vs cv-packed with folded stats."""
    key = jax.random.PRNGKey(1)
    x4 = jax.random.normal(key, (B, T, V, C), jnp.bfloat16)
    xp = jax.random.normal(key, (B, T, C * V), jnp.bfloat16)
    sc = jnp.ones((C,), jnp.float32)
    bi = jnp.zeros((C,), jnp.float32)

    def bn4(x, sc, bi):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - mean ** 2
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * sc + bi).astype(x.dtype)

    def bn_cv(x, sc, bi):
        # stats folded: reduce (B,T)->(C*V), then mean over V
        xf = x.astype(jnp.float32)
        m_cv = jnp.mean(xf, axis=(0, 1))
        m2_cv = jnp.mean(jnp.square(xf), axis=(0, 1))
        mean = m_cv.reshape(C, V).mean(-1)
        var = m2_cv.reshape(C, V).mean(-1) - mean ** 2
        a = (sc * jax.lax.rsqrt(var + 1e-5))
        b = bi - mean * a
        a_cv = jnp.repeat(a, V)
        b_cv = jnp.repeat(b, V)
        return (xf * a_cv + b_cv).astype(x.dtype)

    for name, f, x in [("bn r4 c-last", bn4, x4), ("bn cv-packed", bn_cv, xp)]:
        @jax.jit
        def step(x, sc, bi, f=f):
            def loss(x):
                return jnp.sum(f(x, sc, bi).astype(jnp.float32) ** 2)
            g = jax.grad(loss)(x)
            return x + 1e-6 * g
        print(f"  {name} fwd+bwd: {timeit(step, x, sc, bi):.3f} ms",
              flush=True)


def probe_gcn_cv():
    """cv-packed GCN (free-view agg + proj) vs current agg_packed."""
    from agcn_tpu.ops import gcn as gcn_ops
    key = jax.random.PRNGKey(2)
    K, Co = 3, 64
    x4 = jax.random.normal(key, (B, T, V, C), jnp.bfloat16)
    xcv = jnp.transpose(x4, (0, 1, 3, 2)).reshape(B, T, C * V)
    a1 = jax.random.normal(key, (B, K, V, V), jnp.bfloat16)
    w = jax.random.normal(key, (K, C, Co), jnp.bfloat16)

    def gcn_cv(xcv, a1, w):
        x2 = xcv.reshape(B, T * C, V)                      # free view
        a2 = jnp.transpose(a1, (0, 2, 1, 3)).reshape(B, V, K * V)
        z = jnp.einsum("bmv,bvn->bmn", x2, a2)             # (B,T*C,K*V)
        z3 = z.reshape(B, T, C * K, V)                     # free view
        w3 = jnp.transpose(w, (1, 0, 2)).reshape(C * K, Co)
        y = jnp.einsum("btmv,mo->btov", z3, w3)            # (B,T,O,V)
        return y.reshape(B, T, Co * V)

    def gcn_cl(x4, a1, w):
        return gcn_ops.adaptive_gcn_agg_packed(x4, a1, w)

    for name, f, x in [("gcn agg_packed c-last", gcn_cl, x4),
                       ("gcn cv-packed freeview", gcn_cv, xcv)]:
        @jax.jit
        def step(x, a1, w, f=f):
            def loss(x, a1, w):
                return jnp.sum(f(x, a1, w).astype(jnp.float32) ** 2)
            gx, ga, gw = jax.grad(loss, argnums=(0, 1, 2))(x, a1, w)
            return x + 1e-6 * gx, ga, gw
        @jax.jit
        def stepx(x, a1, w, step=step):
            y = step(x, a1, w)
            return y[0]
        print(f"  {name} fwd+bwd: {timeit(stepx, x, a1, w):.3f} ms",
              flush=True)


def probe_conv():
    """9x1 temporal conv: NHWC (T,V spatial, C feat) vs NHCW cv layout."""
    key = jax.random.PRNGKey(3)
    x4 = jax.random.normal(key, (B, T, V, C), jnp.bfloat16)
    xcv = jax.random.normal(key, (B, T, C, V), jnp.bfloat16)
    k = jax.random.normal(key, (9, 1, C, C), jnp.bfloat16) * 0.05

    def conv_nhwc(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(4, 4), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_nhcw(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(4, 4), (0, 0)],
            dimension_numbers=("NHCW", "HWIO", "NHCW"))

    for name, f, x in [("conv NHWC c-last", conv_nhwc, x4),
                       ("conv NHCW cv", conv_nhcw, xcv)]:
        @jax.jit
        def step(x, k, f=f):
            def loss(x, k):
                return jnp.sum(f(x, k).astype(jnp.float32) ** 2)
            gx = jax.grad(loss)(x, k)
            return x + 1e-6 * gx
        print(f"  {name} fwd+bwd: {timeit(step, x, k):.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["elementwise", "bn", "gcn", "conv"]
    for w in which:
        print(f"[{w}]", flush=True)
        {"elementwise": probe_elementwise, "bn": probe_bn,
         "gcn": probe_gcn_cv, "conv": probe_conv}[w]()
