#!/usr/bin/env python
"""Fused-GCN pallas kernel variants vs the XLA agg_packed baseline.

The round-4 profile attributed the largest copy-only block to the
aggregation einsum's relayout copies (gcn.py:180-182, ~31 ms/step over
9 layers): XLA materializes the (B, T*C, K*V) intermediate in HBM,
copies it to the consumer's layout, and re-reads it. A fused kernel
keeps the intermediate in VMEM.

Mosaic op support on this chip (probed): transposes (incl. minor dim),
leading-dim folds, lane folds only when the minor dim is a multiple of
128, and 3Dx2D dot_general with a middle-dim contraction on the lhs.
2Dx3D dot_general is NOT supported (crashes the compile helper).

Usage: python tools/bench_pallas_gcn.py [variant ...]
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agcn_tpu.ops.gcn import adaptive_gcn_agg_packed

K, V = 3, 25


# --- variant: dgmid (aggregate-first, zero transposes) ---------------------
def _dgmid_kernel(x_ref, a1_ref, w_ref, out_ref):
    """x (1,Tt,V,C), a1 (1,K,V,V), w (K,C,O) -> out (1,Tt,V,O).

    agg_k = dg(x, a1[k]) contracting v (lhs middle)  -> (Tt, C, W)
    y_k   = dg(agg_k, w[k]) contracting c (lhs middle) -> (Tt, W, O)
    """
    x = x_ref[0]
    acc = None
    for k in range(K):
        agg = jax.lax.dot_general(
            x, a1_ref[0, k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = jax.lax.dot_general(
            agg, w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    out_ref[0] = acc.astype(out_ref.dtype)


def fused_dgmid(x, a1, w, tt):
    b, t, v, c = x.shape
    co = w.shape[-1]
    return pl.pallas_call(
        _dgmid_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, v, co), x.dtype),
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, v, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((K, c, co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, v, co), lambda i, j: (i, j, 0, 0)),
    )(x, a1, w)


# --- variant: pf (project-first, one minor transpose per k) ----------------
def _pf_kernel(x_ref, a1_ref, w_ref, out_ref):
    """p_k = fold(x) @ w[k] -> (Tt*V, O); dg(p_k, a1[k]) over v -> (Tt,O,W);
    minor transpose -> (Tt, W, O); accumulate."""
    x = x_ref[0]
    tt, v, c = x.shape
    x2 = x.reshape(tt * v, c)
    acc = None
    for k in range(K):
        p = jnp.dot(x2, w_ref[k],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        p = p.reshape(tt, v, -1)
        y = jax.lax.dot_general(
            p, a1_ref[0, k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (Tt, O, W)
        acc = y if acc is None else acc + y
    out_ref[0] = jnp.transpose(acc, (0, 2, 1)).astype(out_ref.dtype)


def fused_pf(x, a1, w, tt):
    b, t, v, c = x.shape
    co = w.shape[-1]
    return pl.pallas_call(
        _pf_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, v, co), x.dtype),
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, v, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((K, c, co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, v, co), lambda i, j: (i, j, 0, 0)),
    )(x, a1, w)


# --- variant: trj (transpose to joint-major inside, 2D matmuls) ------------
def _trj_kernel(x_ref, a1_ref, w_ref, out_ref):
    """xt = transpose(x) (V,Tt,C) -> per-k agg via dg contracting v
    (lhs middle unavailable: v now leading) — use x as dg lhs with v
    middle after transpose to (Tt? ...). Joint-major 2D path requires a
    lane fold (V, Tt*C), legal only when C % 128 == 0."""
    x = x_ref[0]
    tt, v, c = x.shape
    xt = jnp.transpose(x, (1, 0, 2)).reshape(v, tt * c)   # lane fold!
    acc = None
    for k in range(K):
        agg = jax.lax.dot_general(
            a1_ref[0, k], xt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)  # (W, Tt*C)
        agg = agg.reshape(v * tt, c)
        y = jnp.dot(agg, w_ref[k], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    acc = acc.reshape(v, tt, -1)
    out_ref[0] = jnp.transpose(acc, (1, 0, 2)).astype(out_ref.dtype)


def fused_trj(x, a1, w, tt):
    b, t, v, c = x.shape
    co = w.shape[-1]
    return pl.pallas_call(
        _trj_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, v, co), x.dtype),
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, v, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((K, c, co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, v, co), lambda i, j: (i, j, 0, 0)),
    )(x, a1, w)


VARIANTS = {
    "xla": lambda x, a1, w, tt: adaptive_gcn_agg_packed(x, a1, w),
    "dgmid": fused_dgmid,
    "pf": fused_pf,
    "trj": fused_trj,
}

# (T, C, O) at B=128 (batch 64 x 2 persons): the 3 steady-state block
# shapes plus the two widening blocks
SHAPES = [(300, 64, 64), (300, 64, 128), (150, 128, 128),
          (150, 128, 256), (75, 256, 256)]


def timed(fn, args, iters=30):
    fn = jax.jit(fn)
    out = fn(*args)
    _ = np.asarray(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        chain = (jnp.sum(out) * 0.0).astype(args[0].dtype)
        args = (args[0] + chain,) + args[1:]
    _ = np.asarray(jnp.sum(args[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main(names):
    rng = np.random.default_rng(0)
    b = 128
    print(f"{'shape':>18} | " + " | ".join(f"{n:>12}" for n in names))
    for t, c, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((b, K, V, V)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, c, co)), jnp.bfloat16)
        ref = None
        row = []
        for name in names:
            tt = {64: 100, 128: 50, 256: 25}.get(c, 50)
            fn = functools.partial(VARIANTS[name], tt=tt)
            try:
                ms = timed(fn, (x, a1, w))
                out = np.asarray(jax.jit(fn)(x, a1, w), np.float32)
                if ref is None:
                    ref = out
                    err = 0.0
                else:
                    err = float(np.max(np.abs(out - ref))
                                / max(np.max(np.abs(ref)), 1e-9))
                row.append(f"{ms:8.3f}/{err:.0e}")
            except Exception as e:
                row.append(f"FAIL:{str(e).splitlines()[0][:40]}")
        print(f"({t:3},{c:3},{co:3})B128 | " + " | ".join(
            f"{r:>12}" for r in row))


if __name__ == "__main__" and "vjp" not in sys.argv:
    main(sys.argv[1:] or list(VARIANTS))


# --- product op: fwd+bwd timing vs XLA autodiff ----------------------------
def bench_vjp():
    from agcn_tpu.ops.pallas.gcn_fused import adaptive_gcn_pallas

    rng = np.random.default_rng(0)
    b = 128

    def loss_pallas(x, a1, w):
        return jnp.sum(adaptive_gcn_pallas(x, a1, w) ** 2)

    def loss_xla(x, a1, w):
        return jnp.sum(adaptive_gcn_agg_packed(x, a1, w) ** 2)

    print(f"{'shape':>18} | {'xla fwd':>9} | {'pal fwd':>9} | "
          f"{'xla f+b':>9} | {'pal f+b':>9} | maxerr(dx,da1,dw)")
    for t, c, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((b, K, V, V)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, c, co)), jnp.bfloat16)
        row = []
        for fn in (adaptive_gcn_agg_packed,
                   lambda x, a1, w: adaptive_gcn_pallas(x, a1, w)):
            row.append(timed(fn, (x, a1, w)))
        grads = {}
        for name, ls in (("xla", loss_xla), ("pal", loss_pallas)):
            gf = jax.jit(jax.grad(ls, argnums=(0, 1, 2)))
            g = gf(x, a1, w)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(20):
                g = gf(x, a1, w)
                chain = (jnp.sum(g[0]) * 0.0).astype(x.dtype)
                x = x + chain
            jax.block_until_ready(g)
            row.append((time.perf_counter() - t0) / 20 * 1e3)
            grads[name] = [np.asarray(t, np.float32) for t in g]
        errs = [float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))
                for a, b in zip(grads["xla"], grads["pal"])]
        print(f"({t:3},{c:3},{co:3})B128 | " +
              " | ".join(f"{v:9.3f}" for v in row) +
              " | " + ",".join(f"{e:.0e}" for e in errs))


if __name__ == "__main__" and "vjp" in sys.argv:
    sys.exit(bench_vjp() or 0)
