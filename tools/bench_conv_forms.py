#!/usr/bin/env python
"""9x1 temporal-conv formulations, fwd + VJP, on TPU.

The TCN convs carry most of the model's FLOPs (~70 GF/block at l2-4);
XLA's conv runs at ~13% of peak. Tests whether tap-sum GEMMs or im2col
beat the native convolution."""

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

KS = 9
V = 25


def timed(fn, args, iters=30):
    fn = jax.jit(fn)
    out = fn(*args)
    _ = np.asarray(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        chain = jnp.sum(out).astype(args[0].dtype) * 0.0
        args = (args[0] + chain,) + args[1:]
    _ = np.asarray(jnp.sum(args[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def variants(stride):
    pad = (KS - 1) // 2

    def native(x, w):
        # w: (KS, 1, C, Co) flax conv layout
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, 1),
            padding=((pad, pad), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def tapsum(x, w):
        b, t, v, c = x.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        y = None
        for d in range(KS):
            xd = jax.lax.slice_in_dim(xp, d, d + t, axis=1)
            if stride > 1:
                xd = xd[:, ::stride]
            z = xd @ w[d, 0]
            y = z if y is None else y + z
        return y

    def im2col(x, w):
        b, t, v, c = x.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        cols = jnp.stack([jax.lax.slice_in_dim(xp, d, d + t, axis=1)
                          for d in range(KS)], axis=-2)  # (B,T,V,KS,C)
        if stride > 1:
            cols = cols[:, ::stride]
        flat = cols.reshape(cols.shape[:3] + (KS * c,))
        return flat @ w[:, 0].reshape(KS * c, -1)

    return [("native-conv", native), ("tap-sum", tapsum),
            ("im2col", im2col)]


def main():
    shapes = [("l2-4: C64 T300 s1", 128, 300, 64, 64, 1),
              ("l5: C64->128 T300 s2", 128, 300, 128, 128, 2),
              ("l9-10: C256 T75 s1", 128, 75, 256, 256, 1)]
    rng = np.random.default_rng(0)
    for name, b, t, c, co, stride in shapes:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((KS, 1, c, co)) * 0.02,
                        jnp.bfloat16)
        print(f"== {name}")
        ref = None
        for vname, fn in variants(stride):
            out = np.asarray(jax.jit(fn)(x, w), np.float32)
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
                assert err < 0.05, (vname, err)
            fwd = timed(fn, (x, w))

            def g(x, w, fn=fn):
                return jax.grad(lambda *a: jnp.sum(
                    fn(*a).astype(jnp.float32)))(x, w)

            bwd = timed(g, (x, w))
            print(f"  {vname:12} fwd {fwd:7.2f} ms   vjp {bwd:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
