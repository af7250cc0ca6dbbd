#!/usr/bin/env python
"""Aggregation+projection formulations, fwd + VJP, on TPU.

The attention-logits einsum turned out ~30x slower than an explicitly
packed batched matmul (bench_attn_forms.py). This bench checks whether
the aggregation path y = sum_k (x @ A1_k) @ W_k has the same disease.
"""

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

K = 3
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


def variants():
    def agg(x, a1, w):
        b, t, v, c = x.shape
        z = jnp.einsum("btvc,bkvw->btwkc", x, a1).reshape(b, t, v, K * c)
        return z @ w.reshape(K * c, -1)

    def pf(x, a1, w):
        b, t, v, c = x.shape
        co = w.shape[-1]
        wc = jnp.transpose(w, (1, 0, 2)).reshape(c, K * co)
        p = (x @ wc).reshape(b, t, v, K, co)
        return jnp.einsum("btvko,bkvw->btwo", p, a1)

    def pf_packed(x, a1, w):
        b, t, v, c = x.shape
        co = w.shape[-1]
        wc = jnp.transpose(w, (1, 0, 2)).reshape(c, K * co)
        p = (x @ wc).reshape(b, t, v, K, co)
        # pack (k, v) as one contraction axis, (t, co) as M
        p2 = jnp.transpose(p, (0, 1, 4, 3, 2)).reshape(b, t * co, K * v)
        a2 = a1.reshape(b, K * v, v)
        y = jnp.einsum("bmx,bxw->bmw", p2, a2)
        return jnp.transpose(y.reshape(b, t, co, v), (0, 1, 3, 2))

    def agg_packed(x, a1, w):
        b, t, v, c = x.shape
        x2 = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t * c, v)
        a2 = jnp.transpose(a1, (0, 2, 1, 3)).reshape(b, v, K * v)
        z = jnp.einsum("bmv,bvn->bmn", x2, a2)  # (B, T*C, K*V)
        z = z.reshape(b, t, c, K, v)
        z = jnp.transpose(z, (0, 1, 4, 3, 2)).reshape(b, t, v, K * c)
        return z @ w.reshape(K * c, -1)

    return [("agg(cur)", agg), ("pf", pf), ("pf-packed", pf_packed),
            ("agg-packed", agg_packed)]


def main():
    shapes = [("l2-4: C64 T300", 128, 300, 64, 64),
              ("l5: C64->128 T300", 128, 300, 64, 128),
              ("l9-10: C256 T75", 128, 75, 256, 256)]
    rng = np.random.default_rng(0)
    for name, b, t, c, co in shapes:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((b, K, V, V)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, c, co)) * 0.05,
                        jnp.bfloat16)
        print(f"== {name}")
        ref = None
        for vname, fn in variants():
            out = np.asarray(jax.jit(fn)(x, a1, w), np.float32)
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
                assert err < 0.02, (vname, err)
            fwd = timed(fn, (x, a1, w))

            def g(x, a1, w, fn=fn):
                return jax.grad(lambda *a: jnp.sum(
                    fn(*a).astype(jnp.float32)))(x, a1, w)

            bwd = timed(g, (x, a1, w))
            print(f"  {vname:12} fwd {fwd:7.2f} ms   vjp {bwd:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
