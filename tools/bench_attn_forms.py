#!/usr/bin/env python
"""Attention-logits path formulations: fwd and full-VJP timings on TPU.

The ablation bench shows the theta/phi bilinear + softmax costs ~93 ms of
the 301 ms AGCN step (batch 64) — ~100x its FLOP cost. This bench isolates
the (emb -> logits -> softmax) computation at two block shapes to find the
lowering that XLA does well.
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


def variants(ce, t):
    """Each takes (x (B,T,V,C), emb_w (C, 2*K*Ce)) -> att (B,K,V,V)."""

    def head(x, emb_w):
        emb = x @ emb_w
        b, tt, v, _ = emb.shape
        return emb.reshape(b, tt, v, 2, K, ce)

    def cur(x, emb_w):
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        logits = jnp.einsum("btvkc,btwkc->bkvw", theta, phi) / (ce * t)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-2)

    def transposed(x, emb_w):
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        th = jnp.transpose(theta, (0, 3, 2, 1, 4))  # (B,K,V,T,Ce)
        ph = jnp.transpose(phi, (0, 3, 2, 1, 4))
        b = th.shape[0]
        th = th.reshape(b, K, V, t * ce)
        ph = ph.reshape(b, K, V, t * ce)
        logits = jnp.einsum("bkvx,bkwx->bkvw", th, ph) / (ce * t)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-2)

    def nofp32(x, emb_w):
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        logits = jnp.einsum("btvkc,btwkc->bkvw", theta, phi) / (ce * t)
        return jax.nn.softmax(logits, axis=-2)

    def f32acc(x, emb_w):
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        logits = jnp.einsum("btvkc,btwkc->bkvw", theta, phi,
                            preferred_element_type=jnp.float32) / (ce * t)
        return jax.nn.softmax(logits, axis=-2)

    def packed(x, emb_w):
        # (K*V, K*V) bilinear, take block-diagonal K blocks
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        b = theta.shape[0]
        th = jnp.transpose(theta, (0, 3, 2, 1, 4)).reshape(b, K * V,
                                                           t * ce)
        ph = jnp.transpose(phi, (0, 3, 2, 1, 4)).reshape(b, K * V, t * ce)
        big = jnp.einsum("bpx,bqx->bpq", th, ph)  # (B, KV, KV)
        big = big.reshape(b, K, V, K, V)
        logits = jnp.einsum("bkvkw->bkvw", big) / (ce * t)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-2)

    def fold_t_major(x, emb_w):
        # contract T in an explicit scan-free matmul with (t,c) flattened
        # via a (B*K) batch: same as transposed but batch folded
        emb = head(x, emb_w)
        theta, phi = emb[..., 0, :, :], emb[..., 1, :, :]
        b = theta.shape[0]
        th = jnp.transpose(theta, (0, 3, 2, 1, 4)).reshape(b * K, V,
                                                           t * ce)
        ph = jnp.transpose(phi, (0, 3, 2, 1, 4)).reshape(b * K, V, t * ce)
        logits = jax.lax.dot_general(
            th, ph, (((2,), (2,)), ((0,), (0,)))) / (ce * t)
        logits = logits.reshape(b, K, V, V)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-2)

    return [("einsum(cur)", cur), ("transposed", transposed),
            ("no-fp32-softmax", nofp32), ("f32-accum", f32acc),
            ("packed-KV", packed), ("batched-dot", fold_t_major)]


def main():
    shapes = [("l2-4: C64 T300", 128, 300, 64, 16),
              ("l9-10: C256 T75", 128, 75, 256, 64)]
    rng = np.random.default_rng(0)
    for name, b, t, c, ce in shapes:
        x = jnp.asarray(rng.standard_normal((b, t, V, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((c, 2 * K * ce)) * 0.05,
                        jnp.bfloat16)
        print(f"== {name}")
        for vname, fn in variants(ce, t):
            fwd = timed(fn, (x, w))

            def g(x, w, fn=fn):
                return jax.grad(
                    lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))(x, w)

            bwd = timed(g, (x, w))
            print(f"  {vname:18} fwd {fwd:7.2f} ms   vjp {bwd:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
