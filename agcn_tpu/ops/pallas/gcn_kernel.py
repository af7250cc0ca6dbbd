"""Pallas TPU kernel: fused adaptive graph convolution.

Computes  z[b,t,w,o] = sum_k sum_v sum_c a1[b,k,v,w] * x[b,t,v,c] * W[k,c,o]

in one kernel: per (sample, time-tile) block the aggregation over the
V x V adjacency, the per-subset output projections and the subset sum all
happen in VMEM — the (B, T, V, K*C) aggregated intermediate that the XLA
path materializes in HBM never exists. V <= 25 keeps each adjacency tile
(K, V, V) permanently in VMEM; the projection is one (Tt*V, K*C) x
(K*C, Co) MXU matmul per block.

Used by UnitGCN/AdaptiveGCN when `use_pallas=True`. Gradients route
through a custom VJP whose backward pass uses the same einsum identities
as the XLA path (the bulk of the backward is plain GEMMs XLA already
handles at speed of light).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, a1_ref, w_ref, out_ref):
    """One (sample, time-tile) block, joint-major layout.

    x_ref:  (1, V, Tt, C)    a1_ref: (1, K, V, V)
    w_ref:  (K*C, Co)        out_ref: (1, V, Tt, Co)

    Mosaic-friendly: only adjacent-dim reshapes, no in-kernel transposes
    (the host supplies x joint-major; XLA fuses that layout change).
    """
    x = x_ref[0]          # (V, Tt, C)
    a1 = a1_ref[0]        # (K, V, V)
    v, tt, c = x.shape
    k = a1.shape[0]

    x2d = x.reshape(v, tt * c)
    aggs = []
    for ki in range(k):
        # agg_k[w, (t,c)] = sum_v a1[k,v,w] * x[v,(t,c)]
        agg = jax.lax.dot_general(
            a1[ki], x2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (V, Tt*C)
        aggs.append(agg.reshape(v * tt, c))
    agg = jnp.concatenate(aggs, axis=-1)  # (V*Tt, K*C)
    # fused projection + subset sum: one MXU matmul
    z = jax.lax.dot_general(
        agg, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = z.reshape(v, tt, -1).astype(out_ref.dtype)


def _forward(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray,
             time_tile: int, interpret: bool) -> jnp.ndarray:
    b, t, v, c = x.shape
    k = a1.shape[1]
    co = w.shape[-1]
    tt = min(time_tile, t)
    if tt < t:
        # Mosaic tiling: the block's second-to-last dim must be a
        # multiple of 8 unless it spans the whole axis
        tt = max(8, tt - tt % 8)
    # pad T to a multiple of the tile
    t_pad = -t % tt
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
    n_tiles = (t + t_pad) // tt
    xj = jnp.transpose(x, (0, 2, 1, 3))  # (B, V, T, C), host-side

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, v, t + t_pad, co), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, v, tt, c), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((k * c, co), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, v, tt, co), lambda i, j: (i, 0, j, 0)),
        interpret=interpret,
    )(xj, a1, w.reshape(k * c, co))
    return jnp.transpose(out, (0, 2, 1, 3))[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_gcn(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray,
              time_tile: int = 64, interpret: bool = False) -> jnp.ndarray:
    """z = sum_k (x @ a1_k) @ W_k with a per-sample (B, K, V, V) adjacency.

    Args:
      x: (B, T, V, C) features.
      a1: (B, K, V, V) combined adjacency (static + attention), layout
        a1[b, k, source, dest].
      w: (K, C, Co) per-subset projection kernels.
    """
    return _forward(x, a1, w, time_tile, interpret)


def _fwd(x, a1, w, time_tile, interpret):
    return _forward(x, a1, w, time_tile, interpret), (x, a1, w)


def _bwd(time_tile, interpret, res, g):
    x, a1, w = res
    # dz/dx: route g back through W^T then the transposed adjacency
    gw = jnp.einsum("btwo,kco->btwkc", g, w)          # (B,T,V,K,C)
    dx = jnp.einsum("btwkc,bkvw->btvc", gw, a1)
    # da1[b,k,v,w] = sum_t sum_c x[b,t,v,c] * (g W^T)[b,t,w,k,c]
    da1 = jnp.einsum("btvc,btwkc->bkvw", x, gw)
    # dW[k,c,o] = sum_b,t,w agg[b,t,w,k,c] * g[b,t,w,o]
    agg = jnp.einsum("btvc,bkvw->btwkc", x, a1)
    dw = jnp.einsum("btwkc,btwo->kco", agg, g)
    return dx, da1, dw


fused_gcn.defvjp(_fwd, _bwd)


def reference_fused_gcn(x, a1, w):
    """jnp reference implementation for validation."""
    agg = jnp.einsum("btvc,bkvw->btwkc", x, a1)
    return jnp.einsum("btwkc,kco->btwo", agg, w)
