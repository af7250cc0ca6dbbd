"""Fully-fused adaptive graph convolution — forward AND backward pallas
TPU kernels in the model's native (B, T, V, C) layout.

  y[b,t,w,o] = sum_{k,v,c} x[b,t,v,c] * a1[b,k,v,w] * W[k,c,o]

(reference model/architecture/aagcn/agcn.py:92-109 semantics). The XLA
formulations materialize the (B, T*C, K*V) aggregation intermediate in
HBM and relayout-copy it between the two GEMMs — the round-4 profile
attributed the largest copy-only block (~31 ms/step over 9 layers) to
exactly those copies (gcn.py:180-182). Here the intermediate lives only
in VMEM: per (sample, time-tile) grid cell the kernel runs, per subset,

  agg_k = dot_general(x, a1[k])   contracting v (lhs middle)  (Tt, C, W)
  y    += dot_general(agg_k, W_k) contracting c (lhs middle)  (Tt, W, O)

with fp32 accumulation over k. HBM traffic per layer drops from
~6x activations (x + z write/copy/read + y) to x + y.

Mosaic support constraints on this chip (probed empirically, see
tools/bench_pallas_gcn.py): 3Dx2D dot_general requires the contraction
on the lhs middle dim; lane-dim folds need a 128-multiple minor dim;
a middle contraction over 64 crashes the compiler — so contractions of
width < 128 (C = 3, 64) are zero-padded to 128 (host pads W, the kernel
pads agg; zeros cannot change the sums).

Backward:
  dx  = the SAME forward kernel applied to (g, a1^T, W^T) — the vjp of
        a trilinear form is the same trilinear form with two operands
        transposed on their tiny axes (host transposes of (B,K,V,V) and
        (K,C,O) only).
  dW, da1 = one grid-accumulating kernel: u_k = dg(g, a1_k^T) over w,
        dW_k += x_flat^T @ u_k; p_k = x_flat @ W_k,
        da1_k += p_k^T-over-(t,o) @ g (all leading folds + minor
        transposes + dim-0-contraction 2D dots, each probed supported).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K = 3  # subset count is structural in this architecture (reference A/B/C)


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _fwd_kernel(x_ref, a1_ref, w_ref, out_ref, *, cpad: bool):
    """x (1,Tt,V,C), a1 (1,K,V,V), w (K,Cp,O) -> out (1,Tt,V,O)."""
    x = x_ref[0]
    tt, v, c = x.shape
    acc = None
    for k in range(K):
        agg = jax.lax.dot_general(
            x, a1_ref[0, k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)  # (Tt,C,W)
        if cpad:
            agg = jnp.concatenate(
                [agg, jnp.zeros((tt, _pad128(c) - c, v), agg.dtype)],
                axis=1)
        y = jax.lax.dot_general(
            agg, w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (Tt,W,O)
        acc = y if acc is None else acc + y
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(x_ref, a1_ref, w_ref, g_ref, dw_ref, da1_ref, *,
                cpad: bool):
    """Accumulates dW (K,Cp,O) over the whole grid and da1 (1,K,V,V)
    over the time-tiles of each sample. Grid (B, nT) runs sequentially
    on TPU, so += on a revisited output block is well-defined."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(j == 0)
    def _():
        da1_ref[:] = jnp.zeros_like(da1_ref)

    # v-major folds: Mosaic rejects folding the (1, Tt, V, C) block
    # straight to (Tt*V, C) (the leading-1 squeeze fuses into a 4D->2D
    # reshape it cannot lower), but a fold AFTER an explicit transpose
    # compiles — so every flattened operand goes through one.
    x = x_ref[0]                               # (Tt, V, C)
    g = g_ref[0]                               # (Tt, W, O)
    tt, v, c = x.shape
    o = g.shape[-1]
    xf = jnp.transpose(x, (1, 0, 2)).reshape(v * tt, c)   # (V*Tt, C)
    gm = jnp.transpose(g, (0, 2, 1)).reshape(tt * o, v)   # (Tt*O, W)
    for k in range(K):
        # u_k[t,o,v] = sum_w g[t,w,o] * a1[k,v,w]  (contract w = g middle)
        u = jax.lax.dot_general(
            g, a1_ref[0, k].T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype)  # (Tt,O,V)
        uf = jnp.transpose(u, (2, 0, 1)).reshape(v * tt, o)  # (V*Tt, O)
        # dW_k[c,o] += sum_{v,t} x[v,t,c] * u[v,t,o]
        dwk = jax.lax.dot_general(
            xf, uf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (C, O)
        if cpad:
            dwk = jnp.concatenate(
                [dwk, jnp.zeros((_pad128(c) - c, o), dwk.dtype)], axis=0)
        dw_ref[k] += dwk
        # p_k = x W_k ; da1_k[v,w] += sum_{t,o} p[v,t,o] * g[t,w,o]
        p = jnp.dot(xf, w_ref[k, :c],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        pm = jnp.transpose(p.reshape(v, tt, o),
                           (1, 2, 0)).reshape(tt * o, v)         # (Tt*O, V)
        da1_ref[0, k] += jax.lax.dot_general(
            pm, gm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (V, W)


def _time_tile(t: int, c: int, o: int) -> int:
    """Pick a tile so the VMEM-resident intermediates stay small (the
    per-subset agg block is (Tt, Cp, V->128 lanes)). Mosaic constraint:
    the backward folds (Tt*V, C) with V=25, so Tt must be a multiple of
    8 to keep the folded sublane count 8-aligned; T is padded up to a
    tile multiple — among admissible tiles pick the one wasting the
    least padding (largest tile on ties)."""
    budget = 8192  # Tt * Cp target
    cap = max(8, (budget // max(_pad128(c), _pad128(o))) & ~7)
    best = None
    for tt in range(8, cap + 1, 8):
        padded = -(-t // tt) * tt
        if best is None or padded <= best[0]:
            best = (padded, tt)
    return best[1]


def _pad_time(x, tt):
    t = x.shape[1]
    pad = -t % tt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x, t


def _forward(x, a1, w, interpret):
    b, t0, v, c = x.shape
    k, _, co = w.shape
    assert k == K, (k, K)
    cp = _pad128(c)
    if cp != c:
        w = jnp.pad(w, ((0, 0), (0, cp - c), (0, 0)))
    tt = _time_tile(t0, c, co)
    x, t0 = _pad_time(x, tt)
    t = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cpad=cp != c),
        out_shape=jax.ShapeDtypeStruct((b, t, v, co), x.dtype),
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, v, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((K, cp, co), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, v, co), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(x, a1, w)
    return out[:, :t0]


def _backward(x, a1, w, g, interpret):
    b, t0, v, c = x.shape
    co = w.shape[-1]
    cp = _pad128(c)
    if cp != c:
        w = jnp.pad(w, ((0, 0), (0, cp - c), (0, 0)))
    tt = _time_tile(t0, c, co)
    x, _ = _pad_time(x, tt)
    g, _ = _pad_time(g, tt)  # zero rows contribute zero to both grads
    t = x.shape[1]
    dw, da1 = pl.pallas_call(
        functools.partial(_bwd_kernel, cpad=cp != c),
        out_shape=(
            jax.ShapeDtypeStruct((K, cp, co), jnp.float32),
            jax.ShapeDtypeStruct((b, K, v, v), jnp.float32),
        ),
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, v, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((K, cp, co), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, tt, v, co), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((K, cp, co), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, K, v, v), lambda i, j: (i, 0, 0, 0)),
        ),
        interpret=interpret,
    )(x, a1, w, g)
    return dw[:, :c].astype(w.dtype), da1.astype(a1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adaptive_gcn_pallas(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused y = sum_k (x @_v a1_k) @_c W_k, trainable (custom VJP).

    Args:
      x: (B, T, V, C) features (bf16 or f32).
      a1: (B, K, V, V) combined adjacency, a1[b,k,source,dest].
      w: (K, C, Co) per-subset projection kernels.
    Returns:
      (B, T, V, Co) in x.dtype.
    """
    return _forward(x, a1, w, interpret)


def _vjp_fwd(x, a1, w, interpret):
    return _forward(x, a1, w, interpret), (x, a1, w)


def _vjp_bwd(interpret, res, g):
    x, a1, w = res
    g = g.astype(x.dtype)
    # dx[b,t,v,c] = sum_{k,w,o} g a1 W — the same trilinear kernel with
    # the two small operands transposed
    dx = _forward(g, jnp.swapaxes(a1, 2, 3), jnp.swapaxes(w, 1, 2),
                  interpret)
    dw, da1 = _backward(x, a1, w, g, interpret)
    return dx.astype(x.dtype), da1, dw


adaptive_gcn_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adaptive_gcn_pallas_hybrid(x: jnp.ndarray, a1: jnp.ndarray,
                               w: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """Pallas forward (the aggregation intermediate never touches HBM —
    kills the fwd relayout copy at ops/gcn.py:180-182) with the
    round-3-tuned XLA einsum cotangents (ops/gcn._adaptive_gcn_bwd) for
    the backward — for the case where the fused bwd kernel's extra
    in-VMEM transposes cost more than XLA's bwd fusions."""
    return _forward(x, a1, w, interpret)


def _hyb_fwd(x, a1, w, interpret):
    return _forward(x, a1, w, interpret), (x, a1, w)


def _hyb_bwd(interpret, res, g):
    del interpret
    from agcn_tpu.ops.gcn import _adaptive_gcn_bwd

    return _adaptive_gcn_bwd(res, g.astype(res[0].dtype))


adaptive_gcn_pallas_hybrid.defvjp(_hyb_fwd, _hyb_bwd)
