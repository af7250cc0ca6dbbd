"""Pallas TPU kernel: packed attention-logits GEMM accumulation.

Computes S[b, p, q] = sum_x th[b, p, x] * ph_t[b, x, q] for the packed
(K*V -> 128-padded) theta/phi layout used by the transposed logits
formulation (models/agcn.py). Every in-kernel matmul is (128, Xt) @
(Xt, 128) — fully MXU-tile-aligned, no in-kernel transposes — the shape
class the environment's Mosaic remote-compile helper accepts.

The softmax and the diagonal-block extraction stay in XLA (they are
cheap); the kernel exists to bypass XLA's slow lowering of the bilinear
and to serve as the building block for a fused custom-VJP path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    _VMEM = None

P = 128            # packed (K*V) rows, padded


def _kernel(th_ref, ph_ref, out_ref):
    out_ref[0] = jax.lax.dot_general(
        th_ref[0], ph_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def packed_logits(th: jnp.ndarray, ph_t: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """S = th @ ph_t batched over B (one full-contraction block per
    grid step: grid overhead bound the tiled v1 at 1280 steps; this
    runs B steps with the whole X axis resident in VMEM).

    Args:
      th: (B, 128, X) packed theta rows (K*V padded to 128).
      ph_t: (B, X, 128) packed phi columns.
    Returns:
      (B, 128, 128) fp32 logits (pre-scale).
    """
    b, p, x = th.shape
    assert p == P and ph_t.shape == (b, x, P)
    x_pad = -x % P
    if x_pad:
        th = jnp.pad(th, ((0, 0), (0, 0), (0, x_pad)))
        ph_t = jnp.pad(ph_t, ((0, 0), (0, x_pad), (0, 0)))
    xp = x + x_pad

    kwargs = {}
    if _VMEM is not None and not interpret:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((1, P, xp), lambda i: (i, 0, 0),
                             memory_space=_VMEM),
                pl.BlockSpec((1, xp, P), lambda i: (i, 0, 0),
                             memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec((1, P, P), lambda i: (i, 0, 0),
                                   memory_space=_VMEM),
        )
    else:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((1, P, xp), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, xp, P), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, P, P), lambda i: (i, 0, 0)),
        )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, P, P), jnp.float32),
        grid=(b,),
        interpret=interpret,
        **kwargs,
    )(th, ph_t)


def pack_rows(theta: jnp.ndarray, num_subset: int, stride: int = 32
              ) -> jnp.ndarray:
    """(B, T, V, K, Ce) -> (B, 128, T*Ce): each subset's V rows start at
    k*stride (host-side transpose; XLA fuses it)."""
    b, t, v, k, ce = theta.shape
    th = jnp.transpose(theta, (0, 3, 2, 1, 4)).reshape(b, k, v, t * ce)
    th = jnp.pad(th, ((0, 0), (0, 0), (0, stride - v), (0, 0)))
    th = th.reshape(b, k * stride, t * ce)
    return jnp.pad(th, ((0, 0), (0, P - k * stride), (0, 0)))


def pack_cols(phi: jnp.ndarray, num_subset: int, stride: int = 32
              ) -> jnp.ndarray:
    """(B, T, V, K, Ce) -> (B, T*Ce, 128) transposed packing."""
    b, t, v, k, ce = phi.shape
    ph = jnp.transpose(phi, (0, 1, 4, 3, 2)).reshape(b, t * ce, k, v)
    ph = jnp.pad(ph, ((0, 0), (0, 0), (0, 0), (0, stride - v)))
    ph = ph.reshape(b, t * ce, k * stride)
    return jnp.pad(ph, ((0, 0), (0, 0), (0, P - k * stride)))


def attention_logits_pallas(theta: jnp.ndarray, phi: jnp.ndarray,
                            divisor: float,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for the transposed-logits computation:
    (B, T, V, K, Ce) theta/phi -> (B, K, V, V) logits."""
    b, t, v, k, ce = theta.shape
    s = packed_logits(pack_rows(theta, k), pack_cols(phi, k),
                      interpret=interpret)
    s = s.reshape(b, 4, 32, 4, 32)
    blocks = [s[:, i, :v, i, :v] for i in range(k)]
    return jnp.stack(blocks, axis=1) / divisor
