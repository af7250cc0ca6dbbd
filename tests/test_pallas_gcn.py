"""Pallas fused-GCN kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.ops.pallas.gcn_kernel import fused_gcn, reference_fused_gcn


def _inputs(b=2, t=48, v=25, c=16, k=3, co=32, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((b, t, v, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, k, v, v)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((k, c, co)).astype(np.float32)))


def test_forward_matches_reference():
    x, a1, w = _inputs()
    out = fused_gcn(x, a1, w, 16, True)
    ref = reference_fused_gcn(x, a1, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_forward_unaligned_time():
    x, a1, w = _inputs(t=50)  # not a multiple of the tile
    out = fused_gcn(x, a1, w, 16, True)
    ref = reference_fused_gcn(x, a1, w)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match_reference():
    x, a1, w = _inputs(t=32)

    def lp(x, a1, w):
        return jnp.sum(fused_gcn(x, a1, w, 16, True) ** 2)

    def lr(x, a1, w):
        return jnp.sum(reference_fused_gcn(x, a1, w) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, a1, w)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, a1, w)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_agcn_with_pallas_matches_xla_path():
    adj = build_adjacency("ntu_rgb_d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)).astype(
        np.float32))
    m_ref = AGCN(num_class=9, adj=adj)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    out_ref = m_ref.apply(variables, x, train=False)

    # interpret-mode pallas path must agree using the same params
    import agcn_tpu.ops.pallas.gcn_kernel as gk
    orig = gk.fused_gcn

    def interp(x, a1, w, time_tile=64, interpret=False):
        return orig(x, a1, w, time_tile, True)

    gk_fused = gk.fused_gcn
    try:
        gk.fused_gcn = interp
        m_pl = AGCN(num_class=9, adj=adj, use_pallas=True)
        out_pl = m_pl.apply(variables, x, train=False)
    finally:
        gk.fused_gcn = gk_fused
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_logits_kernel_matches_einsum():
    """ops/pallas/logits_kernel: packed attention-logits kernel
    (the formulation that compiles through this environment's Mosaic
    relay — PERF.md round 2) matches the einsum reference."""
    from agcn_tpu.ops.pallas.logits_kernel import attention_logits_pallas

    rng = np.random.default_rng(3)
    b, t, v, k, ce = 3, 20, 25, 3, 16
    theta = jnp.asarray(rng.standard_normal((b, t, v, k, ce)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((b, t, v, k, ce)), jnp.float32)
    got = attention_logits_pallas(theta, phi, ce * t, interpret=True)
    want = jnp.einsum("btvkc,btwkc->bkvw", theta, phi) / (ce * t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
