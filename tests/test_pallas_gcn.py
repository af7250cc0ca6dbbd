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


# ---------------------------------------------------------------------------
# gcn_fused: the round-4 fully-fused fwd+bwd kernel (native layout)

from agcn_tpu.ops.pallas.gcn_fused import adaptive_gcn_pallas


@pytest.mark.parametrize("t,c,co", [(48, 16, 32), (50, 64, 64),
                                    (24, 128, 128), (20, 3, 64)])
def test_gcn_fused_forward(t, c, co):
    x, a1, w = _inputs(b=2, t=t, c=c, co=co)
    out = adaptive_gcn_pallas(x, a1, w, True)
    ref = reference_fused_gcn(x, a1, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_gcn_fused_gradients():
    x, a1, w = _inputs(b=2, t=40, c=32, co=16)

    def lp(x, a1, w):
        return jnp.sum(adaptive_gcn_pallas(x, a1, w, True) ** 2)

    def lr(x, a1, w):
        return jnp.sum(reference_fused_gcn(x, a1, w) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, a1, w)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, a1, w)
    for name, a, b in zip("x a1 w".split(), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-2, err_msg=name)


def test_gcn_fused_hybrid_matches_reference():
    """pallas fwd + XLA cotangents: values AND all three grads."""
    from agcn_tpu.ops.pallas.gcn_fused import adaptive_gcn_pallas_hybrid

    x, a1, w = _inputs(b=2, t=40, c=32, co=16)
    out = adaptive_gcn_pallas_hybrid(x, a1, w, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(reference_fused_gcn(x, a1, w)),
                               atol=2e-3, rtol=2e-3)
    ln = lambda f: (lambda *a: jnp.sum(f(*a) ** 2))
    gp = jax.grad(ln(lambda x, a1, w: adaptive_gcn_pallas_hybrid(
        x, a1, w, True)), argnums=(0, 1, 2))(x, a1, w)
    gr = jax.grad(ln(reference_fused_gcn), argnums=(0, 1, 2))(x, a1, w)
    for name, a, b in zip("x a1 w".split(), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-2, err_msg=name)


@pytest.mark.parametrize("form", ["pallas", "pallas_hybrid"])
def test_apply_gcn_pallas_dispatch_and_small_c_fallback(form):
    """apply_gcn routes both pallas forms; C=3 (entry layer) falls back
    to the XLA agg_packed form (Mosaic minor-dim-3 unsupported)."""
    from agcn_tpu.ops.gcn import apply_gcn

    x, a1, w = _inputs(b=2, t=24, c=16, co=16)
    np.testing.assert_allclose(
        np.asarray(apply_gcn(x, a1, w, form)),
        np.asarray(reference_fused_gcn(x, a1, w)), atol=2e-3, rtol=2e-3)
    x3, a13, w3 = _inputs(b=2, t=24, c=3, co=16)
    np.testing.assert_allclose(
        np.asarray(apply_gcn(x3, a13, w3, form)),
        np.asarray(reference_fused_gcn(x3, a13, w3)),
        atol=2e-3, rtol=2e-3)


def test_agcn_eval_pallas_formulation_matches_default():
    """At eval the pallas formulations keep the fused forward (the XLA
    forms switch to 'pf'); same params must give the same logits."""
    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN

    adj = build_adjacency("ntu_rgb_d")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    ref_model = AGCN(num_class=7, adj=adj)
    variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    want = ref_model.apply(variables, x, train=False)[0]
    got = AGCN(num_class=7, adj=adj, formulation="pallas_hybrid").apply(
        variables, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


def test_gcn_fused_gradients_padded_channel():
    """C=64 routes through the zero-padded contraction; T=50 is not a
    multiple of the time tile."""
    x, a1, w = _inputs(b=2, t=50, c=64, co=64)
    ln = lambda f: (lambda *a: jnp.sum(f(*a) ** 2))
    gp = jax.grad(ln(lambda x, a1, w: adaptive_gcn_pallas(x, a1, w, True)),
                  argnums=(0, 1, 2))(x, a1, w)
    gr = jax.grad(ln(reference_fused_gcn), argnums=(0, 1, 2))(x, a1, w)
    for name, a, b in zip("x a1 w".split(), gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-2, err_msg=name)
