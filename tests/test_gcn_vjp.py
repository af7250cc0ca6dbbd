"""Custom-VJP project-first GCN: forward + gradient equivalence.

The fast formulation (ops/gcn.py adaptive_gcn) must match the naive
aggregate-then-project form (the reference semantics, agcn.py:92-109)
in both the primal and every cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.ops import gcn as gcn_ops

B, T, V, C, K, CO = 3, 7, 25, 8, 3, 10


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, V, C)), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal((B, K, V, V)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, CO)), jnp.float32)
    return x, a1, w


def test_forward_matches_reference(inputs):
    x, a1, w = inputs
    got = gcn_ops.adaptive_gcn(x, a1, w)
    want = gcn_ops.adaptive_gcn_reference(x, a1, w)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gradients_match_autodiff_of_reference(inputs):
    x, a1, w = inputs
    rng = np.random.default_rng(1)
    # scalarize through a fixed random projection so every output
    # element contributes a distinct cotangent
    probe = jnp.asarray(rng.standard_normal((B, T, V, CO)), jnp.float32)

    def loss_fast(x, a1, w):
        return jnp.sum(gcn_ops.adaptive_gcn(x, a1, w) * probe)

    def loss_ref(x, a1, w):
        return jnp.sum(gcn_ops.adaptive_gcn_reference(x, a1, w) * probe)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, a1, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a1, w)
    for name, gf, gr in zip(("dx", "da1", "dw"), g_fast, g_ref):
        np.testing.assert_allclose(gf, gr, atol=1e-3, rtol=1e-4,
                                   err_msg=name)


def test_jittable_under_grad(inputs):
    x, a1, w = inputs

    @jax.jit
    def f(x, a1, w):
        return jax.grad(
            lambda *a: jnp.sum(gcn_ops.adaptive_gcn(*a) ** 2))(x, a1, w)

    out = f(x, a1, w)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
