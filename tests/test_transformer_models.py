"""Transformer-variant model tests (SGN v15-style + AAGCN v29/v37-style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AAGCNTransformer, SGNTransformer
from agcn_tpu.models.registry import build_model


def test_sgn_transformer_forward_and_train():
    m = SGNTransformer(num_class=11,
                       spatial_mha={"num_layers": 1, "nhead": 4},
                       temporal_mha={"num_layers": 2, "nhead": 4},
                       dropout=0.1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 75)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, aux = m.apply(v, x, train=False)
    assert out.shape == (2, 11)
    assert len(aux["spatial_attn"]) == 1
    assert len(aux["temporal_attn"]) == 2
    out2, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})[0]
    assert np.all(np.isfinite(np.asarray(out2)))


@pytest.mark.parametrize("mode", ["temporal", "spatial", "dual"])
def test_aagcn_transformer_modes(mode):
    adj = build_adjacency("ntu_rgb_d")
    m = AAGCNTransformer(num_class=7, adj=adj, mode=mode, model_layers=102,
                         num_layers=1, num_heads=4, dim_feedforward=128)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 32, 25, 2)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, aux = m.apply(v, x, train=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(out)))


def test_registry_resolves_transformer_aliases():
    m = build_model("model.sgn_v15.SGN",
                    {"num_class": 5, "bias": 1,
                     "spatial_mha_kwargs": {"num_layers": 1, "nhead": 2},
                     "temporal_mha_kwargs": {"num_layers": 1, "nhead": 2}})
    assert isinstance(m, SGNTransformer)
    m2 = build_model("aagcn_transformer",
                     {"num_class": 5, "graph": "ntu_rgb_d", "mode": "dual",
                      "model_layers": 101, "num_layers": 1,
                      "num_heads": 2, "dim_feedforward": 64})
    assert isinstance(m2, AAGCNTransformer)


def test_cross_transformer_fusion():
    from agcn_tpu.ops.attention import CrossTransformer

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 13, 32)).astype(np.float32))
    ct = CrossTransformer(num_heads=4, depth=2)
    v = ct.init(jax.random.PRNGKey(0), a, b)
    a2, b2 = ct.apply(v, a, b)
    assert a2.shape == a.shape and b2.shape == b.shape
    # only the CLS tokens change
    np.testing.assert_allclose(np.asarray(a2[:, 1:]), np.asarray(a[:, 1:]))
    assert not np.allclose(np.asarray(a2[:, 0]), np.asarray(a[:, 0]))


def test_aagcn_transformer_cross_fusion():
    adj = build_adjacency("ntu_rgb_d")
    m = AAGCNTransformer(num_class=7, adj=adj, mode="dual",
                         model_layers=101, num_layers=1, num_heads=4,
                         dim_feedforward=64, cross_fusion=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 32, 25, 2)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = m.apply(v, x, train=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 7)
