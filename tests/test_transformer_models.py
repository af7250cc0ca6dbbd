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


def test_sgn_transformer_mixed_encoders():
    """The reference branches PER ENCODER on 'norm' in the mha kwargs
    (sgn_v15.py:441-446): lucid spatial + torch-style temporal is a
    legal config and must build both backend kinds."""
    m = SGNTransformer(
        num_class=7,
        spatial_mha={"d_model": [128], "nhead": [1],
                     "dim_feedforward": [512], "dropout": 0.1,
                     "activation": "relu", "num_layers": 1,
                     "d_head": [512], "dim_feedforward_output": [256],
                     "norm": "bn", "global_norm": False},
        temporal_mha={"num_layers": 2, "nhead": 4})
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 20, 75)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, aux = m.apply(v, x, train=False)
    assert out.shape == (2, 7)
    names = set(v["params"]["spatial_mha"]) | set(
        v["params"]["temporal_mha"])
    # lucid spatial carries per-layer attn/ffn blocks (l1_attn, l1_ffn, ...);
    # generic temporal carries encoder-layer submodules (layer1, layer2, ...)
    assert any(n.endswith("_attn") or n.endswith("_ffn")
               for n in v["params"]["spatial_mha"]), names
    assert set(v["params"]["spatial_mha"]) != set(
        v["params"]["temporal_mha"]), names


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


# ---------------------------------------------------------------------------
# SGN v15 weight-transplant parity (VERDICT r3 next #3): the shipped
# train_sgn_v15.yaml mha kwargs and the qkv/d_out mode from the
# reference's own __main__ (sgn_v15.py:531-577).

V15_BASE = dict(
    num_class=60, num_point=25, num_segment=20, in_channels=3, bias=1,
    dropout=0.0, dropout2d=0.2, c_multiplier=[1.0, 1.0, 1.0, 1.0],
    norm_type="bn", act_type="relu", input_position=1, input_velocity=1,
    semantic_joint=1, semantic_frame=1, semantic_frame_location=0,
    spatial_maxpool=1, temporal_maxpool=1,
)

# reference config/nturgbd-cross-view/train_sgn_v15.yaml model_args
V15_SHIPPED = dict(
    V15_BASE, semantic_class=0, semantic_joint_fusion=0,
    semantic_frame_fusion=1,
    spatial_mha_kwargs={
        "d_model": [128], "nhead": [1], "dim_feedforward": [512],
        "dropout": 0.1, "activation": "relu", "num_layers": 1,
        "d_head": [512], "dim_feedforward_output": [256],
        "norm": "bn", "global_norm": False},
    temporal_mha_kwargs={
        "d_model": [256], "nhead": [1], "dim_feedforward": [1024],
        "dropout": 0.1, "activation": "relu", "num_layers": 1,
        "d_head": [1024], "dim_feedforward_output": [512],
        "norm": "bn", "global_norm": False},
)

# the qkv / d_out mode exercised by the reference __main__
# (sgn_v15.py:531-577): concat input fusion + explicit attention output
# dim (d_out) so the attention residual becomes a projection
V15_QKV = dict(
    V15_BASE, input_emb_fusion=0, semantic_joint_fusion=1,
    semantic_frame_fusion=1,
    spatial_mha_kwargs={
        "d_model": [128], "nhead": [1], "d_head": [256], "d_out": [256],
        "dim_feedforward": [256], "dim_feedforward_output": [256],
        "dropout": 0.1, "activation": "relu", "num_layers": 1,
        "norm": "bn", "global_norm": False},
    temporal_mha_kwargs={
        "d_model": [256], "nhead": [8], "d_head": [16],
        "dim_feedforward": [256], "dim_feedforward_output": [512],
        "dropout": 0.1, "activation": "relu", "num_layers": 1,
        "norm": "bn", "global_norm": False},
)


@pytest.mark.skipif(not __import__(
    "tests.conftest", fromlist=["reference_available"]
).reference_available(), reason="reference tree unavailable")
@pytest.mark.parametrize("kwargs", [V15_SHIPPED, V15_QKV],
                         ids=["shipped", "qkv_dout"])
def test_sgn_v15_transplant_parity(kwargs):
    """Reference sgn_v15 logits reproduce through transplanted weights
    (same rigor as the v14 suite, atol 1e-3)."""
    import torch

    from tests.conftest import add_reference_to_path
    from agcn_tpu.utils.torch_import import (
        sgn_transformer_variables_from_torch)

    add_reference_to_path()
    from model.architecture.sgn.sgn_v15 import SGN as TorchSGNv15

    torch.manual_seed(0)
    ref = TorchSGNv15(**kwargs).eval()
    # perturb BN running stats so the transplant proves stats transfer
    # (at init they are the trivial 0/1)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.add_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.mul_(
                    1 + torch.rand(m.running_var.shape, generator=g) * 0.2)

    x_np = np.random.default_rng(0).standard_normal(
        (4, 20, 75)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np))[0].numpy()

    ours = build_model("sgn_transformer", kwargs)
    variables = sgn_transformer_variables_from_torch(ref.state_dict())
    out, _ = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-3)
