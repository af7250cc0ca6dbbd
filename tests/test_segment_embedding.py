"""SGN body-part segment embedding parity vs the reference FeatureExtractor
(blocks/feature_extractor.py:11-33, engaged via input modes > 1000)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.models.sgn import SGN, SegmentEmbedding
from agcn_tpu.utils.torch_import import sgn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def test_segment_embedding_shapes():
    model = SegmentEmbedding(out_channels=16, mode=1001)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 25, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 5, 8, 16)  # 8 part nodes, T//4 windows


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_segment_embedding_parity_vs_torch():
    add_reference_to_path()
    import torch
    from torch import nn as tnn
    from model.architecture.sgn.blocks.feature_extractor import (
        FeatureExtractor)

    torch.manual_seed(0)
    c1, cin = 32, 3
    kwargs = dict(in_channels=cin, out_channels=c1, bias=1,
                  dropout=tnn.Dropout2d, activation=tnn.ReLU,
                  normalization=tnn.BatchNorm2d, in_norm=tnn.BatchNorm1d,
                  num_point=25, mode=1001)
    ref = FeatureExtractor(in_pos=1001, in_vel=1001,
                           in_pos_emb_kwargs=dict(kwargs),
                           in_vel_emb_kwargs=dict(kwargs)).eval()

    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((2, 3, 25, 20)).astype(np.float32)  # n,c,v,t
    with torch.no_grad():
        fused, pos_ref, vel_ref = ref(torch.from_numpy(x_np))
    # reference output layout: (n, c', v'=8, t'=5)

    sd = {f"feature_extractor.{k}": v for k, v in ref.state_dict().items()}
    variables = sgn_variables_from_torch(sd)
    model = SegmentEmbedding(out_channels=c1, mode=1001)
    # ours takes (b, t, v, c)
    x_ours = jnp.asarray(np.transpose(x_np, (0, 3, 2, 1)))
    params = {"params": variables["params"]["pos_embed"],
              "batch_stats": variables["batch_stats"]["pos_embed"]}
    ours = model.apply(params, x_ours, train=False)
    ref_np = np.transpose(pos_ref.numpy(), (0, 3, 2, 1))  # n,t',v',c'
    np.testing.assert_allclose(np.asarray(ours), ref_np, atol=2e-5,
                               rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sgn_model_with_segment_embedding_runs():
    """Full SGN forward with part-segment input modes compiles and runs
    (downstream sequence becomes 8 nodes x T//4 frames)."""
    model = SGN(num_class=7, input_position=1001, input_velocity=1001,
                semantic_joint=1, semantic_frame=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 75)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(variables, x, train=False)
    assert logits.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(logits)))
