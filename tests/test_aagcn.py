"""AAGCN tests: shapes across config space + parity vs reference aagcn.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models.aagcn import AAGCN
from agcn_tpu.utils.torch_import import aagcn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def small_inputs(n=2, c=3, t=16, v=25, m=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, c, t, v, m)).astype(np.float32)


@pytest.mark.parametrize("model_layers", [3, 10, 101, 103])
@pytest.mark.parametrize("adaptive,attention", [(True, True), (False, False)])
def test_forward_configs(model_layers, adaptive, attention):
    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=11, adj=adj, model_layers=model_layers,
                  adaptive=adaptive, attention=attention)
    x = jnp.asarray(small_inputs(t=8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = model.apply(variables, x, train=False)
    assert logits.shape == (2, 11)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_fc_cv_and_ln_norm():
    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=5, adj=adj, model_layers=3, fc_cv=True,
                  data_norm="ln")
    x = jnp.asarray(small_inputs(t=8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)


def _torch_ref_model(adaptive=True, attention=True, model_layers=10,
                     fc_cv=False):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn import Model as TorchAAGCN

    torch.manual_seed(0)
    return TorchAAGCN(num_class=60, graph="graph.ntu_rgb_d.Graph",
                      graph_args={"labeling_mode": "spatial"},
                      adaptive=adaptive, attention=attention,
                      model_layers=model_layers, fc_cv=fc_cv)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("adaptive,attention,model_layers,fc_cv",
                         [(True, True, 10, False), (True, False, 3, False),
                          (False, True, 3, False), (True, True, 6, False),
                          (True, True, 7, True)])
def test_parity_vs_torch_reference(adaptive, attention, model_layers,
                                   fc_cv):
    import torch

    ref = _torch_ref_model(adaptive, attention, model_layers,
                           fc_cv).eval()
    x_np = small_inputs(n=2, t=16)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x_np))
    ref_out = ref_out.numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=60, adj=adj, adaptive=adaptive,
                  attention=attention, model_layers=model_layers,
                  fc_cv=fc_cv)
    variables = aagcn_variables_from_torch(ref.state_dict(),
                                           adaptive=adaptive)
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_train_mode():
    import torch

    ref = _torch_ref_model(True, True, 3).train()
    x_np = small_inputs(n=4, t=16)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x_np))
    ref_out = ref_out.numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=60, adj=adj, model_layers=3)
    variables = aagcn_variables_from_torch(ref.state_dict())
    ours, _ = model.apply(variables, jnp.asarray(x_np), train=True,
                          mutable=["batch_stats"])
    ours = ours[0] if isinstance(ours, tuple) else ours
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               atol=2e-4, rtol=2e-4)
