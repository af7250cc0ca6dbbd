"""AGCN model tests: shapes, jit, and activation parity vs the PyTorch
reference (reference model/architecture/aagcn/agcn.py) via weight
transplant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.utils.torch_import import agcn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def small_inputs(n=2, c=3, t=16, v=25, m=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, c, t, v, m)).astype(np.float32)


def test_forward_shape_and_jit():
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=60, adj=adj)
    x = jnp.asarray(small_inputs())
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    logits = fwd(variables, x)
    assert logits.shape == (2, 60)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_scan_blocks_sow_all_adjacencies():
    """scan_blocks=True must still expose all 10 per-block combined
    adjacencies for the live demo: sown intermediates inside nn.scan are
    only collected when 'intermediates' is in variable_axes (stacked
    along a leading scan axis), otherwise they vanish silently."""
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=10, adj=adj, scan_blocks=True)
    x = jnp.asarray(small_inputs(t=8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, inter = model.apply(variables, x, train=False,
                           mutable=["intermediates"])
    n_blocks = 0
    for leaf in jax.tree_util.tree_leaves(inter["intermediates"]):
        g = np.asarray(leaf)
        if g.ndim == 5:       # scanned group: (n, B, K, V, V)
            n_blocks += g.shape[0]
            assert g.shape[2:] == (3, 25, 25)
        else:                 # unrolled block: (B, K, V, V)
            assert g.shape[1:] == (3, 25, 25)
            n_blocks += 1
    assert n_blocks == 10


def test_train_mode_updates_batch_stats():
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=10, adj=adj)
    x = jnp.asarray(small_inputs(t=8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 10)
    before = variables["batch_stats"]["data_bn"]["mean"]
    after = mutated["batch_stats"]["data_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("train", [False, True])
def test_parity_vs_torch_reference(train):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.agcn import Model as TorchAGCN

    torch.manual_seed(0)
    ref = TorchAGCN(num_class=60, num_point=25, num_person=2,
                    graph="graph.ntu_rgb_d.Graph",
                    graph_args={"labeling_mode": "spatial"})
    ref = ref.train(train)
    x_np = small_inputs(n=2, t=16)
    with torch.no_grad():
        # monkeypatch: tensor.cuda(idx) -> identity for CPU parity run
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        finally:
            torch.Tensor.cuda = orig_cuda

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=60, adj=adj)
    variables = agcn_variables_from_torch(ref.state_dict())
    if train:
        ours, _ = model.apply(variables, jnp.asarray(x_np), train=True,
                              mutable=["batch_stats"])
    else:
        ours = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out,
                               atol=2e-4, rtol=2e-4)
