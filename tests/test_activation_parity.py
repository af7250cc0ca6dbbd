"""Per-layer activation parity vs the PyTorch reference (BASELINE north
star: "per-layer activations allclose vs the PyTorch reference").

Transplants reference weights into AGCN, then compares EVERY STGCN
block's output (torch forward hooks vs flax capture_intermediates), not
just the final logits — a drift in any block is pinned to that block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.utils.torch_import import agcn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_agcn_per_block_activations_match():
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.agcn import Model as TorchAGCN

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    ref = TorchAGCN(num_class=7, num_point=25, num_person=2,
                    graph="graph.ntu_rgb_d.Graph",
                    graph_args={"labeling_mode": "spatial"}).eval()

    x_np = np.random.default_rng(0).standard_normal(
        (2, 3, 16, 25, 2)).astype(np.float32)

    # torch: hook every TCN_GCN_unit output (N*M, C, T, V)
    torch_acts = {}

    def hook(name):
        def fn(_m, _i, out):
            torch_acts[name] = out.detach().numpy()
        return fn

    for i in range(1, 11):
        getattr(ref, f"l{i}").register_forward_hook(hook(f"l{i}"))
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np)).numpy()

    # ours: capture every module's output; blocks are named l1..l10
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=7, adj=adj)
    variables = agcn_variables_from_torch(ref.state_dict())
    ours_logits, state = model.apply(
        variables, jnp.asarray(x_np), train=False,
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    for i in range(1, 11):
        got = np.asarray(inter[f"l{i}"]["__call__"][0])  # (N*M, T, V, C)
        want = np.transpose(torch_acts[f"l{i}"], (0, 2, 3, 1))
        np.testing.assert_allclose(
            got, want, atol=2e-4, rtol=2e-4,
            err_msg=f"block l{i} activations diverge")

    np.testing.assert_allclose(np.asarray(ours_logits), ref_logits,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_aagcn_per_block_activations_match():
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.aagcn import Model as TorchAAGCN

    from agcn_tpu.models import AAGCN
    from agcn_tpu.utils.torch_import import aagcn_variables_from_torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    ref = TorchAAGCN(num_class=7, num_point=25, num_person=2,
                     graph="graph.ntu_rgb_d.Graph",
                     graph_args={"labeling_mode": "spatial"},
                     model_layers=10).eval()

    x_np = np.random.default_rng(1).standard_normal(
        (2, 3, 16, 25, 2)).astype(np.float32)

    torch_acts = {}

    def hook(name):
        def fn(_m, _i, out):
            torch_acts[name] = out.detach().numpy()
        return fn

    for i in range(1, 11):
        getattr(ref, f"l{i}").register_forward_hook(hook(f"l{i}"))
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=7, adj=adj)
    variables = aagcn_variables_from_torch(ref.state_dict())
    out, state = model.apply(
        variables, jnp.asarray(x_np), train=False,
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    for i in range(1, 11):
        got = np.asarray(inter[f"l{i}"]["__call__"][0])
        want = np.transpose(torch_acts[f"l{i}"], (0, 2, 3, 1))
        # untrained AAGCN activations amplify ~4x per block (mean |act|
        # reaches ~1e4 by l10); absolute fp32 error grows with scale
        # while the SCALE-RELATIVE error stays ~1e-6 — assert on that
        err = np.abs(got - want)
        scale = max(float(np.abs(want).mean()), 1e-6)
        assert err.max() / scale < 5e-4, (
            f"block l{i}: max err {err.max():.3e} at act scale "
            f"{scale:.3e}")

    scale = max(float(np.abs(ref_logits).mean()), 1e-6)
    assert np.abs(np.asarray(out[0]) - ref_logits).max() / scale < 5e-4


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sgn_per_unit_activations_match():
    """SGN: every spatial GCN unit's output and the temporal branch
    output match the reference under weight transplant."""
    add_reference_to_path()
    import torch

    from agcn_tpu.utils.torch_import import sgn_variables_from_torch

    from .test_sgn import V14_KWARGS, _ours_from, _torch_sgn

    ref = _torch_sgn().eval()
    x_np = np.random.default_rng(2).standard_normal(
        (3, 20, 75)).astype(np.float32)

    torch_acts = {}

    def hook(name):
        def fn(_m, _i, out):
            o = out[0] if isinstance(out, tuple) else out
            torch_acts[name] = o.detach().numpy()
        return fn

    for i in (1, 2, 3):
        getattr(ref.sgcn, f"gcn{i}").register_forward_hook(hook(f"gcn{i}"))
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()

    model = _ours_from(V14_KWARGS)
    variables = sgn_variables_from_torch(ref.state_dict())
    (logits, _), state = model.apply(
        variables, jnp.asarray(x_np), train=False,
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    for i in (1, 2, 3):
        got = np.asarray(
            inter["sgcn"][f"gcn{i}"]["__call__"][0])  # (B, T, V, C)
        want = np.transpose(torch_acts[f"gcn{i}"], (0, 3, 2, 1))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4,
                                   err_msg=f"sgcn unit {i} diverges")
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-4, rtol=3e-4)
