"""Checkpoint export to the reference torch format (utils/torch_export):
the reference model must load our exported state_dict with strict=True
and produce OUR logits — checkpoints trained here are then verifiable
inside the original torch harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models.agcn import AGCN
from agcn_tpu.utils.torch_export import agcn_state_dict_from_variables
from agcn_tpu.utils.torch_import import agcn_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def _trained_variables():
    """Init + a few noisy stat updates so BN stats are non-trivial."""
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=7, adj=adj)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = model.apply(variables, x, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    return model, {"params": variables["params"],
                   "batch_stats": updates["batch_stats"]}, x


def test_roundtrip_through_torch_names():
    """import(export(v)) must reproduce every leaf exactly."""
    _, variables, _ = _trained_variables()
    sd = agcn_state_dict_from_variables(variables)
    back = agcn_variables_from_torch(sd)
    for section in ("params", "batch_stats"):
        want = jax.tree_util.tree_leaves_with_path(variables[section])
        got_tree = back[section]
        n = 0
        for path, leaf in want:
            node = got_tree
            for p in path:
                node = node[getattr(p, "key", str(p))]
            np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                          node)
            n += 1
        assert n > 0


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_model_loads_export_strict_and_matches():
    import torch

    add_reference_to_path()
    from model.architecture.aagcn.agcn import Model as TorchAGCN

    torch.Tensor.cuda = lambda self, *a, **k: self
    model, variables, x = _trained_variables()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in agcn_state_dict_from_variables(variables).items()}
    ref = TorchAGCN(num_class=7, num_point=25, num_person=2,
                    graph="graph.ntu_rgb_d.Graph",
                    graph_args={"labeling_mode": "spatial"})
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(np.asarray(x))).numpy()
    ours = model.apply(variables, x, train=False)
    if isinstance(ours, tuple):
        ours = ours[0]
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_aagcn_export_strict_load_and_matches():
    import torch

    add_reference_to_path()
    from model.architecture.aagcn.aagcn import Model as TorchAAGCN

    from agcn_tpu.models.aagcn import AAGCN
    from agcn_tpu.utils.torch_export import aagcn_state_dict_from_variables

    torch.Tensor.cuda = lambda self, *a, **k: self
    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=6, adj=adj)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in aagcn_state_dict_from_variables(variables).items()}
    ref = TorchAAGCN(num_class=6, num_point=25, num_person=2,
                     graph="graph.ntu_rgb_d.Graph",
                     graph_args={"labeling_mode": "spatial"})
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        out = ref(torch.from_numpy(np.asarray(x)))
    ref_logits = (out[0] if isinstance(out, tuple) else out).numpy()
    ours = model.apply(variables, x, train=False)
    if isinstance(ours, tuple):
        ours = ours[0]
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sgn_original_export_strict_load_and_matches(monkeypatch):
    import torch

    add_reference_to_path()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from model.architecture.sgn.archiv.sgn import SGN as TorchSGN

    from agcn_tpu.models.sgn_original import SGNOriginal
    from agcn_tpu.utils.torch_export import \
        sgn_original_state_dict_from_variables

    model = SGNOriginal(num_class=9)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 20, 75)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          sgn_original_state_dict_from_variables(variables).items()}
    ref = TorchSGN(num_class=9)
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(np.asarray(x)))[0].numpy()
    ours, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=2e-4, rtol=2e-4)
