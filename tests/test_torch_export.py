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


# ---------------------------------------------------------------------------
# SGN (v11-v14 space) + SGN v15 export (VERDICT r4 next #3): round-trip
# export(import(sd)) == sd for every transplant-parity config, plus
# strict-load logits parity starting from OUR random init.

SGN_EXPORT_OVERRIDES = [
    dict(),                     # shipped train_sgn_v14.yaml (gt_mode 1)
    dict(sgcn_gt_mode=0),
    dict(multi_t=[[], [], [3, 5, 7]]),
    dict(sgcn_g_proj_dim=[256, 256, 256]),
    dict(multi_t=[[3], [3], [3]], multi_t_shared=2),
    dict(sgcn_gt_mode=2),
    dict(sgcn_gt_mode=3),
    dict(sgcn_gt_mode=4, sgcn_gt_act=2),
    dict(sgcn_gt_mode=5),
    dict(sgcn_gt_mode=5, sgcn_gt_g3_idx=3),
    dict(sgcn_gt_mode=6, multi_t=[[], [], [3], [3]]),
    dict(sgcn_g_res_alpha=-1, sgcn_gt_mode=4, sgcn_gt_act=2,
         multi_t=[[], [], [3, 5, 7]]),
    dict(sgcn_kernel=3, sgcn_padding=1, sgcn_g_kernel=3),
    dict(sgcn_v_kernel=3),
    dict(sgcn_prenorm=True),
    dict(sgcn_ffn=104.0),       # post-norm conv FFN
    dict(sgcn_ffn=204.0),       # "Linear" FFN == 1x1 conv pre-norm
    dict(sgcn_ffn=304.0),       # "Linear" FFN post-norm
]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("overrides", SGN_EXPORT_OVERRIDES)
def test_sgn_export_roundtrip(overrides):
    """export(import(reference sd)) reproduces the reference state_dict
    key-for-key, value-exact (the mapping is a pure layout permutation)."""
    from agcn_tpu.utils.torch_export import sgn_state_dict_from_variables
    from agcn_tpu.utils.torch_import import (sgn_variables_from_torch,
                                             state_dict_to_numpy)

    from .test_sgn import _torch_sgn

    ref = _torch_sgn(**overrides)
    sd = state_dict_to_numpy(ref.state_dict())
    variables = sgn_variables_from_torch(sd)
    linear_ffn = overrides.get("sgcn_ffn", 0) >= 200
    back = sgn_state_dict_from_variables(variables, linear_ffn=linear_ffn)
    assert set(back) == set(sd), (
        f"missing={sorted(set(sd) - set(back))[:8]} "
        f"extra={sorted(set(back) - set(sd))[:8]}")
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            back[k], np.asarray(sd[k], np.float32), err_msg=k)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("overrides", [
    dict(),
    dict(sgcn_g_res_alpha=-1, sgcn_gt_mode=4, sgcn_gt_act=2,
         multi_t=[[], [], [3, 5, 7]]),   # ledger-best v13_gt4 recipe shape
])
def test_sgn_export_strict_load_and_matches(overrides):
    """Reference sgn_v14 strict-loads OUR randomly-initialized checkpoint
    and reproduces our logits."""
    import torch

    from .test_sgn import V14_KWARGS, _ours_from, seg_inputs

    from agcn_tpu.utils.torch_export import sgn_state_dict_from_variables

    add_reference_to_path()
    from model.architecture.sgn.sgn_v14 import SGN as TorchSGN

    kwargs = {**V14_KWARGS, **overrides}
    model = _ours_from(kwargs)
    x_np = seg_inputs(seed=11)
    x = jnp.asarray(x_np)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(4)})
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          sgn_state_dict_from_variables(variables).items()}
    torch.manual_seed(0)
    ref = TorchSGN(**kwargs)
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()
    ours, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("which", ["shipped", "qkv_dout"])
def test_sgn_transformer_export_roundtrip_and_strict_load(which):
    """v15: round-trip through the reference key space AND reference
    strict-load logits parity from OUR init (shipped recipe + the
    qkv/d_out mode from the reference __main__)."""
    import torch

    from agcn_tpu.models.registry import build_model
    from agcn_tpu.utils.torch_export import (
        sgn_transformer_state_dict_from_variables)
    from agcn_tpu.utils.torch_import import (
        sgn_transformer_variables_from_torch, state_dict_to_numpy)

    from .test_transformer_models import V15_QKV, V15_SHIPPED

    add_reference_to_path()
    from model.architecture.sgn.sgn_v15 import SGN as TorchSGNv15

    kwargs = V15_SHIPPED if which == "shipped" else V15_QKV
    torch.manual_seed(0)
    ref = TorchSGNv15(**kwargs).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    back = sgn_transformer_state_dict_from_variables(
        sgn_transformer_variables_from_torch(sd))
    assert set(back) == set(sd), (
        f"missing={sorted(set(sd) - set(back))[:8]} "
        f"extra={sorted(set(back) - set(sd))[:8]}")
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            back[k], np.asarray(sd[k], np.float32), err_msg=k)

    # strict-load logits parity from OUR random init
    model = build_model("sgn_transformer", kwargs)
    x_np = np.random.default_rng(7).standard_normal(
        (4, 20, 75)).astype(np.float32)
    x = jnp.asarray(x_np)
    variables = model.init(jax.random.PRNGKey(5), x, train=False)
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(6)})
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    sd2 = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
           sgn_transformer_state_dict_from_variables(variables).items()}
    missing, unexpected = ref.load_state_dict(sd2, strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()
    ours, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sgn_export_roundtrip_kinetics_geometry():
    """num_point=18 (Kinetics-18 geometry) with a GT mode that exercises
    the (c, v) kernel reorder: both the import's cv_to_vc and the
    export's inverse must derive V from the checkpoint, not assume 25
    (regression: hardcoded num_point corrupted V!=25 g3 kernels)."""
    from agcn_tpu.utils.torch_export import sgn_state_dict_from_variables
    from agcn_tpu.utils.torch_import import (sgn_variables_from_torch,
                                             state_dict_to_numpy)

    from .test_sgn import _torch_sgn

    import torch

    from .test_sgn import V14_KWARGS, _ours_from

    ref = _torch_sgn(num_point=18, sgcn_gt_mode=3)
    sd = state_dict_to_numpy(ref.state_dict())
    variables = sgn_variables_from_torch(sd)
    back = sgn_state_dict_from_variables(variables)
    assert set(back) == set(sd), (
        f"missing={sorted(set(sd) - set(back))[:8]} "
        f"extra={sorted(set(back) - set(sd))[:8]}")
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            back[k], np.asarray(sd[k], np.float32), err_msg=k)

    # the round trip alone can't catch a consistent-but-wrong reorder
    # pair — logits parity through the transplant pins the convention
    kwargs = {**V14_KWARGS, "num_point": 18, "sgcn_gt_mode": 3}
    ref.eval()
    x_np = np.random.default_rng(0).standard_normal(
        (4, 20, 54)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np))[0].numpy()
    ours, _ = _ours_from(kwargs).apply(variables, jnp.asarray(x_np),
                                       train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=3e-4, rtol=3e-4)
