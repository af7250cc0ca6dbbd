"""Original microsoft/SGN (models/sgn_original.py): shapes + exact
weight-transplant parity vs reference archiv/sgn.py — the one archived
model still referenced by shipped recipes (openpose train_joint_sgn.yaml
uses `model: model.sgn.SGN`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.models.registry import build_model
from agcn_tpu.models.sgn_original import SGNOriginal
from agcn_tpu.utils.torch_import import sgn_original_variables_from_torch

from .conftest import add_reference_to_path, reference_available


def seg_inputs(n=3, t=20, v=25, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, t, v * c)).astype(np.float32)


@pytest.mark.parametrize("v", [25, 15])
def test_forward_shapes(v):
    model = SGNOriginal(num_class=11, num_point=v)
    x = jnp.asarray(seg_inputs(v=v))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, g = model.apply(variables, x, train=False)
    assert logits.shape == (3, 11)
    assert g.shape == (3, 20, v, v)  # the reference returns G as attn
    assert np.all(np.isfinite(np.asarray(logits)))


def test_registry_resolves_reference_dotted_path():
    m = build_model("model.sgn.SGN", dict(num_class=60, num_point=15,
                                          in_channels=3, seg=20, bias=True))
    assert isinstance(m, SGNOriginal)
    assert m.num_point == 15 and m.use_bias is True


def test_train_mode_runs():
    model = SGNOriginal(num_class=5)
    x = jnp.asarray(seg_inputs())
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (logits, _), _ = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(logits)))


def _torch_original(monkeypatch, **kwargs):
    add_reference_to_path()
    import torch

    # the archived constructor hardcodes .cuda() on the one-hot tables
    # (archiv/sgn.py:40-43); neutralize it for CPU parity runs
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from model.architecture.sgn.archiv.sgn import SGN as TorchSGN

    return TorchSGN(**kwargs)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("v", [25, 15])
def test_transplant_parity(monkeypatch, v):
    import torch

    from agcn_tpu.train.checkpoint import merge_params

    ref = _torch_original(monkeypatch, num_class=60, num_point=v).eval()
    x_np = seg_inputs(v=v, seed=3)
    with torch.no_grad():
        ref_logits, ref_g = ref(torch.from_numpy(x_np))
    # torch G layout is (B, T, V, V) with softmax over the last axis
    ref_logits, ref_g = ref_logits.numpy(), ref_g.numpy()

    model = SGNOriginal(num_class=60, num_point=v)
    base = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)
    loaded = sgn_original_variables_from_torch(ref.state_dict())
    variables = {
        "params": merge_params(base["params"], loaded["params"]),
        "batch_stats": merge_params(base.get("batch_stats", {}),
                                    loaded.get("batch_stats", {})),
    }
    ours, g = model.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(g), ref_g, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_transplant_covers_all_reference_params(monkeypatch):
    """Every reference parameter/buffer must land somewhere in our tree —
    catches silently-dropped keys in the import mapping."""
    ref = _torch_original(monkeypatch, num_class=60, num_point=25)
    n_ref = sum(1 for k in ref.state_dict()
                if "num_batches_tracked" not in k)
    loaded = sgn_original_variables_from_torch(ref.state_dict())
    n_ours = len(jax.tree_util.tree_leaves(loaded))
    assert n_ours == n_ref


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_t_not_equal_seg(monkeypatch):
    """T != seg is broken-as-shipped upstream: the one-hot tables are
    seg-sized at construction, so the reference crashes at the
    spa-concat (archiv/sgn.py:83) before its AdaptiveMaxPool2d((1, seg))
    could ever see T != seg. Ours generalizes gracefully — per-input
    tables plus the torch-documented adaptive T->seg maxpool windows."""
    import torch

    ref = _torch_original(monkeypatch, num_class=10, seg=20).eval()
    x_np = seg_inputs(t=30, seed=5)
    with pytest.raises(RuntimeError, match="Sizes of tensors"):
        with torch.no_grad():
            ref(torch.from_numpy(x_np))

    model = SGNOriginal(num_class=10, seg=20)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                           train=False)
    ours, g = model.apply(variables, jnp.asarray(x_np), train=False)
    assert ours.shape == (3, 10) and g.shape == (3, 30, 25, 25)
    assert np.all(np.isfinite(np.asarray(ours)))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_adam_training_trajectory(monkeypatch):
    """20-step Adam trajectory vs the torch reference (dropout zeroed on
    both sides — the hardcoded Dropout2d masks can't be matched): losses
    track and final parameter norms agree, certifying the zero-init W
    branch and BN-momentum dynamics, not just eval-mode parity."""
    import torch

    from agcn_tpu.train import losses as L
    from agcn_tpu.train import optim as O
    from agcn_tpu.train.steps import TrainState, make_train_step
    from .test_training_parity import (N_STEPS, _batches, _param_norm_jax,
                                       _param_norm_torch)

    ref = _torch_original(monkeypatch, num_class=11).train()
    ref.cnn.dropout.p = 0.0
    variables = sgn_original_variables_from_torch(ref.state_dict())

    batches = _batches((4, 20, 75), seed=2)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=1e-4)
    lossf = torch.nn.CrossEntropyLoss()
    torch_losses = []
    for x, y in batches:
        opt.zero_grad()
        loss = lossf(ref(torch.from_numpy(x))[0], torch.from_numpy(y))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        torch_losses.append(float(loss))

    model = SGNOriginal(num_class=11, dropout=0.0)
    tx = O.adam(lambda _: 1e-3, weight_decay=1e-4, grad_clip=1.0)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = jax.jit(make_train_step(L.cross_entropy))
    key = jax.random.PRNGKey(0)
    our_losses = []
    for x, y in batches:
        state, m = step(state, jnp.asarray(x), jnp.asarray(y), key)
        our_losses.append(float(m["loss"]))

    assert len(our_losses) == N_STEPS
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.25,
                               atol=0.08)
    np.testing.assert_allclose(_param_norm_jax(state.params),
                               _param_norm_torch(ref), rtol=1e-3)
