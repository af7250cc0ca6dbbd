"""Loss parity tests vs reference utils/loss.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.train import losses

from .conftest import add_reference_to_path, reference_available


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_cross_entropy_matches_manual():
    logits = jnp.asarray(_rand((5, 7)))
    labels = jnp.asarray([0, 1, 2, 3, 4])
    ce = losses.cross_entropy(logits, labels)
    # smoothing=0 label smoothing reduces to CE
    ls = losses.label_smoothing_loss(logits, labels, smoothing=0.0)
    np.testing.assert_allclose(ce, ls, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_label_smoothing_parity():
    add_reference_to_path()
    import torch
    from utils.loss import LabelSmoothingLoss

    logits = _rand((8, 60))
    labels = np.array([3, 5, 1, 0, 59, 30, 2, 2])
    ref = LabelSmoothingLoss(60, smoothing=0.1)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    ours = losses.label_smoothing_loss(jnp.asarray(logits),
                                       jnp.asarray(labels), 0.1)
    np.testing.assert_allclose(float(ours), ref, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_focal_parity():
    add_reference_to_path()
    import torch
    from utils.loss import CategorialFocalLoss

    logits = _rand((6, 10))
    labels = np.array([0, 1, 2, 3, 4, 5])
    alpha = np.linspace(0.5, 1.5, 10).astype(np.float32)
    ref = CategorialFocalLoss(10, smoothing=0.1,
                              alpha=torch.from_numpy(alpha), gamma=0.7)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    ours = losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                             smoothing=0.1, alpha=jnp.asarray(alpha),
                             gamma=0.7)
    np.testing.assert_allclose(float(ours), ref, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_mmd_parity():
    add_reference_to_path()
    import torch
    from utils.loss import MaximumMeanDiscrepancyLoss

    z = _rand((12, 16))
    prior = _rand((5, 16), seed=1)
    labels = np.array([0, 1, 1, 2, 2, 2, 0, 0, 1, 2, 0, 1])  # classes 3,4 absent
    ref_mmd, ref_l2, _ = MaximumMeanDiscrepancyLoss(5)(
        torch.from_numpy(z), torch.from_numpy(prior),
        torch.from_numpy(labels))
    mmd, l2 = losses.mmd_loss(jnp.asarray(z), jnp.asarray(prior),
                              jnp.asarray(labels), 5)
    np.testing.assert_allclose(float(mmd), ref_mmd.item(), atol=1e-5)
    np.testing.assert_allclose(float(l2), ref_l2.item(), atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("mode", [1, 2])
def test_cosine_parity(mode):
    add_reference_to_path()
    import torch
    from utils.loss import CosineLoss

    x1, x2 = _rand((4, 8, 3)), _rand((4, 8, 3), seed=2)
    ref = CosineLoss(mode=mode)(torch.from_numpy(x1),
                                torch.from_numpy(x2)).item()
    ours = losses.cosine_loss(jnp.asarray(x1), jnp.asarray(x2), mode=mode)
    np.testing.assert_allclose(float(ours), ref, atol=1e-6)
