"""BatchNorm / GhostBN parity tests vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.ops.norm import BatchNorm, LayerNorm

from .conftest import add_reference_to_path, reference_available


def _x(shape=(8, 6, 4), seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_batchnorm_train_and_running_stats_match_torch():
    import torch

    x = _x((8, 5, 3))  # (N, L, C) ours; torch BN1d wants (N, C, L)
    torch_bn = torch.nn.BatchNorm1d(3)
    torch_bn.train()
    with torch.no_grad():
        ref = torch_bn(torch.from_numpy(x).permute(0, 2, 1)) \
            .permute(0, 2, 1).numpy()

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    # torch folds UNBIASED variance into running stats
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        torch_bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        torch_bn.running_var.numpy(), atol=1e-5)

    # eval mode with the updated stats
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    torch_bn.eval()
    with torch.no_grad():
        ref_eval = torch_bn(torch.from_numpy(x).permute(0, 2, 1)) \
            .permute(0, 2, 1).numpy()
    ours_eval = bn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_ghost_batchnorm_matches_reference():
    add_reference_to_path()
    import torch
    from model.layers.module.ghostbatchnorm import GhostBatchNorm2d

    splits = 4
    x = _x((8, 6, 5, 3))  # ours (N, T, V, C); torch (N, C, T, V)
    ref_bn = GhostBatchNorm2d(3, splits).train()
    with torch.no_grad():
        ref = ref_bn(torch.from_numpy(x).permute(0, 3, 1, 2)
                     .contiguous()).permute(0, 2, 3, 1).numpy()

    bn = BatchNorm(splits=splits)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours, _ = bn.apply(variables, jnp.asarray(x), train=True,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_layernorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = _x((4, 7, 6))
    ln_t = torch.nn.LayerNorm(6)
    with torch.no_grad():
        ref = ln_t(torch.from_numpy(x)).numpy()
    ln = LayerNorm()
    variables = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = ln.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
