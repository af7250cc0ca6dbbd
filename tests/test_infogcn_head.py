"""SGN v12 InfoGCN latent head: reparameterized z, orthogonal z_prior,
classifier-consumes-z wiring, MMD value parity, fsim pairing parity.

Reference: model/architecture/sgn/sgn_v12.py:620-630,791-798,812-824,
utils/loss.py:90-106, utils/processor.py:563-599.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.models.sgn import SGN, infogcn_latent_sample
from agcn_tpu.train import losses

from .conftest import add_reference_to_path, reference_available

SMALL = dict(num_class=5, num_point=25, num_segment=20, in_channels=3,
             c_multiplier=(0.25, 0.25, 0.25, 0.25),
             multi_t=((), (), (3,)))


def _inputs(b=4, t=20, v=25, c=3, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (b, t, v * c)).astype(np.float32)


def test_latent_sample_matches_torch_formula():
    """std = clamp(exp(noise_ratio*logvar), max=100); z = eps*std + mu
    (sgn_v12.py:814-824)."""
    import torch

    rng = np.random.default_rng(0)
    mu = rng.standard_normal((6, 32)).astype(np.float32)
    # large logvars exercise the clamp
    logvar = (rng.standard_normal((6, 32)) * 40).astype(np.float32)
    eps = rng.standard_normal((6, 32)).astype(np.float32)
    nr = 0.13
    t_std = torch.clamp(torch.from_numpy(logvar).mul(nr).exp(), max=100)
    t_z = torch.from_numpy(eps).mul(t_std) + torch.from_numpy(mu)
    ours = infogcn_latent_sample(jnp.asarray(mu), jnp.asarray(logvar),
                                 jnp.asarray(eps), nr)
    np.testing.assert_allclose(np.asarray(ours), t_z.numpy(),
                               rtol=1e-6, atol=1e-5)


def test_eval_z_is_fc_mu_of_pooled_feature():
    """At eval, z == fc_mu(pooled) (sgn_v12.py:791-798,823-824): verified
    by transplanting our fc_mu into a torch Linear applied to the pooled
    feature of the SAME model without the head."""
    import torch

    x = jnp.asarray(_inputs())
    base = SGN(**SMALL)
    head = SGN(**SMALL, infogcn_noise_ratio=0.1, infogcn_gain=3.0)
    hv = head.init(jax.random.PRNGKey(0), x, train=False)
    # base model shares every non-head param name
    bv = {"params": {k: v for k, v in hv["params"].items()
                     if k not in ("fc_mu", "fc_logvar")},
          "batch_stats": {k: v for k, v in hv["batch_stats"].items()
                          if k != "z_prior"}}
    _, base_aux = base.apply(bv, x, train=False)
    pooled = np.asarray(base_aux["z"])

    lin = torch.nn.Linear(pooled.shape[1], pooled.shape[1])
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(
            np.asarray(hv["params"]["fc_mu"]["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(
            np.asarray(hv["params"]["fc_mu"]["bias"])))
        want = lin(torch.from_numpy(pooled)).numpy()

    logits, aux = head.apply(hv, x, train=False)
    np.testing.assert_allclose(np.asarray(aux["z"]), want,
                               rtol=1e-4, atol=1e-4)
    # the classifier consumes z, not the pooled feature: logits ==
    # fc(z) (sgn_v12.py:796-798)
    fc_k = np.asarray(hv["params"]["fc"]["kernel"])
    fc_b = np.asarray(hv["params"]["fc"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), want @ fc_k + fc_b,
                               rtol=1e-4, atol=1e-4)


def test_z_prior_orthogonal_and_fixed():
    x = jnp.asarray(_inputs())
    model = SGN(**SMALL, infogcn_noise_ratio=0.1, infogcn_gain=2.0)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    prior = np.asarray(v["batch_stats"]["z_prior"])
    assert prior.shape[0] == SMALL["num_class"]
    # rows orthogonal with norm == gain (nn.init.orthogonal_ w/ gain,
    # sgn_v12.py:812)
    gram = prior @ prior.T
    np.testing.assert_allclose(gram, 4.0 * np.eye(prior.shape[0]),
                               atol=1e-4)
    # never mutated by a train step
    out, mutated = model.apply(v, x, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(
        np.asarray(mutated["batch_stats"]["z_prior"]), prior)
    # exposed to the trainer via aux
    _, aux = out
    np.testing.assert_array_equal(np.asarray(aux["z_prior"]), prior)


def test_train_z_sampled_eval_z_deterministic():
    x = jnp.asarray(_inputs())
    model = SGN(**SMALL, infogcn_noise_ratio=0.1, infogcn_gain=1.0)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    (_, aux1), _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    (_, aux2), _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(aux1["z"]), np.asarray(aux2["z"]))
    _, auxe1 = model.apply(v, x, train=False)
    _, auxe2 = model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(auxe1["z"]),
                                  np.asarray(auxe2["z"]))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_mmd_value_parity_on_model_outputs():
    """MMD loss value on the model's own z/prior matches reference
    utils/loss.py:90-106 on the same inputs."""
    add_reference_to_path()
    import torch
    from utils.loss import MaximumMeanDiscrepancyLoss

    x = jnp.asarray(_inputs())
    model = SGN(**SMALL, infogcn_noise_ratio=0.1, infogcn_gain=1.0)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    _, aux = model.apply(v, x, train=False)
    z = np.asarray(aux["z"], np.float32)
    prior = np.asarray(aux["z_prior"], np.float32)
    y = np.array([0, 2, 2, 4])

    ref = MaximumMeanDiscrepancyLoss(SMALL["num_class"])
    r_mmd, r_l2, _ = ref(torch.from_numpy(z), torch.from_numpy(prior),
                         torch.from_numpy(y))
    mmd, l2 = losses.mmd_loss(jnp.asarray(z), jnp.asarray(prior),
                              jnp.asarray(y), SMALL["num_class"])
    np.testing.assert_allclose(float(mmd), r_mmd.item(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(l2), r_l2.item(), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_fsim_pairing_parity():
    """fsim_pair_loss reproduces the reference pairing loop
    (processor.py:583-599) with torch CosineLoss values."""
    add_reference_to_path()
    import torch
    from utils.loss import CosineLoss

    rng = np.random.default_rng(3)
    kernels, levels_total = 3, 3   # 3 levels x 3 kernels = 9 branches
    outs = [rng.standard_normal((4, 16, 10)).astype(np.float32)
            for _ in range(kernels * levels_total)]
    alphas = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]

    for mode in (1, 2):
        ref_loss = CosineLoss(mode)
        want = 0.0
        levels = len(outs) // kernels - 1
        for i in range(levels):
            for j in range(kernels):
                want += alphas[i * kernels + j] * ref_loss(
                    torch.from_numpy(outs[i * kernels + j]),
                    torch.from_numpy(outs[-kernels + j])).item()
        ours = losses.fsim_pair_loss(
            [jnp.asarray(o) for o in outs], alphas, kernels, mode=mode)
        np.testing.assert_allclose(float(ours), want, rtol=1e-5,
                                   atol=1e-6)


def test_sgn_branch_outputs_are_channel_time():
    """aux['branch_outputs'] entries are (B, C, T') so CosineLoss dim=1
    = channels, matching x_tem_list (sgn_v14.py:1051)."""
    x = jnp.asarray(_inputs())
    model = SGN(**{**SMALL, "multi_t": ((), (), (3, 5))})
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    _, aux = model.apply(v, x, train=False)
    outs = aux["branch_outputs"]
    assert len(outs) == 2
    c4 = int(512 * 0.25)
    for o in outs:
        assert o.shape[0] == 4 and o.shape[1] == c4
