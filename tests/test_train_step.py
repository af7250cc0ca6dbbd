"""Train-step tests: single-device convergence smoke + 8-device data
parallelism on the virtual CPU mesh (DDP-equivalence: sharded loss/grad
must match single-device)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.parallel import (jit_data_parallel, make_mesh, replicate_state,
                               shard_batch)
from agcn_tpu.train import TrainState, losses, make_train_step, optim


def _setup(num_class=5, n=8, t=8):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=num_class, adj=adj)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 3, t, 25, 2)).astype(np.float32)
    y = rng.integers(0, num_class, (n,))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    sched = optim.warmup_step_schedule(0.1, 1, [30, 40], warm_up_epoch=0)
    tx = optim.sgd_nesterov(sched)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    return state, jnp.asarray(x), jnp.asarray(y)


def test_train_step_reduces_loss():
    state, x, y = _setup()
    step = jax.jit(make_train_step(losses.cross_entropy))
    rng = jax.random.PRNGKey(0)
    _, m0 = step(state, x, y, rng)
    s = state
    for _ in range(8):
        s, m = step(s, x, y, rng)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(s.step) == 8


def test_sam_step_runs():
    state, x, y = _setup()
    step = jax.jit(make_train_step(losses.cross_entropy, sam_rho=0.05))
    s, m = step(state, x, y, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_data_parallel_matches_single_device():
    state, x, y = _setup(n=8)
    step_fn = make_train_step(losses.cross_entropy)
    rng = jax.random.PRNGKey(0)

    # single device
    s1, m1 = jax.jit(step_fn)(state, x, y, rng)

    # 8-way data parallel over the virtual CPU mesh
    mesh = make_mesh(data=8, edge=1)
    pstep = jit_data_parallel(step_fn, mesh, donate_state=False)
    state_r = replicate_state(mesh, state)
    xs, ys = shard_batch(mesh, np.asarray(x), np.asarray(y))
    s2, m2 = pstep(state_r, xs, ys, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # parameters after update must match (DDP-equivalence, the reference
    # checks the same property in aagcn.py:580-616)
    l1 = np.asarray(s1.params["fc"]["kernel"])
    l2 = np.asarray(s2.params["fc"]["kernel"])
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    # BN stats must be global (SyncBN semantics)
    b1 = np.asarray(s1.batch_stats["data_bn"]["mean"])
    b2 = np.asarray(s2.batch_stats["data_bn"]["mean"])
    np.testing.assert_allclose(b1, b2, atol=1e-5)


def test_warmup_step_schedule():
    sched = optim.warmup_step_schedule(0.1, 10, [30, 40], warm_up_epoch=5)
    assert np.isclose(float(sched(0)), 0.1 * 1 / 5)
    assert np.isclose(float(sched(49)), 0.1)  # epoch 4 -> warmup 5/5...
    assert np.isclose(float(sched(10 * 10)), 0.1)  # epoch 10
    assert np.isclose(float(sched(10 * 35)), 0.01)  # epoch 35
    assert np.isclose(float(sched(10 * 45)), 0.001)  # epoch 45
