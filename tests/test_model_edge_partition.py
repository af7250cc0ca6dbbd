"""In-model edge-partitioned aggregation: equivalence with the dense path
on the virtual 8-device mesh, forward AND gradients, plus the full AGCN
train step with edge_mesh set (the north-star configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.ops import gcn as gcn_ops
from agcn_tpu.parallel import make_mesh
from agcn_tpu.parallel.edge_partition import model_edge_gcn

B, T, V, C, CO, K = 2, 8, 25, 6, 10, 3


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, V, C)), jnp.float32)
    a1 = jnp.asarray(rng.standard_normal((B, K, V, V)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, CO)), jnp.float32)
    return x, a1, w


@pytest.mark.parametrize("edge", [2, 4])
def test_matches_dense(inputs, edge):
    x, a1, w = inputs
    mesh = make_mesh(data=1, edge=edge)
    got = jax.jit(lambda *a: model_edge_gcn(*a, mesh=mesh))(x, a1, w)
    want = gcn_ops.apply_gcn(x, a1, w, "agg")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_matches_dense_ragged_time(inputs):
    """T not divisible by P (the stride-2 stages make T=300 -> 75):
    handled by internal zero-padding, not an assert."""
    x, a1, w = inputs
    x = x[:, :7]  # T=7 with edge=4
    mesh = make_mesh(data=2, edge=4)
    got = jax.jit(lambda *a: model_edge_gcn(*a, mesh=mesh))(x, a1, w)
    want = gcn_ops.apply_gcn(x, a1, w, "agg")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_gradients_match_dense(inputs):
    x, a1, w = inputs
    mesh = make_mesh(data=2, edge=4)
    rng = np.random.default_rng(1)
    probe = jnp.asarray(rng.standard_normal((B, T, V, CO)), jnp.float32)

    def loss_part(x, a1, w):
        return jnp.sum(model_edge_gcn(x, a1, w, mesh=mesh) * probe)

    def loss_dense(x, a1, w):
        return jnp.sum(gcn_ops.apply_gcn(x, a1, w, "agg") * probe)

    gp = jax.jit(jax.grad(loss_part, argnums=(0, 1, 2)))(x, a1, w)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(x, a1, w)
    for name, a, b in zip(("dx", "da1", "dw"), gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4, err_msg=name)


def test_full_model_train_step_with_edge_mesh():
    """AGCN with in-model edge partitioning: train-step outputs match the
    dense model bit-for-bit-close on the same weights and batch."""
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    mesh = make_mesh(data=2, edge=4)
    adj = build_adjacency("ntu_rgb_d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 16, 25, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (4,)))

    dense = AGCN(num_class=5, adj=adj)
    parted = AGCN(num_class=5, adj=adj, edge_mesh=mesh)
    variables = dense.init(jax.random.PRNGKey(0), x, train=False)

    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
    key = jax.random.PRNGKey(0)
    results = []
    for model in (dense, parted):
        state = TrainState.create(model.apply, variables["params"],
                                  variables["batch_stats"], tx)
        step = jax.jit(make_train_step(losses.cross_entropy))
        for _ in range(2):
            state, m = step(state, x, y, key)
        results.append((float(m["loss"]),
                        np.asarray(state.params["fc"]["kernel"])))

    # fp32 summation-order differences between the dense (agg_packed)
    # and ring-partitioned paths accumulate over the 2 steps
    assert abs(results[0][0] - results[1][0]) < 2e-3
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-3)


def test_kinetics_shape_edge_partition():
    """BASELINE config #5 geometry: Kinetics 18-joint / 400-class
    through the edge-partitioned path (VERDICT r3 next #4). V=18 pads
    and shards differently than NTU-25; the partitioned train step must
    still match dense on the kinetics graph."""
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    mesh = make_mesh(data=2, edge=4)
    adj = build_adjacency("kinetics")
    assert adj.shape == (3, 18, 18)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 16, 18, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 400, (4,)))

    dense = AGCN(num_class=400, adj=adj)
    parted = AGCN(num_class=400, adj=adj, edge_mesh=mesh)
    variables = dense.init(jax.random.PRNGKey(0), x, train=False)

    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
    key = jax.random.PRNGKey(0)
    results = []
    for model in (dense, parted):
        state = TrainState.create(model.apply, variables["params"],
                                  variables["batch_stats"], tx)
        step = jax.jit(make_train_step(losses.cross_entropy))
        for _ in range(2):
            state, m = step(state, x, y, key)
        results.append((float(m["loss"]),
                        np.asarray(state.params["fc"]["kernel"])))

    assert abs(results[0][0] - results[1][0]) < 2e-3
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-3)


def test_aagcn_train_step_with_edge_mesh():
    """AAGCN's AdaptiveGCN consumes edge_mesh the same way (VERDICT r2 #2):
    edge-partitioned train step matches dense on the same weights/batch."""
    from agcn_tpu.models import AAGCN
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    mesh = make_mesh(data=2, edge=4)
    adj = build_adjacency("ntu_rgb_d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 16, 25, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (4,)))

    dense = AAGCN(num_class=5, adj=adj, model_layers=3)
    parted = AAGCN(num_class=5, adj=adj, model_layers=3, edge_mesh=mesh)
    variables = dense.init(jax.random.PRNGKey(0), x, train=False)

    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30]))
    key = jax.random.PRNGKey(0)
    results = []
    for model in (dense, parted):
        state = TrainState.create(model.apply, variables["params"],
                                  variables["batch_stats"], tx)
        step = jax.jit(make_train_step(losses.cross_entropy))
        for _ in range(2):
            state, m = step(state, x, y, key)
        results.append((float(m["loss"]),
                        np.asarray(state.params["fc"]["kernel"])))

    assert abs(results[0][0] - results[1][0]) < 2e-3
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-3)


def test_registry_builds_edge_mesh_models():
    """build_model threads edge_mesh into AGCN/AAGCN and rejects models
    without an in-model edge partition."""
    from agcn_tpu.models.registry import build_model

    mesh = make_mesh(data=2, edge=4)
    m1 = build_model("agcn", {"num_class": 5}, edge_mesh=mesh)
    assert m1.edge_mesh is mesh
    m2 = build_model("aagcn", {"num_class": 5}, edge_mesh=mesh)
    assert m2.edge_mesh is mesh
    with pytest.raises(ValueError, match="mesh_edge"):
        build_model("aagcn_v17", {"num_class": 5}, edge_mesh=mesh)
    # models without an in-model edge partition must fail loudly, not
    # silently replicate compute over the reserved 'edge' axis
    with pytest.raises(ValueError, match="mesh_edge"):
        build_model("sgn", {"num_class": 5}, edge_mesh=mesh)
    with pytest.raises(ValueError, match="mesh_edge"):
        build_model("agcn_tpu.models.AGCN", {"num_class": 5},
                    edge_mesh=mesh)


def test_reference_dotted_paths_accept_edge_mesh():
    """Reference dotted model paths resolve through the alias table, so
    mesh_edge must work for them exactly like the short names (the
    MIGRATION drop-in claim); archived/unknown dotted paths still fail."""
    from agcn_tpu.models.registry import build_model

    mesh = make_mesh(data=2, edge=2)
    m = build_model("model.architecture.aagcn.agcn.Model",
                    {"num_class": 5}, edge_mesh=mesh)
    assert m.edge_mesh is mesh
    m2 = build_model("model.aagcn.Model", {"num_class": 5},
                     edge_mesh=mesh)
    assert m2.edge_mesh is mesh
    with pytest.raises(ValueError, match="mesh_edge"):
        build_model("model.sgn_v14.SGN", {"num_class": 5},
                    edge_mesh=mesh)
