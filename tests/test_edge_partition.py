"""Edge-partitioned aggregation correctness on the virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.ops import aggregate
from agcn_tpu.parallel import make_mesh
from agcn_tpu.parallel.edge_partition import (edge_partitioned_aggregate,
                                              make_edge_partitioned_gcn,
                                              partitioned_adjacency)


def test_partitioned_adjacency_sums_to_full():
    adj = build_adjacency("ntu_rgb_d")
    parts = partitioned_adjacency(adj, 4)
    np.testing.assert_allclose(parts.sum(axis=0), adj, atol=1e-6)


@pytest.mark.parametrize("combiner", ["psum", "ppermute"])
def test_edge_partitioned_aggregate_matches_dense(combiner):
    adj = build_adjacency("ntu_rgb_d")
    mesh = make_mesh(data=2, edge=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 25, 16)).astype(np.float32))
    out = edge_partitioned_aggregate(x, adj, mesh, combiner=combiner)
    ref = jnp.stack([aggregate(x, jnp.asarray(adj[k])) for k in range(3)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("combiner", ["psum", "ppermute"])
def test_edge_partitioned_gcn_matches_dense(combiner):
    adj = build_adjacency("ntu_rgb_d")
    mesh = make_mesh(data=1, edge=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 8, 12)).astype(np.float32))
    fn, parts = make_edge_partitioned_gcn(adj, mesh, combiner=combiner)
    out = fn(x, parts, w)
    ref = sum(aggregate(x, jnp.asarray(adj[k])) @ w[k] for k in range(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("p", [1, 2, 4, 8])
def test_hybrid_partitioned_gcn_matches_dense(p):
    from agcn_tpu.parallel.edge_partition import make_hybrid_partitioned_gcn

    adj = build_adjacency("ntu_rgb_d")
    mesh = make_mesh(data=1, edge=p)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 25, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    fn, parts = make_hybrid_partitioned_gcn(adj, mesh)
    out = fn(x, parts, w)
    ref = sum(aggregate(x, jnp.asarray(adj[k])) @ w[k] for k in range(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_hlo_stats_moves_data_edge_cases():
    """Degenerate-collective detection (parallel/hlo_stats.py): only
    all-singleton groups and empty/self-only permutes are excluded; a
    heterogeneous group set with ANY multi-member group counts."""
    from agcn_tpu.parallel.hlo_stats import _moves_data, collective_bytes

    assert not _moves_data("x = f32[8]{0} all-reduce(y), "
                           "replica_groups={{0},{1}}")
    assert _moves_data("x = f32[8]{0} all-reduce(y), "
                       "replica_groups={{0},{1,2,3}}")
    assert _moves_data("x = f32[8]{0} all-gather(y), "
                       "replica_groups=[2,4]<=[8]")
    assert not _moves_data("x = f32[8]{0} all-gather(y), "
                           "replica_groups=[8,1]<=[8]")
    assert not _moves_data("x = f32[8]{0} collective-permute(y), "
                           "source_target_pairs={}")
    assert not _moves_data("x = f32[8]{0} collective-permute(y), "
                           "source_target_pairs={{0,0},{1,1}}")
    assert _moves_data("x = f32[8]{0} collective-permute(y), "
                       "source_target_pairs={{0,1},{1,0}}")

    hlo = ("  %r = f32[4,8]{1,0} all-reduce(%a), replica_groups={{0,1}}\n"
           "  %d = f32[4,8]{1,0} all-reduce(%b), replica_groups={{0},{1}}\n")
    stats = collective_bytes(hlo)
    assert stats["all-reduce"] == 4 * 8 * 4  # only the real one
    assert stats["n_collectives"] == 1
