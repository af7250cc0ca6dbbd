"""Graph-core unit tests, including parity vs the PyTorch reference's
adjacency construction (reference graph/tools.py + graph/*.py)."""

import numpy as np
import pytest

from agcn_tpu import graph as G

from .conftest import add_reference_to_path, reference_available


SKELETONS = ["ntu_rgb_d", "kinetics", "openpose_b25_j15"]


@pytest.mark.parametrize("name", SKELETONS)
def test_spatial_graph_shapes(name):
    sk = G.get_skeleton(name)
    a = G.build_adjacency(name)
    assert a.shape == (3, sk.num_joints, sk.num_joints)
    assert a.dtype == np.float32
    # subset 0 is the identity
    np.testing.assert_array_equal(a[0], np.eye(sk.num_joints))
    # normalized subsets have column sums in {0, 1}
    for k in (1, 2):
        cs = a[k].sum(axis=0)
        assert np.all((np.abs(cs - 1) < 1e-6) | (np.abs(cs) < 1e-6))


@pytest.mark.parametrize("name", SKELETONS)
def test_coo_roundtrip(name):
    dense = G.build_adjacency(name)
    for k, es in enumerate(G.spatial_edge_sets(name)):
        np.testing.assert_allclose(es.to_dense(), dense[k], atol=1e-7)


def test_edge_partition_covers_all_edges():
    es = G.spatial_edge_sets("ntu_rgb_d")[1]
    parts = es.partition(4)
    assert sum(p.num_edges for p in parts) == es.num_edges
    merged = sum(p.to_dense() for p in parts)
    np.testing.assert_allclose(merged, es.to_dense(), atol=1e-7)


def test_bone_pairs_are_rooted():
    for name in SKELETONS:
        sk = G.get_skeleton(name)
        pairs = sk.bone_pairs
        assert len(pairs) == sk.num_joints
        roots = [j for j, p in pairs if j == p]
        assert sk.center in roots


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize(
    "name,ref_mod",
    [("ntu_rgb_d", "graph.ntu_rgb_d"),
     ("kinetics", "graph.kinetics"),
     ("openpose_b25_j15", "graph.openpose_b25_j15")],
)
def test_parity_vs_reference(name, ref_mod):
    add_reference_to_path()
    import importlib
    ref = importlib.import_module(ref_mod)
    ref_a = ref.Graph(labeling_mode="spatial").A
    ours = G.build_adjacency(name)
    np.testing.assert_allclose(ours, ref_a, atol=1e-7)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_symmetric_norm_parity():
    add_reference_to_path()
    from graph import tools as ref_tools

    a = G.binary_adjacency(G.get_skeleton("ntu_rgb_d"), with_self=True)
    np.testing.assert_allclose(
        G.normalize_symmetric(a),
        ref_tools.normalize_adjacency_matrix(a),
        atol=1e-6,
    )


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_k_adjacency_parity():
    add_reference_to_path()
    from graph import tools as ref_tools

    a = G.binary_adjacency(G.get_skeleton("ntu_rgb_d"), with_self=False)
    for k in range(4):
        np.testing.assert_allclose(
            G.k_adjacency(a, k, with_self=True),
            ref_tools.k_adjacency(a, k, with_self=True),
            atol=1e-6,
        )
