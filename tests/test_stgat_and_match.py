"""STGAT graph builders + openpose_match parity vs the reference."""

import numpy as np
import pytest

from agcn_tpu.data import transforms as T
from agcn_tpu.graph import build as G
from agcn_tpu.graph.skeletons import get_skeleton

from .conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


def test_openpose_match_parity():
    add_reference_to_path()
    from feeders import tools as ref_tools

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 12, 18, 3)).astype(np.float64)
    x[2] = np.abs(x[2])  # confidence channel
    ours = T.openpose_match(x.copy())
    ref = ref_tools.openpose_match(x.copy())
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_openpose_match_threads_identities():
    """A synthetic swap: two persons exchange slots at t=5; matching must
    re-thread them so each slot is one smooth trajectory."""
    t, v = 10, 18
    x = np.zeros((3, t, v, 2))
    pa = np.linspace(0, 1, t)[:, None] + np.zeros((t, v))
    pb = np.linspace(5, 6, t)[:, None] + np.zeros((t, v))
    x[0, :, :, 0], x[0, :, :, 1] = pa, pb
    x[2] = 1.0
    swapped = x.copy()
    swapped[:, 5:, :, 0], swapped[:, 5:, :, 1] = x[:, 5:, :, 1], x[:, 5:, :, 0]
    out = T.openpose_match(swapped)
    # after matching, each slot's x-coordinate is monotone (no 5-unit jump)
    for m in range(2):
        jumps = np.abs(np.diff(out[0, :, 0, m]))
        assert jumps.max() < 1.0


def test_expanded_graph_parity():
    add_reference_to_path()
    from graph import tools as ref_tools
    from graph.ntu_rgb_d import inward as ref_inward, num_node

    ske = get_skeleton("ntu_rgb_d")
    for variant in (1, 2):
        ours = G.expanded_graph(ske, variant)
        ref = ref_tools.get_expanded_graph(num_node, list(ref_inward),
                                           type=variant)
        np.testing.assert_array_equal(ours, ref)


def test_strengthened_graph_parity():
    add_reference_to_path()
    from graph import tools as ref_tools
    from graph.ntu_rgb_d import inward as ref_inward, num_node

    ours = G.strengthened_graph(get_skeleton("ntu_rgb_d"))
    ref = ref_tools.get_strenghtened_graph(num_node, list(ref_inward))
    np.testing.assert_array_equal(ours, ref)


def test_adj_matrix_graph_parity():
    add_reference_to_path()
    from graph.ntu_rgb_d import AdjMatrixGraph as RefGraph

    ours = G.adj_matrix_graph("ntu_rgb_d")
    ref = RefGraph()
    np.testing.assert_array_equal(ours.a_binary, ref.A_binary)
    np.testing.assert_array_equal(ours.a_binary_with_i, ref.A_binary_with_I)
    np.testing.assert_allclose(ours.a, ref.A, atol=1e-6)
    np.testing.assert_allclose(ours.a_sep, ref.A_sep, atol=1e-6)


def test_separated_and_k_total_adjacency_parity():
    add_reference_to_path()
    from graph import tools as ref_tools

    ske = get_skeleton("ntu_rgb_d")
    a = G.binary_adjacency(ske, with_self=True)
    np.testing.assert_allclose(
        G.separated_adjacency(a, [0, 1, 2, 3]),
        ref_tools.seperated_adjacency(a, [0, 1, 2, 3]), atol=1e-6)
    for k in (0, 1, 3):
        np.testing.assert_allclose(G.k_total_adjacency(a, k),
                                   ref_tools.k_total_adjacency(a, k))
    np.testing.assert_array_equal(
        G.spatial_temporal_graph(a, 3),
        ref_tools.build_spatial_temporal_graph(a, 3))
