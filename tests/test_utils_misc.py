"""Tests for the small host-side utility surfaces.

Covers agcn_tpu/utils/parallel_map.py (parity target: reference
utils/multiprocessing.py parallel_processing) and
agcn_tpu/utils/visualization.py (parity target: reference
utils/visualization.py + the demo's live G-matrix plot).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from agcn_tpu.utils.parallel_map import parallel_map


def _square(x):
    return x * x


def test_parallel_map_serial_path_matches_map():
    items = list(range(7))
    assert parallel_map(_square, items, processes=1) == [x * x for x in items]


def test_parallel_map_pool_path_ordered():
    # n >= 2 * processes forces the pool branch; results must stay ordered.
    items = list(range(64))
    out = parallel_map(_square, items, processes=2)
    assert out == [x * x for x in items]


def test_parallel_map_small_workload_stays_serial():
    # fewer items than 2*processes -> serial fallback (no pool fork cost)
    out = parallel_map(_square, [1, 2, 3], processes=8)
    assert out == [1, 4, 9]


def test_parallel_map_empty():
    assert parallel_map(_square, [], processes=4) == []


@pytest.fixture(autouse=True)
def _agg_backend(monkeypatch):
    # Never open a display from the test suite.
    monkeypatch.setenv("MPLBACKEND", "Agg")


def test_visualize_skeleton_saves_gif(tmp_path):
    pytest.importorskip("matplotlib")
    from agcn_tpu.utils.visualization import visualize_skeleton

    rng = np.random.default_rng(0)
    data = rng.normal(size=(1, 3, 4, 25, 2)).astype(np.float32)
    out = tmp_path / "skel.gif"
    visualize_skeleton(data, skeleton_name="ntu_rgb_d", is_3d=True,
                       save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_visualize_skeleton_2d_returns_animation():
    pytest.importorskip("matplotlib")
    from agcn_tpu.utils.visualization import visualize_skeleton

    data = np.zeros((1, 2, 3, 15, 1), dtype=np.float32)
    anim = visualize_skeleton(data, skeleton_name="openpose_b25_j15",
                              is_3d=False)
    assert anim is not None
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plot_attention_2d_and_3d(tmp_path):
    pytest.importorskip("matplotlib")
    from agcn_tpu.utils.visualization import plot_attention

    g2 = np.random.default_rng(1).random((25, 25)).astype(np.float32)
    out = tmp_path / "g.png"
    plot_attention(g2, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0

    # (T, V, V) input averages over frames before plotting
    g3 = np.stack([g2, g2 * 2.0])
    fig = plot_attention(g3, title="G avg")
    # the plotted image must be the frame average
    im = fig.axes[0].images[0].get_array()
    np.testing.assert_allclose(np.asarray(im), g2 * 1.5, rtol=1e-6)
    import matplotlib.pyplot as plt

    plt.close("all")
