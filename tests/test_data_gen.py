"""Offline data-generation tests, including parity of pre_normalization
and stream generation vs the reference data_gen."""

import os
import pickle

import numpy as np
import pytest

from agcn_tpu.data.gen import (bone_stream, motion_stream, pre_normalization,
                               rotation_matrix)
from agcn_tpu.data.gen.ntu import parse_sample_name, read_xyz
from agcn_tpu.data.gen.sgn import dense_to_sgn

from .conftest import add_reference_to_path, reference_available


def _random_skeleton_data(n=3, t=20, v=25, m=2, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((n, 3, 300, v, m), dtype=np.float32)
    data[:, :, :t] = rng.standard_normal((n, 3, t, v, m)) * 0.3
    # second person missing for sample 0
    data[0, :, :, :, 1] = 0
    return data


def test_parse_sample_name():
    assert parse_sample_name("S001C002P003R004A005.skeleton") == (3, 2, 5)


def test_pre_normalization_centers_spine():
    data = _random_skeleton_data()
    out = pre_normalization(data.copy())
    assert out.shape == data.shape
    # after pad, frames are filled through the whole window
    assert np.abs(out[0, :, 150]).sum() > 0
    # centering: spine joint of the main body is at the origin
    np.testing.assert_allclose(out[0, :, 5, 1, 0], 0, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_pre_normalization_parity():
    add_reference_to_path()
    from data_gen.preprocess import pre_normalization as ref_pre

    data = _random_skeleton_data()
    ours = pre_normalization(data.copy())
    ref = ref_pre(data.copy())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bone_and_motion_streams():
    data = _random_skeleton_data()
    bones = bone_stream(data, "ntu_rgb_d")
    assert bones.shape == data.shape
    # center joint bone is zero
    np.testing.assert_allclose(bones[:, :, :, 20], 0, atol=1e-7)
    motion = motion_stream(data)
    np.testing.assert_allclose(motion[:, :, 5], data[:, :, 6] - data[:, :, 5],
                               atol=1e-7)
    np.testing.assert_allclose(motion[:, :, -1], 0, atol=1e-7)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_bone_pairs_match_reference_table():
    """Our skeleton-registry bone pairs must reproduce the reference's
    hardcoded table (data_gen/gen_bone_data.py:6-28)."""
    import re

    with open("/root/reference/data_gen/gen_bone_data.py") as f:
        src = f.read()
    seg = src.split("'ntu/xview'")[1].split("'ntu/xsub'")[0]
    pairs = re.findall(r"\((\d+),\s*(\d+)\)", seg)
    ref_pairs = {(int(a) - 1, int(b) - 1) for a, b in pairs}
    from agcn_tpu.graph import get_skeleton

    ours = set(get_skeleton("ntu_rgb_d").bone_pairs)
    # reference pairs the center joint (21 -> idx 20) with itself too
    assert ref_pairs == ours


def test_dense_to_sgn_roundtrip():
    data = _random_skeleton_data(t=40)
    sgn = dense_to_sgn(data)
    assert sgn.shape == (3, 300, 150)
    # first frame origin: main-body center joint at 0
    np.testing.assert_allclose(sgn[1, 0, 3:6], 0, atol=1e-6)
    # padded tail is zero
    np.testing.assert_allclose(sgn[:, 40:], 0, atol=1e-7)


def test_read_xyz_from_synthetic_skeleton(tmp_path):
    path = tmp_path / "S001C002P003R004A005.skeleton"
    rng = np.random.default_rng(0)
    frames = 4
    with open(path, "w") as f:
        f.write(f"{frames}\n")
        for t in range(frames):
            f.write("1\n")  # one body
            f.write("72057594037931101 0 1 1 1 1 0 0.1 0.2 2\n")
            f.write("25\n")
            for j in range(25):
                xyz = rng.standard_normal(3) * 0.1
                f.write(" ".join(f"{v:.5f}" for v in xyz)
                        + " 100 100 500 500 0 0 0 1 2\n")
    data = read_xyz(str(path))
    assert data.shape == (3, frames, 25, 2)
    assert np.abs(data[:, :, :, 0]).sum() > 0
    np.testing.assert_allclose(data[:, :, :, 1], 0, atol=1e-7)


def test_gen_cli_ntu_and_streams(tmp_path):
    """The unified offline-gen CLI (python -m agcn_tpu.data.gen) drives
    the NTU chain and the bone/motion streams end-to-end on a synthetic
    .skeleton file — the role of the reference's standalone scripts."""
    from agcn_tpu.data.gen.__main__ import main as gen_main

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    # xview: camera 2 -> train split, camera 1 -> eval split
    for cam, perf in ((1, 1), (2, 1)):
        path = raw / f"S001C{cam:03d}P{perf:03d}R001A005.skeleton"
        with open(path, "w") as f:
            f.write("4\n")
            for t in range(4):
                f.write("1\n")
                f.write("7205759 0 1 1 1 1 0 0.1 0.2 2\n")
                f.write("25\n")
                for j in range(25):
                    xyz = rng.standard_normal(3) * 0.1
                    f.write(" ".join(f"{v:.5f}" for v in xyz)
                            + " 100 100 500 500 0 0 0 1 2\n")
    out = tmp_path / "out"
    gen_main(["ntu", "--data-path", str(raw), "--out-path", str(out),
              "--benchmark", "xview", "--part", "train", "eval"])
    train = np.load(out / "xview" / "train_data_joint.npy")
    assert train.shape == (1, 3, 300, 25, 2)
    assert (out / "xview" / "eval_label.pkl").exists()

    gen_main(["streams", "--joint-path",
              str(out / "xview" / "train_data_joint.npy")])
    bone = np.load(out / "xview" / "train_data_bone.npy")
    assert bone.shape == train.shape
    assert (out / "xview" / "train_data_joint_motion.npy").exists()


def _write_synthetic_skeleton(path, frames=4, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        f.write(f"{frames}\n")
        for _ in range(frames):
            f.write("1\n")
            f.write("7205759 0 1 1 1 1 0 0.1 0.2 2\n")
            f.write("25\n")
            for _ in range(25):
                xyz = rng.standard_normal(3) * 0.1
                f.write(" ".join(f"{v:.5f}" for v in xyz)
                        + " 100 100 500 500 0 0 0 1 2\n")


def test_explore_cli(tmp_path, capsys):
    """`gen explore` covers the reference's data_gen/ntu_explore.py role:
    split/class statistics over a raw dir, class filtering, frame/body
    stats, and rendering one pre-normalized sample to a gif."""
    from agcn_tpu.data.gen.__main__ import main as gen_main

    raw = tmp_path / "raw"
    raw.mkdir()
    # cam 2 -> xview train, cam 1 -> val; actions A005 (label 4), A008 (7)
    names = ["S001C002P001R001A005.skeleton",
             "S001C001P002R001A005.skeleton",
             "S001C002P003R001A008.skeleton"]
    for i, n in enumerate(names):
        _write_synthetic_skeleton(raw / n, seed=i)

    gen_main(["explore", "--data-path", str(raw), "--read-frames"])
    out = capsys.readouterr().out
    assert "samples: 3" in out
    assert "train: 2" in out and "val: 1" in out
    assert "A005: 2" in out and "A008: 1" in out
    assert "bodies=1: 3" in out

    # class filter (0-based)
    gen_main(["explore", "--data-path", str(raw), "--classes", "7"])
    out = capsys.readouterr().out
    assert "samples: 1" in out and "A005" not in out

    # render one sample
    gif = tmp_path / "s.gif"
    gen_main(["explore", "--data-path", str(raw),
              "--render-sample", names[0], "--save", str(gif)])
    assert gif.exists() and gif.stat().st_size > 0


def test_explore_npy(tmp_path):
    from agcn_tpu.data.gen.explore import explore_npy

    data = np.zeros((3, 3, 10, 25, 2), dtype=np.float32)
    data[0, :, :4, :, 0] = 1.0          # 4 valid frames, 1 body
    data[1, :, :7, :, :] = 1.0          # 7 valid frames, 2 bodies
    data[2, :, :10, :, 0] = 1.0
    npy = tmp_path / "d.npy"
    np.save(npy, data)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump((["a", "b", "c"], [0, 1, 1]), f)

    rep = explore_npy(str(npy), str(tmp_path / "l.pkl"))
    assert rep.n_samples == 3
    assert rep.class_counts == {0: 1, 1: 2}
    assert sorted(rep.frame_lengths) == [4, 7, 10]
    assert sorted(rep.body_counts) == [1, 1, 2]

    rep = explore_npy(str(npy), str(tmp_path / "l.pkl"), classes=[1])
    assert rep.n_samples == 2 and rep.class_counts == {1: 2}
