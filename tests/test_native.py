"""Native kernel tests: build, correctness vs the numpy reference paths."""

import numpy as np
import pytest

from agcn_tpu import native
from agcn_tpu.data.sgn_collate import SegmentSampler


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def _write_skeleton(path, frames=5, bodies=1, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((bodies, frames, 25, 3)) * 0.2
    with open(path, "w") as f:
        f.write(f"{frames}\n")
        for t in range(frames):
            f.write(f"{bodies}\n")
            for b in range(bodies):
                f.write("72057594037931101 0 1 1 1 1 0 0.1 0.2 2\n")
                f.write("25\n")
                for j in range(25):
                    xyz = vals[b, t, j]
                    f.write(" ".join(f"{v:.6f}" for v in xyz)
                            + " 100 100 500 500 0.1 0.2 0.3 0.9 2\n")
    return vals


def test_parse_skeleton_matches_python(lib, tmp_path):
    path = tmp_path / "S001C001P001R001A001.skeleton"
    vals = _write_skeleton(path, frames=7, bodies=2)
    out, frames = native.parse_skeleton(str(path))
    assert frames == 7
    np.testing.assert_allclose(out[:2, :7], vals, atol=1e-5)

    from agcn_tpu.data.gen.ntu import read_skeleton

    py_data, py_frames = read_skeleton(str(path))
    assert py_frames == 7
    np.testing.assert_allclose(out[:4, :7], py_data[:, :7], atol=1e-5)


def test_flatten_persons_matches_python(lib):
    rng = np.random.default_rng(0)
    t, half = 30, 75
    seq = rng.standard_normal((t, 2 * half)).astype(np.float32)
    seq[5:] *= (rng.random((t - 5, 2 * half)) > 0.0)
    seq[3] = 0.0                 # fully empty frame -> dropped
    seq[10, half:] = 0.0         # person 1 absent
    seq[12, :half] = 0.0         # person 0 absent

    nf, ns = native.flatten_persons(seq)
    sampler = SegmentSampler()
    nz = seq.any(axis=-1)
    pf, ps = sampler.flatten_persons(seq[nz])
    np.testing.assert_allclose(nf, pf, atol=1e-6)
    np.testing.assert_allclose(ns, ps, atol=1e-6)


def test_collate_uses_native_consistently(lib):
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((40, 150)).astype(np.float32)
    seq[30:] = 0.0
    sampler = SegmentSampler(dataset="NTU60-CV", seg=20)
    x, s, y, idx = sampler.collate([(seq, 1, 0)],
                                   np.random.default_rng(1), train=False)
    assert x.shape == (1, 20, 75)
    assert np.all(np.isfinite(x))


def test_native_pre_normalize_matches_numpy():
    """Native pre_normalize (skelio.cpp) vs the pure-numpy path across
    the branch space: single-person samples, leading null frames,
    zero tails (pad tiling), all-zero samples, every alignment/center
    combination — within one float32 ulp (BLAS summation order)."""
    from agcn_tpu import native
    from agcn_tpu.data.gen.preprocess import pre_normalization

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    data = rng.standard_normal((4, 3, 60, 25, 2)).astype(np.float32) * 0.3
    data[0, :, :, :, 1] = 0      # single person
    data[1, :, :5] = 0           # leading null frames
    data[2, :, 30:] = 0          # zero tail -> pad tiling
    data[3] = 0                  # all-zero sample
    for zaxis, xaxis, pad, c, cf in [
            ((0, 1), (8, 4), True, True, False),
            (None, (8, 4), True, True, False),
            ((0, 1), None, False, False, True),
            ((0, 1), (8, 4), False, False, False),
            (None, None, True, False, False)]:
        want = pre_normalization(data.copy(), zaxis, xaxis, pad, c, cf,
                                 native_ok=False)
        got = native.pre_normalize(data.copy(), zaxis, xaxis, pad, c, cf)
        assert got is not None
        np.testing.assert_allclose(got, want, atol=5e-7, rtol=0)


def test_pre_normalization_routes_through_native():
    """The default pre_normalization path uses the native kernel when
    available and stays within tolerance of the numpy reference."""
    from agcn_tpu.data.gen.preprocess import pre_normalization

    rng = np.random.default_rng(1)
    data = rng.standard_normal((2, 3, 40, 25, 2)).astype(np.float32) * 0.3
    auto = pre_normalization(data.copy())
    ref = pre_normalization(data.copy(), native_ok=False)
    np.testing.assert_allclose(auto, ref, atol=5e-7, rtol=0)
