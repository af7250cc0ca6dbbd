"""SGN raw data-gen chain parity vs the reference denoising pipeline.

Builds synthetic `.skeleton` fixtures that exercise every denoising
decision (length filter, x/y-spread filter, motion ordering, two-actor
interval packing, missing-frame removal) and asserts our vectorized
implementation (agcn_tpu/data/gen/sgn_raw.py) produces byte-identical
joints arrays to the reference functions
(data_gen/sgn/get_raw_skes_data.py, get_raw_denoised_data.py,
seq_transformation.py) run with their shipped thresholds.
"""

import logging
import os

import numpy as np
import pytest

from agcn_tpu.data.gen import sgn_raw

from .conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


class _NullLogger:
    def info(self, *a, **k):
        pass


def _ref_modules(tmp_path):
    add_reference_to_path()
    import data_gen.sgn.get_raw_denoised_data as den
    import data_gen.sgn.get_raw_skes_data as raw
    import data_gen.sgn.seq_transformation as seq

    for name in ("noise_len_logger", "noise_spr_logger",
                 "noise_mot_logger", "fail_logger_1", "fail_logger_2",
                 "missing_skes_logger", "missing_skes_logger1",
                 "missing_skes_logger2"):
        setattr(den, name, _NullLogger())
    den.noise_len_thres = 11
    den.noise_spr_thres1 = 0.8
    den.noise_spr_thres2 = 0.69754
    den.noise_mot_thres_lo = 0.089925
    den.noise_mot_thres_hi = 2
    den.missing_count = 0
    den.actors_info_dir = str(tmp_path)
    seq.joint_2 = (3, 6)
    return raw, den, seq


def _make_skeleton_text(frames):
    """frames: list (per raw frame) of list of (body_id, joints (25,3))."""
    lines = [str(len(frames))]
    for frame in frames:
        lines.append(str(len(frame)))
        for body_id, joints in frame:
            lines.append(f"{body_id} 0 0 0 0 0 0 0 0 0")
            lines.append("25")
            for j in joints:
                lines.append(
                    f"{j[0]:.6f} {j[1]:.6f} {j[2]:.6f} 0 0 "
                    f"{j[0] * 100:.2f} {j[1] * 100:.2f} 0 0 0 0 0")
    return "\n".join(lines) + "\n"


def _body_frames(rng, n, x_scale=1.0, y_scale=2.0, offset=0.0):
    """n frames of 25 joints; y-spread > x-spread by default (valid)."""
    out = rng.standard_normal((n, 25, 3)).astype(np.float32)
    out[..., 0] *= x_scale
    out[..., 1] *= y_scale
    out += offset
    return out


def _fixture_frames(rng, case):
    """Return (frames, name) for a named scenario."""
    if case == "one_body":
        b = _body_frames(rng, 30)
        frames = [[("71", b[i])] for i in range(30)]
        # two empty raw frames at the start (dropped by the parser)
        frames = [[], []] + frames
        return frames, "S001C001P001R001A007"
    if case == "short_body":
        # second body only 5 frames -> length filter removes it
        a = _body_frames(rng, 40)
        b = _body_frames(rng, 5, offset=1.0)
        frames = [[("10", a[i])] for i in range(40)]
        for i in range(5):
            frames[10 + i].append(("20", b[i]))
        return frames, "S001C001P001R001A050"
    if case == "spread_noise":
        # second body has wide-x frames in >= 69.754% of its frames ->
        # spread filter removes it
        a = _body_frames(rng, 40)
        b = _body_frames(rng, 20, x_scale=5.0, y_scale=1.0)
        frames = [[("10", a[i])] for i in range(40)]
        for i in range(20):
            frames[i].append(("20", b[i]))
        return frames, "S001C001P001R001A051"
    if case == "spread_partial":
        # second body has SOME wide-x frames (< threshold ratio): kept,
        # motion updated from valid frames only -> may reorder actors
        a = _body_frames(rng, 40)
        b = _body_frames(rng, 30, y_scale=6.0)
        b[:5, :, 0] += np.linspace(0, 50, 5)[:, None]  # 5 wide-x frames
        frames = [[("10", a[i])] for i in range(40)]
        for i in range(30):
            frames[i].append(("20", b[i]))
        return frames, "S001C001P001R001A052"
    if case == "three_bodies":
        # actor1 frames 0..19; body "30" frames 25..39 (no overlap ->
        # merged into actor1's slot); body "20" frames 5..39 overlaps
        # actor1 -> actor2 slot
        a = _body_frames(rng, 20, y_scale=8.0)      # largest motion
        c = _body_frames(rng, 35, y_scale=3.0)
        b2 = _body_frames(rng, 15, y_scale=2.0)
        frames = [[] for _ in range(40)]
        for i in range(20):
            frames[i].append(("10", a[i]))
        for i in range(35):
            frames[5 + i].append(("20", c[i]))
        for i in range(15):
            frames[25 + i].append(("30", b2[i]))
        return frames, "S001C001P001R001A055"
    raise ValueError(case)


CASES = ["one_body", "short_body", "spread_noise", "spread_partial",
         "three_bodies"]


@pytest.mark.parametrize("case", CASES)
def test_denoised_joints_match_reference(case, tmp_path):
    raw, den, seq = _ref_modules(tmp_path)
    rng = np.random.default_rng(hash(case) % (2 ** 31))
    frames, name = _fixture_frames(rng, case)
    ske_file = tmp_path / f"{name}.skeleton"
    ske_file.write_text(_make_skeleton_text(frames))

    # reference chain
    bodies_data = raw.get_raw_bodies_data(str(tmp_path), name, {},
                                          _NullLogger())
    if len(bodies_data["data"]) == 1:
        body = list(bodies_data["data"].values())[0]
        ref_joints, _ = den.get_one_actor_points(
            body, bodies_data["num_frames"])
    else:
        ref_joints, ref_colors = den.get_two_actors_points(bodies_data)
        ref_joints, _ = den.remove_missing_frames(name, ref_joints,
                                                  ref_colors)

    # ours
    ours = sgn_raw.assemble_actors(
        sgn_raw.parse_skeleton_file(str(ske_file)))

    assert ours.shape == ref_joints.shape
    np.testing.assert_array_equal(ours, ref_joints)


def test_seq_translation_and_align_match_reference(tmp_path):
    raw, den, seq = _ref_modules(tmp_path)
    rng = np.random.default_rng(0)
    seqs_ours, seqs_ref = [], []
    for case in CASES:
        frames, name = _fixture_frames(rng, case)
        ske_file = tmp_path / f"{name}.skeleton"
        ske_file.write_text(_make_skeleton_text(frames))
        ours = sgn_raw.assemble_actors(
            sgn_raw.parse_skeleton_file(str(ske_file)))
        seqs_ours.append(ours.copy())
        seqs_ref.append(ours.copy())

    ours_t = sgn_raw.seq_translation(seqs_ours)
    ref_t = seq.seq_translation(seqs_ref)
    for a, b in zip(ours_t, ref_t):
        np.testing.assert_allclose(a, b, atol=1e-6)

    cnt = np.asarray([s.shape[0] for s in ref_t])
    cnt = np.maximum(cnt, 300)  # reference aligns to frames_cnt.max()
    ours_a = sgn_raw.align_frames(ours_t, 300)
    ref_a = seq.align_frames(ref_t, np.full(len(ref_t), 300))
    np.testing.assert_allclose(ours_a, ref_a, atol=1e-6)


def test_gendata_from_raw_end_to_end(tmp_path):
    """Driver writes CS/CV train/val/test pkls with consistent shapes."""
    import pickle

    rng = np.random.default_rng(7)
    paths = []
    for i in range(8):
        frames, _ = _fixture_frames(rng, CASES[i % len(CASES)])
        name = f"S001C00{i % 3 + 1}P00{i % 4 + 1}R001A0{50 + i % 5:02d}"
        p = tmp_path / f"{name}.skeleton"
        p.write_text(_make_skeleton_text(frames))
        paths.append(str(p))
    labels = np.arange(8) % 3
    performer = np.asarray([1, 3, 2, 6, 1, 3, 2, 6])
    camera = np.asarray([1, 2, 3, 1, 2, 3, 1, 2])
    out = sgn_raw.gendata_from_raw(paths, labels, performer, camera,
                                   str(tmp_path / "out"))
    assert out.shape == (8, 300, 150)
    with open(tmp_path / "out" / "NTU_CV_train.pkl", "rb") as f:
        tr = pickle.load(f)
    with open(tmp_path / "out" / "NTU_CV_test.pkl", "rb") as f:
        te = pickle.load(f)
    # CV: cameras 2,3 train (5 samples -> 4 train + 1 val), camera 1 test
    assert te.shape[0] == 3 and tr.shape[0] + te.shape[0] <= 8
    assert np.isfinite(out).all()


def test_load_statistics(tmp_path):
    """The reference's statistics/*.txt metadata tables drive the raw
    pipeline (get_raw_skes_data.py:147-153): names + 1-based labels +
    performer/camera columns, with the missing-skeletons list filtered."""
    from agcn_tpu.data.gen.sgn_raw import load_statistics

    names = ["S001C001P001R001A001", "S001C002P002R001A002",
             "S001C003P003R001A003"]
    (tmp_path / "skes_available_name.txt").write_text("\n".join(names))
    (tmp_path / "label.txt").write_text("1\n2\n3\n")
    (tmp_path / "performer.txt").write_text("1\n2\n3\n")
    (tmp_path / "camera.txt").write_text("1\n2\n3\n")
    (tmp_path / "samples_with_missing_skeletons.txt").write_text(names[1])

    paths, labels, perf, cam = load_statistics(str(tmp_path), "/skel")
    assert paths == ["/skel/S001C001P001R001A001.skeleton",
                     "/skel/S001C003P003R001A003.skeleton"]
    assert labels.tolist() == [0, 2]    # 0-based
    assert perf.tolist() == [1, 3]
    assert cam.tolist() == [1, 3]
