"""Batched multi-stream serving engine (infer/serving.py): per-stream
answers must match the single-stream recognizer, and the batched program
shape must be static regardless of how many streams are live."""

import jax
import numpy as np
import pytest

from agcn_tpu.graph import build_adjacency
from agcn_tpu.infer.realtime import ActionRecognition
from agcn_tpu.infer.serving import BatchedStreamServer
from agcn_tpu.models.agcn import AGCN
from agcn_tpu.models.sgn import SGN


def _frames(seed, n_frames=24, v=25):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((1, 1, v, 3)).astype(np.float32) * 0.2
            for _ in range(n_frames)]


@pytest.fixture(scope="module")
def agcn_model():
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=7, adj=adj)
    x = np.zeros((1, 3, 32, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_batched_matches_single_stream(agcn_model):
    model, variables = agcn_model
    kwargs = dict(kind="dense", max_seq_length=32, moving_avg=2)
    server = BatchedStreamServer(model, variables, max_streams=4, **kwargs)
    singles = {}
    for seed in (0, 1, 2):
        sid = server.add_stream()
        single = ActionRecognition(model, variables, **kwargs)
        for f in _frames(seed):
            server.append_frame(sid, f)
            single.append_frame(f)
        singles[sid] = single
    batched = server.predict()
    assert set(batched) == set(singles)
    for sid, single in singles.items():
        label_s, probs_s = single.predict()
        label_b, probs_b = batched[sid]
        assert label_b == label_s
        np.testing.assert_allclose(probs_b, probs_s, atol=1e-5, rtol=1e-5)


def test_padding_invariance(agcn_model):
    """A stream's answer must not depend on how many OTHER slots are
    live — zero-padded slots and live streams share one program."""
    model, variables = agcn_model
    kwargs = dict(kind="dense", max_seq_length=32)
    s1 = BatchedStreamServer(model, variables, max_streams=4, **kwargs)
    sid = s1.add_stream()
    for f in _frames(5):
        s1.append_frame(sid, f)
    alone = s1.predict()[sid]

    s2 = BatchedStreamServer(model, variables, max_streams=4, **kwargs)
    sid2 = s2.add_stream()
    others = [s2.add_stream() for _ in range(3)]
    for f in _frames(5):
        s2.append_frame(sid2, f)
    for i, o in enumerate(others):
        for f in _frames(10 + i):
            s2.append_frame(o, f)
    crowded = s2.predict()[sid2]
    assert alone[0] == crowded[0]
    np.testing.assert_allclose(alone[1], crowded[1], atol=1e-5, rtol=1e-5)


def test_capacity_and_lifecycle(agcn_model):
    model, variables = agcn_model
    server = BatchedStreamServer(model, variables, max_streams=2,
                                 kind="dense", max_seq_length=32)
    a = server.add_stream()
    b = server.add_stream()
    with pytest.raises(RuntimeError, match="capacity"):
        server.add_stream()
    server.remove_stream(a)
    c = server.add_stream()
    assert c not in (a, b)  # ids are never reused
    assert len(server.predict()) == 2  # empty buffers still serve


def test_sgn_streams_multi_crop():
    model = SGN(num_class=5)
    x = np.zeros((1, 20, 75), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    server = BatchedStreamServer(
        model, variables, max_streams=3, kind="sgn", max_seq_length=48,
        multi_test=5, sgn_dataloader_args=dict(seg=20))
    sids = [server.add_stream() for _ in range(2)]
    for i, sid in enumerate(sids):
        for f in _frames(i, n_frames=40):
            server.append_frame(sid, f)
    out = server.predict()
    assert set(out) == set(sids)
    for label, probs in out.values():
        assert probs.shape == (5,)
        assert np.isfinite(probs).all()
        assert 0 <= label < 5


def test_sgn_batched_matches_single_stream():
    """SGN path exact equivalence: stream id 0 uses rng(0) — the same
    stream the single recognizer draws — so multi-crop sampling and the
    batched forward must reproduce the single-stream answer exactly."""
    model = SGN(num_class=6)
    x = np.zeros((1, 20, 75), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    kwargs = dict(kind="sgn", max_seq_length=48, multi_test=5,
                  sgn_dataloader_args=dict(seg=20))
    server = BatchedStreamServer(model, variables, max_streams=2, **kwargs)
    sid = server.add_stream(stream_id=0)
    single = ActionRecognition(model, variables, **kwargs)
    for f in _frames(7, n_frames=40):
        server.append_frame(sid, f)
        single.append_frame(f)
    label_b, probs_b = server.predict()[sid]
    label_s, probs_s = single.predict()
    assert label_b == label_s
    np.testing.assert_allclose(probs_b, probs_s, atol=1e-5, rtol=1e-5)


def test_batched_vectorized_preprocessing_matches(agcn_model):
    """>4 live dense streams route host preprocessing through the
    whole-batch vectorized path (_prepare_dense_batched: stacked ring
    buffers, masked-moment energy selection) — answers must be
    identical to the per-stream single-recognizer path."""
    model, variables = agcn_model
    kwargs = dict(kind="dense", max_seq_length=32)
    server = BatchedStreamServer(model, variables, max_streams=6, **kwargs)
    singles = {}
    for seed in range(6):
        sid = server.add_stream()
        single = ActionRecognition(model, variables, **kwargs)
        for f in _frames(seed):
            server.append_frame(sid, f)
            single.append_frame(f)
        singles[sid] = single
    batched = server.predict()
    for sid, single in singles.items():
        _, probs_s = single.predict()
        np.testing.assert_allclose(batched[sid][1], probs_s,
                                   atol=1e-5, rtol=1e-5)


def test_batched_vectorized_energy_selection(agcn_model):
    """The vectorized energy selection picks the SAME top-k bodies as
    the reference's per-body nonzero_std: feed one stream whose
    max_person slots carry distinguishable energies with empty slots in
    between."""
    model, variables = agcn_model
    server = BatchedStreamServer(model, variables, max_streams=6,
                                 kind="dense", max_seq_length=32,
                                 max_person=4)
    singles = ActionRecognition(model, variables, kind="dense",
                                max_seq_length=32, max_person=4)
    rng = np.random.default_rng(9)
    for sid in range(6):
        server.add_stream()
    for t in range(32):
        # body 0 quiet, body 1 empty, body 2 loud, body 3 medium
        f = np.zeros((4, 1, 25, 3), np.float32)
        f[0] = rng.standard_normal((1, 25, 3)) * 0.01
        f[2] = rng.standard_normal((1, 25, 3)) * 1.0
        f[3] = rng.standard_normal((1, 25, 3)) * 0.1
        for sid in range(6):
            server.append_frame(sid, f)
        singles.append_frame(f)
    batched = server.predict()
    label_s, probs_s = singles.predict()
    for sid in range(6):
        assert batched[sid][0] == label_s
        np.testing.assert_allclose(batched[sid][1], probs_s,
                                   atol=1e-5, rtol=1e-5)


def test_sgn_recipe_dataloader_args_accepted():
    """Shipped SGN recipes' test_dataloader_args carry multi_test; both
    the server and the single-stream recognizer must accept the dict
    verbatim (regression: double 'multi_test' kwarg crash)."""
    model = SGN(num_class=4)
    x = np.zeros((1, 20, 75), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    recipe_args = dict(seg=20, multi_test=5)  # as in the shipped yamls
    server = BatchedStreamServer(model, variables, max_streams=1,
                                 kind="sgn", max_seq_length=48,
                                 multi_test=5,
                                 sgn_dataloader_args=recipe_args)
    sid = server.add_stream()
    for f in _frames(0, n_frames=30):
        server.append_frame(sid, f)
    assert sid in server.predict()
    single = ActionRecognition(model, variables, kind="sgn",
                               max_seq_length=48, multi_test=5,
                               sgn_dataloader_args=recipe_args)
    for f in _frames(0, n_frames=30):
        single.append_frame(f)
    label, probs = single.predict()
    assert probs.shape == (4,)


def test_pipelined_matches_sync(agcn_model):
    """predict_async() returns exactly predict()'s per-tick answers,
    shifted by one tick (double-buffered host prep vs device compute);
    flush() drains the final in-flight tick."""
    model, variables = agcn_model
    kwargs = dict(kind="dense", max_seq_length=32, moving_avg=2)
    sync = BatchedStreamServer(model, variables, max_streams=3, **kwargs)
    pipe = BatchedStreamServer(model, variables, max_streams=3, **kwargs)
    assert pipe.predict_async() is None  # no streams -> nothing dispatched
    assert pipe.flush() is None
    for seed in (0, 1, 2):
        sync.add_stream()
        pipe.add_stream()
    frames = {sid: _frames(sid, n_frames=40) for sid in range(3)}
    want = []
    # tick every 8 frames; the async engine lags by exactly one tick
    got = []
    for t in range(8, 41, 8):
        for sid in range(3):
            for f in frames[sid][t - 8:t]:
                sync.append_frame(sid, f)
                pipe.append_frame(sid, f)
        want.append(sync.predict())
        r = pipe.predict_async()
        if r is not None:
            got.append(r)
    tail = pipe.flush()
    assert tail is not None
    got.append(tail)
    assert pipe.flush() is None
    assert len(got) == len(want)
    for w, g in zip(want, got):
        assert set(w) == set(g)
        for sid in w:
            assert g[sid][0] == w[sid][0]
            np.testing.assert_allclose(g[sid][1], w[sid][1],
                                       atol=1e-5, rtol=1e-5)


def test_predict_rejects_inflight_pipeline(agcn_model):
    """Mixing predict() with an in-flight predict_async() tick would
    misorder answers — it must refuse until flush()."""
    model, variables = agcn_model
    server = BatchedStreamServer(model, variables, max_streams=2,
                                 kind="dense", max_seq_length=32)
    server.add_stream()
    for f in _frames(0):
        server.append_frame(0, f)
    server.predict_async()  # dispatches tick 1
    with pytest.raises(RuntimeError, match="flush"):
        server.predict()
    assert server.flush() is not None
    server.predict()  # clean again after the drain
