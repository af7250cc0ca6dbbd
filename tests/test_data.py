"""Data-layer tests: transforms, feeder, SGN sampling, pipeline sharding."""

import os
import pickle

import numpy as np
import pytest

from agcn_tpu.data import (BatchIterator, SGNDataset, SegmentSampler,
                           SkeletonDataset, make_sgn_collate, transforms as T)


def _make_dense_dataset(tmp_path, n=12, c=3, t=32, v=25, m=2, num_class=5):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, c, t, v, m)).astype(np.float32)
    # zero-pad tails to emulate variable-length sequences
    for i in range(n):
        data[i, :, 20 + i % 10:] = 0.0
    labels = rng.integers(0, num_class, n).tolist()
    names = [f"sample{i}" for i in range(n)]
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump((names, labels), f)
    return str(tmp_path / "data.npy"), str(tmp_path / "label.pkl")


def _make_sgn_dataset(tmp_path, n=10, t=40, feat=150, num_class=5):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, t, feat)).astype(np.float32)
    data[:, 30:] = 0.0        # padded frames
    data[:, :, 75:] = 0.0     # second person absent
    labels = rng.integers(0, num_class, n)
    with open(tmp_path / "train_data.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_label.pkl", "wb") as f:
        pickle.dump(labels, f)
    return str(tmp_path / "train_data.pkl"), str(tmp_path / "train_label.pkl")


def test_transforms_shapes():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 30, 25, 2)).astype(np.float32)
    assert T.auto_pad(x, 40).shape == (3, 40, 25, 2)
    assert T.random_choose(x, 16, rng).shape == (3, 16, 25, 2)
    assert T.random_shift(x, rng).shape == x.shape
    assert T.random_move(x, rng).shape == x.shape
    assert T.random_subsample(x, 10, rng).shape == (3, 10, 25, 2)
    assert T.stretch_to_maximum_length(x).shape == x.shape
    out = T.random_rotation(x, 0.5, rng)
    assert out.shape == x.shape
    # rotation preserves per-frame joint norms
    n0 = np.linalg.norm(x.reshape(3, -1), axis=0)
    n1 = np.linalg.norm(out.reshape(3, -1), axis=0)
    np.testing.assert_allclose(n0, n1, rtol=1e-4)


def test_rotation_matrices_match_torch_reference():
    """Exact parity vs the reference `_rot` (feeders/tools.py:278-299):
    row order of Rz matters — the transposed variant is a det=-1
    reflection that still preserves norms, so the norm checks alone
    cannot catch it."""
    import torch

    rng = np.random.default_rng(7)
    rot = rng.uniform(-0.6, 0.6, (5, 11, 3)).astype(np.float32)

    ours = T.rotation_matrices(rot)
    np.testing.assert_allclose(np.linalg.det(ours), 1.0, atol=1e-5)

    r = torch.from_numpy(rot)
    cos_r, sin_r = r.cos(), r.sin()
    zeros = torch.zeros(r.shape[:2] + (1,))
    ones = torch.ones(r.shape[:2] + (1,))
    r1 = torch.stack((ones, zeros, zeros), dim=-1)
    rx2 = torch.stack((zeros, cos_r[:, :, 0:1], sin_r[:, :, 0:1]), dim=-1)
    rx3 = torch.stack((zeros, -sin_r[:, :, 0:1], cos_r[:, :, 0:1]), dim=-1)
    rx = torch.cat((r1, rx2, rx3), dim=2)
    ry1 = torch.stack((cos_r[:, :, 1:2], zeros, -sin_r[:, :, 1:2]), dim=-1)
    r2 = torch.stack((zeros, ones, zeros), dim=-1)
    ry3 = torch.stack((sin_r[:, :, 1:2], zeros, cos_r[:, :, 1:2]), dim=-1)
    ry = torch.cat((ry1, r2, ry3), dim=2)
    rz1 = torch.stack((cos_r[:, :, 2:3], sin_r[:, :, 2:3], zeros), dim=-1)
    r3 = torch.stack((zeros, zeros, ones), dim=-1)
    rz2 = torch.stack((-sin_r[:, :, 2:3], cos_r[:, :, 2:3], zeros), dim=-1)
    rz = torch.cat((rz1, rz2, r3), dim=2)
    expect = rz.matmul(ry).matmul(rx).numpy()

    np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_batch_rotation_preserves_norms():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 20, 75)).astype(np.float32)
    out = T.batch_rotation(x, 0.5, rng)
    p0 = x.reshape(4, 20, 25, 3)
    p1 = out.reshape(4, 20, 25, 3)
    np.testing.assert_allclose(np.linalg.norm(p0, axis=-1),
                               np.linalg.norm(p1, axis=-1), rtol=1e-4,
                               atol=1e-5)


def test_split_policies():
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((37, 75)).astype(np.float32)
    for bounds in [T.split_idx_equal(37, 20),
                   T.split_idx_using_auc(seq, 20),
                   T.split_idx_using_kmeans(seq, 20),
                   T.split_idx_tempshift(37, 20, 0.1, rng)]:
        assert len(bounds) == 21
        assert bounds[0] >= 0 and bounds[-1] <= 37
        assert np.all(np.diff(bounds) >= 1), bounds
    # the center policy may produce zero-width intervals on short
    # sequences (the reference raises there, loader.py:242-245); our
    # sampler repairs them at draw time, so only monotonicity is required
    center = T.split_idx_center(37, 20, 0.001)
    assert len(center) == 21 and np.all(np.diff(center) >= 0)


def test_dense_feeder_and_pipeline(tmp_path):
    dp, lp = _make_dense_dataset(tmp_path)
    ds = SkeletonDataset(dp, lp, window_size=16, random_choose=True,
                         random_rotation=True, random_shift=True)
    x, y, i = ds[0]
    assert x.shape == (3, 16, 25, 2)
    it = BatchIterator(ds, batch_size=4, shuffle=True, seed=1, prefetch=2)
    batches = list(it)
    assert len(batches) == 3
    xb, yb, ib = batches[0]
    assert xb.shape == (4, 3, 16, 25, 2)
    # top_k sanity
    score = np.eye(5)[ds.label]
    assert ds.top_k(score, 1) == 1.0


def test_pipeline_sharding_covers_dataset(tmp_path):
    dp, lp = _make_dense_dataset(tmp_path)
    ds = SkeletonDataset(dp, lp, window_size=16)
    seen = []
    for shard in range(4):
        it = BatchIterator(ds, batch_size=3, shuffle=True, seed=7,
                           num_shards=4, shard_index=shard, prefetch=0)
        it.set_epoch(3)
        for _, _, idx in it:
            seen.extend(idx.tolist())
    assert set(seen) == set(range(len(ds)))


def test_sgn_sampler_collate(tmp_path):
    dp, lp = _make_sgn_dataset(tmp_path)
    ds = SGNDataset(dp, lp, merge_val_into_train=False)
    sampler = SegmentSampler(dataset="NTU60-CV", seg=20, multi_test=3)
    rng = np.random.default_rng(0)
    batch = [ds[i] for i in range(4)]
    x, s, y, idx = sampler.collate(batch, rng, train=True)
    assert x.shape == (4, 20, 75)
    assert s.shape == (4, 20, 1)
    x, s, y, idx = sampler.collate(batch, rng, train=False, multi_crop=True)
    assert x.shape == (12, 20, 75)
    assert list(y[:3]) == [y[0]] * 3  # crops are consecutive


@pytest.mark.parametrize("kwargs", [
    dict(motion_sampler=1), dict(midvel_sampler=1),
    dict(center_sampler=0.001), dict(tempshift_sampler=0.1),
    dict(motion_sampler=1, motion_norm=1),
])
def test_sgn_sampler_policies(tmp_path, kwargs):
    dp, lp = _make_sgn_dataset(tmp_path)
    ds = SGNDataset(dp, lp, merge_val_into_train=False)
    sampler = SegmentSampler(dataset="NTU60-CV", seg=20, **kwargs)
    rng = np.random.default_rng(0)
    x, s, y, idx = sampler.collate([ds[0], ds[1]], rng, train=False)
    assert x.shape == (2, 20, 75)
    assert np.all(np.isfinite(x))


def test_sgn_pipeline_end_to_end(tmp_path):
    dp, lp = _make_sgn_dataset(tmp_path)
    ds = SGNDataset(dp, lp, merge_val_into_train=False)
    sampler = SegmentSampler(dataset="NTU60-CV", seg=20)
    it = BatchIterator(ds, batch_size=5, shuffle=True,
                       collate=make_sgn_collate(sampler, train=True))
    x, y, idx = next(iter(it))
    assert x.shape == (5, 20, 75)


def test_pipeline_workers_match_serial(tmp_path):
    # augmentation ON: the per-item RNG streams make worker-pool results
    # bit-identical to serial iteration regardless of thread scheduling
    dp, lp = _make_dense_dataset(tmp_path)
    ds = SkeletonDataset(dp, lp, window_size=16, random_rotation=True,
                         random_shift=True, random_move=True)
    serial = BatchIterator(ds, batch_size=4, shuffle=True, seed=3,
                           prefetch=0, num_workers=0)
    threaded = BatchIterator(ds, batch_size=4, shuffle=True, seed=3,
                             prefetch=0, num_workers=4)
    for (x1, y1, i1), (x2, y2, i2) in zip(serial, threaded):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(y1, y2)
        np.testing.assert_array_equal(x1, x2)


def test_pipeline_abandoned_iterator_releases_producer(tmp_path):
    import threading

    dp, lp = _make_dense_dataset(tmp_path)
    ds = SkeletonDataset(dp, lp, window_size=16)
    before = threading.active_count()
    for _ in range(5):
        it = iter(BatchIterator(ds, batch_size=2, prefetch=2))
        next(it)
        it.close()  # abandon mid-epoch
    import time

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_shard_coverage_invariants():
    """The DDP loss-trace equivalence rests on these: across shards each
    epoch covers every sample, shards are equal-length (padded from the
    head of the permutation), and the union of per-shard batch k equals
    the contiguous global batch k of a single-shard iterator."""
    from agcn_tpu.data.pipeline import BatchIterator

    class Idx:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return np.float32([i]), i % 3, i

    for n, nproc, bs in [(32, 2, 8), (30, 4, 3), (17, 2, 4), (9, 3, 2)]:
        per = -(-n // nproc)
        shards = []
        for p in range(nproc):
            it = BatchIterator(Idx(n), bs, shuffle=True, drop_last=True,
                               seed=7, num_shards=nproc, shard_index=p)
            it.set_epoch(3)
            shards.append(it._indices())
        assert all(len(s) == per for s in shards)
        union = np.concatenate(shards)
        assert set(union.tolist()) == set(range(n))  # full coverage
        single = BatchIterator(Idx(n), bs * nproc, shuffle=True,
                               drop_last=True, seed=7)
        single.set_epoch(3)
        order = single._indices()
        # global batch k (union over shards) == contiguous batch k
        gb = min(len(order) // (bs * nproc), per // bs)
        for k in range(gb):
            got = set()
            for s in shards:
                got.update(s[k * bs:(k + 1) * bs].tolist())
            want = set(order[k * bs * nproc:(k + 1) * bs * nproc].tolist())
            assert got == want
