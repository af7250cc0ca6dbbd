"""REAL multi-process DDP run: two `main.py` processes, each with 2
virtual CPU devices, joined via jax.distributed (Gloo) into one 4-device
data mesh. The reference's DDP semantics (rank-0 artifacts, sharded
sampler, allreduced gradients, SyncBN, score gather) must hold — and the
per-step loss trace must MATCH a single-process run, because the global
batch of step k is the same index SET (padded[16k:16k+16]) whether it is
drawn contiguously by one process or interleaved by two.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

from .conftest import REPO_ROOT

N, NUM_CLASS = 32, 4


def _write_data(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((N, 3, 16, 25, 2)).astype(np.float32) * 0.1
    labels = (np.arange(N) % NUM_CLASS).tolist()
    for i, l in enumerate(labels):
        data[i, 0] += l
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(N)], labels), f)


def _cfg(tmp_path, work, batch, world_size):
    feeder = {"data_path": str(tmp_path / "data.npy"),
              "label_path": str(tmp_path / "label.pkl"),
              "window_size": 16}
    return dict(
        work_dir=str(tmp_path / work),
        model="agcn", model_args={"num_class": NUM_CLASS,
                                  "graph": "ntu_rgb_d"},
        train_feeder_args=feeder, test_feeder_args=feeder,
        batch_size=batch, test_batch_size=batch,
        num_epoch=2, eval_interval=2, save_interval=2, save_score=True,
        base_lr=0.05, log_interval=1, device="cpu",
        world_size=world_size, ddp=world_size > 1)


def _run(cfg_path, env_extra, timeout=420):
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               **env_extra)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO_ROOT, "main.py"),
         "--config", str(cfg_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _train_losses(work_dir):
    out = []
    with open(os.path.join(work_dir, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            if m.get("kind", "train") == "train" and "loss" in m:
                out.append(m["loss"])
    return out


@pytest.mark.slow
def test_two_process_ddp_matches_single(tmp_path):
    _write_data(tmp_path)

    # single process: 2 devices, global batch 16
    cfg1 = _cfg(tmp_path, "work_single", batch=16, world_size=1)
    with open(tmp_path / "single.yaml", "w") as f:
        yaml.safe_dump(cfg1, f)
    p = _run(tmp_path / "single.yaml", {})
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out[-2000:]

    # two processes: per-host batch 8 -> same global batch of 16
    cfg2 = _cfg(tmp_path, "work_ddp", batch=8, world_size=2)
    with open(tmp_path / "ddp.yaml", "w") as f:
        yaml.safe_dump(cfg2, f)
    procs = [
        _run(tmp_path / "ddp.yaml",
             {"JAX_COORDINATOR_ADDRESS": "localhost:23467",
              "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)})
        for i in range(2)]
    outs = [pr.communicate(timeout=420)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o[-2000:]

    # rank-0 artifacts only: one log, one checkpoint set, one score pkl
    ddp_dir = cfg2["work_dir"]
    assert os.path.exists(os.path.join(ddp_dir, "log.txt"))
    ckpts = os.listdir(os.path.join(ddp_dir, "checkpoints"))
    assert ckpts
    assert os.listdir(os.path.join(ddp_dir, "score"))

    # the per-step loss traces must match: same global batch SETS, and
    # gradient/BN reductions are permutation-invariant
    l_single = _train_losses(cfg1["work_dir"])
    l_ddp = _train_losses(ddp_dir)
    assert len(l_single) == len(l_ddp) > 0
    np.testing.assert_allclose(l_ddp, l_single, rtol=2e-3, atol=2e-4)

    # eval agrees too: the gathered+reassembled DDP score matrix matches
    # the single-process one per sample (argmax/top-1 can flip on
    # near-tie logits at this training length, so compare scores, which
    # carry the full information, not the thresholded metric)
    def scores(work_dir):
        fn = sorted(os.listdir(os.path.join(work_dir, "score")))[-1]
        with open(os.path.join(work_dir, "score", fn), "rb") as f:
            d = pickle.load(f)
        return np.stack([d[f"s{i}"] for i in range(N)])

    s_single, s_ddp = scores(cfg1["work_dir"]), scores(ddp_dir)
    np.testing.assert_allclose(s_ddp, s_single, atol=0.05, rtol=0.05)

    # and the north-star axis across PROCESSES: a (data=2, edge=2) mesh
    # spanning both hosts — the in-model edge-partitioned aggregation is
    # numerically identical to dense, so this too must match the
    # single-process trace
    cfg3 = _cfg(tmp_path, "work_edge", batch=8, world_size=2)
    cfg3["mesh_edge"] = 2
    with open(tmp_path / "edge.yaml", "w") as f:
        yaml.safe_dump(cfg3, f)
    procs = [
        _run(tmp_path / "edge.yaml",
             {"JAX_COORDINATOR_ADDRESS": "localhost:23477",
              "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)})
        for i in range(2)]
    outs = [pr.communicate(timeout=420)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o[-2000:]
    l_edge = _train_losses(cfg3["work_dir"])
    np.testing.assert_allclose(l_edge, l_single, rtol=2e-3, atol=2e-4)

    # multi-process TEST PHASE on the saved DDP checkpoint, with an eval
    # batch (3) that does NOT divide the 4-device data axis — exercises
    # the per-process local-eval + process_allgather reassembly fallback
    ckpt = sorted(os.listdir(os.path.join(ddp_dir, "checkpoints")))[-1]
    cfg4 = _cfg(tmp_path, "work_test", batch=8, world_size=2)
    cfg4.update(phase="test", test_batch_size=3,
                weights=os.path.join(ddp_dir, "checkpoints", ckpt))
    with open(tmp_path / "test.yaml", "w") as f:
        yaml.safe_dump(cfg4, f)
    procs = [
        _run(tmp_path / "test.yaml",
             {"JAX_COORDINATOR_ADDRESS": "localhost:23489",
              "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)})
        for i in range(2)]
    outs = [pr.communicate(timeout=420)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o[-2000:]

    def test_scores(work_dir):
        fn = sorted(os.listdir(os.path.join(work_dir, "score")))[-1]
        with open(os.path.join(work_dir, "score", fn), "rb") as f:
            d = pickle.load(f)
        return np.stack([d[f"s{i}"] for i in range(N)])

    # the fallback reassembly must reproduce the DDP training run's own
    # final eval scores (same checkpoint, same data)
    np.testing.assert_allclose(test_scores(cfg4["work_dir"]), s_ddp,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_two_process_sgn_multicrop(tmp_path):
    """SGN 2-process run with multi_test crops: exercises the crops>1
    score reassembly (global logits carry per-process blocks of
    crop-averaged rows) and the SGN collate under host sharding."""
    rng = np.random.default_rng(0)
    n, t, num_class = 24, 40, 3
    data = np.zeros((n, t, 150), np.float32)
    data[:, :, :75] = rng.standard_normal((n, t, 75)).astype(
        np.float32) * 0.1
    labels = (np.arange(n) % num_class).tolist()
    for i, l in enumerate(labels):
        data[i, :, 0] += l * 0.5
    with open(tmp_path / "train.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_label.pkl", "wb") as f:
        pickle.dump(labels, f)

    feeder = {"data_path": str(tmp_path / "train.pkl"),
              "label_path": str(tmp_path / "train_label.pkl"),
              "dataset": "NTU60-CV-SGN"}
    cfg = dict(
        work_dir=str(tmp_path / "work_sgn"),
        model="sgn", use_sgn_dataloader=True,
        model_args={"num_class": num_class, "num_point": 25,
                    "num_segment": 20, "bias": 1, "dropout2d": 0.0},
        train_feeder_args=feeder, test_feeder_args=feeder,
        train_dataloader_args={"seg": 20, "multi_test": 1},
        test_dataloader_args={"seg": 20, "multi_test": 2},
        batch_size=6, test_batch_size=4, num_epoch=1, eval_interval=1,
        optimizer="Adam", base_lr=0.001, save_score=True,
        device="cpu", world_size=2, ddp=True)
    with open(tmp_path / "sgn.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    procs = [
        _run(tmp_path / "sgn.yaml",
             {"JAX_COORDINATOR_ADDRESS": "localhost:23481",
              "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i)})
        for i in range(2)]
    outs = [pr.communicate(timeout=420)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o[-2000:]
    # score pickle covers every sample exactly once
    score_dir = os.path.join(cfg["work_dir"], "score")
    fn = sorted(os.listdir(score_dir))[-1]
    with open(os.path.join(score_dir, fn), "rb") as f:
        d = pickle.load(f)
    assert len(d) == n
    assert all(np.isfinite(v).all() for v in d.values())
