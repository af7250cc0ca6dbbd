"""Runtime surface: TensorBoard event writing, work-dir reuse guard,
model-source snapshot, and multi-crop eval with a partial final batch."""

import glob
import os
import pickle

import numpy as np
import pytest

from agcn_tpu.utils.config import Config

from .test_trainer import _dense_data, _make_cfg


def test_tb_writer_roundtrip(tmp_path):
    """Events written by our pure-python writer must be readable by
    TensorBoard's own reader (ecosystem compatibility)."""
    from agcn_tpu.utils.tb_writer import SummaryWriter

    d = str(tmp_path / "ev")
    w = SummaryWriter(d)
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/acc", 0.25, 10)
    w.add_scalar("train/loss", 0.75, 20)
    w.close()

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)

    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(EventFileLoader(files[0]).Load())
    # the loader's data-compat layer may migrate simple_value -> tensor
    scalars = [(v.tag, e.step,
                v.tensor.float_val[0] if v.HasField("tensor")
                else v.simple_value)
               for e in events if e.HasField("summary")
               for v in e.summary.value]
    assert ("train/loss", 10, 1.5) in scalars
    assert ("train/acc", 10, 0.25) in scalars
    assert ("train/loss", 20, 0.75) in scalars


def test_trainer_writes_tb_events(tmp_path):
    from agcn_tpu.train.trainer import Trainer

    dp, lp = _dense_data(tmp_path)
    cfg = _make_cfg(tmp_path, dp, lp, log_interval=1, num_epoch=1)
    Trainer(cfg).start()
    train_ev = glob.glob(os.path.join(cfg.work_dir, "event", "train",
                                      "events.out.tfevents.*"))
    val_ev = glob.glob(os.path.join(cfg.work_dir, "event", "val",
                                    "events.out.tfevents.*"))
    assert train_ev and val_ev
    assert os.path.getsize(train_ev[0]) > 20  # more than the header


def test_work_dir_reuse_guard(tmp_path):
    from agcn_tpu.train.trainer import Trainer

    dp, lp = _dense_data(tmp_path)
    cfg = _make_cfg(tmp_path, dp, lp, num_epoch=1)
    Trainer(cfg).start()
    # same work dir, fresh non-resuming train run -> refused
    cfg2 = _make_cfg(tmp_path, dp, lp, num_epoch=1)
    with pytest.raises(RuntimeError, match="work_dir"):
        Trainer(cfg2)
    # assume_yes overrides the guard
    cfg3 = _make_cfg(tmp_path, dp, lp, num_epoch=1, assume_yes=True)
    Trainer(cfg3)


def test_model_source_snapshot(tmp_path):
    from agcn_tpu.train.trainer import Trainer

    dp, lp = _dense_data(tmp_path)
    cfg = _make_cfg(tmp_path, dp, lp, num_epoch=1)
    Trainer(cfg)
    assert os.path.exists(os.path.join(cfg.work_dir, "agcn.py"))


def test_multicrop_eval_partial_batch(tmp_path):
    """Multi-crop eval where the crop count does not divide the final
    partial batch's row capacity: 10 samples, batch 4, 3 crops -> the last
    batch carries 2 samples (6 rows vs the compiled 12). Score length must
    equal the dataset and padded rows must not leak in."""
    from agcn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n, t, feat, num_class = 10, 40, 150, 3
    data = rng.standard_normal((n, t, feat)).astype(np.float32) * 0.1
    labels = np.arange(n) % num_class
    data[:, 30:] = 0.0
    data[:, :, 75:] = 0.0
    with open(tmp_path / "d.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump(labels, f)

    cfg = Config()
    cfg.work_dir = str(tmp_path / "work_mc")
    cfg.model = "sgn"
    cfg.use_sgn_dataloader = True
    cfg.model_args = {"num_class": num_class, "num_point": 25,
                      "num_segment": 20, "bias": 1, "dropout2d": 0.0}
    feeder_args = {"data_path": str(tmp_path / "d.pkl"),
                   "label_path": str(tmp_path / "l.pkl"),
                   "dataset": "NTU60-CV-SGN",
                   "merge_val_into_train": False}
    cfg.test_feeder_args = dict(feeder_args)
    cfg.test_dataloader_args = {"seg": 20, "multi_test": 3}
    cfg.train_feeder_args = {}
    cfg.test_batch_size = 4
    cfg.phase = "test"
    cfg.mesh_data = 1

    tr = Trainer(cfg)
    # fabricate a checkpoint-free test run: evaluate directly
    accs = tr.evaluate(0, save_score=True)
    assert accs is not None
    score_files = os.listdir(os.path.join(cfg.work_dir, "score"))
    with open(os.path.join(cfg.work_dir, "score", score_files[0]),
              "rb") as f:
        out = pickle.load(f)
    assert len(out) == n  # one score row per real sample, no pad leakage
