"""SGN with MMD + fsim auxiliary losses trains end to end."""

import os
import pickle

import numpy as np

from agcn_tpu.utils.config import Config


def test_sgn_with_mmd_and_fsim(tmp_path):
    from agcn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n, t, feat, num_class = 8, 40, 150, 3
    data = rng.standard_normal((n, t, feat)).astype(np.float32) * 0.1
    labels = np.arange(n) % num_class
    data[:, 30:] = 0.0
    data[:, :, 75:] = 0.0
    with open(tmp_path / "d.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump(labels, f)

    cfg = Config()
    cfg.work_dir = str(tmp_path / "work")
    cfg.model = "sgn"
    cfg.use_sgn_dataloader = True
    cfg.model_args = {"num_class": num_class, "dropout2d": 0.0,
                      "multi_t": [[], [], [3, 5]]}
    feeder = {"data_path": str(tmp_path / "d.pkl"),
              "label_path": str(tmp_path / "l.pkl"),
              "dataset": "NTU60-CV-SGN", "merge_val_into_train": False}
    cfg.train_feeder_args = dict(feeder)
    cfg.test_feeder_args = dict(feeder)
    cfg.train_dataloader_args = {"seg": 20, "multi_test": 1}
    cfg.test_dataloader_args = {"seg": 20, "multi_test": 1}
    cfg.batch_size = 4
    cfg.test_batch_size = 4
    cfg.num_epoch = 1
    cfg.eval_interval = 1
    cfg.optimizer = "Adam"
    cfg.base_lr = 1e-3
    cfg.mmd_lambda1 = 0.1
    cfg.mmd_lambda2 = 0.1
    cfg.fsim_mode = 1
    cfg.fsim_alpha = [0.5]
    cfg.mesh_data = 1

    tr = Trainer(cfg)
    tr.start()
    metrics_file = os.path.join(cfg.work_dir, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    import json

    with open(metrics_file) as f:
        recs = [json.loads(line) for line in f]
    train_recs = [r for r in recs if r["kind"] == "train"]
    assert "mmd" in train_recs[-1] and "fsim" in train_recs[-1]
    assert np.isfinite(train_recs[-1]["mmd"])
