"""only_train_part: PA parameters stay frozen until only_train_epoch
(reference processor.py:612-630)."""

import pickle

import numpy as np

from agcn_tpu.utils.config import Config


def test_pa_frozen_then_trained(tmp_path):
    from agcn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 8
    data = rng.standard_normal((n, 3, 16, 25, 2)).astype(np.float32)
    labels = (np.arange(n) % 3).tolist()
    np.save(tmp_path / "d.npy", data)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)], labels), f)

    cfg = Config()
    cfg.work_dir = str(tmp_path / "w")
    cfg.model = "agcn"
    cfg.model_args = {"num_class": 3, "graph": "ntu_rgb_d"}
    cfg.train_feeder_args = {"data_path": str(tmp_path / "d.npy"),
                             "label_path": str(tmp_path / "l.pkl"),
                             "window_size": 16}
    cfg.test_feeder_args = {}
    cfg.batch_size = 8
    cfg.num_epoch = 1
    cfg.eval_interval = 100
    cfg.save_interval = 100
    cfg.only_train_part = True
    cfg.only_train_epoch = 5  # PA frozen while epoch <= 5
    cfg.base_lr = 0.05
    cfg.log_interval = 1000
    cfg.mesh_data = 1

    tr = Trainer(cfg)
    pa_before = np.asarray(tr.state.params["l1"]["gcn1"]["PA"]).copy()
    fc_before = np.asarray(tr.state.params["fc"]["kernel"]).copy()
    tr.train_epoch(0)
    pa_after = np.asarray(tr.state.params["l1"]["gcn1"]["PA"])
    fc_after = np.asarray(tr.state.params["fc"]["kernel"])
    # frozen up to weight decay (the reference's DDP freeze zeroes grads
    # but torch SGD still decays those params, processor.py:699-702)
    np.testing.assert_allclose(pa_after, pa_before, rtol=1e-3)
    assert not np.allclose(fc_after, fc_before)      # others train

    # past only_train_epoch the PA unfreezes and moves by gradient-scale
    tr.train_epoch(6)
    pa_final = np.asarray(tr.state.params["l1"]["gcn1"]["PA"])
    frozen_drift = np.abs(pa_after - pa_before).max()
    trained_drift = np.abs(pa_final - pa_after).max()
    assert trained_drift > 100 * max(frozen_drift, 1e-12)
