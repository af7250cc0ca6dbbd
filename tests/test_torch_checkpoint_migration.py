"""Migration: a reference .pt checkpoint loads into the Trainer and
evaluates identically to the torch model (end-to-end checkpoint path)."""

import os
import pickle

import numpy as np
import pytest

from agcn_tpu.utils.config import Config

from .conftest import add_reference_to_path, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_pt_checkpoint_loads_and_matches(tmp_path):
    add_reference_to_path()
    import torch
    from model.architecture.aagcn.agcn import Model as TorchAGCN

    from agcn_tpu.train.trainer import Trainer

    torch.manual_seed(0)
    ref = TorchAGCN(num_class=4, graph="graph.ntu_rgb_d.Graph",
                    graph_args={"labeling_mode": "spatial"}).eval()
    pt_path = str(tmp_path / "ref-10-100.pt")
    torch.save(ref.state_dict(), pt_path)

    rng = np.random.default_rng(0)
    n = 8
    data = rng.standard_normal((n, 3, 16, 25, 2)).astype(np.float32)
    labels = (np.arange(n) % 4).tolist()
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)], labels), f)

    cfg = Config()
    cfg.work_dir = str(tmp_path / "work")
    cfg.model = "agcn"
    cfg.model_args = {"num_class": 4, "graph": "ntu_rgb_d"}
    cfg.test_feeder_args = {"data_path": str(tmp_path / "data.npy"),
                            "label_path": str(tmp_path / "label.pkl"),
                            "window_size": 16}
    cfg.phase = "test"
    cfg.weights = pt_path
    cfg.test_batch_size = 8
    cfg.mesh_data = 1
    tr = Trainer(cfg)
    accs = tr.evaluate(0)

    # reference accuracy with the same weights
    with torch.no_grad():
        torch.Tensor.cuda = lambda self, *a, **k: self
        logits = ref(torch.from_numpy(data)).numpy()
    ref_acc = (logits.argmax(-1) == np.asarray(labels)).mean()
    np.testing.assert_allclose(accs[1], ref_acc, atol=1e-6)
