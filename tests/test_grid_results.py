"""grid_results aggregation test."""

import json
import os
import sys

import yaml

from .conftest import REPO_ROOT

sys.path.insert(0, REPO_ROOT)


def test_grid_results_scrape(tmp_path):
    import grid_results as gr

    for i, acc in enumerate((0.8, 0.9, 0.7)):
        d = tmp_path / f"run{i}"
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"kind": "train", "epoch": 0}) + "\n")
            f.write(json.dumps({"kind": "eval", "epoch": 0,
                                "top1": acc - 0.05}) + "\n")
            f.write(json.dumps({"kind": "eval", "epoch": 1,
                                "top1": acc}) + "\n")
        with open(d / "config.yaml", "w") as f:
            yaml.safe_dump({"base_lr": 0.1 * (i + 1), "seed": i}, f)

    results = gr.main([str(tmp_path / "run*")])
    assert len(results) == 3
    assert abs(max(results.values()) - 0.9) < 1e-9

    # heatmap path
    png = tmp_path / "hm.png"
    gr.main([str(tmp_path / "run*"), "--heatmap", str(png),
             "--row-key", "base_lr", "--col-key", "seed"])
    assert png.exists()


def test_gen_grid_cmulti_preset(tmp_path):
    """The reference's grid_cmulti (grid_resuts.py:6-66): 81 cells over
    (C1,C2) x (C3,C4), each pair in {0.25,0.5,1.0}^2; every generated
    config builds a runnable recipe with its own work_dir."""
    from tools.gen_grid import main as gen_main

    base = os.path.join(REPO_ROOT, "configs", "grid_sgn",
                        "train_seg20_drop0.0.yaml")
    out = tmp_path / "grid_cmulti"
    written = gen_main([base, str(out), "--preset", "cmulti"])
    assert len(written) == 81
    seen = set()
    for path in written:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        cm = tuple(cfg["model_args"]["c_multiplier"])
        assert set(cm) <= {0.25, 0.5, 1.0}
        assert cm not in seen
        seen.add(cm)
        assert cfg["work_dir"] == os.path.dirname(path)


def test_gen_grid_generic_axis_and_slice_heatmap(tmp_path):
    """Generic --axis with a shared '|' key (the reference grid_seg
    changes dataloader seg AND model num_segment together), plus
    grid_results heatmaps keyed on c_multiplier slices."""
    import grid_results as gr
    from tools.gen_grid import main as gen_main

    base = os.path.join(REPO_ROOT, "configs", "grid_sgn",
                        "train_seg20_drop0.0.yaml")
    out = tmp_path / "grid"
    written = gen_main([
        base, str(out),
        "--axis", "train_dataloader_args.seg|test_dataloader_args.seg|"
                  "model_args.num_segment=[20, 30]",
        "--axis", "model_args.c_multiplier[2:4]=[[0.5, 0.5], [1.0, 1.0]]",
    ])
    assert len(written) == 4
    for i, path in enumerate(written):
        with open(path) as f:
            cfg = yaml.safe_load(f)
        assert (cfg["train_dataloader_args"]["seg"]
                == cfg["model_args"]["num_segment"]
                == cfg["test_dataloader_args"]["seg"])
        with open(os.path.join(os.path.dirname(path),
                               "metrics.jsonl"), "w") as f:
            f.write(json.dumps({"kind": "eval", "epoch": 0,
                                "top1": 0.7 + i * 0.05}) + "\n")
        os.rename(path, os.path.join(os.path.dirname(path), "config.yaml"))

    png = tmp_path / "hm.png"
    results = gr.main([str(out / "*"), "--heatmap", str(png),
                       "--row-key", "model_args.num_segment",
                       "--col-key", "model_args.c_multiplier[2:4]"])
    assert len(results) == 4
    assert png.exists()
