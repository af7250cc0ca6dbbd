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
