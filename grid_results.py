#!/usr/bin/env python
"""Grid-search result aggregation.

Parity target: reference grid_resuts.py: scrape final accuracies across a
grid of work dirs and render heatmaps. Ours reads the structured
metrics.jsonl each Trainer writes instead of fixed log-line offsets.

Usage:
    python grid_results.py work_dir/grid_*/ --metric top1
    python grid_results.py work_dir/grid_*/ --heatmap rows.png \
        --row-key seg --col-key dropout
"""

import argparse
import glob
import json
import os
from typing import Dict, Optional

import yaml


def best_metric(work_dir: str, metric: str = "top1") -> Optional[float]:
    path = os.path.join(work_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "eval" and metric in rec:
                best = max(best or 0.0, rec[metric])
    return best


def run_config(work_dir: str) -> Dict:
    path = os.path.join(work_dir, "config.yaml")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+")
    p.add_argument("--metric", default="top1")
    p.add_argument("--heatmap", default=None)
    p.add_argument("--row-key", default=None)
    p.add_argument("--col-key", default=None)
    args = p.parse_args(argv)

    dirs = sorted(d for pattern in args.dirs for d in glob.glob(pattern))
    results = {}
    for d in dirs:
        val = best_metric(d, args.metric)
        if val is not None:
            results[d] = val
            print(f"{d}: {args.metric}={val:.4f}")

    if args.heatmap and args.row_key and args.col_key:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        def dig(cfg, dotted):
            """Resolve a dotted key; a trailing [i] / [i:j] indexes a
            list value (e.g. model_args.c_multiplier[0:2] for the
            reference's cmulti grid axes, grid_resuts.py:6-66)."""
            from tools.gen_grid import parse_key

            path, idx = parse_key(dotted)
            node = cfg
            for part in path:
                node = node.get(part, {}) if isinstance(node, dict) else {}
            if isinstance(node, dict):
                return None
            if idx is not None:
                if isinstance(idx, slice) and (
                        not isinstance(node, list)
                        or idx.stop > len(node)):
                    # a short slice would silently collapse distinct
                    # configs into one heatmap key — fail loudly
                    raise ValueError(
                        f"key {dotted!r}: [{idx.start}:{idx.stop}] is "
                        f"out of range for value {node!r}")
                try:
                    node = node[idx]
                except (TypeError, IndexError):
                    return None
            return tuple(node) if isinstance(node, list) else node

        rows, cols, cells = set(), set(), {}
        for d, val in results.items():
            cfg = run_config(d)
            r, c = dig(cfg, args.row_key), dig(cfg, args.col_key)
            if r is None or c is None:
                continue
            rows.add(r)
            cols.add(c)
            cells[(r, c)] = val
        rows, cols = sorted(rows), sorted(cols)
        mat = np.full((len(rows), len(cols)), np.nan)
        for (r, c), val in cells.items():
            mat[rows.index(r), cols.index(c)] = val
        fig, ax = plt.subplots()
        im = ax.imshow(mat)
        ax.set_xticks(range(len(cols)), [str(c) for c in cols])
        ax.set_yticks(range(len(rows)), [str(r) for r in rows])
        ax.set_xlabel(args.col_key)
        ax.set_ylabel(args.row_key)
        fig.colorbar(im)
        fig.savefig(args.heatmap, dpi=150, bbox_inches="tight")
        print(f"heatmap saved: {args.heatmap}")

    return results


if __name__ == "__main__":
    main()
