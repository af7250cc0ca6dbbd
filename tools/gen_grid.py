#!/usr/bin/env python
"""Grid-search config generator.

Parity target: the reference ran three real grids (grid_resuts.py:6-133):
`grid_cmulti` — 81 runs over c_multiplier with rows (C1,C2) and columns
(C3,C4) each in {0.25,0.5,1.0}^2; `grid_seg` — a 1-D sweep over the
segment count; `grid_dropout` — a 1-D sweep over dropout. The reference
materialized these as ad-hoc work-dir trees scraped by fixed log-line
offsets; here a generator emits one config per grid cell from a base
recipe, and grid_results.py aggregates the structured metrics.jsonl.

Usage:
    # the reference's 81-run c_multiplier grid
    python tools/gen_grid.py configs/ntu60_xview/train_sgn_v14.yaml \
        work_dir/grid_cmulti --preset cmulti

    # generic axes: dotted keys, optional [i:j] list-slice target,
    # '|' to apply one value to several keys, RHS = YAML list of values
    python tools/gen_grid.py base.yaml out/ \
        --axis 'model_args.c_multiplier[0:2]=[[0.25,0.25],[1.0,1.0]]' \
        --axis 'train_dataloader_args.seg|test_dataloader_args.seg|model_args.num_segment=[20,30]'

Then train each cell (python main.py --config <cell>/config.yaml) and
aggregate:
    python grid_results.py 'work_dir/grid_cmulti/*' --metric top1 \
        --heatmap grid.png --row-key 'model_args.c_multiplier[0:2]' \
        --col-key 'model_args.c_multiplier[2:4]'
"""

import argparse
import copy
import itertools
import os
import re
import sys
from typing import Any, List, Tuple

import yaml

_SLICE = re.compile(r"^(.*?)\[(\d+)(?::(\d+))?\]$")


def parse_key(key: str) -> Tuple[List[str], Any]:
    """'a.b[0:2]' -> (['a','b'], slice(0,2)); 'a.b[1]' -> (['a','b'], 1);
    'a.b' -> (['a','b'], None)."""
    m = _SLICE.match(key)
    idx = None
    if m:
        key = m.group(1)
        idx = (slice(int(m.group(2)), int(m.group(3))) if m.group(3)
               else int(m.group(2)))
    return key.split("."), idx


def set_key(cfg: dict, key: str, value: Any) -> None:
    path, idx = parse_key(key)
    node = cfg
    for part in path[:-1]:
        node = node.setdefault(part, {})
    if idx is None:
        node[path[-1]] = value
    else:
        tgt = list(node[path[-1]])  # must exist in the base recipe
        if isinstance(idx, slice):
            if len(value) != idx.stop - idx.start:
                raise ValueError(
                    f"{key}: value {value!r} does not fill [{idx.start}:"
                    f"{idx.stop}]")
            tgt[idx] = list(value)
        else:
            tgt[idx] = value
        node[path[-1]] = tgt


def _tok(v: Any) -> str:
    if isinstance(v, (list, tuple)):
        return "-".join(_tok(x) for x in v)
    return str(v).replace(".", "p")


PAIRS = [[a, b] for a in (0.25, 0.5, 1.0) for b in (0.25, 0.5, 1.0)]
PRESETS = {
    # reference grid_cmulti (grid_resuts.py:6-66): (C1,C2) x (C3,C4)
    "cmulti": [
        ("model_args.c_multiplier[0:2]", PAIRS),
        ("model_args.c_multiplier[2:4]", PAIRS),
    ],
    # reference grid_seg (grid_resuts.py:68-97): 1-D over segments —
    # seg feeds the dataloader AND the model's num_segment
    "seg": [
        ("train_dataloader_args.seg|test_dataloader_args.seg|"
         "model_args.num_segment", [10, 15, 20, 25, 30]),
    ],
    # reference grid_dropout (grid_resuts.py:99-129)
    "dropout": [
        ("model_args.dropout", [0.0, 0.1, 0.2, 0.3, 0.4, 0.5]),
    ],
}


def generate(base_path: str, out_dir: str,
             axes: List[Tuple[str, List[Any]]]) -> List[str]:
    with open(base_path) as f:
        base = yaml.safe_load(f)
    keys = [k for k, _ in axes]
    written = []
    for combo in itertools.product(*(vals for _, vals in axes)):
        cfg = copy.deepcopy(base)
        parts = []
        for key, value in zip(keys, combo):
            for k in key.split("|"):
                set_key(cfg, k, value)
            parts.append(
                f"{key.split('|')[0].split('.')[-1].split('[')[0]}"
                f"{_tok(value)}")
        name = "_".join(parts)
        cell = os.path.join(out_dir, name)
        os.makedirs(cell, exist_ok=True)
        cfg["work_dir"] = cell
        path = os.path.join(cell, "config.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("base", help="base recipe yaml")
    p.add_argument("out_dir", help="grid root; one subdir per cell")
    p.add_argument("--preset", choices=sorted(PRESETS),
                   help="one of the reference's grids")
    p.add_argument("--axis", action="append", default=[],
                   metavar="KEY=YAML_LIST",
                   help="dotted key (|-joined for shared values, "
                        "[i] / [i:j] for list slices) = YAML list of "
                        "grid values")
    args = p.parse_args(argv)

    axes: List[Tuple[str, List[Any]]] = []
    if args.preset:
        axes += PRESETS[args.preset]
    for spec in args.axis:
        key, _, rhs = spec.partition("=")
        if not rhs:
            p.error(f"--axis {spec!r}: expected KEY=YAML_LIST")
        vals = yaml.safe_load(rhs)
        if not isinstance(vals, list):
            p.error(f"--axis {spec!r}: RHS must be a YAML list")
        axes.append((key.strip(), vals))
    if not axes:
        p.error("no axes: pass --preset and/or --axis")

    written = generate(args.base, args.out_dir, axes)
    print(f"{len(written)} configs under {args.out_dir}")
    return written


if __name__ == "__main__":
    main()
