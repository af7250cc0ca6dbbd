"""Machine-independent communication stats from compiled HLO.

On a single-chip substrate the only forward-looking evidence for
multi-chip scaling quality is what the COMPILER scheduled: how many
bytes move through collectives per step, and how that compares to the
per-device compute. This module parses the post-optimization HLO text
of a compiled program and totals the bytes produced by each collective
kind (all-reduce, all-gather, reduce-scatter, collective-permute,
all-to-all) — the numbers a pod run would push over ICI.

The reference has no counterpart (NCCL volumes are implicit in torch
DDP, main.py:20-41); this is the TPU-native replacement for that
visibility.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f8e4m3fn": 1, "f8e5m2": 1, "s8": 1, "u8": 1, "pred": 1,
    "c128": 16,
}

# collective op kinds, including the async start/done split forms XLA
# emits after scheduling ("all-gather-start" etc.); "done" ops are
# excluded so each transfer counts once
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_OP_RE = re.compile(
    r"=\s+((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?))\s+"
    r"(" + "|".join(_COLLECTIVES) + r")(-start)?\(")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of one shape or a (tuple, of, shapes)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_GROUPS_RE = re.compile(r"replica_groups=\{((?:\{[0-9,]*\},?)+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")
_PAIRS_RE = re.compile(
    r"source_target_pairs=\{((?:\{\d+,\d+\},?)*)\}")


def _moves_data(line: str) -> bool:
    """False for degenerate collectives that move nothing over the
    interconnect: all-singleton replica groups (a 1-shard mesh still
    emits the all-reduce op) and empty/self-only permute pair lists.
    A collective with ANY multi-member group counts."""
    m = _GROUPS_RE.search(line)
    if m:
        groups = re.findall(r"\{([0-9,]*)\}", m.group(1))
        return any(len([x for x in g.split(",") if x]) > 1
                   for g in groups)
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # [groups, group_size]<=[...]
        return int(m.group(2)) > 1
    if "source_target_pairs={}" in line:
        return False
    m = _PAIRS_RE.search(line)
    if m:
        pairs = re.findall(r"\{(\d+),(\d+)\}", m.group(1))
        return any(a != b for a, b in pairs)
    return True  # no group info: count it (conservative)


def collective_bytes(hlo_text: str) -> Dict[str, float]:
    """Per-kind and total collective output bytes of one compiled
    program (per executing device, per step). Degenerate
    single-participant collectives count as zero.

    Uses each collective's RESULT shape — for -start ops whose result
    tuple carries (operand, result, scratch...) aliases this
    over-counts by ~2x consistently, so ratios between configs remain
    meaningful; exact single-shape ops dominate in practice.
    """
    out: Dict[str, float] = {k: 0.0 for k in _COLLECTIVES}
    count = 0
    for m in _OP_RE.finditer(hlo_text):
        line = hlo_text[m.start():hlo_text.find("\n", m.start())]
        if not _moves_data(line):
            continue
        shape_text, kind = m.group(1), m.group(2)
        b = _shape_bytes(shape_text)
        if m.group(3):  # -start: result tuple aliases the operand too
            b //= 2
        out[kind] += b
        count += 1
    out["total_bytes"] = float(sum(out[k] for k in _COLLECTIVES))
    out["n_collectives"] = float(count)
    return out


def program_comm_stats(compiled) -> Dict[str, float]:
    """collective_bytes() of a jax `Compiled` object, plus its cost-model
    FLOPs and the compute/communication ratio (FLOPs per collective
    byte — higher = more headroom to hide the collectives under
    compute on a real interconnect)."""
    stats = collective_bytes(compiled.as_text())
    flops = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    stats["flops"] = flops
    stats["flops_per_comm_byte"] = (
        flops / stats["total_bytes"] if stats["total_bytes"] else 0.0)
    return stats
