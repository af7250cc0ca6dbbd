"""The scaling artifact (SCALING_r*.json, VERDICT r3 next #6): schema and
the per-device FLOP-division check — partitioning must DIVIDE work over
the edge shards, not replicate it."""

import json

import pytest


@pytest.mark.slow
def test_scaling_artifact_schema(tmp_path):
    import bench_scaling

    out = tmp_path / "scaling.json"
    artifact = bench_scaling.run(steps=3, out=str(out))
    on_disk = json.loads(out.read_text())
    assert on_disk == artifact

    assert artifact["metric"] == "edge_partition_scaling"
    shards = {r["shards"] for r in artifact["shards"]}
    assert {1, 2, 4, 8} <= shards  # the 8-device virtual mesh covers all
    for row in artifact["shards"]:
        assert row["medges_per_sec"] > 0
    # efficiency recorded for every multi-shard point
    assert set(artifact["efficiency"]) == {"2", "4", "8"}
    # per-device FLOPs must FALL ~1/P vs the 1-shard program: a ratio
    # near 1.0 would mean each device replicates the full aggregation
    ratios = artifact["per_device_flop_ratio_vs_1shard"]
    assert set(ratios) == {"2", "4", "8"}
    for s, ratio in ratios.items():
        assert ratio <= 1.6 / int(s), (s, ratio)
    assert artifact["flop_division_ok"] is True

    # comm evidence (VERDICT r4 next #5): the compiler must schedule
    # ZERO collective bytes at 1 shard, >0 at each multi-shard point,
    # and the compute/comm ratio must fall monotonically with P (each
    # doubling trades compute per device for communication)
    rows = {r["shards"]: r for r in artifact["shards"]}
    assert rows[1]["collective_bytes_per_step"] == 0
    prev_ratio = None
    for s in (2, 4, 8):
        row = rows[s]
        assert row["collective_bytes_per_step"] > 0, s
        assert row["collective_breakdown"], s
        assert row["flops_per_comm_byte"] > 0, s
        if prev_ratio is not None:
            assert row["flops_per_comm_byte"] <= prev_ratio * 1.05, (
                s, row["flops_per_comm_byte"], prev_ratio)
        prev_ratio = row["flops_per_comm_byte"]

    # the hybrid (data=4, edge=2) FULL train step: gradient all-reduce
    # over 'data' must be present alongside the edge-partition ring
    hybrid = artifact["hybrid_train_step"]
    assert hybrid is not None
    assert hybrid["collective_bytes_per_step"] > 0
    assert "all-reduce" in hybrid["collective_breakdown"]
    assert hybrid["flops_per_comm_byte"] > 0
