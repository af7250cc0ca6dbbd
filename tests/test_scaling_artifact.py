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
