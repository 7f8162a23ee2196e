"""The multi-device scaling benchmark harness (BASELINE: ">= 85% efficiency
at 2 hosts" must be *measurable*; round-2 verdict #1). Runs in-process on the
8-virtual-device CPU mesh with a tiny procedural scene."""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # repo-root module (the driver runs it the same way)


def test_scaling_rows_shape_and_efficiency(small_room):
    rows = bench.scaling_rows(
        device_counts=[1, 2], rays_per_device=2048, iters=1, scene_mesh=small_room
    )
    assert [r["devices"] for r in rows] == [1, 2]
    for r in rows:
        # rows must round-trip as JSON lines (the driver parses them)
        parsed = json.loads(json.dumps(r))
        assert parsed["rays_per_sec"] > 0
        assert 0.0 < parsed["efficiency"] <= 1.05
    assert rows[0]["efficiency"] == 1.0


def test_scaling_cli_parses():
    args = bench.parse_args(["--scaling", "--devices", "1", "2", "--iters", "1"])
    assert args.scaling and args.devices == [1, 2]


def test_bench_bounce_row_smoke():
    """`bench --bounce` produces the config-2 row through the product path."""
    import bench
    from uvtrace.geometry.procedural import make_box_room

    row = bench.bounce_row(n=1 << 12, iters=1,
                           scene_mesh=make_box_room(subdivisions=3, seed=3))
    assert row["segments_per_photon"] == 5
    assert row["value"] > 0 and row["unit"] == "rays/s"
