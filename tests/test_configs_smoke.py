"""Tiny-scale smoke runs of every BASELINE configuration exactly as
CONFIGS.md documents them (same flags, reduced photon counts/resolutions)."""

import json
import os

import numpy as np
import pytest

from uvtrace.cli import main
from uvtrace.io.gltf_export import export_glb

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
SCENE = os.path.join(ASSETS, "testroomopt.glb")


@pytest.fixture(scope="module")
def room_glb(tmp_path_factory):
    from uvtrace.geometry.procedural import make_box_room

    room = make_box_room(subdivisions=3, clutter=1, seed=9)
    path = tmp_path_factory.mktemp("cfg") / "room.glb"
    export_glb(path, room.tris)
    return str(path)


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_config1_dose_grid(room_glb, tmp_path, capsys):
    rc = main(["compute", room_glb, "--photon-count", "4096",
               "--iterations", "1", "--dose-grid", "32", "--no-render",
               "--output", str(tmp_path / "c1")])
    assert rc == 0 and _last_json(capsys)["dose_max"] > 0
    grid = np.load(tmp_path / "c1" / "dose_grid.npy")
    assert grid.shape == (32, 32) and (grid > 0).any()


def test_config2_bounces(room_glb, tmp_path, capsys):
    rc = main(["compute", room_glb, "--photon-count", "2048",
               "--iterations", "1", "--bounces", "4", "--reflectance", "0.25",
               "--no-render", "--output", str(tmp_path / "c2")])
    assert rc == 0
    out = _last_json(capsys)
    assert out["dose_max"] > 0


def test_config3_route_integration(room_glb, tmp_path, capsys):
    rc = main(["compute", room_glb, "--route", os.path.join(ASSETS, "route.xml"),
               "--photon-count", "4096", "--iterations", "1", "--no-render",
               "--output", str(tmp_path / "c3")])
    assert rc == 0 and _last_json(capsys)["dose_max"] > 0


def test_config4_optimize_route(room_glb, tmp_path, capsys):
    out_xml = tmp_path / "opt.xml"
    rc = main(["optimize-route", room_glb,
               "--route", os.path.join(ASSETS, "lange_route.xml"),
               "--steps", "2", "--samples", "2", "--photon-count", "2048",
               "--output", str(out_xml)])
    assert rc == 0
    res = _last_json(capsys)
    assert out_xml.exists() and np.isfinite(res["final_min_dose"])


def test_config5_sharded_texels(room_glb, tmp_path, capsys):
    rc = main(["compute", room_glb, "--photon-count", "8192",
               "--iterations", "1", "--texel-density", "8",
               "--shards", "8", "--texel-shards", "2",
               "--dose-grid", "32", "--no-render",
               "--output", str(tmp_path / "c5")])
    assert rc == 0 and _last_json(capsys)["dose_max"] > 0
