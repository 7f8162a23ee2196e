"""GLB export/import roundtrip, PNG codec, texture view mode."""

import io
import os

import numpy as np
import pytest

from uvtrace.geometry.gltf import load_glb
from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.gltf_export import export_glb
from uvtrace.io.png import decode_png, read_png, write_png


def _encode_png_bytes(img):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        write_png(f.name, img)
        return open(f.name, "rb").read()


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (20, 31, 3)).astype(np.uint8)
    write_png(tmp_path / "a.png", img)
    back = read_png(tmp_path / "a.png")
    np.testing.assert_array_equal(back, img)


def test_glb_roundtrip_plain(tmp_path, small_room):
    export_glb(tmp_path / "room.glb", small_room.tris)
    mesh = load_glb(tmp_path / "room.glb")
    assert mesh.triangle_count == small_room.triangle_count
    np.testing.assert_allclose(mesh.tris, small_room.tris, rtol=1e-6)
    np.testing.assert_allclose(mesh.floor_height, small_room.floor_height, atol=1e-5)


def test_glb_roundtrip_textured(tmp_path, rng):
    room = make_box_room(subdivisions=2)
    t = room.triangle_count
    uvs = rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)
    tex = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    export_glb(
        tmp_path / "t.glb", room.tris, uvs=uvs, texture_png=_encode_png_bytes(tex)
    )
    mesh = load_glb(tmp_path / "t.glb")
    assert mesh.uvs is not None
    np.testing.assert_allclose(mesh.uvs, uvs, rtol=1e-6)
    assert mesh.texture is not None
    np.testing.assert_array_equal(mesh.texture, tex)
    # texture view colors sample the scan
    colors = mesh.flat_texture_colors()
    assert colors.shape == (t, 3)
    assert (colors >= 0).all() and (colors <= 1).all()


def test_flat_texture_colors_without_texture(small_room):
    c = small_room.flat_texture_colors()
    np.testing.assert_array_equal(c, np.ones((small_room.triangle_count, 3), np.float32))


def test_simulator_export_glb(tmp_path, small_room):
    from uvtrace.io.routexml import LightPos
    from uvtrace.sim import SimParams, Simulator, ViewMode

    sim = Simulator(
        small_room, SimParams(photon_count=1 << 12, max_iterations=1),
        route=[LightPos(0, 0, 1.0)],
    )
    sim.compute()
    sim.export_glb(tmp_path / "dose.glb", ViewMode.DOSAGE)
    mesh = load_glb(tmp_path / "dose.glb")
    assert mesh.triangle_count == small_room.triangle_count
