"""Scene loading: GLB parsing, flattening, floor-height detection."""

import numpy as np
import pytest

from uvtrace.geometry.mesh import TriangleMesh, detect_floor_height
from uvtrace.geometry.procedural import make_box_room, make_single_square


def test_load_testroom(testroom_mesh):
    m = testroom_mesh
    assert m.triangle_count > 100
    assert m.tris.shape == (m.triangle_count, 3, 3)
    assert m.tris.dtype == np.float32
    # scene should span a room-sized AABB
    lo, hi = m.aabb
    assert (hi - lo).max() > 1.0
    assert np.isfinite(m.tris).all()
    # floor below or at zero (reference assumes floor <= 0, mesh.cpp:104)
    assert m.floor_height <= 0.0
    assert m.floor_height >= lo[1] - 1e-3


def test_uvs_shape(testroom_mesh):
    if testroom_mesh.uvs is not None:
        assert testroom_mesh.uvs.shape == (testroom_mesh.triangle_count, 3, 2)


def test_areas_positive(testroom_mesh):
    areas = testroom_mesh.areas
    assert (areas >= 0).all()
    assert areas.sum() > 0


def test_floor_height_histogram():
    # plane of many vertices at y=-1 plus sparse vertices above
    rng = np.random.default_rng(0)
    floor = rng.uniform(-1.0, -0.98, size=(500, 3, 3)).astype(np.float32)
    # slight jitter: vertices exactly at the histogram minimum are dropped by
    # the reference's strict inequalities (mesh.cpp:119-124)
    floor[:, :, 1] = rng.uniform(-1.0, -0.995, size=(500, 3)).astype(np.float32)
    other = rng.uniform(0.5, 1.0, size=(20, 3, 3)).astype(np.float32)
    other[:, :, 1] = rng.uniform(-0.5, 0.0, size=(20, 3))
    tris = np.concatenate([floor, other])
    fh = detect_floor_height(tris)
    # densest bin centered near -1 (bin width = 1/48)
    assert abs(fh - (-1.0 + 0.5 / 48)) < 1.5 / 48


def test_box_room_scaling():
    m1 = make_box_room(subdivisions=2)
    m2 = make_box_room(subdivisions=8, clutter=5)
    assert m2.triangle_count > m1.triangle_count
    assert m1.floor_height <= m1.tris[:, :, 1].max()


def test_calibration_square():
    m = make_single_square(center=(0, 0.8, 1.0), half_width=0.1)
    assert m.triangle_count == 2
    np.testing.assert_allclose(m.areas.sum(), 0.2 * 0.2, rtol=1e-5)
