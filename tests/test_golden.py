"""Golden regression tests: fixed-seed dose fields on a deterministic scene
must reproduce the committed snapshots exactly (CPU backend; any change in
RNG streams, traversal, histogramming or unit conversion trips these)."""

import os
import dataclasses

import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.sim import SimParams, Simulator, ViewMode

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# the snapshots pin their RNG streams: one per sampler
PARAMS = SimParams(photon_count=1 << 14, max_iterations=2, seed=1234,
                   light_intensity=450.0, sampler="native")
PARAMS_STRAT = dataclasses.replace(PARAMS, sampler="stratified")
ROUTE = [LightPos(0.3, -0.4, 45.0), LightPos(-0.6, 0.8, 30.0)]


def _run(params):
    room = make_box_room(subdivisions=4, clutter=2, seed=77, floor_y=-1.2)
    sim = Simulator(room, params, route=list(ROUTE))
    sim.compute()
    return (
        np.asarray(sim.dosage_map(ViewMode.DOSAGE)),
        np.asarray(sim.dosage_map(ViewMode.MAX_POWER)),
    )


def _check(name, params):
    path = os.path.join(GOLDEN, name)
    dose, irr = _run(params)
    if not os.path.exists(path):  # pragma: no cover - regeneration path
        os.makedirs(GOLDEN, exist_ok=True)
        np.savez_compressed(path, dose=dose, irr=irr)
        pytest.skip("golden regenerated; rerun")
    ref = np.load(path)
    np.testing.assert_allclose(dose, ref["dose"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(irr, ref["irr"], rtol=1e-6, atol=1e-8)


def test_golden_dose():
    _check("box_room_dose.npz", PARAMS)


def test_golden_dose_stratified():
    _check("box_room_dose_stratified.npz", PARAMS_STRAT)


ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.mark.slow  # ~190 s: 2^18-ray exact-replay golden on the real scene
def test_golden_testroom_scene(testroom_mesh):
    """BASELINE config 1 regression pin: the reference's SHIPPED scene
    (assets/testroomopt.glb) + shipped route (assets/route.xml), fixed seed —
    exact-equality snapshots of the per-triangle dose field, the peak
    irradiance field, and the 256^2 top-down dose grid."""
    from uvtrace.io.routexml import load_route_xml

    r = load_route_xml(os.path.join(ASSETS, "route.xml"))
    params = dataclasses.replace(
        r.apply_to(PARAMS_STRAT),
        photon_count=1 << 14,  # golden-sized; route.xml asks for 2^25
        max_iterations=1,
        seed=1234,
    )
    sim = Simulator(testroom_mesh, params, route=r.waypoints)
    sim.compute()
    dose = np.asarray(sim.dosage_map(ViewMode.DOSAGE))
    irr = np.asarray(sim.dosage_map(ViewMode.MAX_POWER))
    grid = np.asarray(sim.dose_grid(res=256))
    assert dose.shape == (44866,) and grid.shape == (256, 256)
    assert dose.max() > 0 and grid.max() > 0
    path = os.path.join(GOLDEN, "testroom_dose.npz")
    if not os.path.exists(path):  # pragma: no cover - regeneration path
        os.makedirs(GOLDEN, exist_ok=True)
        np.savez_compressed(path, dose=dose, irr=irr, grid=grid)
        pytest.skip("golden regenerated; rerun")
    ref = np.load(path)
    np.testing.assert_allclose(dose, ref["dose"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(irr, ref["irr"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(grid, ref["grid"], rtol=1e-6, atol=1e-8)
