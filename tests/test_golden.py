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
