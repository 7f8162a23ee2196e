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

PARAMS = SimParams(photon_count=1 << 14, max_iterations=2, seed=1234,
                   light_intensity=450.0)
ROUTE = [LightPos(0.3, -0.4, 45.0), LightPos(-0.6, 0.8, 30.0)]


def _run():
    room = make_box_room(subdivisions=4, clutter=2, seed=77, floor_y=-1.2)
    sim = Simulator(room, PARAMS, route=list(ROUTE))
    sim.compute()
    return (
        np.asarray(sim.dosage_map(ViewMode.DOSAGE)),
        np.asarray(sim.dosage_map(ViewMode.MAX_POWER)),
    )


def test_golden_dose():
    path = os.path.join(GOLDEN, "box_room_dose.npz")
    dose, irr = _run()
    if not os.path.exists(path):  # pragma: no cover - regeneration path
        os.makedirs(GOLDEN, exist_ok=True)
        np.savez_compressed(path, dose=dose, irr=irr)
        pytest.skip("golden regenerated; rerun")
    ref = np.load(path)
    np.testing.assert_allclose(dose, ref["dose"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(irr, ref["irr"], rtol=1e-6, atol=1e-8)
