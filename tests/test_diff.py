"""Differentiable dose layer: gradient checks vs finite differences (CRN),
cross-validation against the count-based simulator, route optimization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.diff import irradiance, make_diff_scene, optimize_route, route_dose
from uvtrace.geometry.procedural import make_box_room, make_single_square
from uvtrace.io.routexml import LightPos
from uvtrace.sim import SimParams, Simulator, ViewMode


@pytest.fixture(scope="module")
def room_scene():
    room = make_box_room(subdivisions=4, clutter=1, seed=11, floor_y=-1.0)
    return room, make_diff_scene(room)


def test_irradiance_positive_and_finite(room_scene):
    room, scene = room_scene
    e = irradiance(
        scene, jnp.array([0.0, 0.0]), room.floor_height + 0.8, 1.0, 450.0,
        jax.random.PRNGKey(0), n_samples=8,
    )
    e = np.asarray(e)
    assert np.isfinite(e).all() and (e >= 0).all()
    assert (e > 0).mean() > 0.5  # most of a convex-ish room sees the lamp


def test_matches_count_estimator_unoccluded():
    """E[count dose] == analytic G on an unoccluded target: the two
    estimators must agree (cross-validation, SURVEY.md §4)."""
    sq = make_single_square(center=(0.0, 0.5, 2.0), half_width=0.1)
    p = SimParams(photon_count=1 << 20, max_iterations=1, light_length=1.0)
    sim = Simulator(sq, p, route=[LightPos(0.0, 0.0, 1.0)])
    sim.mesh.floor_height = -p.light_height  # rod base at y=0
    sim.compute()
    count_irr = np.asarray(sim.dosage_map(ViewMode.MAX_POWER))  # µW/cm^2

    scene = make_diff_scene(sq)
    e = irradiance(
        scene, jnp.array([0.0, 0.0]), 0.0, 1.0, p.light_intensity,
        jax.random.PRNGKey(1), n_samples=256,
    )
    analytic_irr = 100.0 * np.asarray(e)  # W/m^2 -> µW/cm^2
    np.testing.assert_allclose(count_irr.mean(), analytic_irr.mean(), rtol=0.05)


def test_gradient_matches_finite_difference(room_scene):
    """AD gradient == central FD of the same CRN estimator (the documented
    contract: visibility held fixed, geometry differentiated)."""
    room, scene = room_scene
    key = jax.random.PRNGKey(3)
    base_y = room.floor_height + 0.8

    def f(xz):
        e = irradiance(scene, xz, base_y, 1.0, 450.0, key, n_samples=4)
        return jnp.mean(e)

    x0 = jnp.array([0.3, -0.2])
    g = np.asarray(jax.grad(f)(x0))
    eps = 1e-3
    for i in range(2):
        d = np.zeros(2)
        d[i] = eps
        fd = (float(f(x0 + d)) - float(f(x0 - d))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.08, atol=1e-5)


def test_gradient_wrt_durations(room_scene):
    room, scene = room_scene
    key = jax.random.PRNGKey(4)
    wp = jnp.array([[0.0, 0.0], [0.5, 0.5]])

    def f(durs):
        dose = route_dose(scene, wp, durs, room.floor_height + 0.8, 1.0, 450.0, key,
                          n_samples=2)
        return jnp.mean(dose)

    durs = jnp.array([30.0, 60.0])
    g = np.asarray(jax.grad(f)(durs))
    # dose is linear in durations: gradient equals the per-waypoint mean dose rate
    assert (g > 0).all()
    eps = 1.0
    fd0 = (float(f(durs + jnp.array([eps, 0.0]))) - float(f(durs))) / eps
    np.testing.assert_allclose(g[0], fd0, rtol=1e-4)


def test_route_optimization_improves_min_dose(room_scene):
    room, scene = room_scene
    init_wp = np.array([[1.5, 2.5]])  # corner start
    res = optimize_route(
        scene, init_wp, np.array([60.0]),
        room.floor_height + 0.8, 1.0, 450.0,
        steps=25, learning_rate=0.1, n_samples=2, temperature=10.0,
        optimize_durations=False, seed=0,
    )
    assert len(res.history) == 25
    # loss = -softmin(dose): optimization must reduce it
    assert res.history[-1] < res.history[0]
    assert np.isfinite(res.final_min_dose)
    # waypoint should move toward the room interior
    assert np.linalg.norm(res.waypoints_xz[0]) < np.linalg.norm(init_wp[0])
