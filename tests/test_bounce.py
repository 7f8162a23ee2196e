"""Multi-bounce diffuse interreflection (Russian roulette) — BASELINE
config 2 superset semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.ops.bounce import cosine_hemisphere, orthonormal_basis
from uvtrace.sim import SimParams, Simulator


def test_onb_orthonormal(rng):
    n = rng.normal(size=(500, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t1, t2 = orthonormal_basis(jnp.asarray(n, jnp.float32))
    t1, t2 = np.asarray(t1), np.asarray(t2)
    for a, b in [(t1, t2), (t1, n), (t2, n)]:
        dots = np.abs(np.sum(a * b, axis=1))
        assert dots.max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(t1, axis=1), 1.0, atol=1e-5)


def test_cosine_hemisphere_distribution():
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (20000, 3))
    d = np.asarray(cosine_hemisphere(jax.random.PRNGKey(0), n))
    assert (d[:, 1] > 0).all()  # all in the hemisphere
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # cosine-weighted: E[cos theta] = 2/3
    assert abs(d[:, 1].mean() - 2 / 3) < 0.01


@pytest.fixture(scope="module")
def room():
    return make_box_room(subdivisions=4, clutter=1, seed=5, floor_y=-1.0)


def _total_counts(room, bounces, rho, n=1 << 15):
    p = SimParams(
        photon_count=n, max_iterations=1, max_bounces=bounces, reflectance=rho, seed=3
    )
    sim = Simulator(room, p, route=[LightPos(0.0, 0.0, 1.0)])
    sim.compute()
    return float(jnp.sum(sim.photon_map)), sim


def test_zero_bounces_matches_reference_mode(room):
    t0, _ = _total_counts(room, 0, 0.0)
    t1, _ = _total_counts(room, 4, 0.0)  # rho=0 -> RR kills everything
    assert t0 == t1


def test_bounce_deposits_grow_geometrically(room):
    """With survival prob rho, expected total deposits ~ N * (1-rho^{B+1})/(1-rho)
    for B bounces in a closed room (every bounce hits something)."""
    n = 1 << 15
    rho = 0.5
    t0, _ = _total_counts(room, 0, rho, n)
    t4, _ = _total_counts(room, 4, rho, n)
    hit_frac = t0 / n
    expected = t0 * (1 - rho**5) / (1 - rho)
    assert abs(t4 - expected) / expected < 0.05, (t4, expected)


def test_bounce_spreads_dose(room):
    """Interreflection must deposit dose on triangles the lamp cannot see
    directly (e.g. shadowed faces) — coverage strictly grows."""
    _, sim0 = _total_counts(room, 0, 0.9, 1 << 16)
    _, sim4 = _total_counts(room, 4, 0.9, 1 << 16)
    cov0 = float((sim0.photon_map > 0).mean())
    cov4 = float((sim4.photon_map > 0).mean())
    assert cov4 >= cov0


def test_per_triangle_reflectance(room):
    p = SimParams(photon_count=1 << 14, max_iterations=1, max_bounces=2, reflectance=0.0)
    sim = Simulator(room, p, route=[LightPos(0.0, 0.0, 1.0)])
    sim.set_reflectance(np.linspace(0.0, 0.8, room.triangle_count).astype(np.float32))
    sim.compute()
    assert float(jnp.sum(sim.photon_map)) > 0


def test_bounce_mxu_slot_space_matches_clustered(room):
    """The mxu backend's gather-free slot-space bounce path (launch.py
    contract: geometry pre-expanded to slot space, histograms stay in slot
    space across bounces — round-2 verdict #6) produces bit-identical counts
    to the clustered backend's original-id path at depth 1: same photons,
    same bounce RNG, both traversals exact, and the histogram is
    order-invariant. (Depth >= 2 cannot be bit-compared across backends: the
    mxu path coherence-sorts bounce rays between segments, so later RR draws
    pair with permuted lanes — checked statistically instead.)"""
    params = SimParams(
        photon_count=4096, max_iterations=1, max_bounces=1, reflectance=0.6,
        precision="highest",
    )

    def run(backend, bounces):
        sim = Simulator(
            room,
            dataclasses.replace(params, traversal=backend, max_bounces=bounces),
            route=[LightPos(0.2, -0.1, 1.0)],
            ray_chunk=1024,
            max_clusters=1 << 30,  # budget-free: exact like the mxu kernel
        )
        sim.run_iteration()
        return np.asarray(sim.photon_map)

    np.testing.assert_array_equal(run("clustered", 1), run("mxu", 1))
    m_c, m_m = run("clustered", 2), run("mxu", 2)
    assert m_m.sum() > 4096  # bounces deposited extra dose
    # depth-2 deposits agree statistically (same RR survival law)
    assert abs(m_c.sum() - m_m.sum()) / m_c.sum() < 0.05
