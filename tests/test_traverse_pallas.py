"""Pallas packet kernel (interpret mode on CPU) vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.generate import generate_native, generate_stratified
from uvtrace.ops.intersect import brute_force_closest_hit
from uvtrace.ops.traverse_pallas import build_pallas_scene, traverse_pallas


@pytest.fixture(scope="module")
def pallas_scene():
    room = make_box_room(subdivisions=6, clutter=3, seed=2)
    cs = build_clusters(room.tris, cluster_size=128)
    return room, build_pallas_scene(cs)


def test_matches_brute_force_stratified(pallas_scene):
    room, ps = pallas_scene
    rays = generate_stratified(jax.random.PRNGKey(0), 2048, (0.0, 0.2, 0.0), 1.0)
    t, hit = traverse_pallas(ps, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit) < 0, np.asarray(id_ref) < 0)
    assert (np.asarray(hit) == np.asarray(id_ref)).mean() > 0.999


def test_matches_brute_force_incoherent(pallas_scene):
    """Uniform (incoherent) rays are slower but must stay exact — the DFS
    visits whatever each packet needs; there is no budget to overflow."""
    room, ps = pallas_scene
    rays = generate_native(jax.random.PRNGKey(9), 1024, (0.3, -0.2, 0.1), 0.5)
    t, hit = traverse_pallas(ps, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit) < 0, np.asarray(id_ref) < 0)


def test_single_cluster_scene():
    room = make_box_room(subdivisions=2)  # < 128 tris -> one cluster
    cs = build_clusters(room.tris, cluster_size=128)
    assert cs.n_clusters == 1
    ps = build_pallas_scene(cs)
    rays = generate_stratified(jax.random.PRNGKey(1), 1024, (0.0, 0.3, 0.0), 0.5)
    t, hit = traverse_pallas(ps, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
