"""Traversal correctness: BVH closest-hit == brute force over all triangles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.bvh.builder import build_bvh, single_leaf_bvh
from uvtrace.ops.generate import generate_native
from uvtrace.ops.intersect import BIG, brute_force_closest_hit, intersect_tri
from uvtrace.ops.traverse import scene_arrays, traverse


def assert_hits_match(t_bvh, hit_orig, tris, orig, direction, t_ref, id_ref):
    t_bvh, t_ref = np.asarray(t_bvh), np.asarray(t_ref)
    hit_orig, id_ref = np.asarray(hit_orig), np.asarray(id_ref)
    # distances must agree everywhere (ties resolve to equal t)
    np.testing.assert_allclose(t_bvh, t_ref, rtol=1e-5)
    # ids: either identical, or a genuine tie (the reported triangle achieves
    # the same closest distance) — shared-edge hits legitimately resolve to
    # different triangles depending on visit order
    np.testing.assert_array_equal(hit_orig < 0, id_ref < 0)  # miss <=> miss
    differ = (hit_orig != id_ref) & (hit_orig >= 0)
    if differ.any():
        tris_np = np.asarray(tris)
        sel = np.where(differ)[0]
        t_check = np.asarray(
            intersect_tri(
                jnp.asarray(np.asarray(orig)[sel]),
                jnp.asarray(np.asarray(direction)[sel]),
                jnp.asarray(tris_np[hit_orig[sel], 0]),
                jnp.asarray(tris_np[hit_orig[sel], 1]),
                jnp.asarray(tris_np[hit_orig[sel], 2]),
            )
        )
        np.testing.assert_allclose(t_check, t_ref[sel], rtol=1e-5)


def assert_matches_brute_force(bvh, tris, orig, direction):
    scene = scene_arrays(bvh)
    t_bvh, hit_orig = traverse(scene, orig, direction, max_leaf=bvh.max_leaf_size)
    t_ref, id_ref = brute_force_closest_hit(orig, direction, jnp.asarray(tris))
    assert_hits_match(t_bvh, hit_orig, tris, orig, direction, t_ref, id_ref)


def test_intersect_tri_basic():
    # unit triangle in z=1 plane, ray from origin through it
    t = intersect_tri(
        jnp.zeros(3),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, 1.0]),
        jnp.array([3.0, -1.0, 1.0]),
        jnp.array([-1.0, 3.0, 1.0]),
    )
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)
    # reversed direction misses (t > 1e-4 clip)
    t2 = intersect_tri(
        jnp.zeros(3),
        jnp.array([0.0, 0.0, -1.0]),
        jnp.array([-1.0, -1.0, 1.0]),
        jnp.array([3.0, -1.0, 1.0]),
        jnp.array([-1.0, 3.0, 1.0]),
    )
    assert float(t2) >= 1e29


def test_traverse_room_interior_rays(small_room, rng):
    bvh = build_bvh(small_room.tris, max_leaf_size=8)
    rays = generate_native(jax.random.PRNGKey(0), 2000, (0.0, 0.0, 0.0), 1.0)
    assert_matches_brute_force(bvh, small_room.tris, rays.orig, rays.dir)
    # interior rays in a closed room must all hit something
    t, hit = traverse(scene_arrays(bvh), rays.orig, rays.dir, max_leaf=bvh.max_leaf_size)
    assert (np.asarray(hit) >= 0).all()


def test_traverse_random_soup(rng):
    n = 400
    base = rng.uniform(-1, 1, size=(n, 1, 3))
    tris = (base + rng.uniform(-0.15, 0.15, size=(n, 3, 3))).astype(np.float32)
    bvh = build_bvh(tris)
    origs = rng.uniform(-2, 2, size=(1000, 3)).astype(np.float32)
    dirs = rng.normal(size=(1000, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    assert_matches_brute_force(bvh, tris, jnp.asarray(origs), jnp.asarray(dirs))


def test_traverse_single_leaf_equals_bvh(rng):
    n = 64
    base = rng.uniform(-1, 1, size=(n, 1, 3))
    tris = (base + rng.uniform(-0.2, 0.2, size=(n, 3, 3))).astype(np.float32)
    origs = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    slb = single_leaf_bvh(tris)
    b = build_bvh(tris)
    t1, _ = traverse(scene_arrays(slb), jnp.asarray(origs), jnp.asarray(dirs), max_leaf=slb.max_leaf_size)
    t2, _ = traverse(scene_arrays(b), jnp.asarray(origs), jnp.asarray(dirs), max_leaf=b.max_leaf_size)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)


def test_axis_aligned_rays(small_room):
    """Rays with zero direction components exercise the inf inv_dir path of
    the slab test (cl/extend.cl:31-36 divides by zero the same way)."""
    bvh = build_bvh(small_room.tris, max_leaf_size=8)
    origs = np.array(
        [[0, 0, 0], [0.1, 0.2, 0.3], [0, 0, 0], [0.5, -0.5, 0.5]], np.float32
    )
    dirs = np.array([[0, -1, 0], [0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float32)
    assert_matches_brute_force(bvh, small_room.tris, jnp.asarray(origs), jnp.asarray(dirs))
