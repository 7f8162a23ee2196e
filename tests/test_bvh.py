"""BVH builder: structural invariants + traversal == brute force."""

import numpy as np
import pytest

from uvtrace.bvh.builder import build_bvh, single_leaf_bvh
from uvtrace.geometry.procedural import make_box_room


def random_tris(rng, n, scale=1.0):
    base = rng.uniform(-1, 1, size=(n, 1, 3))
    offs = rng.uniform(-0.1, 0.1, size=(n, 3, 3)) * scale
    return ((base + offs)).astype(np.float32)


def test_structure_random(rng):
    tris = random_tris(rng, 500)
    bvh = build_bvh(tris)
    bvh.validate(tris)
    assert bvh.n_tris == 500
    assert bvh.tri_count[0] == 0 or bvh.n_nodes == 1


def test_structure_room(small_room):
    bvh = build_bvh(small_room.tris)
    bvh.validate(small_room.tris)
    # SAH on a room must actually subdivide
    assert bvh.n_nodes > 10
    assert bvh.max_depth < 64


def test_max_leaf_size(small_room):
    bvh = build_bvh(small_room.tris, max_leaf_size=4)
    bvh.validate(small_room.tris)
    assert bvh.max_leaf_size <= 4


def test_single_leaf():
    tris = np.zeros((2, 3, 3), np.float32)
    tris[0] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    tris[1] = [[1, 1, 0], [1, 0, 0], [0, 1, 0]]
    bvh = single_leaf_bvh(tris)
    bvh.validate(tris)
    assert bvh.n_nodes == 1 and bvh.tri_count[0] == 2


def test_degenerate_identical_centroids(rng):
    # all centroids identical -> SAH cannot split -> one big leaf (reference
    # behavior: boundsMin == boundsMax on every axis, bvh.cpp:104-105)
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tris = np.repeat(tri, 33, axis=0)
    bvh = build_bvh(tris)
    bvh.validate(tris)
    assert bvh.n_nodes == 1
    # ... unless a bounded leaf size forces median splits
    bvh2 = build_bvh(tris, max_leaf_size=4)
    bvh2.validate(tris)
    assert bvh2.max_leaf_size <= 4
