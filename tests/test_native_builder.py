"""Native C++ builder vs NumPy builder: structure, traversal equality, speed."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.bvh import native
from uvtrace.bvh.builder import build_bvh
from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.generate import generate_native
from uvtrace.ops.intersect import brute_force_closest_hit
from uvtrace.ops.traverse import scene_arrays, traverse

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_bvh_structure(small_room):
    bvh = native.build_bvh_native(small_room.tris, max_leaf_size=8)
    bvh.validate(small_room.tris)
    assert bvh.max_leaf_size <= 8


def test_native_bvh_traversal_exact(small_room):
    bvh = native.build_bvh_native(small_room.tris, max_leaf_size=8)
    rays = generate_native(jax.random.PRNGKey(0), 1024, (0.0, 0.0, 0.0), 1.0)
    t, hit = traverse(scene_arrays(bvh), rays.orig, rays.dir, max_leaf=bvh.max_leaf_size)
    t_ref, _ = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(small_room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)


def test_native_clusters(small_room):
    cs = native.build_clusters_native(small_room.tris, cluster_size=32)
    cs.validate(small_room.tris)
    assert cs.cluster_size == 32


def test_native_matches_numpy_partition_quality(small_room):
    """Trees may differ in tie-breaking, but SAH quality (total leaf
    surface-area cost) should be comparable."""

    def cost(bvh):
        leaf = bvh.tri_count > 0
        ext = np.maximum(bvh.node_max[leaf] - bvh.node_min[leaf], 0)
        ha = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
        return float((ha * bvh.tri_count[leaf]).sum())

    c_native = cost(native.build_bvh_native(small_room.tris, max_leaf_size=8))
    c_numpy = cost(build_bvh(small_room.tris, max_leaf_size=8))
    assert c_native < 1.5 * c_numpy


def test_native_speedup_large():
    from uvtrace.geometry.procedural import make_box_room

    room = make_box_room(subdivisions=24, clutter=16)  # ~8k tris
    t0 = time.time()
    native.build_bvh_native(room.tris, max_leaf_size=8)
    t_native = time.time() - t0
    t0 = time.time()
    build_bvh(room.tris, max_leaf_size=8)
    t_numpy = time.time() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
