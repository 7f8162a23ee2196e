"""Clustered two-phase traversal: matches brute force, overflow accounting,
and stratified generation keeps packets within the cluster budget."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.generate import generate_native, generate_stratified
from uvtrace.ops.intersect import brute_force_closest_hit
from uvtrace.ops.traverse_clustered import cluster_arrays, traverse_clustered
from tests.test_traverse import assert_hits_match


def test_cluster_build_partition(small_room):
    cs = build_clusters(small_room.tris, cluster_size=32)
    cs.validate(small_room.tris)
    assert cs.cluster_size == 32
    assert cs.n_clusters >= small_room.triangle_count // 32


def test_clustered_matches_brute_force(small_room):
    cs = build_clusters(small_room.tris, cluster_size=32)
    ca = cluster_arrays(cs)
    rays = generate_native(jax.random.PRNGKey(3), 2048, (0.2, 0.1, -0.3), 1.0)
    # budget >= total clusters => exhaustive, exact
    t, hit, ov = traverse_clustered(
        ca, rays.orig, rays.dir, max_clusters=cs.n_clusters, return_overflow=True
    )
    assert int(ov) == 0
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(small_room.tris))
    assert_hits_match(t, hit, small_room.tris, rays.orig, rays.dir, t_ref, id_ref)


def test_stratified_coherence_small_budget(small_room):
    """With stratified (cone-coherent) packets a small cluster budget must
    reproduce the exhaustive result."""
    cs = build_clusters(small_room.tris, cluster_size=64)
    ca = cluster_arrays(cs)
    rays = generate_stratified(
        jax.random.PRNGKey(5), 8192, (0.0, 0.2, 0.0), 1.0, packet=1024
    )
    t_small, hit_small, ov = traverse_clustered(
        ca, rays.orig, rays.dir, max_clusters=min(16, cs.n_clusters), return_overflow=True
    )
    t_full, hit_full = traverse_clustered(ca, rays.orig, rays.dir, max_clusters=cs.n_clusters)
    if int(ov) == 0:
        np.testing.assert_array_equal(np.asarray(hit_small), np.asarray(hit_full))
    # even with overflow, hit distances can only be >= (dropped clusters)
    assert (np.asarray(t_small) >= np.asarray(t_full) - 1e-5).all()


def test_stratified_distribution():
    rays = generate_stratified(jax.random.PRNGKey(0), 64 * 1024, (0.0, 0.0, 0.0), 1.0)
    d = np.asarray(rays.dir)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert abs(d[:, 1].mean()) < 0.02
    assert abs(np.var(d[:, 1]) - 1 / 3) < 0.01
    # packet coherence: directions within one packet span a small cone
    pkt = d[:1024]
    mean_dir = pkt.mean(axis=0)
    mean_dir /= np.linalg.norm(mean_dir)
    cosines = pkt @ mean_dir
    assert cosines.min() > 0.9, "packet cone too wide"


def test_overflow_counts(small_room):
    """Incoherent rays + tiny budget must report overflow, not silently
    return (possibly wrong) hits."""
    cs = build_clusters(small_room.tris, cluster_size=16)
    ca = cluster_arrays(cs)
    if cs.n_clusters < 4:
        pytest.skip("scene too small to overflow")
    rays = generate_native(jax.random.PRNGKey(1), 1024, (0.0, 0.0, 0.0), 1.0)
    _, _, ov = traverse_clustered(
        ca, rays.orig, rays.dir, max_clusters=2, return_overflow=True
    )
    assert int(ov) > 0
