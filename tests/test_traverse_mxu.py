"""MXU cluster-intersection kernel (interpret mode on CPU) vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.ops import accumulate as acc_ops
from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.generate import generate_native, generate_stratified
from uvtrace.ops.intersect import brute_force_closest_hit
from uvtrace.ops.traverse_mxu import build_mxu_scene, traverse_mxu, traverse_mxu_slots


@pytest.fixture(scope="module")
def mxu_scene():
    room = make_box_room(subdivisions=6, clutter=3, seed=2)
    cs = build_clusters(room.tris, cluster_size=128)
    return room, build_mxu_scene(cs)


def test_matches_brute_force_stratified(mxu_scene):
    room, ms = mxu_scene
    rays = generate_stratified(jax.random.PRNGKey(0), 2048, (0.0, 0.2, 0.0), 1.0)
    t, hit = traverse_mxu(ms, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit) < 0, np.asarray(id_ref) < 0)
    assert (np.asarray(hit) == np.asarray(id_ref)).mean() > 0.999


def test_matches_brute_force_incoherent(mxu_scene):
    """Uniform (incoherent) rays make the packet frustum cover the whole
    scene — slower (more clusters visited) but still exact."""
    room, ms = mxu_scene
    rays = generate_native(jax.random.PRNGKey(9), 1024, (0.3, -0.2, 0.1), 0.5)
    t, hit = traverse_mxu(ms, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit) < 0, np.asarray(id_ref) < 0)


def test_single_cluster_scene():
    room = make_box_room(subdivisions=2)  # < 128 tris -> one cluster
    cs = build_clusters(room.tris, cluster_size=128)
    assert cs.n_clusters == 1
    ms = build_mxu_scene(cs)
    rays = generate_stratified(jax.random.PRNGKey(1), 1024, (0.0, 0.3, 0.0), 0.5)
    t, hit = traverse_mxu(ms, rays.orig, rays.dir, interpret=True)
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)


def test_high_precision_tier(mxu_scene):
    """bf16x3 production tier: tiny t noise, ~all hits still agree."""
    room, ms = mxu_scene
    rays = generate_stratified(jax.random.PRNGKey(2), 2048, (0.0, 0.2, 0.0), 1.0)
    t, hit = traverse_mxu(ms, rays.orig, rays.dir, interpret=True, precision="high")
    t_ref, id_ref = brute_force_closest_hit(rays.orig, rays.dir, jnp.asarray(room.tris))
    t, hit, t_ref, id_ref = map(np.asarray, (t, hit, t_ref, id_ref))
    assert (hit == id_ref).mean() > 0.995
    same = hit == id_ref
    np.testing.assert_allclose(t[same], t_ref[same], rtol=5e-3)


def test_slot_space_counts_match_id_space(mxu_scene):
    """Gather-free slot-space histogram + bin remap == id-space histogram."""
    room, ms = mxu_scene
    t_count = room.tris.shape[0]
    rays = generate_stratified(jax.random.PRNGKey(4), 2048, (0.1, 0.1, -0.2), 1.0)
    _, slots = traverse_mxu_slots(ms, rays.orig, rays.dir, interpret=True)
    _, ids = traverse_mxu(ms, rays.orig, rays.dir, interpret=True)
    counts_slots = acc_ops.hit_counts(slots, int(ms.tri_idx_flat.shape[0]), "segment")
    remapped = acc_ops.slots_to_tri(counts_slots, ms.tri_idx_flat, t_count)
    direct = acc_ops.hit_counts(ids, t_count, "segment")
    np.testing.assert_array_equal(np.asarray(remapped), np.asarray(direct))
    # dose conservation: every hit lands in exactly one triangle bin
    assert int(np.asarray(remapped).sum()) == int((np.asarray(ids) >= 0).sum())


def test_in_kernel_counts_match_segment(mxu_scene):
    """The kernel's own histogram equals the XLA segment histogram exactly,
    for both coherent and incoherent rays."""
    from uvtrace.ops.traverse_mxu import traverse_mxu_counts

    room, ms = mxu_scene
    n_bins = int(ms.tri_idx_flat.shape[0])
    for rays in (
        generate_stratified(jax.random.PRNGKey(0), 2048, (0.0, 0.2, 0.0), 1.0),
        generate_native(jax.random.PRNGKey(9), 1024, (0.3, -0.2, 0.1), 0.5),
    ):
        t, slot, counts = traverse_mxu_counts(ms, rays.orig, rays.dir, interpret=True)
        ref = acc_ops.hit_counts(slot, n_bins, "segment")
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref))
        assert int(np.asarray(counts).sum()) == int((np.asarray(slot) >= 0).sum())


def test_hbm_tiles_mode_bit_identical(mxu_scene):
    """HBM-resident tiles with per-visit double-buffered DMA (the big-scene
    mode) == VMEM-resident tiles, bit for bit, for coherent and incoherent
    rays and for the in-kernel histogram."""
    from uvtrace.ops.traverse_mxu import traverse_mxu_counts

    room, ms = mxu_scene
    for rays in (
        generate_stratified(jax.random.PRNGKey(0), 2048, (0.0, 0.2, 0.0), 1.0),
        generate_native(jax.random.PRNGKey(9), 2048, (0.3, -0.2, 0.1), 0.5),
    ):
        a = traverse_mxu_slots(ms, rays.orig, rays.dir, interpret=True)
        b = traverse_mxu_slots(
            ms, rays.orig, rays.dir, interpret=True, hbm_tiles=True
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    a = traverse_mxu_counts(ms, rays.orig, rays.dir, interpret=True)
    b = traverse_mxu_counts(ms, rays.orig, rays.dir, interpret=True, hbm_tiles=True)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
