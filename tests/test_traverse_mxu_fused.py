"""fused_trace_counts (generate+trace+histogram in ONE Pallas kernel) —
now a product backend (traversal="mxu-fused", round-2 verdict #2). Interpret
mode on CPU = the exact kernel code path the TPU compiles.

The critical invariants pinned here:
  1. tracing the kernel's OWN generated rays through the split kernel
     reproduces (t, slot, counts) bit-exactly — the in-kernel Möller-Trumbore
     and histogram agree with the split path;
  2. the in-kernel stratified generator emits rays inside the analytic
     stratum cells of ops/generate._stratum_grid — the bound the frustum
     culling relies on (a silent grid mismatch would drop hits);
  3. the Simulator product path (single-device and sharded) runs it and
     conserves photons.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.generate import _stratum_grid
from uvtrace.ops.traverse_mxu import (
    build_mxu_scene,
    fused_trace_counts,
    traverse_mxu_counts,
)

PACKET = 1024


@pytest.fixture(scope="module")
def scene_room():
    room = make_box_room(subdivisions=4, clutter=2, seed=5)
    cs = build_clusters(room.tris, cluster_size=64)
    return room, build_mxu_scene(cs)


def test_fused_matches_split_on_own_rays(scene_room):
    """with_rays=True exposes the in-kernel rays; the split kernel must
    reproduce the fused kernel's (t, slot, counts) bit-exactly on them."""
    room, scene = scene_room
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    n = 4 * PACKET
    t_f, slot_f, counts_f, orig, direction = fused_trace_counts(
        scene, jax.random.PRNGKey(3), lamp, 1.0, n,
        interpret=True, precision="highest", with_rays=True,
    )
    t_s, slot_s, counts_s = traverse_mxu_counts(
        scene, orig, direction, interpret=True, precision="highest"
    )
    np.testing.assert_array_equal(np.asarray(slot_f), np.asarray(slot_s))
    np.testing.assert_array_equal(np.asarray(counts_f), np.asarray(counts_s))
    # misses carry t=BIG in both
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_s), rtol=0, atol=0)
    assert int(np.asarray(counts_f).sum()) == n  # closed room: all land


def test_fused_packet_parameter(scene_room):
    """round-4 verdict weak #5: the fused path takes packet= like the split
    kernel. A non-default packet must (a) still match the split kernel
    bit-exactly on its own rays (the split kernel consumes the same packet
    width), (b) conserve photons in a closed room."""
    room, scene = scene_room
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    n = 4 * PACKET
    t_f, slot_f, counts_f, orig, direction = fused_trace_counts(
        scene, jax.random.PRNGKey(6), lamp, 1.0, n,
        interpret=True, precision="highest", with_rays=True, packet=2048,
    )
    assert t_f.shape == (n,) and slot_f.shape == (n,)
    assert int(np.asarray(counts_f).sum()) == n  # closed room: all land
    t_s, slot_s, counts_s = traverse_mxu_counts(
        scene, orig, direction, interpret=True, precision="highest",
        packet=2048,
    )
    np.testing.assert_array_equal(np.asarray(slot_f), np.asarray(slot_s))
    np.testing.assert_array_equal(np.asarray(counts_f), np.asarray(counts_s))


def test_fused_rays_lie_in_stratum_cells(scene_room):
    """The in-kernel generator's stratum grid must match
    ops/generate._stratum_grid (same parameterization: dir_y/phi cell of
    packet g, rod-height band) — the frustum bounds assume it."""
    room, scene = scene_room
    lamp = np.array([0.2, room.floor_height + 0.8, -0.1], np.float32)
    n = 8 * PACKET
    _, _, _, orig, direction = fused_trace_counts(
        scene, jax.random.PRNGKey(11), jnp.asarray(lamp), 1.0, n,
        interpret=True, precision="highest", with_rays=True,
    )
    gh, gy, gphi = _stratum_grid(n // PACKET, height_bands=4)
    d = np.asarray(direction).reshape(-1, PACKET, 3)
    o = np.asarray(orig).reshape(-1, PACKET, 3)
    for g in range(n // PACKET):
        ih, iy, ip = g // (gy * gphi), (g // gphi) % gy, g % gphi
        # dir_y in the cell [-1 + 2 iy/gy, -1 + 2 (iy+1)/gy]
        ylo, yhi = -1 + 2 * iy / gy, -1 + 2 * (iy + 1) / gy
        assert (d[g, :, 1] >= ylo - 1e-6).all() and (d[g, :, 1] <= yhi + 1e-6).all()
        # azimuth in the sector [2pi ip/gphi, 2pi (ip+1)/gphi]
        phi = np.arctan2(d[g, :, 2], d[g, :, 0]) % (2 * np.pi)
        plo, phi_hi = 2 * np.pi * ip / gphi, 2 * np.pi * (ip + 1) / gphi
        horiz = np.hypot(d[g, :, 0], d[g, :, 2]) > 1e-6
        ok = (phi[horiz] >= plo - 1e-4) & (phi[horiz] <= phi_hi + 1e-4)
        assert ok.all(), (g, phi[horiz][~ok])
        # origin height in the rod band [ly + ih/gh, ly + (ih+1)/gh] * len
        oylo = lamp[1] + ih / gh
        oyhi = lamp[1] + (ih + 1) / gh
        assert (o[g, :, 1] >= oylo - 1e-6).all() and (o[g, :, 1] <= oyhi + 1e-6).all()
        # unit directions
        np.testing.assert_allclose(
            np.linalg.norm(d[g], axis=-1), 1.0, atol=1e-5
        )


def test_simulator_mxu_fused_backend(scene_room):
    """traversal='mxu-fused' through the product Simulator: photons conserve
    and the dose map is nonzero; bounce mode transparently falls back to the
    split path (needs per-ray hits)."""
    from uvtrace.io.routexml import LightPos
    from uvtrace.sim import SimParams, Simulator

    room, _ = scene_room
    sim = Simulator(
        room,
        SimParams(photon_count=4 * PACKET, max_iterations=1,
                  traversal="mxu-fused", precision="highest"),
        route=[LightPos(0.0, 0.0, 1.0)],
        ray_chunk=2 * PACKET,
    )
    assert sim._fused_counts is not None
    sim.run_iteration()
    counts = np.asarray(sim.photon_map)
    assert int(counts.sum()) == 4 * PACKET  # closed room
    # bounce mode: same backend constructs, falls back to split traversal
    simb = Simulator(
        room,
        SimParams(photon_count=2 * PACKET, max_iterations=1,
                  traversal="mxu-fused", precision="highest",
                  max_bounces=1, reflectance=0.5),
        route=[LightPos(0.0, 0.0, 1.0)],
        ray_chunk=2 * PACKET,
    )
    simb.run_iteration()
    assert np.asarray(simb.photon_map).sum() > 2 * PACKET  # bounces add hits


def test_simulator_mxu_fused_sharded_bitexact(scene_room):
    """mxu-fused under shard_map: 1 device == 4 devices bit-exact (the fused
    kernel folds the GLOBAL chunk index into its in-kernel RNG key)."""
    from uvtrace.io.routexml import LightPos
    from uvtrace.parallel import make_ray_mesh
    from uvtrace.sim import SimParams, Simulator

    room, _ = scene_room
    maps = {}
    for nd in (None, 4):
        sim = Simulator(
            room,
            SimParams(photon_count=4 * PACKET, max_iterations=1,
                      traversal="mxu-fused", precision="highest"),
            route=[LightPos(0.1, -0.2, 1.0)],
            ray_chunk=PACKET,
            device_mesh=None if nd is None else make_ray_mesh(nd),
        )
        sim.run_iteration()
        maps[nd] = np.asarray(sim.photon_map)
    np.testing.assert_array_equal(maps[None], maps[4])
    assert maps[4].sum() == 4 * PACKET
