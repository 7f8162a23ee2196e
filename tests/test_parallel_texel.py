"""2-D (rays x texels) sharded texel dose maps — BASELINE config 5 through
the PRODUCT path: Simulator(device_mesh=2-D mesh) -> sharded_launch_fn ->
launch_counts, texel partials psum_scattered over the texel axis
(uvtrace/parallel/sharded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.parallel import make_2d_mesh, make_ray_mesh
from uvtrace.sim import SimParams, Simulator, ViewMode


@pytest.fixture(scope="module")
def room():
    return make_box_room(subdivisions=4, clutter=1, seed=13)


def test_2d_mesh_shapes():
    mesh = make_2d_mesh(ray_shards=4, texel_shards=2)
    assert mesh.shape == {"rays": 4, "texels": 2}


def _run(room, device_mesh, photon_count=1 << 13, **params):
    sim = Simulator(
        room,
        SimParams(photon_count=photon_count, max_iterations=1,
                  texel_density=4.0, **params),
        route=[LightPos(0.0, 0.0, 1.0)],
        ray_chunk=1024,
        device_mesh=device_mesh,
    )
    sim.run_iteration()
    return sim


def test_2d_matches_single_device_bitexact(room):
    """Counts and texel maps are bit-identical across mesh factorizations
    (global-chunk-index RNG): 1 device == 8x1 == 4x2 == 2x4."""
    ref = _run(room, None)
    ref_tex = np.asarray(ref.photon_map_tex)[: ref.atlas.n_slots]
    for rs, ts in ((8, 1), (4, 2), (2, 4)):
        mesh = make_2d_mesh(ray_shards=rs, texel_shards=ts) if ts > 1 else make_ray_mesh(rs)
        sim = _run(room, mesh)
        np.testing.assert_array_equal(
            np.asarray(sim.photon_map), np.asarray(ref.photon_map)
        )
        np.testing.assert_array_equal(
            np.asarray(sim.photon_map_tex)[: sim.atlas.n_slots], ref_tex
        )
    assert ref_tex.sum() > 0


def test_texel_axis_is_actually_sharded(room):
    """Each device permanently holds only n_texels/texel_shards slots — the
    whole point of the texel axis (per-device memory bounded)."""
    mesh = make_2d_mesh(ray_shards=2, texel_shards=4)
    sim = _run(room, mesh)
    arr = sim.photon_map_tex
    shard_sizes = {s.data.shape[0] for s in arr.addressable_shards}
    assert shard_sizes == {sim._n_texels // 4}
    # the map is still globally correct
    assert np.asarray(arr).sum() > 0


def test_texel_sharding_with_bounces(room):
    """Texel axis composes with multi-bounce mode (bounce hits bin into the
    atlas too), still bit-identical to the single-device run."""
    ref = _run(room, None, max_bounces=1, reflectance=0.4)
    sim = _run(room, make_2d_mesh(ray_shards=4, texel_shards=2),
               max_bounces=1, reflectance=0.4)
    np.testing.assert_array_equal(
        np.asarray(sim.photon_map_tex)[: sim.atlas.n_slots],
        np.asarray(ref.photon_map_tex)[: ref.atlas.n_slots],
    )


def test_large_atlas_16m_slots(room):
    """Config-5 scale: a >= 16M-slot atlas (the 4K dose-map equivalent,
    BASELINE config 5) sharded over the texel axis. Verifies the histograms
    stay exact at scale and per-device resident texel state is
    n_texels/texel_shards."""
    room_big = room
    sim = Simulator(
        room_big,
        SimParams(photon_count=4096, max_iterations=1,
                  texel_density=2048.0, texel_max_slots=1 << 25),
        route=[LightPos(0.0, 0.0, 1.0)],
        ray_chunk=1024,
        device_mesh=make_2d_mesh(ray_shards=2, texel_shards=4),
    )
    assert sim.atlas.n_slots >= (1 << 24), sim.atlas.n_slots
    sim.run_iteration()
    arr = sim.photon_map_tex
    # per-device steady-state shard is bounded: n_texels / texel_shards
    shard_sizes = {s.data.shape[0] for s in arr.addressable_shards}
    assert shard_sizes == {sim._n_texels // 4}
    # exactness: every landed photon bins into exactly one texel, so the
    # atlas total equals the per-triangle total
    tex_total = int(np.asarray(arr).sum())
    tri_total = int(np.asarray(sim.photon_map).sum())
    assert tex_total == tri_total > 0


def test_dosage_map_texels_units(room):
    """Sharded texel dose in physical units matches the unsharded value."""
    ref = _run(room, None)
    sim = _run(room, make_2d_mesh(ray_shards=4, texel_shards=2))
    np.testing.assert_allclose(
        np.asarray(sim.dosage_map_texels(ViewMode.DOSAGE)),
        np.asarray(ref.dosage_map_texels(ViewMode.DOSAGE)),
        rtol=1e-6,
    )
