"""Texel-resolution dose maps: atlas allocation, barycentric binning,
count conservation, dose consistency with per-triangle maps."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.ops.texel import (
    barycentrics,
    build_atlas,
    slot_triangles,
    texel_ids,
)
from uvtrace.sim import SimParams, Simulator, ViewMode


def test_atlas_allocation():
    areas = np.array([1.0, 0.25, 4.0, 1e-8])
    atlas = build_atlas(areas, density=4.0)
    k = np.asarray(atlas.k)
    assert k[3] == 1  # tiny triangle -> one cell
    assert k[2] > k[0] > k[1] or k[0] >= k[1]
    base = np.asarray(atlas.base)
    assert base[0] == 0
    np.testing.assert_array_equal(np.diff(base), (k**2)[:-1])
    assert atlas.n_slots == int((k**2).sum())


def test_atlas_budget_cap():
    areas = np.full(1000, 100.0)
    atlas = build_atlas(areas, density=64.0, max_slots=5000)
    assert atlas.n_slots <= 5000


def test_slot_triangles():
    atlas = build_atlas(np.array([1.0, 1.0]), density=2.0)
    tri_of = np.asarray(slot_triangles(atlas))
    k2 = int(np.asarray(atlas.k)[0]) ** 2
    assert (tri_of[:k2] == 0).all() and (tri_of[k2:] == 1).all()


def test_barycentrics_roundtrip(rng):
    v0 = rng.normal(size=(100, 3)).astype(np.float32)
    e1 = rng.normal(size=(100, 3)).astype(np.float32)
    e2 = rng.normal(size=(100, 3)).astype(np.float32)
    u = rng.uniform(0, 0.5, 100).astype(np.float32)
    v = rng.uniform(0, 0.5, 100).astype(np.float32)
    p = v0 + u[:, None] * e1 + v[:, None] * e2
    orig = p - np.array([0, 0, 1], np.float32)  # ray from offset, t=1
    d = np.broadcast_to(np.array([0, 0, 1], np.float32), (100, 3))
    uu, vv = barycentrics(
        jnp.asarray(orig), jnp.asarray(d), jnp.ones(100), jnp.asarray(v0),
        jnp.asarray(e1), jnp.asarray(e2),
    )
    np.testing.assert_allclose(np.asarray(uu), u, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vv), v, atol=1e-4)


def test_texel_ids_in_range(rng):
    atlas = build_atlas(np.array([1.0, 2.0, 0.5]), density=8.0)
    hits = jnp.asarray(rng.integers(-1, 3, 500), jnp.int32)
    u = jnp.asarray(rng.uniform(0, 1, 500), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, 500), jnp.float32)
    slots = np.asarray(texel_ids(atlas, hits, u, v))
    miss = np.asarray(hits) < 0
    assert (slots[miss] == -1).all()
    assert (slots[~miss] >= 0).all() and (slots[~miss] < atlas.n_slots).all()
    # slots land in the owning triangle's range
    tri_of = np.asarray(slot_triangles(atlas))
    np.testing.assert_array_equal(tri_of[slots[~miss]], np.asarray(hits)[~miss])


@pytest.fixture(scope="module")
def texel_sim():
    room = make_box_room(subdivisions=4, clutter=1, seed=21, floor_y=-1.0)
    p = SimParams(photon_count=1 << 16, max_iterations=1, texel_density=4.0, seed=2)
    sim = Simulator(room, p, route=[LightPos(0.0, 0.0, 60.0)])
    sim.compute()
    return room, sim


def test_texel_counts_conserve(texel_sim):
    room, sim = texel_sim
    # texel counts and triangle counts bin the same hits
    assert float(jnp.sum(sim.photon_map_tex)) == float(jnp.sum(sim.photon_map))


def test_texel_dose_consistent_with_triangle_dose(texel_sim):
    """Area-weighted mean of texel doses within a triangle == its
    per-triangle dose (same counts, same units)."""
    room, sim = texel_sim
    tri_dose = np.asarray(sim.dosage_map(ViewMode.DOSAGE))
    tex_dose = np.asarray(sim.dosage_map_texels(ViewMode.DOSAGE))
    tri_of = np.asarray(slot_triangles(sim.atlas))
    k2 = np.asarray(sim.atlas.k, np.int64) ** 2
    # mean texel dose per triangle (equal-area cells => plain mean)
    sums = np.bincount(tri_of, weights=tex_dose, minlength=room.triangle_count)
    mean_tex = sums / k2
    big = tri_dose > np.percentile(tri_dose, 60)
    np.testing.assert_allclose(mean_tex[big], tri_dose[big], rtol=1e-4)


def test_texel_map_resolves_gradients(texel_sim):
    """Within large floor triangles the dose should vary across texels
    (near vs far from the lamp) — the information per-triangle maps lose."""
    room, sim = texel_sim
    tex_dose = np.asarray(sim.dosage_map_texels(ViewMode.DOSAGE))
    tri_of = np.asarray(slot_triangles(sim.atlas))
    k = np.asarray(sim.atlas.k)
    big_tris = np.nonzero(k >= 4)[0]
    assert len(big_tris) > 0
    spreads = []
    for t in big_tris[:20]:
        cells = tex_dose[tri_of == t]
        if cells.mean() > 0:
            spreads.append(cells.std() / (cells.mean() + 1e-9))
    assert max(spreads) > 0.05  # nontrivial intra-triangle variation


def test_atlas_budget_is_a_hard_cap():
    """sum(k^2) <= max_slots even when the k>=1 floor fights the scale-down;
    a budget below the triangle count is a hard error."""
    import numpy as np
    import pytest

    from uvtrace.ops.texel import build_atlas

    rng = np.random.default_rng(3)
    areas = rng.uniform(0.001, 4.0, size=5000)
    atlas = build_atlas(areas, density=64.0, max_slots=6000)
    assert atlas.n_slots <= 6000
    assert int(np.asarray(atlas.k).min()) >= 1
    with pytest.raises(ValueError, match="triangle count"):
        build_atlas(areas, density=1.0, max_slots=4999)
