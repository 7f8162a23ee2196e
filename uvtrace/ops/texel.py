"""Texel-resolution dose maps (sub-triangle accumulation).

The reference accumulates one dose value per triangle (cl/accumulate.cl);
BASELINE configs ask for dose *maps* at fixed resolution (256^2 for the
testroom config, 4K sharded for the pod-scale config). This module bins hits
into a per-triangle texel atlas:

- every triangle gets a k_t x k_t grid of barycentric cells, k_t chosen so a
  cell's area is ~(1/density)^2 m^2, clamped so the whole atlas fits the
  requested budget; cell area is exactly tri_area / k_t^2 (barycentric cells
  are equal-area), so count -> dose conversion stays exact;
- a hit (tri, u, v) maps to slot base_t + iy * k_t + ix where (ix, iy) is the
  folded barycentric cell — fold (u,v) with u+v>1 onto the lower triangle so
  the index stays in range while cells remain equal-area pairs;
- the flat atlas is a first-class sharding axis: each device histograms its
  own rays over all slots and partials are psum/reduce-scattered
  (parallel/sharded.py).

Barycentrics are recomputed from the hit point (traversals return (t, id)
only): one extra Möller–Trumbore-style solve per hit, fully vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TexelAtlas(NamedTuple):
    base: jax.Array  # i32[T] first slot of each triangle
    k: jax.Array  # i32[T] grid side per triangle
    n_slots: int  # total texel count (python int)
    cell_area: jax.Array  # f32[T] = tri_area / k^2


def build_atlas(areas: np.ndarray, density: float = 16.0, max_slots: int = 1 << 22) -> TexelAtlas:
    """Allocate texel grids: k_t ~ sqrt(area)*density, >=1, capped so
    sum(k^2) <= max_slots (scaled down uniformly, iterated: the k >= 1 floor
    means a single pass can land above the cap when many triangles clamp)."""
    areas = np.asarray(areas, np.float64)
    if areas.shape[0] > max_slots:
        raise ValueError(
            f"texel_max_slots={max_slots} is below the triangle count "
            f"({areas.shape[0]}): every triangle needs at least one texel — "
            "raise the budget or use per-triangle accumulation"
        )
    k = np.maximum(1, np.ceil(np.sqrt(np.maximum(areas, 0.0)) * density)).astype(np.int64)
    while int((k**2).sum()) > max_slots:
        scale = np.sqrt(max_slots / (k**2).sum())
        k_new = np.maximum(1, np.floor(k * scale)).astype(np.int64)
        if (k_new == k).all():  # all clamped at 1 or floor made no progress
            k_new = np.maximum(1, k - 1)
        k = k_new
    base = np.concatenate([[0], np.cumsum(k**2)[:-1]]).astype(np.int64)
    n_slots = int((k**2).sum())
    cell_area = (areas / (k**2)).astype(np.float32)
    return TexelAtlas(
        base=jnp.asarray(base, jnp.int32),
        k=jnp.asarray(k, jnp.int32),
        n_slots=n_slots,
        cell_area=jnp.asarray(cell_area),
    )


def barycentrics(orig, direction, t_hit, v0, e1, e2):
    """(u, v) of hit points p = o + t d w.r.t. triangle (v0, e1, e2).

    Least-squares solve of p - v0 = u e1 + v e2 via the 2x2 Gram system —
    robust for points on the triangle plane."""
    p = orig + t_hit[..., None] * direction
    w = p - v0
    a = jnp.sum(e1 * e1, axis=-1)
    b = jnp.sum(e1 * e2, axis=-1)
    c = jnp.sum(e2 * e2, axis=-1)
    d1 = jnp.sum(w * e1, axis=-1)
    d2 = jnp.sum(w * e2, axis=-1)
    det = jnp.maximum(a * c - b * b, 1e-20)
    u = (c * d1 - b * d2) / det
    v = (a * d2 - b * d1) / det
    return u, v


def texel_ids(atlas: TexelAtlas, hit_ids, u, v):
    """Flat atlas slot for each hit (-1 passthrough for misses)."""
    safe = jnp.maximum(hit_ids, 0)
    k = atlas.k[safe].astype(jnp.float32)
    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    # fold the upper half (u+v>1) onto the lower triangle (equal-area pairing)
    over = uu + vv > 1.0
    uu = jnp.where(over, 1.0 - uu, uu)
    vv = jnp.where(over, 1.0 - vv, vv)
    ix = jnp.minimum((uu * k).astype(jnp.int32), atlas.k[safe] - 1)
    iy = jnp.minimum((vv * k).astype(jnp.int32), atlas.k[safe] - 1)
    slot = atlas.base[safe] + iy * atlas.k[safe] + ix
    return jnp.where(hit_ids >= 0, slot, -1)


def texel_dose(atlas: TexelAtlas, texel_counts, photons_per_light, scaled_power):
    """Per-texel dose with the reference's unit rule (cl/shade.cl:39) using
    the exact cell area."""
    # expand per-triangle cell areas to slots via the triangle id per slot
    return (
        jnp.asarray(scaled_power, jnp.float32)
        * texel_counts.astype(jnp.float32)
        / (slot_areas(atlas) * jnp.asarray(photons_per_light, jnp.float32))
    )


def slot_areas(atlas: TexelAtlas) -> jax.Array:
    """f32[n_slots] cell areas (repeat per-triangle value k^2 times)."""
    tri_of = slot_triangles(atlas)
    return atlas.cell_area[tri_of]


def slot_triangles(atlas: TexelAtlas) -> jax.Array:
    """i32[n_slots] owning triangle of every slot."""
    t_count = atlas.base.shape[0]
    slots = jnp.arange(atlas.n_slots, dtype=jnp.int32)
    # searchsorted over the base offsets
    return (
        jnp.searchsorted(atlas.base, slots, side="right").astype(jnp.int32) - 1
    )
