"""Per-stratum candidate cluster lists (conservative wedge-vs-AABB culling).

Stratified generation (ops/generate.generate_stratified) gives every ray
packet a known *wedge*: all rays start on the lamp rod segment and point into
one (cos-theta band x azimuth sector) cell. Which clusters such a wedge can
reach is *ray-independent* — so the cull runs once per (lamp, stratum grid)
as a dense [G, L] interval test in XLA, and the Pallas intersection kernel
receives a ready, near-to-far ordered candidate list per packet. This removes
all tree traversal from the device kernel (SURVEY.md §7 hard part #1) — the
irregular work happens as regular dense arithmetic.

Conservativeness: azimuth and elevation ranges are bounded independently
(product-of-intervals superset), so a listed wedge/box overlap may be a false
positive (harmless extra work) but never a false negative (which would lose
hits) — except through the explicit `max_candidates` budget, which is
reported via the returned counts so callers can check for overflow.

Geometry:
  - azimuth range of a box footprint from the rod axis (a vertical line):
    attained at footprint corners when the axis is outside the footprint;
    full circle otherwise.
  - elevation (dir_y) range: dy/sqrt(dy^2+dxz^2) is monotonic in dy and
    anti-monotonic in dxz for fixed sign, so the extremes come from interval
    endpoints of dy = box_y - rod_y and dxz = point-to-rect distance range.
  - entry distance lower bound (ordering / early-exit): rod-segment-to-box
    distance sqrt(dxz_min^2 + dy_gap^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _wrap_pi(x):
    """Wrap angle difference to (-pi, pi]."""
    return x - 2.0 * np.pi * jnp.round(x / (2.0 * np.pi))


def stratum_candidates(
    box_min,
    box_max,
    lamp_xyz,
    light_length,
    gy: int,
    gphi: int,
    *,
    max_candidates: int = 32,
):
    """Candidate clusters for every stratum cell.

    Args:
      box_min, box_max: f32[L,3] cluster AABBs.
      lamp_xyz: f32[3] rod base (y = base height; rod spans [y, y+len]).
      light_length: rod length.
      gy, gphi: stratum grid (G = gy*gphi cells; cell g = (g//gphi, g%gphi)).

    Returns:
      queue: i32[G, max_candidates] cluster ids ordered near-to-far, -1 pad.
      entry: f32[G, max_candidates] entry-distance lower bounds (inf for pads).
      counts: i32[G] number of overlapped clusters (may exceed max_candidates
        => overflow).
    """
    lx, ly, lz = lamp_xyz[0], lamp_xyz[1], lamp_xyz[2]
    h0, h1 = ly, ly + jnp.float32(light_length)
    l_count = box_min.shape[0]

    # ---- horizontal distance range from the rod axis to each box footprint
    cx0, cz0 = box_min[:, 0] - lx, box_min[:, 2] - lz
    cx1, cz1 = box_max[:, 0] - lx, box_max[:, 2] - lz
    dx_lo = jnp.maximum(jnp.maximum(cx0, -cx1), 0.0)  # clamp distance in x
    dz_lo = jnp.maximum(jnp.maximum(cz0, -cz1), 0.0)
    dxz_min = jnp.sqrt(dx_lo**2 + dz_lo**2)
    dx_hi = jnp.maximum(jnp.abs(cx0), jnp.abs(cx1))
    dz_hi = jnp.maximum(jnp.abs(cz0), jnp.abs(cz1))
    dxz_max = jnp.sqrt(dx_hi**2 + dz_hi**2)
    axis_inside = (cx0 <= 0) & (cx1 >= 0) & (cz0 <= 0) & (cz1 >= 0)

    # ---- azimuth span of the footprint (phi = atan2(z, x), direction basis
    # dir=(r cos phi, y, r sin phi) of the stratified sampler)
    corners_x = jnp.stack([cx0, cx1, cx0, cx1], axis=1)  # [L,4]
    corners_z = jnp.stack([cz0, cz0, cz1, cz1], axis=1)
    ang = jnp.arctan2(corners_z, corners_x)  # [L,4]
    rel = _wrap_pi(ang - ang[:, :1])
    phi_lo = ang[:, 0] + jnp.min(rel, axis=1)
    phi_hi = ang[:, 0] + jnp.max(rel, axis=1)
    phi_c = 0.5 * (phi_lo + phi_hi)
    phi_hw = jnp.where(axis_inside, np.pi, 0.5 * (phi_hi - phi_lo))  # half-width

    # ---- dir_y (elevation) range over (box y-range) x (rod y-range)
    dy_min = box_min[:, 1] - h1
    dy_max = box_max[:, 1] - h0

    def ydir(dy, dxz):
        denom = jnp.sqrt(dy * dy + dxz * dxz)
        return jnp.where(denom > 0, dy / jnp.maximum(denom, 1e-30), 0.0)

    # max of dy/sqrt(dy^2+dxz^2): at dy_max with the dxz that favors it
    y_hi = ydir(dy_max, jnp.where(dy_max > 0, dxz_min, dxz_max))
    y_lo = ydir(dy_min, jnp.where(dy_min < 0, dxz_min, dxz_max))
    # lamp inside the box (any axis overlap incl. y): all directions possible
    inside = axis_inside & (dy_min <= 0) & (dy_max >= 0)
    y_lo = jnp.where(inside, -1.0, y_lo)
    y_hi = jnp.where(inside, 1.0, y_hi)
    phi_hw = jnp.where(inside, np.pi, phi_hw)

    # ---- entry-distance lower bound (rod segment to box)
    dy_gap = jnp.maximum(jnp.maximum(dy_min, -dy_max), 0.0)
    dy_gap = jnp.where((dy_min <= 0) & (dy_max >= 0), 0.0, dy_gap)
    dist_lb = jnp.sqrt(dxz_min**2 + dy_gap**2)

    # ---- per-cell overlap tests, dense [G, L]
    g = gy * gphi
    cell = jnp.arange(g, dtype=jnp.int32)
    iy = (cell // gphi).astype(jnp.float32)
    ip = (cell % gphi).astype(jnp.float32)
    cell_y0 = -1.0 + 2.0 * iy / gy
    cell_y1 = -1.0 + 2.0 * (iy + 1.0) / gy
    cell_p0 = 2.0 * np.pi * ip / gphi
    cell_p1 = 2.0 * np.pi * (ip + 1.0) / gphi
    cell_pc = 0.5 * (cell_p0 + cell_p1)
    cell_phw = 0.5 * (cell_p1 - cell_p0)

    y_overlap = (cell_y0[:, None] <= y_hi[None, :]) & (cell_y1[:, None] >= y_lo[None, :])
    dphi = jnp.abs(_wrap_pi(cell_pc[:, None] - phi_c[None, :]))
    phi_overlap = dphi <= (cell_phw[:, None] + phi_hw[None, :])
    mask = y_overlap & phi_overlap  # [G, L]

    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    key = jnp.where(mask, dist_lb[None, :], jnp.inf)
    k = min(max_candidates, l_count)
    neg_key, queue = jax.lax.top_k(-key, k)
    entry = -neg_key
    queue = jnp.where(jnp.isfinite(entry), queue, -1).astype(jnp.int32)
    if k < max_candidates:
        pad = max_candidates - k
        queue = jnp.pad(queue, ((0, 0), (0, pad)), constant_values=-1)
        entry = jnp.pad(entry, ((0, 0), (0, pad)), constant_values=np.inf)
    return queue, entry, counts
