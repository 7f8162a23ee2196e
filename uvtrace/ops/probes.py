"""Top-down probe layout + ceiling-skip re-cast — the ONE implementation
shared by the forward count-based image (Simulator.dose_grid) and the
differentiable image planner (diff/image.plan_dose_image). The two images
are compared against each other in tests (test_diff_image.py), which only
means anything if they use the same probe geometry; keeping it here makes
desynchronizing them impossible.

Layout: res x res probe CELL CENTERS over the scene's xz footprint
(corners would land exactly on the AABB boundary and on quad diagonals —
shared-edge t-ties whose winner is tie-break-order dependent; centers are
also the correct image-sampling convention), cast straight down from just
above the scene top.

skip_ceiling: probes start above the scene and Möller–Trumbore accepts
both faces, so in a room with a roof the first hit IS the ceiling; probes
whose hit lies within `ceiling_margin` of the scene top are re-cast from
just below their hit point. CAVEAT: the classification is a pure height
band — any legitimate surface whose top reaches within the margin of the
scene's max-y (a wardrobe touching the roof) is also re-cast past. A
normal-based classifier cannot disambiguate on arbitrary-winding scan
meshes. Degenerate flat scenes (a bare floor) disable the skip.
"""

from __future__ import annotations

import jax.numpy as jnp

DOWN = (0.0, -1.0, 0.0)


def probe_rays(lo, hi, res: int, pad: int = 0):
    """Probe origins/directions for a res x res top-down grid; `pad` extra
    parked rays (far outside the scene) appended for packet/shard
    alignment. Returns (orig f32[res*res+pad,3], dir f32[res*res+pad,3])."""
    n = res * res
    idx = jnp.arange(res, dtype=jnp.float32) + 0.5
    xs = lo[0] + idx * ((hi[0] - lo[0]) / res)
    zs = lo[2] + idx * ((hi[2] - lo[2]) / res)
    gx, gz = jnp.meshgrid(xs, zs, indexing="xy")
    orig = jnp.stack(
        [gx.ravel(), jnp.full((n,), hi[1] + 0.1, jnp.float32), gz.ravel()],
        axis=-1,
    )
    if pad:
        orig = jnp.concatenate([orig, jnp.full((pad, 3), 1e6, jnp.float32)])
    direction = jnp.broadcast_to(
        jnp.asarray(DOWN, jnp.float32), (n + pad, 3)
    )
    return orig, direction


def first_hits_skip_ceiling(
    extend2, orig, direction, lo_y: float, hi_y: float,
    *, skip_ceiling: bool = True, ceiling_margin: float = 0.05,
):
    """First hits of downward probes with the ceiling-band re-cast.
    extend2(orig, dir) -> (t_hit, hit) in any hit-id space; hit < 0 = miss.
    Returns (t_hit, hit) with ceiling-band hits replaced by what lies
    below them (or -1 when nothing does)."""
    t_hit, hit = extend2(orig, direction)
    if hi_y - lo_y <= 10 * ceiling_margin:
        skip_ceiling = False  # flat scene: the top IS the target
    if skip_ceiling:
        # re-cast probes that hit within ceiling_margin of the scene top
        # from just below their hit point; others park outside
        p_y = orig[:, 1] - t_hit  # direction is (0,-1,0)
        near_top = (hit >= 0) & (p_y > hi_y - ceiling_margin)
        orig2 = jnp.where(
            near_top[:, None],
            orig.at[:, 1].set(p_y - 1e-3),
            jnp.full_like(orig, 1e6),
        )
        t2, hit2 = extend2(orig2, direction)
        use2 = near_top & (hit2 >= 0)
        t_hit = jnp.where(use2, (orig[:, 1] - orig2[:, 1]) + t2, t_hit)
        hit = jnp.where(near_top, jnp.where(use2, hit2, -1), hit)
    return t_hit, hit
