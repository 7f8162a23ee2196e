"""Differentiable dose estimator.

The reference's count-based estimator (photon hits per triangle,
cl/extend.cl + cl/shade.cl) is piecewise-constant in the lamp parameters —
its a.e. derivative is zero, so a differentiable layer needs a different
formulation (BASELINE north-star: "gradients flow from dose maps back to lamp
position/route waypoints").

We use the next-event factorization  E_t = G_t(theta) * V_t :

  irradiance of triangle t from a vertical rod lamp (power P, length L,
  isotropic emission per rod point — the distribution of cl/generate.cl):

    E_t(theta) = P * mean_{r on rod, q on tri} [ V(r,q) * |cos theta_q| / (4 pi |q-r|^2) ]

  - G (geometry term): closed-form in lamp x/z, rod base height, rod length,
    triangle geometry -> differentiated exactly by JAX AD.
  - V (visibility): Monte-Carlo binary occlusion, estimated by tracing
    shadow rays with the regular traversal, and held piecewise-constant
    (`stop_gradient`) — the documented differentiability contract: gradients
    are exact wherever visibility is locally constant; visibility-boundary
    (silhouette) terms are ignored. With common random numbers this matches
    finite differences of the same estimator away from silhouettes.

Expected values match the reference estimator: a photon from rod point r hits
triangle t with probability A_t |cos| / (4 pi d^2) (solid-angle measure, both
faces — Möller–Trumbore accepts backfaces, cl/extend.cl:6-27), so
E[count-dose] == this estimator. Tests cross-validate the two.

Units follow RayTracer::Shade (raytracer.cpp:96-116): multiply irradiance
(W/m^2) by 100 for µW/cm^2, time-integrate and multiply by 0.1 for mJ/cm^2.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffScene(NamedTuple):
    """Static geometry for the differentiable estimator."""

    v0: jax.Array  # f32[T,3]
    e1: jax.Array  # f32[T,3] v1-v0
    e2: jax.Array  # f32[T,3] v2-v0
    normal: jax.Array  # f32[T,3] unit normals
    # occluder representation for shadow rays (clustered scene, any backend)
    trav_scene: object
    extend_fn: object


def make_diff_scene(mesh, max_clusters=None) -> DiffScene:
    from uvtrace.ops.cluster import build_clusters
    from uvtrace.ops.traverse_clustered import cluster_arrays, traverse_clustered

    tris = jnp.asarray(mesh.tris)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    cs = build_clusters(mesh.tris, cluster_size=128)
    ca = cluster_arrays(cs)
    if max_clusters is None:
        # shadow-ray packets point from one source to samples spread over
        # EVERY triangle — their frustum covers the whole scene, so any
        # nearest-entry budget silently drops occluders (V=1 where shadowed:
        # over-estimated dose AND wrong gradients). No budget: exact.
        max_clusters = cs.n_clusters
    extend = functools.partial(traverse_clustered, max_clusters=max_clusters)
    return DiffScene(v0=v0, e1=e1, e2=e2, normal=n, trav_scene=ca, extend_fn=extend)


def _sample_triangle_points(scene: DiffScene, key, n_samples: int):
    """Uniform points on each triangle: q = v0 + u*e1 + v*e2, (u,v) uniform
    on the unit triangle. Returns f32[S,T,3] (differentiable in geometry)."""
    t_count = scene.v0.shape[0]
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, (n_samples, t_count, 1))
    v = jax.random.uniform(kv, (n_samples, t_count, 1))
    flip = (u + v) > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    return scene.v0[None] + u * scene.e1[None] + v * scene.e2[None]


def _visibility(scene: DiffScene, rod_points, qs, eps: float = 1e-3):
    """Binary visibility between rod points r[S,3]-broadcastable and surface
    points q[S,T,3]: 1.0 if the shadow ray reaches q before any other hit.
    Non-differentiable by construction (used under stop_gradient)."""
    d = qs - rod_points
    dist = jnp.linalg.norm(d, axis=-1)
    direction = d / jnp.maximum(dist[..., None], 1e-20)
    s, t_count = qs.shape[0], qs.shape[1]
    orig = jnp.broadcast_to(rod_points, qs.shape).reshape(s * t_count, 3)
    dirs = direction.reshape(s * t_count, 3)
    t_hit, _ = scene.extend_fn(scene.trav_scene, orig, dirs)[:2]
    t_hit = t_hit.reshape(s, t_count)
    # visible if nothing closer than the target point (within tolerance)
    return (t_hit >= dist * (1.0 - eps) - eps).astype(jnp.float32)


def irradiance(
    scene: DiffScene,
    lamp_xz,
    rod_base_y,
    rod_length,
    power,
    key,
    *,
    n_samples: int = 8,
) -> jax.Array:
    """Differentiable per-triangle irradiance E_t in W/m^2.

    Args:
      lamp_xz: f32[2] lamp floor position (differentiable).
      rod_base_y: rod base world height (floor + light_height).
      rod_length: rod length (m).
      power: lamp power P (W).
      key: PRNG key — fix it for common random numbers across evaluations.
      n_samples: (rod point, triangle point) sample pairs per triangle.
    """
    keys = jax.random.split(key, 3)
    t_count = scene.v0.shape[0]
    qs = _sample_triangle_points(scene, keys[0], n_samples)  # [S,T,3]
    u_rod = jax.random.uniform(keys[1], (n_samples, 1))
    rod_y = rod_base_y + u_rod * rod_length  # [S,1]
    rod_points = jnp.concatenate(
        [
            jnp.broadcast_to(lamp_xz[0], (n_samples, 1)),
            rod_y,
            jnp.broadcast_to(lamp_xz[1], (n_samples, 1)),
        ],
        axis=-1,
    )[:, None, :]  # [S,1,3]

    d = qs - rod_points  # [S,T,3]
    dist2 = jnp.sum(d * d, axis=-1)  # [S,T]
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    cos = jnp.abs(jnp.sum(d * scene.normal[None], axis=-1)) / dist
    g = cos / (4.0 * np.pi * jnp.maximum(dist2, 1e-12))  # [S,T]

    vis = jax.lax.stop_gradient(_visibility(scene, rod_points, qs))
    return power * jnp.mean(g * vis, axis=0)  # [T]


def _points_direct(
    scene: DiffScene, pts, normals, lamp_xz, rod_base_y, rod_length, power,
    key, n_rod: int,
):
    """Differentiable direct irradiance at arbitrary surface points
    pts f32[M,3] with unit normals f32[M,3] — the same rod-sampled
    G x V estimator as `irradiance`, point-wise. Returns f32[M]."""
    u_rod = jax.random.uniform(key, (n_rod, 1))
    rod_points = jnp.concatenate(
        [
            jnp.broadcast_to(lamp_xz[0], (n_rod, 1)),
            rod_base_y + u_rod * rod_length,
            jnp.broadcast_to(lamp_xz[1], (n_rod, 1)),
        ],
        axis=-1,
    )[:, None, :]  # [R,1,3]
    d = pts[None] - rod_points  # [R,M,3]
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    cos = jnp.abs(jnp.sum(d * normals[None], axis=-1)) / dist
    g = cos / (4.0 * np.pi * jnp.maximum(dist2, 1e-12))
    qs = jnp.broadcast_to(pts[None], (n_rod,) + pts.shape)  # [R,M,3]
    vis = jax.lax.stop_gradient(_visibility(scene, rod_points, qs))
    return power * jnp.mean(g * vis, axis=0)  # [M]


def one_bounce_irradiance(
    scene: DiffScene,
    lamp_xz,
    rod_base_y,
    rod_length,
    power,
    reflectance,
    areas,
    key,
    *,
    n_samples: int = 4,
    n_sources: int = 64,
) -> jax.Array:
    """Differentiable ONE-BOUNCE (diffuse interreflection) irradiance
    E1_t in W/m^2 with per-triangle reflectance `reflectance` f32[T] —
    the differentiable counterpart of the count-based bounce mode
    (ops/bounce.py: survive w.p. rho, re-emit cosine-weighted; its expected
    per-triangle arrival flux equals  A_t * E1_t  below).

    Estimator: area-weighted source points x_m (prob ∝ A_s), Lambertian
    transfer to receiver samples q on every triangle:

      E1_t = mean_q  sum_m  w_m * rho(s_m) * E_dir(x_m)
                      * cos_m * cos_t / (pi r^2) * V(x_m, q)
      with importance weight  w_m = A_total / n_sources.

    Gradients: EXACT and linear in `reflectance`; lamp/rod/power gradients
    flow through E_dir (same stop-gradient visibility contract as
    `irradiance`). Double-sided cosines match the reference's backface-
    accepting Möller–Trumbore (cl/extend.cl:6-27).

    areas: f32[T] triangle areas (mesh.areas).
    """
    keys = jax.random.split(key, 4)
    t_count = scene.v0.shape[0]
    areas = jnp.asarray(areas)
    probs = areas / jnp.sum(areas)
    src = jax.random.choice(keys[0], t_count, (n_sources,), p=probs)
    ku, kv = jax.random.split(keys[1])
    u = jax.random.uniform(ku, (n_sources, 1))
    v = jax.random.uniform(kv, (n_sources, 1))
    flip = (u + v) > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    x_m = scene.v0[src] + u * scene.e1[src] + v * scene.e2[src]  # [M,3]
    n_m = scene.normal[src]
    rho_m = jnp.asarray(reflectance)[src]

    e_dir = _points_direct(
        scene, x_m, n_m, lamp_xz, rod_base_y, rod_length, power,
        keys[2], n_rod=max(4, n_samples),
    )  # [M]

    qs = _sample_triangle_points(scene, keys[3], n_samples)  # [S,T,3]
    d = qs[None] - x_m[:, None, None, :]  # [M,S,T,3]
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    cos_m = jnp.abs(jnp.sum(d * n_m[:, None, None, :], axis=-1)) / dist
    cos_t = jnp.abs(jnp.sum(d * scene.normal[None, None], axis=-1)) / dist
    # visibility x_m -> q: one shadow-ray batch per source point
    s, t = qs.shape[0], qs.shape[1]
    vis = jax.lax.stop_gradient(
        _visibility(
            scene,
            x_m[:, None, :],  # [M,1,3]
            jnp.broadcast_to(qs.reshape(1, s * t, 3), (n_sources, s * t, 3)),
        )
    ).reshape(n_sources, s, t)
    w = jnp.sum(areas) / n_sources
    transfer = cos_m * cos_t / (np.pi * jnp.maximum(dist2, 1e-12)) * vis
    contrib = (rho_m * e_dir)[:, None, None] * transfer  # [M,S,T]
    return w * jnp.mean(jnp.sum(contrib, axis=0), axis=0)  # [T]


def route_dose(
    scene: DiffScene,
    waypoints_xz,
    durations,
    rod_base_y,
    rod_length,
    power,
    key,
    *,
    n_samples: int = 8,
    reflectance=None,
    areas=None,
    n_sources: int = 64,
) -> jax.Array:
    """Differentiable cumulative dose [mJ/cm^2] over a route.

    dose_t = 0.1 * sum_w duration_w * E_t(lamp_w)   (Report §3 Eq. 1 units)

    waypoints_xz: f32[W,2]; durations: f32[W] (both differentiable).
    reflectance: optional f32[T] — adds the one-bounce interreflection term
    (one_bounce_irradiance; requires `areas`); gradients then also flow
    w.r.t. the reflectances.
    """
    if reflectance is not None and areas is None:
        raise ValueError("route_dose(reflectance=...) needs areas=mesh.areas")

    def one(w, carry):
        acc = carry
        kw_ = jax.random.fold_in(key, w)
        e = irradiance(
            scene,
            waypoints_xz[w],
            rod_base_y,
            rod_length,
            power,
            kw_,
            n_samples=n_samples,
        )
        if reflectance is not None:
            e = e + one_bounce_irradiance(
                scene,
                waypoints_xz[w],
                rod_base_y,
                rod_length,
                power,
                reflectance,
                areas,
                jax.random.fold_in(kw_, 1),
                n_samples=n_samples,
                n_sources=n_sources,
            )
        return acc + durations[w] * e

    acc = jnp.zeros((scene.v0.shape[0],))
    acc = jax.lax.fori_loop(0, waypoints_xz.shape[0], one, acc)
    return 0.1 * acc
