"""Gradient-based route optimization (BASELINE config 4:
"gradient descent on route waypoints to maximize min surface dose").

Objective: soft minimum of the cumulative dose over target triangles
(softmin keeps the objective smooth; temperature anneals toward the true
min). Parameters: waypoint floor positions and optionally dwell durations
(durations re-normalized to a total time budget through a softmax so the
route time stays fixed).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uvtrace.diff.estimator import DiffScene, route_dose


def softmin(x, temperature):
    return -temperature * jax.nn.logsumexp(-x / temperature)


@dataclasses.dataclass
class RouteOptResult:
    waypoints_xz: np.ndarray
    durations: np.ndarray
    history: list
    final_min_dose: float
    # full estimator dose over the target mask (diagnostics: real scans have
    # genuinely unreachable triangles — inside furniture, scan artifacts —
    # that pin the raw min at 0, so percentiles/coverage carry the signal)
    final_dose_masked: np.ndarray = None


def optimize_route(
    scene: DiffScene,
    init_waypoints_xz,
    init_durations,
    rod_base_y: float,
    rod_length: float,
    power: float,
    *,
    steps: int = 100,
    learning_rate: float = 0.05,
    temperature: float = 5.0,
    n_samples: int = 4,
    optimize_durations: bool = True,
    target_mask=None,
    bounds: Optional[tuple] = None,
    seed: int = 0,
    progress: Optional[Callable] = None,
    reflectance=None,
    areas=None,
    n_sources: int = 64,
    n_bounces: int = 1,
) -> RouteOptResult:
    """Maximize the (soft) minimum dose over target triangles.

    target_mask: optional bool[T] restricting the objective (e.g. exclude
      ceiling); default all triangles with nonzero area.
    bounds: optional ((xmin, zmin), (xmax, zmax)) box constraint on waypoints.
    reflectance: optional f32[T] (or scalar) per-triangle UV reflectance —
      the objective then includes the differentiable interreflection terms
      (route_dose bounce estimator; requires `areas`=mesh.areas), so
      optimized routes account for rho-and-higher transport the way the
      forward bounce simulator does (BASELINE configs 2+4).
    n_sources / n_bounces: bounce-estimator sampling/depth (see route_dose).
    """
    if reflectance is not None:
        if areas is None:
            raise ValueError("optimize_route(reflectance=...) needs areas=mesh.areas")
        reflectance = jnp.broadcast_to(
            jnp.asarray(reflectance, jnp.float32), (scene.v0.shape[0],)
        )
        areas = jnp.asarray(areas)
    wp = jnp.asarray(init_waypoints_xz, jnp.float32)
    if bounds is not None:
        # the objective maps raw params through lo + (hi-lo)*sigmoid(wp), so
        # the raw init must be the INVERSE transform (logit) of the requested
        # starting positions — otherwise optimization starts from the wrong
        # waypoints (and saturates for |x| > ~4)
        lo, hi = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
        frac = jnp.clip((wp - lo) / jnp.maximum(hi - lo, 1e-9), 1e-4, 1 - 1e-4)
        wp = jnp.log(frac) - jnp.log1p(-frac)
    total_time = float(np.sum(init_durations))
    # durations through a softmax -> fixed total time budget
    logits = jnp.log(jnp.asarray(init_durations, jnp.float32) / total_time)
    if target_mask is not None:
        mask = jnp.asarray(target_mask)
    else:
        # default: every non-degenerate triangle (zero-area pads carry no
        # dose and would pin the softmin at 0 forever)
        mask = jnp.linalg.norm(jnp.cross(scene.e1, scene.e2), axis=-1) > 0
    key = jax.random.PRNGKey(seed)

    def durations_of(logits):
        return total_time * jax.nn.softmax(logits)

    def objective(params):
        wp, logits = params
        if bounds is not None:
            lo, hi = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
            wp = lo + (hi - lo) * jax.nn.sigmoid(wp)
        dose = route_dose(
            scene,
            wp,
            durations_of(logits),
            rod_base_y,
            rod_length,
            power,
            key,  # common random numbers: fixed across steps
            n_samples=n_samples,
            reflectance=reflectance,
            areas=areas,
            n_sources=n_sources,
            n_bounces=n_bounces,
        )
        return -softmin(dose[mask], temperature)

    params = (wp, logits)
    if optimize_durations:
        opt = optax.adam(learning_rate)
    else:
        # multi_transform, NOT optax.masked(adam, mask): masked leaves the
        # masked-out leaf's update as the RAW gradient (unscaled ascent on
        # the frozen durations); set_to_zero actually freezes them
        opt = optax.multi_transform(
            {"opt": optax.adam(learning_rate), "frozen": optax.set_to_zero()},
            ("opt", "frozen"),
        )
    state = opt.init(params)
    val_grad = jax.jit(jax.value_and_grad(objective))

    history = []
    for i in range(steps):
        loss, grads = val_grad(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        history.append(float(loss))
        if progress:
            progress(i, float(loss))

    wp, logits = params
    if bounds is not None:
        lo, hi = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
        wp = lo + (hi - lo) * jax.nn.sigmoid(wp)
    final_dose = route_dose(
        scene, wp, durations_of(logits), rod_base_y, rod_length, power, key,
        n_samples=n_samples, reflectance=reflectance, areas=areas,
        n_sources=n_sources, n_bounces=n_bounces,
    )
    return RouteOptResult(
        waypoints_xz=np.asarray(wp),
        durations=np.asarray(durations_of(logits)),
        history=history,
        final_min_dose=float(jnp.min(final_dose[mask])),
        final_dose_masked=np.asarray(final_dose[mask]),
    )
