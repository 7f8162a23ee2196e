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
) -> RouteOptResult:
    """Maximize the (soft) minimum dose over target triangles.

    target_mask: optional bool[T] restricting the objective (e.g. exclude
      ceiling); default all triangles with nonzero area.
    bounds: optional ((xmin, zmin), (xmax, zmax)) box constraint on waypoints.
    """
    wp = jnp.asarray(init_waypoints_xz, jnp.float32)
    total_time = float(np.sum(init_durations))
    # durations through a softmax -> fixed total time budget
    logits = jnp.log(jnp.asarray(init_durations, jnp.float32) / total_time)
    mask = (
        jnp.asarray(target_mask)
        if target_mask is not None
        else jnp.ones((scene.v0.shape[0],), bool)
    )
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
        )
        return -softmin(dose[mask], temperature)

    params = (wp, logits)
    opt = optax.adam(learning_rate)
    if not optimize_durations:
        opt = optax.masked(opt, (True, False))
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
        n_samples=n_samples,
    )
    return RouteOptResult(
        waypoints_xz=np.asarray(wp),
        durations=np.asarray(durations_of(logits)),
        history=history,
        final_min_dose=float(jnp.min(final_dose[mask])),
    )
