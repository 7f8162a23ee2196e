"""Simulation checkpoint / resume.

The reference's persistence is coarse (SURVEY.md §5): route XML auto-saved on
shutdown/recompute and an in-session pausable iteration loop — the dose maps
themselves never hit disk. Here the full simulation state checkpoints to one
.npz: dose accumulators, iteration counters, RNG state, parameters, and
route, so a run can resume across processes/hosts (the TPU equivalent of
"Resume computation", userinterface.cpp:339-344).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

from uvtrace.io.routexml import LightPos
from uvtrace.sim.params import SimParams


def save_checkpoint(path, sim) -> None:
    params = dataclasses.asdict(sim.params)
    route = [(w.x, w.y, w.duration) for w in sim.route]
    tex = {}
    if getattr(sim, "atlas", None) is not None:
        # texel accumulators (np.asarray gathers sharded maps to host)
        tex = dict(
            photon_map_tex=np.asarray(sim.photon_map_tex),
            max_photon_map_tex=np.asarray(sim.max_photon_map_tex),
        )
    np.savez_compressed(
        str(path),
        **tex,
        photon_map=np.asarray(sim.photon_map),
        max_photon_map=np.asarray(sim.max_photon_map),
        photon_map_size=np.int64(sim.photon_map_size),
        curr_iterations=np.int64(sim.curr_iterations),
        global_seed=np.uint32(sim.global_seed),
        key=np.asarray(sim.key),
        finished=np.bool_(sim.finished),
        params_json=json.dumps(params),
        route=np.asarray(route, np.float64),
        triangle_count=np.int64(sim.triangle_count),
    )


def load_checkpoint(path, sim) -> None:
    """Restore state into an existing Simulator built on the same scene."""
    import jax.numpy as jnp

    data = np.load(str(path), allow_pickle=False)
    t = int(data["triangle_count"])
    if t != sim.triangle_count:
        raise ValueError(
            f"checkpoint is for a {t}-triangle scene, simulator has {sim.triangle_count}"
        )
    sim.photon_map = jnp.asarray(data["photon_map"])
    sim.max_photon_map = jnp.asarray(data["max_photon_map"])
    if "photon_map_tex" in data and getattr(sim, "atlas", None) is not None:
        # restore with the simulator's texel sharding (reset() built the
        # accumulators with the right NamedSharding; keep it)
        like = sim.photon_map_tex
        sim.photon_map_tex = jax.device_put(
            jnp.asarray(data["photon_map_tex"]), like.sharding
        )
        sim.max_photon_map_tex = jax.device_put(
            jnp.asarray(data["max_photon_map_tex"]), like.sharding
        )
    sim.photon_map_size = int(data["photon_map_size"])
    sim.curr_iterations = int(data["curr_iterations"])
    sim.global_seed = np.uint32(data["global_seed"])
    sim.key = jnp.asarray(data["key"])
    sim.finished = bool(data["finished"])
    params = json.loads(str(data["params_json"]))
    sim.params = SimParams(**params)
    sim.route = [LightPos(x, y, d) for x, y, d in data["route"]]
