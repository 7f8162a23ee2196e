"""Round-5 measurement: optimize-route wall time on the 45k-tri room
(12 waypoints, 100 steps, n_samples=4) with the diff layer's visibility on
the clustered backend (round-4 state) vs the MXU kernel (round-5 wiring).

Usage: python scripts/measure_optroute_45k.py [steps] [backends...]
"""

import json
import os
import sys
import time

import numpy as np

from uvtrace.diff import make_diff_scene, optimize_route
from uvtrace.geometry.gltf import load_glb
from uvtrace.io.routexml import load_route_xml

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
BACKENDS = sys.argv[2:] or ["mxu", "clustered"]

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
mesh = load_glb(os.path.join(root, "assets", "testroomopt.glb"))
route = load_route_xml(os.path.join(root, "assets", "route.xml"))
wp = np.array([[w.x, w.y] for w in route.waypoints], np.float32)
durs = np.array([w.duration for w in route.waypoints], np.float32)
print(f"scene {mesh.triangle_count} tris, {len(wp)} waypoints, "
      f"{STEPS} steps", flush=True)

for backend in BACKENDS:
    scene = make_diff_scene(mesh, backend=backend)
    steptimes = []

    def progress(i, loss, _t=[time.time()]):
        now = time.time()
        steptimes.append(now - _t[0])
        _t[0] = now

    t0 = time.time()
    res = optimize_route(
        scene, wp, durs, mesh.floor_height + 0.8, 1.0, 450.0,
        steps=STEPS, n_samples=4, seed=0, progress=progress,
    )
    wall = time.time() - t0
    steady = float(np.median(steptimes[1:])) if len(steptimes) > 1 else wall
    print(json.dumps({
        "backend": backend,
        "steps": STEPS,
        "wall_s": round(wall, 1),
        "compile_s": round(steptimes[0] - steady, 1) if steptimes else None,
        "steady_s_per_step": round(steady, 3),
        "wall_100_steps_est_s": round(steptimes[0] + 99 * steady, 1) if steptimes else None,
        "final_min_dose": res.final_min_dose,
    }), flush=True)
