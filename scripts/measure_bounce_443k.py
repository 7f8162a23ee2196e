"""Round-5 measurement: 4-bounce mode at the 443k-tri scale (PERF.md's own
deferred question: does the gen-1 per-ray DFS kernel win back on scenes
large enough that the packet kernel's candidate sets saturate?).

Usage: python scripts/measure_bounce_443k.py [subdivisions] [backends...]
"""

import json
import sys
import time

import numpy as np

from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.sim import SimParams, Simulator

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 else 192
BACKENDS = sys.argv[2:] or ["mxu-fused", "pallas"]

mesh = make_box_room(subdivisions=SUBDIV, clutter=96)
print(f"scene: box room s={SUBDIV} clutter=96, {mesh.triangle_count} tris",
      flush=True)


def row(traversal, n=1 << 20, iters=3, bounces=4):
    p = SimParams(
        photon_count=n, max_iterations=iters + 2, max_bounces=bounces,
        reflectance=0.5, seed=0, traversal=traversal,
    )
    sim = Simulator(mesh, p, route=[LightPos(0.0, 0.0, 1.0)], ray_chunk=n)
    t0 = time.time()
    sim.run_iteration()
    np.asarray(sim.photon_map)
    print(f"{traversal}: compile+warmup {time.time() - t0:.1f}s "
          f"(hbm_tiles={getattr(sim, '_hbm_tiles', False)})", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        sim.run_iteration()
        np.asarray(sim.photon_map)  # readback fence
        best = min(best, time.time() - t0)
    segs = sim._launch_n * (1 + bounces)
    total = int(np.asarray(sim.photon_map).sum())
    out = {
        "traversal": traversal,
        "tris": mesh.triangle_count,
        "all_segment_mrays_per_s": round(segs / best / 1e6, 2),
        "sec_per_iter": round(best, 2),
        "hit_total": total,
    }
    print(json.dumps(out), flush=True)
    return out


results = []
for b in BACKENDS:
    try:
        results.append(row(b))
    except Exception as e:  # compile OOM etc. — record, keep measuring
        print(json.dumps({"traversal": b, "error": str(e)[:500]}), flush=True)

if len(results) > 1:
    totals = {r["hit_total"] for r in results}
    print(f"hit-total agreement: {totals}", flush=True)
