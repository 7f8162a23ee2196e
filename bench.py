"""Benchmark: rays/sec/chip over the extend(+histogram)+shade pipeline.

Runs the flagship configuration on the attached TPU chip: testroomopt.glb
(the reference's shipped scene), stratified generation, the fastest available
traversal backend, sort-histogram accumulation, and the dose shade — i.e. the
same work the reference times per iteration (myapp.cpp:166-169: generate +
extend + accumulate per frame).

Baseline note: the reference publishes NO throughput numbers (BASELINE.md).
The only quantified performance statement is the requirement "compute the
dosage map within 5 minutes" for 335M photons (Report §1.2) = 1.118 Mrays/s.
`vs_baseline` is measured against that requirement floor; interpret it as
"x times faster than the reference's stated requirement", not vs. a measured
OpenCL run (which this environment cannot execute).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REQUIREMENT_RAYS_PER_SEC = 335_544_320 / 300.0  # Report §1.2 floor


def main():
    from uvtrace.geometry.gltf import load_glb
    from uvtrace.geometry.procedural import make_box_room
    from uvtrace.ops import accumulate as acc_ops
    from uvtrace.ops import generate as gen_ops
    from uvtrace.ops import shade as shade_ops
    from uvtrace.ops.cluster import build_clusters

    scene_path = os.path.join(os.path.dirname(__file__), "assets", "testroomopt.glb")
    if os.path.exists(scene_path):
        mesh = load_glb(scene_path)
    else:
        mesh = make_box_room(subdivisions=48, clutter=24)
    t_count = mesh.triangle_count
    lamp = jnp.array([0.0, mesh.floor_height + 0.8, 0.0], jnp.float32)
    areas = jnp.asarray(mesh.areas)

    cs = build_clusters(mesh.tris, cluster_size=128)

    backend = os.environ.get("UVTRACE_BENCH_BACKEND", "pallas")
    if backend == "pallas" and jax.default_backend() != "cpu":
        from uvtrace.ops.traverse_pallas import build_pallas_scene, traverse_pallas

        scene = build_pallas_scene(cs)
        extend = traverse_pallas
    else:
        import functools

        from uvtrace.ops.traverse_clustered import cluster_arrays, traverse_clustered

        scene = cluster_arrays(cs)
        extend = functools.partial(traverse_clustered, max_clusters=48)

    n = int(os.environ.get("UVTRACE_BENCH_RAYS", 1 << 20))

    @jax.jit
    def step(key):
        rays = gen_ops.generate_stratified(key, n, lamp, 1.0, packet=1024)
        _, hit = extend(scene, rays.orig, rays.dir)
        counts = acc_ops.hit_counts(hit, t_count, "sort")
        dose = shade_ops.compute_dosage(counts, areas, n, 45.0)
        return counts, dose

    counts, dose = step(jax.random.PRNGKey(0))
    jax.block_until_ready(dose)

    iters = int(os.environ.get("UVTRACE_BENCH_ITERS", 5))
    t0 = time.time()
    for i in range(iters):
        counts, dose = step(jax.random.PRNGKey(i))
        jax.block_until_ready(dose)
    dt = (time.time() - t0) / iters
    rays_per_sec = n / dt

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip (generate+extend+accumulate+shade, testroom 45k tris)",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REQUIREMENT_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
