"""Benchmark: rays/sec/chip over the extend(+histogram)+shade pipeline.

Runs the flagship configuration on the attached TPU chip: testroomopt.glb
(the reference's shipped scene), stratified generation, the fastest available
traversal backend (MXU cluster-intersection kernel, slot-space histograms),
and the dose shade — i.e. the same work the reference times per iteration
(myapp.cpp:166-169: generate + extend + accumulate per frame).

Iterations run inside ONE jit via lax.scan: per-dispatch host->TPU overhead
(measured 30-40 ms through the remote-chip tunnel) would otherwise dominate,
and the production pipeline (launch_counts) amortizes dispatches the same way.

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

    backend = os.environ.get("UVTRACE_BENCH_BACKEND", "mxu")
    cs = build_clusters(mesh.tris, cluster_size=64 if backend == "mxu" else 128)
    slot_map = None
    if backend in ("mxu", "pallas") and jax.default_backend() == "cpu":
        backend = "clustered"
    if backend == "mxu":
        import functools

        from uvtrace.ops.traverse_mxu import build_mxu_scene, traverse_mxu_counts

        scene = build_mxu_scene(cs)
        extend = functools.partial(
            traverse_mxu_counts,
            precision=os.environ.get("UVTRACE_BENCH_PRECISION", "high"),
        )
        slot_map = scene.tri_idx_flat
        n_bins = int(slot_map.shape[0])
    elif backend == "pallas":
        from uvtrace.ops.traverse_pallas import build_pallas_scene, traverse_pallas

        scene = build_pallas_scene(cs)
        extend = traverse_pallas
        n_bins = t_count
    else:
        import functools

        from uvtrace.ops.traverse_clustered import cluster_arrays, traverse_clustered

        scene = cluster_arrays(cs)
        extend = functools.partial(traverse_clustered, max_clusters=48)
        n_bins = t_count

    n = int(os.environ.get("UVTRACE_BENCH_RAYS", 1 << 20))
    iters = int(os.environ.get("UVTRACE_BENCH_ITERS", 5))

    def one_iter(carry, i):
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        rays = gen_ops.generate_stratified(key, n, lamp, 1.0, packet=1024)
        res = extend(scene, rays.orig, rays.dir)
        if slot_map is not None:
            counts = res[2]  # histogrammed inside the kernel
        else:
            counts = acc_ops.hit_counts(res[1], n_bins, "segment")
        return carry + counts, None

    @jax.jit
    def run(n_iters_arr):
        counts, _ = jax.lax.scan(one_iter, jnp.zeros((n_bins,), jnp.int32), n_iters_arr)
        if slot_map is not None:
            counts = acc_ops.slots_to_tri(counts, slot_map, t_count)
        dose = shade_ops.compute_dosage(counts, areas, n * n_iters_arr.shape[0], 45.0)
        return counts, dose

    idx = jnp.arange(iters, dtype=jnp.int32)
    counts, dose = run(idx)
    jax.block_until_ready(dose)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        counts, dose = run(idx)
        jax.block_until_ready(dose)
        best = min(best, (time.time() - t0) / iters)
    rays_per_sec = n / best

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
