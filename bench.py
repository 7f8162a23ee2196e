"""Benchmark: rays/sec/chip over the extend(+histogram)+shade pipeline.

Default mode (the driver contract) prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} for the flagship single-chip
configuration: testroomopt.glb (the reference's shipped scene), stratified
generation, the fastest available traversal backend (MXU cluster-intersection
kernel, slot-space histograms), and the dose shade — i.e. the same work the
reference times per iteration (myapp.cpp:166-169: generate + extend +
accumulate per frame).

Iterations run inside ONE jit via lax.scan: per-dispatch host->TPU overhead
(measured 30-40 ms through the remote-chip tunnel) would otherwise dominate,
and the production pipeline (launch_counts) amortizes dispatches the same way.

Scaling mode (`python bench.py --scaling [--devices N]`, also
`python -m uvtrace bench --scaling`) measures the PRODUCT multi-device path —
Simulator(device_mesh=make_ray_mesh(d)) -> sharded_launch_fn ->
launch_counts — at d = 1, 2, 4, ... devices (weak scaling: constant photons
per device) and prints one JSON row per device count:
{"devices", "rays_per_sec", "rays_per_sec_per_device", "efficiency"} with
efficiency = rate_d / (d * rate_1) — the BASELINE multi-chip metric
(">= 85% efficiency at 2 hosts"). On a single-real-chip host only d=1 runs;
use JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 (or
--platform cpu, which sets both) for a virtual-mesh smoke run, and a real
multi-chip slice for hardware numbers.

Baseline note: the reference publishes NO throughput numbers (BASELINE.md).
The only quantified performance statement is the requirement "compute the
dosage map within 5 minutes" for 335M photons (Report §1.2) = 1.118 Mrays/s.
`vs_baseline` is measured against that requirement floor; interpret it as
"x times faster than the reference's stated requirement", not vs. a measured
OpenCL run (which this environment cannot execute).
"""

import argparse
import json
import os
import sys
import time

REQUIREMENT_RAYS_PER_SEC = 335_544_320 / 300.0  # Report §1.2 floor


def _load_scene_mesh():
    from uvtrace.geometry.gltf import load_glb
    from uvtrace.geometry.procedural import make_box_room

    scene_path = os.path.join(os.path.dirname(__file__), "assets", "testroomopt.glb")
    if os.path.exists(scene_path):
        return load_glb(scene_path)
    return make_box_room(subdivisions=60, clutter=40)  # ~44k-tri stand-in


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uvtrace.ops import accumulate as acc_ops
    from uvtrace.ops import generate as gen_ops
    from uvtrace.ops import shade as shade_ops
    from uvtrace.ops.cluster import build_clusters

    mesh = _load_scene_mesh()
    t_count = mesh.triangle_count
    lamp = jnp.array([0.0, mesh.floor_height + 0.8, 0.0], jnp.float32)
    areas = jnp.asarray(mesh.areas)

    backend = os.environ.get("UVTRACE_BENCH_BACKEND", "mxu-fused")
    cs = build_clusters(mesh.tris, cluster_size=128)  # product default (PERF.md r4)
    slot_map = None
    fused = None
    if backend in ("mxu", "mxu-fused", "pallas") and jax.default_backend() == "cpu":
        backend = "clustered"
    if backend in ("mxu", "mxu-fused"):
        import functools

        from uvtrace.ops.traverse_mxu import (
            build_mxu_scene,
            fused_trace_counts,
            traverse_mxu_counts,
        )

        scene = build_mxu_scene(cs)
        precision = os.environ.get("UVTRACE_BENCH_PRECISION", "high")
        extend = functools.partial(traverse_mxu_counts, precision=precision)
        if backend == "mxu-fused":
            fused = functools.partial(fused_trace_counts, precision=precision)
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
    # 20 iterations inside ONE jit: at 5 the fixed per-run dispatch+fence
    # through the remote-chip tunnel was ~20-25% of the measurement (r3's
    # 34.6 Mrays/s at iters=5 vs 41.0 steady-state, <0.1% run-to-run spread
    # at 20). Production amortizes far more (10 iterations x 2^25 rays).
    iters = int(os.environ.get("UVTRACE_BENCH_ITERS", 20))

    def one_iter(carry, i):
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        if fused is not None:
            # generate+trace+histogram in ONE kernel; rays never touch HBM
            _, _, counts = fused(scene, key, lamp, 1.0, n)
            return carry + counts, None
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
    np.asarray(dose)
    # correctness gate (round-3 verdict #4): the fixed-seed hit total is a
    # pinned invariant, not PERF.md prose. Split-path value computed with the
    # budget-audited clustered backend on CPU XLA (5 x 2^20 stratified rays,
    # PRNGKey(0), testroom); the fused kernel draws its photons from the
    # in-kernel RNG (a different, equally-stratified population), so it has
    # its own pinned total. ±64 absorbs float-marginal hit<->miss flips
    # between backends/compilers — a Mosaic miscompile (garbage/zero hits)
    # is orders of magnitude outside this.
    if (
        mesh.triangle_count == 44866
        and n == (1 << 20)
        and iters in (5, 20)
        and "UVTRACE_BENCH_PRECISION" not in os.environ
    ):
        total = int(np.asarray(counts).sum())
        expected = {
            (True, 5): 4_624_690,
            (True, 20): 18_499_935,
            (False, 5): 4_624_808,
            (False, 20): 18_500_845,
        }[(fused is not None, iters)]
        tol = 64 * (iters // 5)
        if abs(total - expected) > tol:  # not assert: survives python -O
            raise RuntimeError(
                f"bench hit-count invariant violated: {total} vs {expected} "
                f"(diff {total - expected}) — kernel correctness regression"
            )

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        counts, dose = run(idx)
        # fence with a host readback: on the remote-chip tunnel,
        # block_until_ready alone can return before the device work is done
        # (measured); the T-sized transfer itself is negligible
        np.asarray(dose)
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


def bounce_row(n=None, bounces=4, reflectance=0.5, iters=3, scene_mesh=None):
    """4-bounce diffuse+RR throughput through the product Simulator
    (BASELINE config 2). Returns the result-row dict."""
    import jax
    import numpy as np

    from uvtrace.io.routexml import LightPos
    from uvtrace.sim import SimParams, Simulator

    if n is None:
        n = (1 << 20) if jax.default_backend() == "tpu" else (1 << 13)
    mesh = scene_mesh if scene_mesh is not None else _load_scene_mesh()
    sim = Simulator(
        mesh,
        SimParams(photon_count=n, max_iterations=iters + 1,
                  max_bounces=bounces, reflectance=reflectance, seed=0),
        route=[LightPos(0.0, 0.0, 1.0)],
        ray_chunk=min(n, 1 << 20),
    )
    sim.run_iteration()  # compile + warmup
    np.asarray(sim.photon_map)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        sim.run_iteration()
        np.asarray(sim.photon_map)  # readback fence
        best = min(best, time.time() - t0)
    segs = sim._launch_n * (1 + bounces)
    return {
        "metric": f"all-segment rays/sec/chip ({bounces}-bounce diffuse+RR)",
        "value": round(segs / best, 1),
        "unit": "rays/s",
        "vs_baseline": round(sim._launch_n / best / REQUIREMENT_RAYS_PER_SEC, 3),
        "segments_per_photon": 1 + bounces,
    }


def scaling_rows(device_counts=None, rays_per_device=None, iters=3, scene_mesh=None):
    """Measure the product sharded path at each device count; returns the
    list of result-row dicts (also usable in-process by tests)."""
    import jax

    from uvtrace.io.routexml import LightPos
    from uvtrace.parallel import make_ray_mesh
    from uvtrace.sim import SimParams, Simulator

    avail = len(jax.devices())
    if not device_counts:  # None or an empty --devices list
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= avail]
    if max(device_counts) > avail:
        raise SystemExit(
            f"bench --scaling: {max(device_counts)} devices requested, "
            f"{avail} visible (JAX_PLATFORMS={jax.default_backend()}); use "
            "--platform cpu for a virtual smoke mesh"
        )
    if rays_per_device is None:
        rays_per_device = (1 << 20) if jax.default_backend() == "tpu" else (1 << 13)
    if scene_mesh is not None:
        mesh = scene_mesh
    elif jax.default_backend() == "cpu":
        # smoke lane: the virtual-device mesh validates the sharded path,
        # not absolute throughput — a small procedural room keeps it fast
        # (the 45k-tri scene through the CPU clustered backend is minutes)
        from uvtrace.geometry.procedural import make_box_room

        mesh = make_box_room(subdivisions=8, clutter=4, seed=0)
    else:
        mesh = _load_scene_mesh()

    rows = []
    base_per_dev = None
    for d in device_counts:
        sim = Simulator(
            mesh,
            SimParams(
                photon_count=d * rays_per_device,
                max_iterations=iters + 1,
                sampler="stratified",
            ),
            route=[LightPos(0.0, 0.0, 1.0)],
            ray_chunk=min(rays_per_device, 1 << 20),
            device_mesh=make_ray_mesh(d),
        )
        import numpy as np

        sim.run_iteration()  # compile + warmup
        np.asarray(sim.photon_map)  # readback fence (see main())
        t0 = time.time()
        for _ in range(iters):
            sim.run_iteration()
        np.asarray(sim.photon_map)
        dt = (time.time() - t0) / iters
        rate = sim._launch_n / dt  # photons actually traced per iteration
        per_dev = rate / d
        if base_per_dev is None:
            base_per_dev = per_dev
        rows.append(
            {
                "devices": d,
                "rays_per_sec": round(rate, 1),
                "rays_per_sec_per_device": round(per_dev, 1),
                "efficiency": round(per_dev / base_per_dev, 4),
                "backend": sim.backend,
                "platform": jax.default_backend(),
            }
        )
    return rows


def scaling_main(args):
    for row in scaling_rows(
        device_counts=args.devices, rays_per_device=args.rays, iters=args.iters
    ):
        print(json.dumps(row))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="uvtrace throughput benchmark")
    p.add_argument("--scaling", action="store_true",
                   help="multi-device weak-scaling rows via the product "
                        "sharded path (one JSON row per device count)")
    p.add_argument("--bounce", action="store_true",
                   help="4-bounce diffuse+RR all-segment throughput "
                        "(BASELINE config 2) instead of the direct pipeline")
    p.add_argument("--devices", type=int, nargs="*", default=None,
                   metavar="N", help="device counts to measure (default: "
                   "powers of two up to the visible device count)")
    p.add_argument("--rays", type=int, default=None,
                   help="photons per device per iteration")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="cpu = force an 8-virtual-device CPU mesh (must be "
                        "the FIRST jax touch in the process)")
    return p.parse_args(argv)


def run_cli(argv=None):
    args = parse_args(argv)
    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
        # config update, not just the env var: site-installed device plugins
        # can override JAX_PLATFORMS (same pin as tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.scaling:
        scaling_main(args)
    elif args.bounce:
        print(json.dumps(bounce_row(n=args.rays, iters=args.iters)))
    else:
        main()


if __name__ == "__main__":
    run_cli()
