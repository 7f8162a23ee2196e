"""Multi-chip execution: ray-axis sharding over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2 'Distributed communication backend:
none'); this module is the TPU-native scale-out design:

- the photon batch is embarrassingly parallel -> shard the `rays` axis;
- the scene (clusters + BVH, a few MB) is replicated on every chip;
- each chip histograms its own hits locally, and the per-triangle count
  partials are summed with one `psum` over ICI — the collective replaces the
  reference's atomic_inc global-memory contention (cl/extend.cl:95-98);
- dose accumulators stay replicated (they are T-sized, tiny next to rays).

Per-shard RNG: every device folds its mesh position into the launch key, so
the union of shards is the same photon population regardless of device count
(statistically; bit-identical for a fixed mesh shape).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uvtrace.ops import accumulate as acc_ops
from uvtrace.ops import generate as gen_ops
from uvtrace.ops.traverse_clustered import ClusterArrays, traverse_clustered

RAY_AXIS = "rays"


def make_ray_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D device mesh over the `rays` axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (RAY_AXIS,), devices=devices)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "n_per_device",
        "t_count",
        "sampler",
        "method",
        "max_clusters",
        "extend_fn",
    ),
)
def sharded_launch_counts(
    mesh: Mesh,
    scene,
    key,
    lamp_xyz,
    light_length,
    *,
    n_per_device: int,
    t_count: int,
    sampler: str = "stratified",
    method: str = "segment",
    max_clusters: int = 32,
    extend_fn=None,
    slot_map=None,
):
    """Replicated int32[t_count] hit counts for n_per_device x |mesh| photons.

    One generate->traverse->histogram->psum step, shard_mapped over the ray
    axis. The scene rides in replicated; XLA keeps it resident per chip.

    extend_fn(scene, orig, dir, lamp_xyz=, light_length=) -> (t, ids-or-slots)
    defaults to the XLA clustered traversal; pass the MXU kernel
    (traverse_mxu_slots + slot_map=scene.tri_idx_flat) on TPU — each chip runs
    the Pallas kernel on its own ray shard, and the psum rides slot bins so
    the per-ray id gather never happens.
    """
    if extend_fn is None:
        extend_fn = functools.partial(traverse_clustered, max_clusters=max_clusters)
    n_bins = t_count if slot_map is None else int(slot_map.shape[0])

    def shard_fn(scene, key, lamp_xyz, light_length):
        dev = jax.lax.axis_index(RAY_AXIS)
        k = jax.random.fold_in(key, dev)
        if sampler == "stratified":
            rays = gen_ops.generate_stratified(
                k, n_per_device, lamp_xyz, light_length, packet=min(1024, n_per_device)
            )
        else:
            rays = gen_ops.generate_native(k, n_per_device, lamp_xyz, light_length)
        res = extend_fn(
            scene, rays.orig, rays.dir, lamp_xyz=lamp_xyz, light_length=light_length
        )
        counts = acc_ops.hit_counts(res[1], n_bins, method)
        return jax.lax.psum(counts, RAY_AXIS)

    fn = jax.shard_map(
        lambda s, k, l, ll: shard_fn(s, k, l, ll),
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    counts = fn(scene, key, lamp_xyz, jnp.float32(light_length))
    if slot_map is not None:
        counts = acc_ops.slots_to_tri(counts, slot_map, t_count)
    return counts


TEXEL_AXIS = "texels"


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "n_per_device",
        "n_texels",
        "sampler",
        "method",
        "max_clusters",
    ),
)
def sharded_texel_counts(
    mesh: Mesh,
    scene: ClusterArrays,
    atlas,
    tri_v0,
    tri_e1,
    tri_e2,
    key,
    lamp_xyz,
    light_length,
    *,
    n_per_device: int,
    n_texels: int,
    sampler: str = "stratified",
    method: str = "sort",
    max_clusters: int = 32,
):
    """Texel dose-map partials over a 2-D (rays, texels) mesh — the
    BASELINE config-5 layout (4K dose maps sharded over a pod slice).

    Every (ray-shard, texel-shard) device traces its own photon sub-batch
    (scene + atlas replicated — a few MB), bins ONLY the texel range it owns,
    and the partials are `psum`ed over the ray axis. The returned dose-count
    vector is sharded over `texels` and replicated over `rays`: reductions
    ride ICI, and no device ever materializes the full 4K map's worth of
    per-ray scatter traffic.
    """
    assert n_texels % mesh.shape[TEXEL_AXIS] == 0, (n_texels, mesh.shape)
    shard_slots = n_texels // mesh.shape[TEXEL_AXIS]

    def shard_fn(scene, atlas, tri_v0, tri_e1, tri_e2, key, lamp_xyz, light_length):
        from uvtrace.ops import texel as texel_ops

        ray_id = jax.lax.axis_index(RAY_AXIS)
        tex_id = jax.lax.axis_index(TEXEL_AXIS)
        k = jax.random.fold_in(key, ray_id)
        if sampler == "stratified":
            rays = gen_ops.generate_stratified(
                k, n_per_device, lamp_xyz, light_length, packet=min(1024, n_per_device)
            )
        else:
            rays = gen_ops.generate_native(k, n_per_device, lamp_xyz, light_length)
        t_hit, hit = traverse_clustered(
            scene, rays.orig, rays.dir, max_clusters=max_clusters
        )
        safe = jnp.maximum(hit, 0)
        u, v = texel_ops.barycentrics(
            rays.orig, rays.dir, t_hit, tri_v0[safe], tri_e1[safe], tri_e2[safe]
        )
        slots = texel_ops.texel_ids(atlas, hit, u, v)
        # keep only the texel range this shard owns
        lo = tex_id * shard_slots
        local = jnp.where((slots >= lo) & (slots < lo + shard_slots), slots - lo, -1)
        counts = acc_ops.hit_counts(local, shard_slots, method)
        return jax.lax.psum(counts, RAY_AXIS)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(TEXEL_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return fn(scene, atlas, tri_v0, tri_e1, tri_e2, key, lamp_xyz, jnp.float32(light_length))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "n_per_device",
        "t_count",
        "sampler",
        "method",
        "max_clusters",
        "extend_fn",
    ),
)
def sharded_sim_step(
    mesh: Mesh,
    scene,
    photon_map,
    max_photon_map,
    key,
    lamp_xyz,
    duration,
    light_length,
    *,
    n_per_device: int,
    t_count: int,
    sampler: str = "stratified",
    method: str = "segment",
    max_clusters: int = 32,
    extend_fn=None,
    slot_map=None,
):
    """One full waypoint step: counts (sharded) + dose accumulation
    (ComputeSingleLightDosageMap + accumulate, raytracer.cpp:75-88 +
    cl/accumulate.cl). Returns (photon_map, max_photon_map)."""
    counts = sharded_launch_counts(
        mesh,
        scene,
        key,
        lamp_xyz,
        light_length,
        n_per_device=n_per_device,
        t_count=t_count,
        sampler=sampler,
        method=method,
        max_clusters=max_clusters,
        extend_fn=extend_fn,
        slot_map=slot_map,
    )
    return acc_ops.accumulate_dose(photon_map, max_photon_map, counts, duration)
