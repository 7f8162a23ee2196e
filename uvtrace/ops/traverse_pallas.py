"""Pallas TPU packet-traversal kernel — the extend-stage fast path.

Design (replaces cl/extend.cl's per-thread DFS, SURVEY.md §7 hard part #1):

- Rays are processed in *packets* of 1024 = one (8,128) VPU tile per
  component; ray r sits at (sublane r%8, lane r//8). Packets are
  direction-coherent by construction (ops/generate.generate_stratified).
- The scene is clustered (ops/cluster.py): triangles live in VMEM as
  lane-major tiles `tri[L, 16, 128]` (rows v0.xyz, e1.xyz, e2.xyz; lanes =
  the cluster's 128 triangles), so a cluster load is one contiguous (16,128)
  VMEM read — no gathers anywhere.
- A binned-SAH top tree over cluster AABBs lives in SMEM via scalar prefetch
  (PrefetchScalarGridSpec): node boxes + meta are scalar loads, free of
  vector-memory traffic.
- Each packet runs an ordered DFS with ONE shared stack (scalar, SMEM):
  pop node -> slab-test both children against all 1024 rays (VPU, box scalars
  broadcast) -> descend near-first, skipping subtrees no ray can improve on
  (packet upper bound = max over rays of current best t).
- Cluster (leaf) intersection is fully rotated compute: for each of 128
  ray-columns, Möller–Trumbore runs on an (8 rays x 128 triangles) tile —
  ray components are (8,1) column slices, triangle components are (1,128)
  rows of the cluster tile; both broadcast natively on the VPU. min/argmin
  over lanes gives each ray's best triangle in the cluster.

Returns original triangle ids (pads map to -1 through ClusteredScene.tri_idx).
Deterministic, atomic-free; closest-hit is an order-independent min.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvtrace.bvh.builder import build_bvh
from uvtrace.ops.cluster import ClusteredScene

BIG = np.float32(1e30)  # numpy scalar: jnp constants would be captured consts in the kernel
PACKET = 1024
STACK_DEPTH = 128
TRI_ROWS = 16  # v0(3), e1(3), e2(3), padding to sublane multiple


class PallasScene(NamedTuple):
    """Device arrays for the Pallas traversal (pytree)."""

    node_box: jax.Array  # f32[Nn*8] flat: minx,miny,minz,maxx,maxy,maxz,pad,pad
    node_meta: jax.Array  # i32[Nn*2] flat: (left_child | cluster_id, is_leaf)
    # (flat 1D because 2D SMEM windows pad the minor dim to 128 elements)
    tri: jax.Array  # f32[L, TRI_ROWS, 128] lane-major cluster tiles (VMEM)
    tri_idx_flat: jax.Array  # i32[L*128] padded slot -> original tri id (-1 pad)
    box_min: jax.Array  # f32[L,3] cluster AABBs (for wedge candidate culling)
    box_max: jax.Array  # f32[L,3]


def build_pallas_scene(cs: ClusteredScene) -> PallasScene:
    """Host-side: top tree over cluster AABBs + lane-major triangle tiles."""
    assert cs.cluster_size == 128, "pallas kernel is specialized to C=128"
    l_count = cs.n_clusters
    # Top tree: reuse the binned-SAH builder with each cluster's AABB encoded
    # as a degenerate triangle (v0=min, v1=max, v2=center) — bounds and
    # centroids come out right, one cluster per leaf.
    pseudo = np.stack(
        [cs.box_min, cs.box_max, 0.5 * (cs.box_min + cs.box_max)], axis=1
    ).astype(np.float32)
    top = build_bvh(pseudo, max_leaf_size=1)
    n_nodes = top.n_nodes
    node_box = np.zeros((n_nodes, 8), np.float32)
    node_box[:, 0:3] = top.node_min
    node_box[:, 3:6] = top.node_max
    node_meta = np.zeros((n_nodes, 2), np.int32)
    leaf = top.tri_count > 0
    node_meta[:, 1] = leaf.astype(np.int32)
    # leaf: meta0 = cluster id (the single pseudo-triangle's index);
    # internal: meta0 = left child (right = left+1)
    node_meta[leaf, 0] = top.tri_idx[top.left_first[leaf]]
    node_meta[~leaf, 0] = top.left_first[~leaf]

    tri = np.zeros((l_count, TRI_ROWS, 128), np.float32)
    v0 = cs.tris[:, :, 0]  # [L,128,3]
    e1 = cs.tris[:, :, 1] - v0
    e2 = cs.tris[:, :, 2] - v0
    tri[:, 0:3] = np.moveaxis(v0, 2, 1)
    tri[:, 3:6] = np.moveaxis(e1, 2, 1)
    tri[:, 6:9] = np.moveaxis(e2, 2, 1)
    return PallasScene(
        node_box=jnp.asarray(node_box.reshape(-1)),
        node_meta=jnp.asarray(node_meta.reshape(-1)),
        tri=jnp.asarray(tri),
        tri_idx_flat=jnp.asarray(cs.tri_idx.reshape(-1)),
        box_min=jnp.asarray(cs.box_min),
        box_max=jnp.asarray(cs.box_max),
    )


def _mt_columns(o, d, tile, cid, t_out, slot_out, col_flags=None):
    """Intersect a 1024-ray packet against one cluster tile (16,128) and merge
    into the packet state refs t_out/slot_out (block (1,8,128)).

    Static unroll over the 128 ray columns: TPU vector memory cannot index
    single lanes dynamically, but static lane slices are fine. Each step runs
    Möller–Trumbore (reference semantics, cl/extend.cl:6-27) on an
    (8 rays x 128 triangles) tile — ray components are (8,1) columns,
    triangle components (1,128) rows; both broadcast natively on the VPU.

    col_flags: optional (1,128) SMEM ref of per-column activity flags (any of
    the column's 8 rays can still be improved by this cluster) — inactive
    columns skip the whole MT body via `pl.when`.
    """
    v0x, v0y, v0z = tile[0:1], tile[1:2], tile[2:3]
    e1x, e1y, e1z = tile[3:4], tile[4:5], tile[5:6]
    e2x, e2y, e2z = tile[6:7], tile[7:8], tile[8:9]

    def column(g):
        cox = o[0][:, g : g + 1]
        coy = o[1][:, g : g + 1]
        coz = o[2][:, g : g + 1]
        cdx = d[0][:, g : g + 1]
        cdy = d[1][:, g : g + 1]
        cdz = d[2][:, g : g + 1]
        hx = cdy * e2z - cdz * e2y
        hy = cdz * e2x - cdx * e2z
        hz = cdx * e2y - cdy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(a == 0.0, jnp.float32(1.0), a)
        sx = cox - v0x
        sy = coy - v0y
        sz = coz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (cdx * qx + cdy * qy + cdz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        valid = (
            (jnp.abs(a) >= 1e-5)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 1e-4)
        )
        t = jnp.where(valid, t, BIG)
        col_t = jnp.min(t, axis=1, keepdims=True)  # (8,1)
        col_arg = jnp.argmin(t, axis=1).reshape(8, 1).astype(jnp.int32)
        cur_t = t_out[0, :, g : g + 1]
        cur_s = slot_out[0, :, g : g + 1]
        better = col_t < cur_t
        t_out[0, :, g : g + 1] = jnp.where(better, col_t, cur_t)
        slot_out[0, :, g : g + 1] = jnp.where(better, cid * 128 + col_arg, cur_s)

    for g in range(128):
        if col_flags is None:
            column(g)
        else:
            pl.when(col_flags[0, g] > 0)(lambda g=g: column(g))


def _kernel(node_box, node_meta, ox, oy, oz, dx, dy, dz, tri_ref, t_out, slot_out,
            stack, vflags, sflags, dma_sem):
    o = (ox[0], oy[0], oz[0])
    d = (dx[0], dy[0], dz[0])
    inv = tuple(1.0 / jnp.where(c == 0.0, jnp.float32(1e-30), c) for c in d)
    t_out[0] = jnp.full((8, 128), BIG)
    slot_out[0] = jnp.full((8, 128), -1, jnp.int32)

    def aabb(node):
        """Packet slab test vs node box -> (tmin (8,128), hit mask)."""
        tmin = jnp.full((8, 128), -BIG)
        tmax = jnp.full((8, 128), BIG)
        for axis in range(3):
            t1 = (node_box[node * 8 + axis] - o[axis]) * inv[axis]
            t2 = (node_box[node * 8 + axis + 3] - o[axis]) * inv[axis]
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        return tmin, (tmax >= tmin) & (tmax > 0)

    def intersect_cluster(node, cid):
        # per-column activity mask: a column (8 rays) participates only if
        # some ray both enters this cluster's box and could improve its best
        # hit; inactive columns skip the whole MT body. The (1,128) vector
        # mask crosses to the scalar domain with one VMEM->SMEM DMA.
        tmin, m = aabb(node)
        act = m & (tmin < t_out[0])
        vflags[:] = jnp.any(act, axis=0, keepdims=True).astype(jnp.int32)
        cp = pltpu.make_async_copy(vflags, sflags, dma_sem)
        cp.start()
        cp.wait()
        _mt_columns(o, d, tri_ref[cid], cid, t_out, slot_out, col_flags=sflags)

    def body(carry):
        sp, t_ub = carry
        node = stack[sp - 1]
        sp = sp - 1
        is_leaf = node_meta[node * 2 + 1] == 1

        def leaf_case(sp, t_ub):
            intersect_cluster(node, node_meta[node * 2])
            return sp, jnp.max(t_out[0])  # packet bound tightens after leaves

        def inner_case(sp, t_ub):
            c1 = node_meta[node * 2]
            c2 = c1 + 1
            t_best = t_out[0]
            tmin1, m1 = aabb(c1)
            tmin2, m2 = aabb(c2)
            v1 = jnp.any(m1 & (tmin1 < t_ub) & (tmin1 < t_best))
            v2 = jnp.any(m2 & (tmin2 < t_ub) & (tmin2 < t_best))
            d1 = jnp.min(jnp.where(m1, tmin1, BIG))
            d2 = jnp.min(jnp.where(m2, tmin2, BIG))
            # push far child first so the near one is processed next
            near_first = d1 <= d2
            first = jnp.where(near_first, c2, c1)  # pushed first (far)
            second = jnp.where(near_first, c1, c2)  # pushed last (near, on top)
            vfirst = jnp.where(near_first, v2, v1)
            vsecond = jnp.where(near_first, v1, v2)

            @pl.when(vfirst)
            def _():
                stack[sp] = first

            sp1 = sp + vfirst.astype(jnp.int32)

            @pl.when(vsecond)
            def _():
                stack[sp1] = second

            return sp1 + vsecond.astype(jnp.int32), t_ub

        return jax.lax.cond(is_leaf, leaf_case, inner_case, sp, t_ub)

    stack[0] = jnp.int32(0)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (jnp.int32(1), BIG))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse_pallas_padded(scene: PallasScene, o3, d3, interpret=False):
    """o3/d3: f32[G, 1024, 3] packet-major rays."""
    g_total = o3.shape[0]
    # component-planes [G,8,128]; ray r of packet g at (r%8, r//8)
    def plane(x, c):
        return x[:, :, c].reshape(g_total, 128, 8).swapaxes(1, 2)

    comps = [plane(o3, 0), plane(o3, 1), plane(o3, 2), plane(d3, 0), plane(d3, 1), plane(d3, 2)]

    # Node arrays ride as whole-array SMEM inputs (a scalar-prefetch operand
    # would be duplicated per grid step by the pipeline — 528K each for a
    # 128-packet launch, blowing the 1M SMEM budget).
    t, slot = pl.pallas_call(
        _kernel,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # node_box
            pl.BlockSpec(memory_space=pltpu.SMEM),  # node_meta
        ]
        + [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # tri tiles, fully resident
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_total, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((g_total, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(scene.node_box, scene.node_meta, *comps, scene.tri)
    # back to ray-linear order, map padded slots to original ids
    t = t.swapaxes(1, 2).reshape(g_total * PACKET)
    slot = slot.swapaxes(1, 2).reshape(g_total * PACKET)
    hit = jnp.where(
        slot >= 0, scene.tri_idx_flat[jnp.maximum(slot, 0)], jnp.int32(-1)
    )
    hit = jnp.where(t >= BIG, -1, hit)
    return t, hit


def traverse_pallas(scene: PallasScene, orig, direction, *, interpret: bool = False, **_):
    """Closest-hit via the Pallas packet-DFS kernel (works for ANY rays,
    coherent or not — no candidate budget).

    orig/direction: f32[R,3], R a multiple of 1024.
    Returns (t, hit_original_ids); miss => (1e30, -1).
    """
    r = orig.shape[0]
    assert r % PACKET == 0, (r, PACKET)
    o3 = orig.reshape(r // PACKET, PACKET, 3)
    d3 = direction.reshape(r // PACKET, PACKET, 3)
    return _traverse_pallas_padded(scene, o3, d3, interpret=interpret)
