"""MXU cluster-intersection kernel — extend-stage fast path, generation 2.

Two ideas replace the packet-DFS VPU kernel (traverse_pallas.py):

1. MXU Möller–Trumbore. Every ray-triangle quantity MT needs is a 3x3
   determinant, and determinants are LINEAR in a small per-ray feature
   vector. With Plücker coordinates (d, m = o x d) the three edge-side tests
   and the plane-equation t numerator are all dot products

       side_i = d . (a_i x b_i)  +  m . (b_i - a_i)     (edge a_i -> b_i)
       t_num  = n . v0  -  n . o                         (n = geometric normal)
       t_den  = side_0 + side_1 + side_2 = n . d         (exact identity)

   so intersecting a whole 1024-ray packet against a whole 128-triangle
   cluster is ONE matmul  feat[cid] (16,4C) x rfeat (16,1024)  on the MXU
   plus a short VPU epilogue (sign agreement + eps tests + min/argmin).

2. Scan-and-extract traversal (no tree). The scene has only a few hundred
   clusters, so the packet frustum (conservative interval arithmetic over the
   packet's origin/direction bounds) is slab-tested against ALL cluster AABBs
   in one vectorized pass; a selection loop then extracts candidate clusters
   in near-to-far entry order, crosses them to the scalar domain with one
   VMEM->SMEM DMA per batch, and a scalar loop visits leaves until the packet
   upper bound (max over rays of current best t) rules the rest out. This
   removed a 44 us/packet scalar DFS (measured): per-node scalar<->vector
   round trips are gone; the vector units only ever see leaf work.

Semantics match cl/extend.cl:6-27 (Möller–Trumbore with |det| >= 1e-5
parallel rejection and t > 1e-4 near clip): sum(sides) equals MT's
determinant exactly, the sign test is MT's 0 <= u, v, u+v <= 1, and
t = t_num/t_den is the same plane intersection MT computes. Closest hit is an
order-independent min => deterministic and atomic-free (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvtrace.ops.cluster import ClusteredScene

BIG = np.float32(1e30)
PACKET = 1024
NFEAT = 16  # d(3), m=o x d(3), o(3), 1; padded to a sublane multiple
K3 = 32  # bf16x3-packed contraction rows (29 used, padded to sublane x2)
KBATCH = 8  # candidates extracted per vector->scalar crossing. Sweep
#   (r4, fused direct, honest fencing): 8 -> 41.08, 16 -> 40.28, 32 -> 37.02
#   Mrays/s (coherent packets average ~10 candidates, so 8 covers most in
#   one batch with half the wasted extraction mins); bounce end-to-end is
#   neutral (8.12 vs 8.08). r5: 4 -> 40.76 vs 8 -> 40.48 same-day — parity
#   within tunnel noise, sweep closed at 8.


class MxuScene(NamedTuple):
    """Device arrays for the MXU traversal (pytree)."""

    boxes: jax.Array  # f32[6, 8, L8] cluster AABBs: rows min.xyz,max.xyz;
    #                   cluster c lives at (c % 8, c // 8); pads = +BIG
    feat: jax.Array  # f32[LG, NFEAT, 4*G*C] per-GROUP feature tiles (below)
    feat3: jax.Array  # bf16[LG, K3, 4*G*C] bf16x3-packed tiles ("high" tier)
    tri_idx_flat: jax.Array  # i32[LG*G*C] padded slot -> original tri id (-1)


def _bf16_split(x32: np.ndarray):
    """(hi, lo) bf16 split of f32 values: hi + lo == x to ~16 mantissa bits."""
    import ml_dtypes

    hi = x32.astype(ml_dtypes.bfloat16)
    lo = (x32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _pack_feat3(feat_f32: np.ndarray) -> np.ndarray:
    """Pack f32 feature tiles (..., NFEAT, M) into single-pass bf16x3 rows.

    The MXU's systolic array is 128 deep, so a K=10 contraction pays for 128
    rows regardless — the padding rows are FREE compute. bf16x3 (three
    sequential passes f_hi.r_hi + f_hi.r_lo + f_lo.r_hi) therefore folds into
    ONE pass by materializing each product term as its own contraction row:

      rows  0..9  : f_hi[j]  paired with r_hi[j]   (j = d,m,o,1)
      rows 10..18 : f_hi[j]  paired with r_lo[j]   (j = d,m,o; the constant
                    1-row has r_lo == 0 and is dropped)
      rows 19..28 : f_lo[j]  paired with r_hi[j]
      rows 29..31 : zero padding (sublane alignment)

    Same products, same f32 accumulation, 1/3 the MXU streaming time. The
    ray-side rows are packed to match in _pack_rf3 / the fused kernel.
    """
    f32 = np.asarray(feat_f32, np.float32)
    f_hi, f_lo = _bf16_split(f32)
    shape = list(f32.shape)
    shape[-2] = K3
    out = np.zeros(shape, f_hi.dtype)
    out[..., 0:10, :] = f_hi[..., 0:10, :]
    out[..., 10:19, :] = f_hi[..., 0:9, :]
    out[..., 19:29, :] = f_lo[..., 0:10, :]
    return out


def _pack_rf3(rf10: jax.Array) -> jax.Array:
    """Ray-side counterpart of _pack_feat3: (G, 10, P) f32 -> (G, K3, P) bf16.

    rows 0..9 r_hi; rows 10..18 r_lo (constant 1-row dropped, its lo is 0);
    rows 19..28 r_hi again (paired with the f_lo rows); rows 29..31 zero.
    """
    hi = rf10.astype(jnp.bfloat16)
    lo = (rf10 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    g, _, p = rf10.shape
    pad = jnp.zeros((g, K3 - 29, p), jnp.bfloat16)
    return jnp.concatenate([hi, lo[:, 0:9], hi, pad], axis=1)


def needs_hbm_tiles(n_clusters: int, cluster_size: int) -> bool:
    """True when the scene's Plücker feature tiles exceed the ~96 MB VMEM
    budget and must live in HBM with per-visit double-buffered DMA
    (hbm_tiles mode). The footprint scales with PADDED slots
    (clusters x cluster_size; measured cluster fill ~0.7), so decide AFTER
    clustering. Single source of truth for the Simulator and the diff
    layer."""
    return n_clusters * cluster_size * 4 * K3 * 2 > (96 << 20)


def build_mxu_scene(cs: ClusteredScene, group: int = 1) -> MxuScene:
    """Host-side: padded AABB planes + grouped Plücker feature tiles.

    Clusters are packed into GROUPS of `group` consecutive clusters (the SAH
    cluster builder emits DFS order, so consecutive clusters are spatial
    siblings). Culling stays at per-cluster AABB granularity (tight boxes),
    but the matmul runs once per GROUP on a static contiguous tile — the
    weight-load and scalar-visit-loop overhead of the per-cluster matmul is
    amortized `group`-fold with NO per-packet gather (the layout is built
    here, once per scene).

    feat[g, :, q*G*C + u*C + j] is the 16-coefficient vector of quantity q
    for triangle j of member cluster u of group g; rows are the ray-feature
    basis [dx,dy,dz, mx,my,mz, ox,oy,oz, 1, 0...]. Quantities: q=0,1,2 the
    edge side tests, q=3 the t numerator. Within a quantity slice the column
    index u*C + j is exactly the group-local slot, so the kernel's slot
    arithmetic (gid * G*C + local) yields the same global flat slot order
    cluster_id * C + lane as the ungrouped layout. Padded (degenerate)
    triangles are all zeros -> sum(sides)=0 -> rejected by |den| >= 1e-5.
    """
    c_sz = cs.cluster_size
    assert c_sz % 8 == 0 and c_sz <= 512, c_sz
    assert group in (1, 2, 4, 8), group
    l_count = cs.n_clusters
    l_pad = -(-l_count // group) * group  # multiple of `group`
    l8 = max(1, -(-l_pad // 8))
    boxes = np.full((6, 8 * l8), BIG, np.float32)
    boxes[0:3, :l_count] = cs.box_min.T
    boxes[3:6, :l_count] = cs.box_max.T
    # column-major placement: cluster c at (row c % 8, col c // 8), so the
    # `group` members of group g are consecutive rows of one column and the
    # kernel reduces them with a sublane-axis min/any
    boxes = boxes.reshape(6, l8, 8).swapaxes(1, 2).copy()

    a = cs.tris[:, :, 0].astype(np.float64)  # [L,C,3] f64 for feature prep
    b = cs.tris[:, :, 1].astype(np.float64)
    c = cs.tris[:, :, 2].astype(np.float64)
    n = np.cross(b - a, c - a)  # geometric normal (unnormalized)
    feat = np.zeros((l_pad, NFEAT, 4, c_sz), np.float32)
    for q, (edge_a, edge_b) in enumerate(((a, b), (b, c), (c, a))):
        feat[:l_count, 0:3, q] = np.moveaxis(np.cross(edge_a, edge_b), 2, 1)  # . d
        feat[:l_count, 3:6, q] = np.moveaxis(edge_b - edge_a, 2, 1)  # . m
    feat[:l_count, 6:9, 3] = np.moveaxis(-n, 2, 1)  # . o
    feat[:l_count, 9, 3] = np.einsum("ljk,ljk->lj", n, a)  # n . v0
    # (Lpad, NFEAT, 4, C) -> (LG, G, NFEAT, 4, C) -> (LG, NFEAT, 4, G, C)
    lg = l_pad // group
    feat = feat.reshape(lg, group, NFEAT, 4, c_sz)
    feat = np.moveaxis(feat, 1, 3)  # (LG, NFEAT, 4, G, C)
    feat = feat.reshape(lg, NFEAT, 4 * group * c_sz)
    tri_idx = np.full((l_pad, c_sz), -1, np.int32)
    tri_idx[:l_count] = cs.tri_idx
    return MxuScene(
        boxes=jnp.asarray(boxes),
        feat=jnp.asarray(feat),
        feat3=jnp.asarray(_pack_feat3(feat)),
        tri_idx_flat=jnp.asarray(tri_idx.reshape(-1)),
    )


def _kernel(pb, boxes, rfeat, feat, t_out, slot_out, counts, ebuf_v, ibuf_v, ebuf_s, ibuf_s,
            vlist, sems, tile_v=None, tsems=None, *, precision, with_counts, group, hbm_tiles):
    pb_vals = [pb[0, 0, k] for k in range(12)]
    _trace(pb_vals, boxes, rfeat[0], feat, t_out, slot_out, counts, ebuf_v,
           ibuf_v, ebuf_s, ibuf_s, vlist, sems,
           precision=precision, with_counts=with_counts, group=group,
           tile_v=tile_v, tsems=tsems, hbm_tiles=hbm_tiles)


def _trace(pb_vals, boxes, rf, feat, t_out, slot_out, counts, ebuf_v, ibuf_v, ebuf_s, ibuf_s,
           vlist, sems, *, precision, with_counts, group=1,
           tile_v=None, tsems=None, hbm_tiles=False):
    # hbm_tiles: feature tiles live in HBM (scenes past the ~96 MB VMEM
    # budget, >~380k tris); each visited tile is DMAed into one of two VMEM
    # scratch slots, double-buffered so candidate j+1's fetch overlaps
    # candidate j's matmul. Identical math and results either way.
    packet = rf.shape[-1]  # rays per packet (1024 default; sweepable)
    t_out[0] = jnp.full((1, packet), BIG)
    slot_out[0] = jnp.full((1, packet), -1, jnp.int32)
    l8 = boxes.shape[2]
    if with_counts:
        # per-slot hit counts accumulate across the (sequential) grid steps
        # in this constant-index output block; zero once at the first packet
        @pl.when(pl.program_id(0) == 0)
        def _():
            counts[:, :] = jnp.zeros(counts.shape, jnp.int32)
    c_sz = feat.shape[2] // 4  # triangles per cluster

    # ---- phase 1: frustum vs ALL cluster AABBs, one vector pass -----------
    # Conservative interval slab test: the t-interval of plane x=p over the
    # packet is (p - O) * INV with O the origin interval and INV the inverse
    # direction interval; a slab's interval is the hull over both planes, and
    # intersecting the three slab intervals bounds every ray's [entry, exit].
    # An axis whose direction interval spans 0 contributes the full line.
    entry = jnp.full((8, l8), -BIG)
    exit_ = jnp.full((8, l8), BIG)
    sbig = jnp.float32(1e18)  # half-line sentinel; |g|*sbig stays finite f32
    for ax in range(3):
        o_lo, o_hi = pb_vals[ax], pb_vals[3 + ax]
        d_lo, d_hi = pb_vals[6 + ax], pb_vals[9 + ax]
        # Only a STRICTLY two-sided direction interval (or the degenerate
        # all-zero axis) leaves the axis unconstrained. A one-sided interval
        # touching 0 (d_lo == 0 < d_hi, common for analytic stratum-cell
        # bounds whose trig endpoints are exactly 0) is a HALF-line: the
        # unbounded end of 1/d is a large finite sentinel, which keeps the
        # other three interval products constraining. Treating touch-zero as
        # spanning cost ~9x candidate overfetch on the fused path (measured).
        spans = jnp.logical_or(
            jnp.logical_and(d_lo < 0.0, d_hi > 0.0),
            jnp.logical_and(d_lo == 0.0, d_hi == 0.0),
        )
        i_lo = 1.0 / jnp.where(d_hi == 0.0, jnp.float32(1.0), d_hi)
        i_lo = jnp.where(d_hi == 0.0, -sbig, i_lo)
        i_hi = 1.0 / jnp.where(d_lo == 0.0, jnp.float32(1.0), d_lo)
        i_hi = jnp.where(d_lo == 0.0, sbig, i_hi)
        g_lo = boxes[ax] - o_hi  # (8, l8): hull of (box - O) over both planes
        g_hi = boxes[3 + ax] - o_lo
        p1, p2 = g_lo * i_lo, g_lo * i_hi
        p3, p4 = g_hi * i_lo, g_hi * i_hi
        s_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        s_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        s_lo = jnp.where(spans, jnp.float32(-BIG), s_lo)
        s_hi = jnp.where(spans, jnp.float32(BIG), s_hi)
        entry = jnp.maximum(entry, s_lo)
        exit_ = jnp.minimum(exit_, s_hi)
    may_hit = jnp.logical_and(entry <= exit_, exit_ > 0.0)
    # ---- group reduction: culling is per-cluster (tight boxes), the visit
    # loop and matmul run per GROUP of `group` consecutive clusters. Cluster
    # c sits at (row c % 8, col c // 8) (build_mxu_scene), so group
    # g = col*nrb + rb owns rows [rb*group, (rb+1)*group) of column col and
    # the reduction is a sublane-axis min. Pad clusters inside a real group
    # are harmless even when the degenerate all-axes-span frustum marks them
    # hit: their feat[] columns exist (zeros) and every pad triangle is
    # rejected by the |den| >= 1e-5 test.
    nrb = 8 // group
    lg = feat.shape[0]  # number of groups
    e_masked = jnp.where(may_hit, jnp.maximum(entry, 0.0), BIG)
    e_grp = e_masked.reshape(nrb, group, l8).min(axis=1)  # (nrb, l8)
    g_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (nrb, l8), 1) * nrb
        + jax.lax.broadcasted_iota(jnp.int32, (nrb, l8), 0)
    )
    # groups beyond the real group count MUST stay at BIG: when every
    # direction axis spans 0 the slab test degenerates to "always hit", and a
    # visited pad group would read feat[] out of bounds (garbage hits)
    valid = jnp.logical_and(e_grp < BIG, g_idx < lg)
    # Packed sort keys: entry is >= 0, so its f32 bit pattern is monotone in
    # value; the low `idx_bits` mantissa bits are replaced by the group id.
    # min(keys) then yields BOTH the nearest group and a truncated-DOWN
    # (i.e. still conservative) entry bound in one reduction per extraction.
    idx_bits = max(1, (nrb * l8 - 1).bit_length())
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    ibig = jnp.int32(0x7F7FFFFF)  # bits of f32 max; sorts after everything
    entry_bits = pltpu.bitcast(e_grp, jnp.int32)
    keys0 = jnp.where(valid, (entry_bits & ~idx_mask) | g_idx, ibig)  # (nrb, l8)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)  # buffer-row lanes
    # rf: (NFEAT, packet) ray-feature value (from HBM rays or the fused
    # in-kernel generator)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (c_sz, packet), 0)

    dot_kw = dict(
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    def leaf(cid, t_ub, slot=None):
        fc = tile_v[slot] if hbm_tiles else feat[cid]
        if precision == "high":
            # bf16x3 quality in ONE MXU pass: both operands arrive with the
            # three product terms packed as extra contraction rows
            # (_pack_feat3 / _pack_rf3) — the systolic array is 128 deep, so
            # rows 10..28 ride the K-padding the K=10 layout wasted anyway.
            # Replaced three sequential bf16 dots (measured 3x the cost).
            q = jax.lax.dot_general(fc, rf, **dot_kw)
        else:
            q = jax.lax.dot_general(fc, rf, precision=precision, **dot_kw)
        # (4*c_sz, PACKET)
        s0, s1, s2, tn = (
            q[0:c_sz],
            q[c_sz : 2 * c_sz],
            q[2 * c_sz : 3 * c_sz],
            q[3 * c_sz : 4 * c_sz],
        )
        den = s0 + s1 + s2  # == n . d (exact identity)
        mn = jnp.minimum(jnp.minimum(s0, s1), s2)
        mx = jnp.maximum(jnp.maximum(s0, s1), s2)
        # all sides share a sign (edge-inclusive) <=> min*max >= 0
        ok = (mn * mx >= 0.0) & (jnp.abs(den) >= 1e-5)
        t = tn / jnp.where(den == 0.0, jnp.float32(1.0), den)
        t = jnp.where(ok & (t > 1e-4), t, BIG)
        tmin = jnp.min(t, axis=0, keepdims=True)  # (1, PACKET)
        arg = jnp.min(
            jnp.where(t <= tmin, row_id, jnp.int32(1 << 30)), axis=0, keepdims=True
        )
        cur = t_out[0]
        better = tmin < cur
        slot_out[0] = jnp.where(better, cid * c_sz + arg, slot_out[0])
        t_out[0] = jnp.where(better, tmin, cur)
        return jnp.max(t_out[0])  # packet bound tightens after leaves

    # ---- phase 2: near-ordered extraction + scalar visit loop -------------
    # NOTE on pipelining (PERF.md roadmap #1, tried & REJECTED): a double-
    # buffered variant that speculatively extracted batch k+1 (into buffer
    # row 1-p) while batch k was visited measured 32.25 vs 36.4 Mrays/s —
    # most packets need exactly ONE batch, so the speculative extraction is
    # pure added VPU work that does NOT hide under the MXU visit stream (the
    # issue order serializes the vector mins ahead of the first leaf matmul).
    # The serial form below extracts, DMAs, waits, visits.
    def extract_batch(keys, p):
        """Pull the next KBATCH near-ordered candidates into buffer row p and
        START its DMA (consumer waits via wait_batch(p))."""

        def extract(k, keys):
            m = jnp.min(keys)
            ibuf_v[pl.ds(p, 1), :] = jnp.where(
                kiota == k, m, ibuf_v[pl.ds(p, 1), :]
            )
            return jnp.where(keys == m, ibig, keys)

        keys = jax.lax.fori_loop(0, KBATCH, extract, keys)
        # split packed keys: entry bound (f32 bits, idx bits zeroed -> still
        # a lower bound on the true entry) and cluster id
        ebuf_v[pl.ds(p, 1), :] = pltpu.bitcast(
            ibuf_v[pl.ds(p, 1), :] & ~idx_mask, jnp.float32
        )
        ibuf_v[pl.ds(p, 1), :] = ibuf_v[pl.ds(p, 1), :] & idx_mask
        pltpu.make_async_copy(ebuf_v.at[p], ebuf_s.at[p], sems.at[2 * p]).start()
        pltpu.make_async_copy(ibuf_v.at[p], ibuf_s.at[p], sems.at[2 * p + 1]).start()
        return keys

    def wait_batch(p):
        pltpu.make_async_copy(ebuf_v.at[p], ebuf_s.at[p], sems.at[2 * p]).wait()
        pltpu.make_async_copy(ibuf_v.at[p], ibuf_s.at[p], sems.at[2 * p + 1]).wait()

    def batch_body(carry):
        keys, t_ub, _more, vbase = carry
        keys = extract_batch(keys, 0)
        wait_batch(0)

        def visit_cond(c):
            j, t_ub = c
            return jnp.logical_and(
                j < KBATCH, ebuf_s[0, jnp.minimum(j, KBATCH - 1)] < t_ub
            )

        def tile_copy(j, slot):
            # CLAMP: pad candidates carry id = idx_mask (out of range). The
            # VMEM path never touches them (leaf only runs for candidates
            # that pass the entry < t_ub test), but the prefetch chain
            # fetches j+1 before knowing whether it will be visited — an
            # unclamped id DMAs out of bounds and faults the chip (observed).
            cid = jnp.minimum(ibuf_s[0, j], jnp.int32(lg - 1))
            return pltpu.make_async_copy(
                feat.at[cid], tile_v.at[slot], tsems.at[slot]
            )

        if hbm_tiles:
            tile_copy(jnp.int32(0), 0).start()  # prefetch first candidate

        def visit(c):
            j, t_ub = c
            cid = ibuf_s[0, j]
            if with_counts:
                vlist[vbase + j] = cid
            if not hbm_tiles:
                return j + 1, leaf(cid, t_ub)
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < KBATCH)
            def _():
                # fetch candidate j+1 under candidate j's matmul
                tile_copy(j + 1, 1 - slot).start()

            tile_copy(j, slot).wait()
            return j + 1, leaf(cid, t_ub, slot=slot)

        j, t_ub = jax.lax.while_loop(visit_cond, visit, (jnp.int32(0), t_ub))
        if hbm_tiles:
            # drain the outstanding prefetch: tile j was started (by the
            # initial prefetch when j==0, else by iteration j-1) whenever
            # the loop exited before consuming the whole batch — an
            # un-waited DMA would leave its semaphore pending and corrupt
            # the next batch's double-buffering
            @pl.when(j < KBATCH)
            def _():
                tile_copy(j, jax.lax.rem(j, 2)).wait()
        # all KBATCH consumed and the farthest still mattered => maybe more.
        # i32 carry, not bool: a bool while-carry miscompiled here (Mosaic
        # produced all-miss results for the all-axes-span frustum case).
        more = jnp.logical_and(
            j == KBATCH, ebuf_s[0, KBATCH - 1] < jnp.minimum(t_ub, BIG)
        )
        return keys, t_ub, more.astype(jnp.int32), vbase + j

    _, _, _, vtotal = jax.lax.while_loop(
        lambda c: c[2] > 0,
        batch_body,
        (keys0, BIG, jnp.int32(1), jnp.int32(0)),
    )

    if with_counts:
        # histogram the packet's final winners into counts[cid]: one
        # eq-compare + ray-axis reduction per VISITED cluster (every winner
        # slot belongs to a visited cluster by construction)
        final_slot = slot_out[0]  # (1, PACKET)

        def hist(k, _):
            cid = vlist[k]
            eq = (final_slot - cid * c_sz) == row_id  # (c_sz, PACKET)
            col = jnp.sum(eq.astype(jnp.int32), axis=1, keepdims=True)  # (c_sz,1)
            counts[pl.ds(cid, 1), :] = counts[pl.ds(cid, 1), :] + col.reshape(1, c_sz)
            return 0

        jax.lax.fori_loop(0, vtotal, hist, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "precision", "with_counts", "group", "hbm_tiles"))
def _traverse_mxu_padded(scene: MxuScene, o3, d3, interpret=False, precision="highest",
                         with_counts=False, group=1, hbm_tiles=False):
    """o3/d3: f32[G, P, 3] packet-major rays (P = rays/packet, default 1024)."""
    packet = o3.shape[1]
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": "high",
        "fast": jax.lax.Precision.DEFAULT,
    }[precision]
    g_total = o3.shape[0]
    l_count = scene.feat.shape[0]
    c_sz = scene.feat.shape[2] // 4
    vmax = scene.boxes.shape[2] * (8 // group)
    m3 = jnp.cross(o3, d3)
    rf10 = jnp.concatenate(
        [d3, m3, o3, jnp.ones((g_total, packet, 1), jnp.float32)], axis=2
    ).swapaxes(1, 2)  # (G, 10, packet); ray r of packet g = column r
    if precision == "high":
        rfeat = _pack_rf3(rf10)  # (G, K3, packet) bf16
        feat_op = scene.feat3
    else:
        rfeat = jnp.concatenate(
            [rf10, jnp.zeros((g_total, NFEAT - 10, packet), jnp.float32)], axis=1
        )
        feat_op = scene.feat
    krows = rfeat.shape[1]
    pbounds = jnp.concatenate(
        [
            jnp.min(o3, axis=1),
            jnp.max(o3, axis=1),
            jnp.min(d3, axis=1),
            jnp.max(d3, axis=1),
            jnp.zeros((g_total, 4), jnp.float32),
        ],
        axis=1,
    ).reshape(g_total, 1, 16)

    out = pl.pallas_call(
        functools.partial(_kernel, precision=prec, with_counts=with_counts,
                          group=group, hbm_tiles=hbm_tiles),
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes
            pl.BlockSpec((1, krows, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # feat tiles: VMEM-resident by default; HBM with per-visit DMA
            # for scenes past the VMEM budget (hbm_tiles)
            pl.BlockSpec(
                memory_space=pl.ANY if hbm_tiles else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_count, c_sz), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_total, 1, packet), jnp.float32),
            jax.ShapeDtypeStruct((g_total, 1, packet), jnp.int32),
            jax.ShapeDtypeStruct((l_count, c_sz), jnp.int32),
        ],
        scratch_shapes=[
            # one 128-lane buffer row (DMA slices along the lane dim must
            # be tile-aligned on TPU; only lanes < KBATCH are used)
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.float32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SMEM((vmax,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + (
            # double-buffered HBM tile slots, only allocated in hbm mode
            # (the default VMEM-resident layout needs every byte of VMEM
            # headroom for the feat tiles themselves)
            [
                pltpu.VMEM((2,) + feat_op.shape[1:], feat_op.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if hbm_tiles
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pbounds, scene.boxes, rfeat, feat_op)
    t, slot, counts = out
    t = t.reshape(g_total * packet)
    slot = slot.reshape(g_total * packet)
    slot = jnp.where(t >= BIG, -1, slot)
    if with_counts:
        return t, slot, counts.reshape(-1)
    return t, slot


def traverse_mxu(scene: MxuScene, orig, direction, *, interpret: bool = False,
                 precision: str = "highest", group: int = 1,
                 hbm_tiles: bool = False, **_):
    """Closest-hit via the MXU cluster-intersection kernel (works for ANY
    rays, coherent or not — incoherent packets degrade to visiting more
    clusters, never to wrong results).

    orig/direction: f32[R,3], R a multiple of 1024.
    Returns (t, hit_original_ids); miss => (1e30, -1).

    Note: mapping slots to original ids is a 1-per-ray gather — slow on TPU
    (~16 ms per 2^20 rays, measured). Histogram-bound callers should use
    `traverse_mxu_slots` and remap at the bin level (slots_to_tri).
    """
    t, slot = traverse_mxu_slots(scene, orig, direction, interpret=interpret,
                                 precision=precision, group=group,
                                 hbm_tiles=hbm_tiles)
    hit = jnp.where(slot >= 0, scene.tri_idx_flat[jnp.maximum(slot, 0)], jnp.int32(-1))
    return t, hit


def traverse_mxu_counts(
    scene: MxuScene,
    orig,
    direction,
    *,
    interpret: bool = False,
    precision: str = "highest",
    group: int = 1,
    packet: int = PACKET,
    hbm_tiles: bool = False,
    **_,
):
    """Like traverse_mxu_slots but ALSO returns int32[L*C] per-slot hit
    counts histogrammed inside the kernel (counts accumulate in a VMEM
    output block across the sequential packet grid) — saves the XLA
    segment_sum scatter (~7 us/packet at 2^20 rays). Returns (t, slot,
    counts_slots); counts include every ray (callers must launch whole
    chunks, i.e. no masked tail)."""
    r = orig.shape[0]
    packet = min(packet, r)  # small launches fall back to one whole packet
    while r % packet and packet > PACKET:
        packet //= 2  # e.g. r=6144 with packet=4096 -> 2048 (bounce default
        #   is 4096; ray counts are always multiples of 1024)
    # lane alignment (see fused_trace_counts): fail on every platform, not
    # just at Mosaic compile time
    assert packet % 128 == 0 and r % packet == 0, (r, packet)
    o3 = orig.reshape(r // packet, packet, 3)
    d3 = direction.reshape(r // packet, packet, 3)
    return _traverse_mxu_padded(
        scene, o3, d3, interpret=interpret, precision=precision, with_counts=True,
        group=group, hbm_tiles=hbm_tiles,
    )


def traverse_mxu_slots(
    scene: MxuScene,
    orig,
    direction,
    *,
    interpret: bool = False,
    precision: str = "highest",
    group: int = 1,
    packet: int = PACKET,
    hbm_tiles: bool = False,
    **_,
):
    """Like traverse_mxu but returns PADDED CLUSTER SLOTS (cid*C + lane)
    instead of original triangle ids — no per-ray gather. miss => slot -1.
    Slot s maps to original id scene.tri_idx_flat[s].

    precision: "highest" (f32-faithful MXU passes, exact vs the oracle) or
    "fast" (single bf16 pass; ~0.4% relative t noise and edge-band hit
    reassignments — statistically unbiased for dose, same spirit as the
    reference's -cl-fast-relaxed-math build flag, template.cpp:1192).

    packet: bounce segments run 4096 (incoherent rays are per-visit-fixed-
    cost-bound and candidates/packet grow sublinearly with the window);
    coherent launches keep 1024 (PERF.md round-4 sweep). A per-column
    (sub-packet) kernel variant with per-128-ray frusta/candidates/t-bounds
    was built, measured 2.8x SLOWER end-to-end, and removed — the union of
    sub-frusta candidates equals the packet-frustum set (measured 0.96-0.98x)
    while per-visit fixed costs multiply 8-fold (PERF.md round-4)."""
    r = orig.shape[0]
    packet = min(packet, r)  # small launches fall back to one whole packet
    while r % packet and packet > PACKET:
        packet //= 2  # e.g. r=6144 with packet=4096 -> 2048 (bounce default
        #   is 4096; ray counts are always multiples of 1024)
    # lane alignment (see fused_trace_counts): fail on every platform, not
    # just at Mosaic compile time
    assert packet % 128 == 0 and r % packet == 0, (r, packet)
    o3 = orig.reshape(r // packet, packet, 3)
    d3 = direction.reshape(r // packet, packet, 3)
    return _traverse_mxu_padded(
        scene, o3, d3, interpret=interpret, precision=precision, group=group,
        hbm_tiles=hbm_tiles,
    )


# --------------------------------------------------------------------------
# Fused generate + trace + histogram: rays never leave VMEM
# --------------------------------------------------------------------------

TWO_PI = np.float32(2.0 * np.pi)


def _fused_kernel(gpi, gpf, boxes, feat, t_out, slot_out, counts, ro_out, rd_out,
                  rf_scr, ebuf_v, ibuf_v, ebuf_s, ibuf_s, vlist, sems,
                  tile_v=None, tsems=None,
                  *, precision, grid_dims, with_rays, group=1, hbm_tiles=False):
    """Generate one stratified 1024-ray packet in-kernel (pltpu PRNG), build
    its Plücker features in VMEM scratch, derive the packet frustum bounds
    ANALYTICALLY from the stratum cell (no vector->scalar reductions), then
    run the shared trace body. Ray data never touches HBM.

    gpi: i32[1,1,8] SMEM [key0, key1]; gpf: f32[1,1,8] SMEM [lx,ly,lz,len].
    grid_dims: static (gh, gy, gphi) — must match ops/generate._stratum_grid.
    """
    gh, gy, gphi = grid_dims
    packet = rf_scr.shape[-1]  # rays per packet (sweepable, default 1024)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        if precision == "high":
            # bf16x3-packed layout: constant 1-rows at 9 (r_hi) and 28
            # (paired with f_lo of the n.v0 row); zero padding rows 29..31
            one = jnp.ones((1, packet), jnp.bfloat16)
            rf_scr[9:10, :] = one
            rf_scr[28:29, :] = one
            rf_scr[29:K3, :] = jnp.zeros((K3 - 29, packet), jnp.bfloat16)
        else:
            # constant feature rows: 1-row (index 9) and the K padding
            rf_scr[9:NFEAT, :] = jnp.concatenate(
                [jnp.ones((1, packet), jnp.float32),
                 jnp.zeros((NFEAT - 10, packet), jnp.float32)], axis=0
            )

    ih = pid // (gy * gphi)
    iy = (pid // gphi) % gy
    ip = pid % gphi
    ihf, iyf, ipf = (x.astype(jnp.float32) for x in (ih, iy, ip))
    lx, ly, lz, llen = gpf[0, 0, 0], gpf[0, 0, 1], gpf[0, 0, 2], gpf[0, 0, 3]

    # counter-based per-value hash (WangHash x2, the reference's own RNG
    # family, cl/tools.cl:2-4) — pure jnp int ops, identical in interpret
    # and compiled modes, no pltpu PRNG dependency
    def wang(x):
        x = (x ^ 61) ^ jax.lax.shift_right_logical(x, 16)
        x = x * 9
        x = x ^ jax.lax.shift_right_logical(x, 4)
        x = x * jnp.int32(0x27D4EB2D)
        x = x ^ jax.lax.shift_right_logical(x, 15)
        return x

    ctr = (
        jax.lax.broadcasted_iota(jnp.int32, (3, packet), 0) * packet
        + jax.lax.broadcasted_iota(jnp.int32, (3, packet), 1)
        + pid * (3 * packet)
    )
    h = wang(wang(ctr ^ gpi[0, 0, 0]) ^ gpi[0, 0, 1])
    u = jax.lax.shift_right_logical(h, 8).astype(jnp.float32) * np.float32(
        1.0 / (1 << 24)
    )
    uh, uy, up = u[0:1], u[1:2], u[2:3]  # (1, PACKET) each

    # ---- analytic per-cell bounds (scalar, conservative BY CONSTRUCTION) --
    # Strategy: compute the cell's trig bounds first, snap near-zero
    # endpoints to exactly 0 (fp cos(pi/2) etc. is ~1e-8 off; a sign-
    # straddling sliver would force the slab test to treat the axis as
    # unconstrained — measured 9x candidate overfetch), then CLIP the sampled
    # trig values into the bounds. Every other sampled quantity (dy, r, oy)
    # lies inside its bounds automatically because fp rounding of monotone
    # operations is monotone; the product hulls below then bound the sampled
    # dx/dz exactly, with no epsilon slack at all.
    ylo = -1.0 + 2.0 * iyf / np.float32(gy)
    yhi = -1.0 + 2.0 * (iyf + 1.0) / np.float32(gy)
    y2a, y2b = ylo * ylo, yhi * yhi
    spans0 = jnp.logical_and(ylo <= 0.0, yhi >= 0.0)
    y2min = jnp.where(spans0, jnp.float32(0.0), jnp.minimum(y2a, y2b))
    y2max = jnp.maximum(y2a, y2b)
    rmin = jnp.sqrt(jnp.maximum(0.0, 1.0 - y2max))
    rmax = jnp.sqrt(jnp.maximum(0.0, 1.0 - y2min))
    plo = TWO_PI * ipf / np.float32(gphi)
    phi_ = TWO_PI * (ipf + 1.0) / np.float32(gphi)
    ca, cb = jnp.cos(plo), jnp.cos(phi_)
    c_hi = jnp.maximum(ca, cb)
    c_hi = jnp.where((plo <= 0.0) | (phi_ >= TWO_PI), jnp.float32(1.0), c_hi)
    c_lo = jnp.minimum(ca, cb)
    c_lo = jnp.where((plo <= np.pi) & (phi_ >= np.pi), jnp.float32(-1.0), c_lo)
    sa, sb = jnp.sin(plo), jnp.sin(phi_)
    s_hi = jnp.maximum(sa, sb)
    s_hi = jnp.where((plo <= np.pi / 2) & (phi_ >= np.pi / 2), jnp.float32(1.0), s_hi)
    s_lo = jnp.minimum(sa, sb)
    s_lo = jnp.where(
        (plo <= 3 * np.pi / 2) & (phi_ >= 3 * np.pi / 2), jnp.float32(-1.0), s_lo
    )

    def snap(v):  # quadrant-boundary trig noise -> exact 0 (keeps one-sided)
        return jnp.where(jnp.abs(v) < 1e-6, jnp.float32(0.0), v)

    c_lo, c_hi, s_lo, s_hi = snap(c_lo), snap(c_hi), snap(s_lo), snap(s_hi)

    # same parameterization as ops/generate.generate_stratified
    dy = -1.0 + 2.0 * (iyf + uy) / np.float32(gy)
    phi = TWO_PI * (ipf + up) / np.float32(gphi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - dy * dy))
    dx = r * jnp.clip(jnp.cos(phi), c_lo, c_hi)
    dz = r * jnp.clip(jnp.sin(phi), s_lo, s_hi)
    oy = ly + (ihf + uh) / np.float32(gh) * llen
    ox = jnp.full((1, packet), lx) + 0.0 * oy
    oz = jnp.full((1, packet), lz) + 0.0 * oy

    rows = (
        dx, dy, dz,
        oy * dz - lz * dy,  # m = o x d (ox=lx, oz=lz constant)
        lz * dx - lx * dz,
        lx * dy - oy * dx,
        ox, oy, oz,
    )
    if precision == "high":
        for j, v in enumerate(rows):
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rf_scr[j : j + 1, :] = v_hi
            rf_scr[10 + j : 11 + j, :] = v_lo
            rf_scr[19 + j : 20 + j, :] = v_hi
    else:
        for j, v in enumerate(rows):
            rf_scr[j : j + 1, :] = v
    if with_rays:
        ro_out[0, 0:1, :] = ox
        ro_out[0, 1:2, :] = oy
        ro_out[0, 2:3, :] = oz
        rd_out[0, 0:1, :] = dx
        rd_out[0, 1:2, :] = dy
        rd_out[0, 2:3, :] = dz

    def prod_hull(lo, hi):
        # 4-corner interval product; fp-monotone multiplication keeps every
        # clipped sample inside, so no epsilon is needed (and none is added:
        # an epsilon would re-create sign-straddling intervals at exact-zero
        # endpoints, defeating the one-sided slab handling in _trace)
        p1, p2, p3, p4 = rmin * lo, rmin * hi, rmax * lo, rmax * hi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    dxlo, dxhi = prod_hull(c_lo, c_hi)
    dzlo, dzhi = prod_hull(s_lo, s_hi)
    oylo = ly + ihf / np.float32(gh) * llen
    oyhi = ly + (ihf + 1.0) / np.float32(gh) * llen
    pb_vals = [lx, oylo, lz, lx, oyhi, lz,
               dxlo, ylo, dzlo, dxhi, yhi, dzhi]

    _trace(pb_vals, boxes, rf_scr[:, :], feat, t_out, slot_out, counts, ebuf_v,
           ibuf_v, ebuf_s, ibuf_s, vlist, sems,
           precision=precision, with_counts=True, group=group,
           tile_v=tile_v, tsems=tsems, hbm_tiles=hbm_tiles)


@functools.partial(
    jax.jit,
    static_argnames=("n", "height_bands", "interpret", "precision", "with_rays", "group", "hbm_tiles", "packet"),
)
def fused_trace_counts(
    scene: MxuScene,
    key,
    lamp_xyz,
    light_length,
    n: int,
    *,
    precision: str = "highest",
    height_bands: int = 4,
    interpret: bool = False,
    with_rays: bool = False,
    group: int = 1,
    hbm_tiles: bool = False,
    packet: int = PACKET,
    **_,
):
    """Fused generate->extend->histogram: one kernel launch per chunk; the
    stratified sampler runs on the in-kernel PRNG, so rays never exist in
    HBM. Statistically identical to generate_stratified + traverse_mxu_counts
    (same stratum grid; different RNG streams).

    packet: rays per packet / stratum cell (matches the split kernel's
    sweepable parameter; 1024 measured optimal for coherent packets,
    PERF.md round-4 sweep — parameterized so future sweeps can cover the
    production fused path too).

    Returns (t, slot, counts_slots[, orig, dir if with_rays]).
    """
    from uvtrace.ops.generate import _stratum_grid

    packet = min(packet, n)  # small launches fall back to one whole packet
    while n % packet and packet > PACKET:
        packet //= 2
    # lane alignment: a non-multiple-of-128 packet would instantiate VMEM
    # blocks the TPU cannot tile — interpret mode (the CPU test lane) would
    # accept it while Mosaic fails, breaking the interpret==compiled
    # parity contract. Fail loudly on EVERY platform instead.
    assert packet % 128 == 0 and n % packet == 0, (n, packet)
    g_total = n // packet
    grid_dims = _stratum_grid(g_total, height_bands=height_bands)
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": "high",
        "fast": jax.lax.Precision.DEFAULT,
    }[precision]
    l_count = scene.feat.shape[0]
    c_sz = scene.feat.shape[2] // 4
    vmax = scene.boxes.shape[2] * (8 // group)
    kd = jax.random.key_data(key).astype(jnp.uint32)
    gpi = jnp.zeros((1, 1, 8), jnp.int32)
    gpi = gpi.at[0, 0, 0].set(kd[0].astype(jnp.int32)).at[0, 0, 1].set(kd[1].astype(jnp.int32))
    lamp = jnp.asarray(lamp_xyz, jnp.float32)
    gpf = jnp.zeros((1, 1, 8), jnp.float32)
    gpf = gpf.at[0, 0, 0].set(lamp[0]).at[0, 0, 1].set(lamp[1])
    gpf = gpf.at[0, 0, 2].set(lamp[2]).at[0, 0, 3].set(jnp.float32(light_length))

    if with_rays:
        kernel = functools.partial(
            _fused_kernel, precision=prec, grid_dims=grid_dims, with_rays=True,
            group=group, hbm_tiles=hbm_tiles,
        )
        ray_specs = [
            pl.BlockSpec((1, 3, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        ray_shapes = [
            jax.ShapeDtypeStruct((g_total, 3, packet), jnp.float32),
            jax.ShapeDtypeStruct((g_total, 3, packet), jnp.float32),
        ]
    else:
        def kernel(gpi, gpf, boxes, feat, t_out, slot_out, counts, *scratch):
            _fused_kernel(
                gpi, gpf, boxes, feat, t_out, slot_out, counts, None, None,
                *scratch, precision=prec, grid_dims=grid_dims, with_rays=False,
                group=group, hbm_tiles=hbm_tiles,
            )

        ray_specs, ray_shapes = [], []
    out = pl.pallas_call(
        kernel,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes
            pl.BlockSpec(memory_space=pl.ANY if hbm_tiles else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, packet), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_count, c_sz), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + ray_specs,
        out_shape=[
            jax.ShapeDtypeStruct((g_total, 1, packet), jnp.float32),
            jax.ShapeDtypeStruct((g_total, 1, packet), jnp.int32),
            jax.ShapeDtypeStruct((l_count, c_sz), jnp.int32),
        ]
        + ray_shapes,
        scratch_shapes=[
            pltpu.VMEM((K3, packet), jnp.bfloat16)
            if precision == "high"
            else pltpu.VMEM((NFEAT, packet), jnp.float32),
            # one 128-lane buffer row (DMA slices along the lane dim must
            # be tile-aligned on TPU; only lanes < KBATCH are used)
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.float32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SMEM((vmax,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + (
            [
                pltpu.VMEM(
                    (2,) + (scene.feat3 if precision == "high" else scene.feat).shape[1:],
                    (scene.feat3 if precision == "high" else scene.feat).dtype,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if hbm_tiles
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gpi, gpf, scene.boxes, scene.feat3 if precision == "high" else scene.feat)
    t, slot, counts = out[0], out[1], out[2]
    t = t.reshape(g_total * packet)
    slot = jnp.where(t >= BIG, -1, slot.reshape(g_total * packet))
    if with_rays:
        orig = out[3].swapaxes(1, 2).reshape(g_total * packet, 3)
        direction = out[4].swapaxes(1, 2).reshape(g_total * packet, 3)
        return t, slot, counts.reshape(-1), orig, direction
    return t, slot, counts.reshape(-1)
