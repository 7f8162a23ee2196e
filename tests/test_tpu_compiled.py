"""Compiled-on-TPU kernel parity — the opt-in real-hardware lane
(round-3 verdict #4).

The default suite runs every Pallas kernel in interpret mode on CPU; a real
Mosaic miscompile was already caught once (bool while-loop carries,
ops/traverse_mxu.py "Known pitfalls"). These tests compile the kernels with
Mosaic on the attached chip and assert (t, slot, counts) BIT-equality against
interpret mode on the same device data — the role of the reference's
CheckCL/build-log path (template/template.cpp:1213-1275: every kernel it runs
was compile-checked on the real device).

Run:  UVTRACE_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu -q
They self-skip when no TPU is attached (the default CPU-pinned suite).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="needs an attached TPU (UVTRACE_TEST_PLATFORM=tpu)",
    ),
]


@pytest.fixture(scope="module")
def mxu_scene():
    from uvtrace.geometry.procedural import make_box_room
    from uvtrace.ops.cluster import build_clusters
    from uvtrace.ops.traverse_mxu import build_mxu_scene

    room = make_box_room(subdivisions=6, clutter=6, seed=11)
    scene = build_mxu_scene(build_clusters(room.tris, cluster_size=64))
    return room, scene


@pytest.fixture(scope="module")
def rays(mxu_scene):
    from uvtrace.ops import generate as gen_ops

    room, _ = mxu_scene
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    r = gen_ops.generate_stratified(jax.random.PRNGKey(3), 1 << 14, lamp, 1.0, packet=1024)
    return lamp, r


@pytest.mark.parametrize("precision", ["highest", "high"])
def test_slots_compiled_matches_interpret(mxu_scene, rays, precision):
    from uvtrace.ops.traverse_mxu import traverse_mxu_slots

    _, scene = mxu_scene
    _, r = rays
    fn = functools.partial(traverse_mxu_slots, scene, r.orig, r.dir, precision=precision)
    t_c, s_c = fn(interpret=False)
    t_i, s_i = fn(interpret=True)
    np.testing.assert_array_equal(np.asarray(s_c), np.asarray(s_i))
    np.testing.assert_array_equal(np.asarray(t_c), np.asarray(t_i))
    assert int((np.asarray(s_c) >= 0).sum()) > 0


@pytest.mark.parametrize("precision", ["highest", "high"])
def test_counts_compiled_matches_interpret(mxu_scene, rays, precision):
    from uvtrace.ops.traverse_mxu import traverse_mxu_counts

    _, scene = mxu_scene
    _, r = rays
    fn = functools.partial(traverse_mxu_counts, scene, r.orig, r.dir, precision=precision)
    t_c, s_c, c_c = fn(interpret=False)
    t_i, s_i, c_i = fn(interpret=True)
    np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_i))
    np.testing.assert_array_equal(np.asarray(s_c), np.asarray(s_i))
    np.testing.assert_array_equal(np.asarray(t_c), np.asarray(t_i))
    # in-kernel histogram is exact: counts tally exactly the hit slots
    hits = np.asarray(s_c)
    expect = np.bincount(hits[hits >= 0], minlength=c_c.shape[0])
    np.testing.assert_array_equal(np.asarray(c_c), expect)


def test_fused_compiled_matches_interpret(mxu_scene, rays):
    """The production default (mxu-fused: generate+trace+histogram in one
    kernel) compiled on the chip == interpret mode, bit for bit."""
    from uvtrace.ops.traverse_mxu import fused_trace_counts

    _, scene = mxu_scene
    lamp, _ = rays
    key = jax.random.PRNGKey(7)
    t_c, s_c, c_c = fused_trace_counts(scene, key, lamp, 1.0, 1 << 14, interpret=False)
    t_i, s_i, c_i = fused_trace_counts(scene, key, lamp, 1.0, 1 << 14, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_i))
    assert int(np.asarray(c_c).sum()) > 0


def test_compiled_matches_oracle_on_exact_rays(mxu_scene):
    """The compiled kernel's hits agree with the brute-force oracle on the
    EXACT rays the fused kernel generated (with_rays returns them) — the
    strongest on-hardware correctness check available."""
    from uvtrace.ops.intersect import brute_force_closest_hit
    from uvtrace.ops.traverse_mxu import fused_trace_counts

    room, scene = mxu_scene
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    t, slot, counts, orig, direction = fused_trace_counts(
        scene, jax.random.PRNGKey(5), lamp, 1.0, 1 << 13, with_rays=True
    )
    hit = jnp.where(slot >= 0, scene.tri_idx_flat[jnp.maximum(slot, 0)], -1)
    t_ref, id_ref = brute_force_closest_hit(orig, direction, jnp.asarray(room.tris))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit) < 0, np.asarray(id_ref) < 0)
    assert (np.asarray(hit) == np.asarray(id_ref)).mean() > 0.999


def test_simulator_on_tpu(mxu_scene):
    """Full product pipeline compiled on the chip: deterministic across runs
    (bit-equal photon maps) and consistent with the interpret-mode pipeline
    up to float-tie winner reassignment (total hits EQUAL; per-triangle
    reshuffle a small fraction). Bitwise compiled==interpret holds at the
    kernel level (tests above) but not across XLA fusion contexts — the
    enclosing lax.scan may contract muls/adds differently in interpret mode,
    flipping ties between adjacent triangles."""
    from uvtrace.io.routexml import LightPos
    from uvtrace.sim import SimParams, Simulator

    room, _ = mxu_scene
    p = SimParams(photon_count=1 << 14, max_iterations=1, seed=21, traversal="mxu-fused")

    def run(interpret):
        sim = Simulator(room, p, route=[LightPos(0.0, 0.0, 1.0)], ray_chunk=1 << 14)
        if interpret:
            sim._extend = functools.partial(sim._extend, interpret=True)
            sim._extend_counts = functools.partial(sim._extend_counts, interpret=True)
            if sim._fused_counts is not None:
                sim._fused_counts = functools.partial(sim._fused_counts, interpret=True)
        sim.run_iteration()
        return np.asarray(sim.photon_map)

    compiled_a = run(False)
    compiled_b = run(False)
    np.testing.assert_array_equal(compiled_a, compiled_b)  # deterministic

    interp = run(True)
    assert compiled_a.sum() == interp.sum()  # no ray lost or double-counted
    # winner reassignment between float-tied neighbors only: small L1 mass
    assert np.abs(compiled_a - interp).sum() / compiled_a.sum() < 0.05


def test_hbm_tiles_compiled_matches_vmem(mxu_scene, rays):
    """HBM-tile mode compiled on the chip == the VMEM-resident layout, bit
    for bit (the prefetch chain must clamp pad candidate ids — an unclamped
    id DMAs out of bounds and faults the chip, caught in r4)."""
    from uvtrace.ops.traverse_mxu import fused_trace_counts, traverse_mxu_slots

    _, scene = mxu_scene
    _, r = rays
    a = traverse_mxu_slots(scene, r.orig, r.dir, precision="high")
    b = traverse_mxu_slots(scene, r.orig, r.dir, precision="high", hbm_tiles=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    lamp, _ = rays
    ca = fused_trace_counts(scene, jax.random.PRNGKey(7), lamp, 1.0, 1 << 14)
    cb = fused_trace_counts(
        scene, jax.random.PRNGKey(7), lamp, 1.0, 1 << 14, hbm_tiles=True
    )
    np.testing.assert_array_equal(np.asarray(ca[2]), np.asarray(cb[2]))


def test_diff_visibility_compiled_matches_clustered():
    """Round-5: the diff layer's shadow rays ride the MXU kernel on TPU
    (coherence-sorted, sort-inverted). Compiled-on-chip irradiance must
    match the budget-free clustered backend — visibility is binary and the
    t comparisons carry a 1e-3 tolerance, so estimates agree tightly."""
    from uvtrace.diff import irradiance, make_diff_scene
    from uvtrace.geometry.procedural import make_box_room

    room = make_box_room(subdivisions=5, clutter=3, seed=2)
    key = jax.random.PRNGKey(5)
    args = (jnp.array([0.2, -0.3]), room.floor_height + 0.8, 1.0, 450.0, key)
    e_mxu = np.asarray(
        irradiance(make_diff_scene(room, backend="mxu", precision="highest"),
                   *args, n_samples=4)
    )
    e_cl = np.asarray(
        irradiance(make_diff_scene(room, backend="clustered"), *args,
                   n_samples=4)
    )
    assert np.isfinite(e_mxu).all()
    np.testing.assert_allclose(e_mxu, e_cl, rtol=2e-3, atol=1e-6)

    # gradients flow on the compiled path (visibility inputs severed)
    scene = make_diff_scene(room, backend="mxu", precision="highest")

    def f(xz):
        return jnp.mean(irradiance(scene, xz, room.floor_height + 0.8, 1.0,
                                   450.0, key, n_samples=2))

    g = np.asarray(jax.grad(f)(jnp.array([0.2, -0.3])))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
