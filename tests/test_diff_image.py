"""Differentiable dose image: pixel gradients vs FD oracle (BASELINE
north-star: "pixel gradients allclose to finite-difference oracle") and
forward-consistency against the count-based Simulator.dose_grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.diff import dose_image, make_diff_scene, plan_dose_image
from uvtrace.geometry.procedural import make_box_room
from uvtrace.io.routexml import LightPos
from uvtrace.sim import SimParams, Simulator

RES = 24


@pytest.fixture(scope="module")
def image_setup():
    room = make_box_room(subdivisions=4, clutter=1, seed=11, floor_y=-1.0)
    scene = make_diff_scene(room)
    plan = plan_dose_image(scene, res=RES)
    return room, scene, plan


def test_plan_covers_the_room(image_setup):
    room, scene, plan = image_setup
    mask = np.asarray(plan.mask)
    assert mask.mean() > 0.95  # closed box: nearly every probe lands
    tri = np.asarray(plan.tri)
    assert (tri[mask] >= 0).all() and tri[mask].max() < room.triangle_count
    # skip-ceiling: no planned point sits at the roof
    verts = np.asarray(room.tris).reshape(-1, 3)
    assert np.asarray(plan.points)[mask][:, 1].max() < verts[:, 1].max() - 0.04


def test_pixel_gradients_match_fd(image_setup):
    """jax.grad of individual PIXELS w.r.t. lamp x/z equals central FD of
    the same CRN estimator (the BASELINE correctness target, verbatim)."""
    room, scene, plan = image_setup
    key = jax.random.PRNGKey(7)
    base_y = room.floor_height + 0.8
    durs = jnp.array([60.0])

    def pixel(xz, i, j):
        img = dose_image(
            scene, plan, xz[None, :], durs, base_y, 1.0, 450.0, key,
            n_samples=4,
        )
        return img[i, j]

    img0 = np.asarray(
        dose_image(
            scene, plan, jnp.array([[0.3, -0.2]]), durs, base_y, 1.0, 450.0,
            key, n_samples=4,
        )
    )
    # a handful of well-lit pixels, spread over the image
    lit = np.argwhere(img0 > np.percentile(img0[img0 > 0], 60))
    picks = lit[:: max(1, len(lit) // 3)][:3]
    x0 = jnp.array([0.3, -0.2])
    for i, j in picks:
        g = np.asarray(jax.grad(lambda xz: pixel(xz, int(i), int(j)))(x0))
        for ax in range(2):
            e = np.zeros(2)
            e[ax] = 1e-3
            fd = (
                float(pixel(x0 + e, int(i), int(j)))
                - float(pixel(x0 - e, int(i), int(j)))
            ) / 2e-3
            np.testing.assert_allclose(g[ax], fd, rtol=0.08, atol=1e-5)


def test_duration_gradient_exact(image_setup):
    """The image is linear in durations: AD == FD to float precision."""
    room, scene, plan = image_setup
    key = jax.random.PRNGKey(2)
    base_y = room.floor_height + 0.8
    wp = jnp.array([[0.0, 0.0], [0.6, 0.4]])

    def f(durs):
        return jnp.sum(
            dose_image(scene, plan, wp, durs, base_y, 1.0, 450.0, key,
                       n_samples=2)
        )

    durs = jnp.array([30.0, 50.0])
    g = np.asarray(jax.grad(f)(durs))
    assert (g > 0).all()
    fd = (float(f(durs + jnp.array([1.0, 0.0]))) - float(f(durs))) / 1.0
    np.testing.assert_allclose(g[0], fd, rtol=1e-4)


def test_matches_forward_dose_grid(image_setup):
    """Evaluated at the same parameters, the differentiable image agrees
    with the forward count-based dose_grid (point dose vs triangle-average
    dose: image means match within MC + tessellation tolerance)."""
    room, scene, plan = image_setup
    sim = Simulator(
        room,
        SimParams(photon_count=1 << 18, max_iterations=2, seed=3),
        route=[LightPos(0.2, -0.1, 60.0)],
    )
    sim.compute()
    fwd = sim.dose_grid(res=RES)

    img = np.asarray(
        dose_image(
            scene, plan, jnp.array([[0.2, -0.1]]), jnp.array([60.0]),
            room.floor_height + 0.8, sim.params.light_length,
            sim.params.light_intensity, jax.random.PRNGKey(0), n_samples=64,
        )
    )
    both = (fwd > 0) & (img > 0)
    assert both.mean() > 0.9
    np.testing.assert_allclose(img[both].mean(), fwd[both].mean(), rtol=0.10)
    # per-pixel: point dose vs triangle-average dose differ by
    # within-triangle variation + count-MC noise (measured corr ~0.87 at
    # this tessellation/photon budget), but the spatial pattern must be
    # the same image — a mis-registered or mis-normalized image decorrelates
    corr = np.corrcoef(img[both], fwd[both])[0, 1]
    assert corr > 0.8, corr


def test_sharded_scene_image_bit_identical(image_setup):
    """dose_image through a device-mesh scene (shadow rays sharded over the
    ray axis) is bit-identical to the single-device image."""
    from uvtrace.parallel import make_ray_mesh

    room, scene, plan = image_setup
    scene_sh = make_diff_scene(room, device_mesh=make_ray_mesh(8))
    plan_sh = plan_dose_image(scene_sh, res=RES)
    np.testing.assert_array_equal(np.asarray(plan.mask), np.asarray(plan_sh.mask))
    args = (
        jnp.array([[0.1, 0.2]]), jnp.array([45.0]),
        room.floor_height + 0.8, 1.0, 450.0, jax.random.PRNGKey(3),
    )
    a = np.asarray(dose_image(scene, plan, *args, n_samples=2))
    b = np.asarray(dose_image(scene_sh, plan_sh, *args, n_samples=2))
    np.testing.assert_array_equal(a, b)


def test_image_bounce_term_adds_dose(image_setup):
    room, scene, plan = image_setup
    key = jax.random.PRNGKey(4)
    args = (
        jnp.array([[0.0, 0.0]]), jnp.array([60.0]),
        room.floor_height + 0.8, 1.0, 450.0, key,
    )
    base = np.asarray(dose_image(scene, plan, *args, n_samples=2))
    withb = np.asarray(
        dose_image(
            scene, plan, *args, n_samples=2,
            reflectance=0.5, areas=jnp.asarray(room.areas),
            n_sources=16, n_bounces=2,
        )
    )
    assert (withb >= base - 1e-6).all()
    assert withb.sum() > base.sum()


def test_reflectance_pixel_gradient(image_setup):
    """Pixel gradients also flow w.r.t. reflectance (scalar here): FD
    check with CRN — polynomial in rho, central FD near-exact."""
    room, scene, plan = image_setup
    key = jax.random.PRNGKey(9)
    args = (
        jnp.array([[0.0, 0.0]]), jnp.array([60.0]),
        room.floor_height + 0.8, 1.0, 450.0, key,
    )

    def f(rho):
        return jnp.sum(
            dose_image(
                scene, plan, *args, n_samples=2, reflectance=rho,
                areas=jnp.asarray(room.areas), n_sources=8, n_bounces=2,
            )
        )

    g = float(jax.grad(f)(jnp.float32(0.4)))
    fd = (float(f(jnp.float32(0.45))) - float(f(jnp.float32(0.35)))) / 0.1
    np.testing.assert_allclose(g, fd, rtol=1e-3)


def test_plan_on_flat_scene():
    """A roofless floor: the shared probe helper auto-disables the ceiling
    skip (ops/probes.py) and every probe lands on the floor — the image
    differentiates normally."""
    from uvtrace.geometry.procedural import make_single_square

    floor = make_single_square(center=(0.0, 0.0, 0.0), half_width=2.0, axis="y")
    scene = make_diff_scene(floor)
    plan = plan_dose_image(scene, res=8)
    assert bool(np.asarray(plan.mask).all())
    img = dose_image(
        scene, plan, jnp.array([[0.0, 0.0]]), jnp.array([60.0]), 0.5, 1.0,
        450.0, jax.random.PRNGKey(0), n_samples=4,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img > 0).all()
    # inverse-square: directly under the lamp beats the corners
    assert img[4, 4] > img[0, 0]
