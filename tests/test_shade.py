"""Units and heatmap coloring (cl/shade.cl semantics)."""

import jax.numpy as jnp
import numpy as np

from uvtrace.ops.shade import (
    compute_dosage,
    dosage_to_color,
    greyscale_to_heatmap,
    triangle_areas,
)


def test_areas():
    tris = jnp.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],  # area 0.5
            [[0, 0, 0], [2, 0, 0], [0, 0, 2]],  # area 2
        ],
        jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(triangle_areas(tris)), [0.5, 2.0], rtol=1e-6)


def test_compute_dosage_formula():
    # dose = P * n / (A * N) (cl/shade.cl:39, Report §3 Eq. 1)
    d = compute_dosage(jnp.array([10.0]), jnp.array([0.5]), 100, 45.0)
    np.testing.assert_allclose(np.asarray(d), [45.0 * 10 / (0.5 * 100)], rtol=1e-6)


def test_heatmap_stops():
    """5-stop gradient: blue -> cyan -> green -> yellow -> red
    (cl/shade.cl:4-21)."""
    stops = {
        0.0: (0, 0, 1),
        0.25: (0, 1, 1),
        0.5: (0, 1, 0),
        0.75: (1, 1, 0),
        1.0: (1, 0, 0),
    }
    for x, rgb in stops.items():
        got = np.asarray(greyscale_to_heatmap(jnp.float32(x)))
        np.testing.assert_allclose(got, rgb, atol=1e-6)


def test_threshold_view():
    dose = jnp.array([10.0, 90.0, 150.0])
    c = np.asarray(dosage_to_color(dose, min_value=100.0, threshold_view=True))
    # below 0.5 of 2*min: dark blue ramp (cl/shade.cl:56-58)
    assert c[0, 2] > 0 and c[0, 0] == 0 and c[0, 1] == 0
    assert c[1, 2] > 0 and c[1, 0] == 0
    # above: normal gradient
    assert c[2, 1] > 0
    assert (c >= 0).all() and (c <= 1).all()


def test_colors_clamped():
    c = np.asarray(dosage_to_color(jnp.array([1e6, -5.0]), min_value=10.0))
    assert (c >= 0).all() and (c <= 1).all()
