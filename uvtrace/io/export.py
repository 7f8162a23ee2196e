"""Dose-map exports: npy arrays, heatmap legend, rendered PNG views."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from uvtrace.io.png import write_png
from uvtrace.ops.shade import dosage_to_color, greyscale_to_heatmap


def export_dose_npy(path, dose) -> None:
    np.save(str(path), np.asarray(dose))


def export_heatmap_png(path, mesh_tris, dose, min_value, threshold_view=False,
                       camera=None, width=960, height=720, gamma=False,
                       route=None, selected=-1, floor_height=0.0,
                       light_height=0.8, light_length=1.0) -> None:
    """Render the per-triangle heatmap to a PNG (the reference's GL view,
    myapp.cpp:180-205, headless). `route` draws lamp-rod markers on top
    (myapp.cpp:140-153); `gamma` sqrt-encodes (opt-in: the reference's blit
    ships with gamma commented out, template.cpp:159)."""
    from uvtrace.viz.rasterizer import default_camera, draw_route_markers, render_heatmap

    if camera is None:
        camera = default_camera(mesh_tris)
    colors = np.asarray(dosage_to_color(dose, min_value, threshold_view))
    img = render_heatmap(mesh_tris, colors, camera=camera, width=width,
                         height=height, gamma=gamma)
    if route:
        img = draw_route_markers(img, camera, route, floor_height,
                                 light_height, light_length, selected)
    write_png(path, img)


def export_legend_png(path, min_value, width=256, height=32) -> None:
    """The heatmap legend strip (UI legend, userinterface.cpp:366-402):
    gradient from 0 to 2*min_value."""
    ramp = np.linspace(0.0, 1.0, width, dtype=np.float32)
    import jax.numpy as jnp

    colors = np.asarray(greyscale_to_heatmap(jnp.asarray(ramp)))
    img = np.clip(np.broadcast_to(colors[None, :, :], (height, width, 3)), 0, 1)
    write_png(path, (img * 255).astype(np.uint8))


def export_grid_png(path, grid, min_value, threshold_view=False, route=None,
                    aabb=None, selected=-1, gamma=False) -> None:
    """Top-down dose-grid image (Simulator.dose_grid) with the reference's
    5-stop heatmap gradient (cl/shade.cl:43-71); optional waypoint crosses."""
    import jax.numpy as jnp

    colors = np.asarray(
        dosage_to_color(jnp.asarray(grid.ravel()), min_value, threshold_view)
    ).reshape(grid.shape[0], grid.shape[1], 3)
    colors = np.clip(colors, 0, 1)
    if gamma:
        colors = np.sqrt(colors)
    img = (colors * 255).astype(np.uint8)
    if route is not None and aabb is not None:
        from uvtrace.viz.rasterizer import draw_route_markers_grid

        img = draw_route_markers_grid(img, aabb, route, selected)
    write_png(path, img)
