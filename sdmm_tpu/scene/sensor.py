"""Perspective sensor: pixel + jitter → camera rays.

Equivalent of the reference's perspective camera plugin
(reference: mitsuba/src/sensors/perspective.cpp). Mitsuba 0.6 convention:
camera space looks down +z, y up, fov about the axis given by ``fovAxis``
(default x = image width).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import normalize


def generate_rays(
    scene,
    pixel_xy: jnp.ndarray,  # [N, 2] float pixel coords (x, y) including jitter
    width: int,
    height: int,
    fov_axis: str = "x",
):
    """Returns (origins [N,3], directions [N,3])."""
    aspect = width / height
    ndc_x = pixel_xy[..., 0] / width
    ndc_y = pixel_xy[..., 1] / height
    # Mitsuba 0.6 screen convention: camera-space +x maps to image LEFT
    # (with the scene toWorld matrices' x-flip this yields the standard
    # red-left/green-right Cornell orientation).
    sx = 1.0 - 2.0 * ndc_x
    sy = 1.0 - 2.0 * ndc_y
    tan_half = scene.cam_tan_half_fov
    if fov_axis == "x":
        tx = tan_half
        ty = tan_half / aspect
    else:
        ty = tan_half
        tx = tan_half * aspect
    d_cam = jnp.stack(
        [sx * tx, sy * ty, jnp.ones_like(sx)], axis=-1
    )
    rot = scene.cam_to_world[:3, :3]
    d_world = normalize(d_cam @ rot.T)
    o_world = jnp.broadcast_to(scene.cam_to_world[:3, 3], d_world.shape)
    return o_world, d_world
