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
    sensor_type: str = "perspective",
    aperture: float = 0.0,
    focus_dist: float = 1.0,
    lens_uv: jnp.ndarray | None = None,
    ortho_scale: float = 1.0,
):
    """Returns (origins [N,3], directions [N,3]).

    sensor_type: perspective | thinlens | orthographic | spherical
    (reference plugins: mitsuba/src/sensors/{perspective,thinlens,
    orthographic,spherical}.cpp).
    """
    if sensor_type == "spherical":
        # Equirectangular: x → azimuth, y → polar.
        phi = (1.0 - pixel_xy[..., 0] / width) * 2.0 * jnp.pi
        theta = pixel_xy[..., 1] / height * jnp.pi
        d_cam = jnp.stack(
            [
                jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(theta),
                -jnp.sin(theta) * jnp.cos(phi),
            ],
            axis=-1,
        )
        rot = scene.cam_to_world[:3, :3]
        d_world = normalize(d_cam @ rot.T)
        o_world = jnp.broadcast_to(scene.cam_to_world[:3, 3], d_world.shape)
        return o_world, d_world
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
    rot = scene.cam_to_world[:3, :3]
    if sensor_type == "orthographic":
        o_cam = jnp.stack(
            [sx * ortho_scale, sy * ortho_scale / (width / height), jnp.zeros_like(sx)],
            axis=-1,
        )
        o_world = o_cam @ rot.T + scene.cam_to_world[:3, 3]
        d_world = jnp.broadcast_to(normalize(rot[:, 2]), o_world.shape)
        return o_world, d_world

    d_cam = jnp.stack([sx * tx, sy * ty, jnp.ones_like(sx)], axis=-1)
    if sensor_type == "thinlens" and aperture > 0.0:
        # Depth of field: jitter origin on the lens disk, refocus
        # (reference: sensors/thinlens.cpp).
        from ..core import warp

        assert lens_uv is not None
        p_lens = warp.square_to_uniform_disk_concentric(lens_uv) * aperture
        focus_p = d_cam * focus_dist  # point on the focal plane (z = focus)
        o_cam = jnp.concatenate([p_lens, jnp.zeros_like(sx)[..., None]], axis=-1)
        d_cam = focus_p - o_cam
        o_world = o_cam @ rot.T + scene.cam_to_world[:3, 3]
        d_world = normalize(d_cam @ rot.T)
        return o_world, d_world

    d_world = normalize(d_cam @ rot.T)
    o_world = jnp.broadcast_to(scene.cam_to_world[:3, 3], d_world.shape)
    return o_world, d_world
