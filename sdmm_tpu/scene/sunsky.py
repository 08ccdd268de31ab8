"""Preetham sun/sky emitter baked to an equirect environment map.

TPU-native re-design of the reference's sun/sky plugins
(reference: mitsuba/src/emitters/{sun,sky,sunsky}.cpp — ~25 k LoC of
tabulated spectral sky models evaluated per ray): here the analytic
Preetham et al. 1999 model is evaluated once on an equirect grid at scene
load, producing a plain envmap that plugs into the existing image-envmap
machinery (bilinear eval + luminance-CDF NEE) with zero extra per-ray cost.
"""

from __future__ import annotations

import numpy as np

# Perez coefficient polynomials in turbidity T (Preetham et al. 1999, A.2).
_PEREZ = {
    "Y": ((0.1787, -1.4630), (-0.3554, 0.4275), (-0.0227, 5.3251),
          (0.1206, -2.5771), (-0.0670, 0.3703)),
    "x": ((-0.0193, -0.2592), (-0.0665, 0.0008), (-0.0004, 0.2125),
          (-0.0641, -0.8989), (-0.0033, 0.0452)),
    "y": ((-0.0167, -0.2608), (-0.0950, 0.0092), (-0.0079, 0.2102),
          (-0.0441, -1.6537), (-0.0109, 0.0529)),
}


def _perez(theta, gamma, c):
    a, b, cc, d, e = c
    cos_t = np.maximum(np.cos(theta), 1e-3)
    return (1.0 + a * np.exp(b / cos_t)) * (
        1.0 + cc * np.exp(d * gamma) + e * np.cos(gamma) ** 2
    )


def _coeffs(channel, t):
    return tuple(m * t + k for m, k in _PEREZ[channel])


_MX = np.array([
    [0.00166, -0.00375, 0.00209, 0.0],
    [-0.02903, 0.06377, -0.03202, 0.00394],
    [0.11693, -0.21196, 0.06052, 0.25886],
])
_MY = np.array([
    [0.00275, -0.00610, 0.00317, 0.0],
    [-0.04214, 0.08970, -0.04153, 0.00516],
    [0.15346, -0.26756, 0.06670, 0.26688],
])


def _zenith(t, theta_s):
    """Zenith luminance (kcd/m²) and chromaticity (Preetham A.2)."""
    chi = (4.0 / 9.0 - t / 120.0) * (np.pi - 2.0 * theta_s)
    y_z = (4.0453 * t - 4.9710) * np.tan(chi) - 0.2155 * t + 2.4192
    tv = np.array([t * t, t, 1.0])
    sv = np.array([theta_s ** 3, theta_s ** 2, theta_s, 1.0])
    x_z = tv @ _MX @ sv
    y_z2 = tv @ _MY @ sv
    return max(y_z, 0.0), x_z, y_z2


def _xyy_to_rgb(x, y, big_y):
    """CIE xyY → linear sRGB."""
    y_safe = np.maximum(y, 1e-6)
    big_x = x / y_safe * big_y
    big_z = (1.0 - x - y) / y_safe * big_y
    m = np.array([
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ])
    rgb = np.einsum("ij,...j->...i", m, np.stack([big_x, big_y, big_z], -1))
    return np.maximum(rgb, 0.0)


SUN_ANGULAR_RADIUS = np.deg2rad(0.5358 / 2.0)


def make_sunsky_envmap(
    sun_dir,
    turbidity: float = 3.0,
    resolution: int = 128,
    with_sky: bool = True,
    with_sun: bool = True,
    sky_scale: float = 1.0,
    sun_scale: float = 1.0,
):
    """Bake the Preetham sky (+ sun disk) into an equirect [H, 2H, 3] map.

    Directions follow emitters.env_eval's convention: row v ∈ [0,1] maps to
    θ = vπ from +y (up); the map is black below the horizon.
    """
    sun_dir = np.asarray(sun_dir, dtype=np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    theta_s = np.arccos(np.clip(sun_dir[1], -1.0, 1.0))
    theta_s = min(theta_s, np.pi / 2 - 1e-3)

    he, we = resolution, 2 * resolution
    v = (np.arange(he) + 0.5) / he
    u = (np.arange(we) + 0.5) / we
    theta = v * np.pi  # from +y
    phi = (u - 0.5) * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    d = np.stack(
        [
            st * np.sin(phi)[None, :],
            np.cos(theta)[:, None] * np.ones((1, we)),
            -st * np.cos(phi)[None, :],
        ],
        axis=-1,
    )
    cos_gamma = np.clip(d @ sun_dir, -1.0, 1.0)
    gamma = np.arccos(cos_gamma)
    theta_v = np.minimum(theta[:, None] * np.ones((1, we)), np.pi / 2 - 1e-3)

    out = np.zeros((he, we, 3), np.float32)
    if with_sky:
        y_z, x_z, yz2 = _zenith(turbidity, theta_s)
        cy = _coeffs("Y", turbidity)
        cx = _coeffs("x", turbidity)
        cyy = _coeffs("y", turbidity)
        f0y = _perez(0.0, theta_s, cy)
        f0x = _perez(0.0, theta_s, cx)
        f0yy = _perez(0.0, theta_s, cyy)
        big_y = y_z * _perez(theta_v, gamma, cy) / max(f0y, 1e-6)
        x = x_z * _perez(theta_v, gamma, cx) / max(f0x, 1e-6)
        yy = yz2 * _perez(theta_v, gamma, cyy) / max(f0yy, 1e-6)
        rgb = _xyy_to_rgb(x, yy, big_y) * sky_scale
        out += rgb.astype(np.float32)
    if with_sun:
        # Sun disk: direct-normal irradiance ~1.0 (relative units; scale
        # with sun_scale) attenuated by a simple turbidity air-mass term,
        # spread over the disk's solid angle.
        m_air = 1.0 / (np.cos(theta_s) + 0.15 * (93.885 - np.rad2deg(theta_s)) ** -1.253)
        tau = np.exp(-0.08 * turbidity * m_air)
        omega = 2.0 * np.pi * (1.0 - np.cos(SUN_ANGULAR_RADIUS))
        l_sun = sun_scale * 25.0 * tau / omega
        in_disk = gamma < SUN_ANGULAR_RADIUS
        if in_disk.any():
            out[in_disk] += np.float32(l_sun)
        else:
            # Sub-texel sun: deposit the disk's power into the nearest
            # texel (radiance scaled by the solid-angle ratio) so envmap
            # NEE still sees it.
            iy, ix = np.unravel_index(np.argmin(gamma), gamma.shape)
            omega_texel = (np.pi / he) * (2.0 * np.pi / we) * max(
                np.sin(theta[iy]), 1e-4
            )
            out[iy, ix] += np.float32(l_sun * omega / omega_texel)
    # Below-horizon: black.
    out[theta[:, None] * np.ones((1, we)) > np.pi / 2] = 0.0
    return out
