"""Reconstruction filters for film splatting.

TPU-native equivalent of the reference's rfilter plugins
(reference: mitsuba/src/rfilters/{box,tent,gaussian,mitchell,catmullrom,
lanczos}.cpp and ImageBlock::put, mitsuba/include/mitsuba/render/imageblock.h).
Instead of per-sample footprint loops over a filter LUT, every filter is a
static-radius stencil evaluated on the whole wave; the (2r+1)^2 taps unroll
into scatter-adds that XLA fuses. Per-sample footprint weights are
renormalized so each sample deposits total weight 1 (the reference
normalizes at develop time by the accumulated filter weight — same estimator).
"""

from __future__ import annotations

import jax.numpy as jnp

# name -> (integer stencil radius, weight fn of distance)
# Radii follow the reference plugin defaults (box .5, tent 1, gaussian 2,
# mitchell/catmullrom 2, lanczos 3); gaussian is truncated at 1.5px like the
# existing splat (stddev 0.5 → negligible tail beyond that).


def _gaussian(r, stddev=0.5):
    alpha = 1.0 / (2.0 * stddev * stddev)
    return jnp.exp(-alpha * r * r)


def _tent(r):
    return jnp.maximum(0.0, 1.0 - jnp.abs(r))


def _mitchell_1d(x, b=1.0 / 3.0, c=1.0 / 3.0):
    """Mitchell-Netravali kernel (reference: rfilters/mitchell.cpp)."""
    x = jnp.abs(2.0 * x)
    x2 = x * x
    x3 = x2 * x
    near = (
        (12.0 - 9.0 * b - 6.0 * c) * x3
        + (-18.0 + 12.0 * b + 6.0 * c) * x2
        + (6.0 - 2.0 * b)
    ) * (1.0 / 6.0)
    far = (
        (-b - 6.0 * c) * x3
        + (6.0 * b + 30.0 * c) * x2
        + (-12.0 * b - 48.0 * c) * x
        + (8.0 * b + 24.0 * c)
    ) * (1.0 / 6.0)
    return jnp.where(x < 1.0, near, jnp.where(x < 2.0, far, 0.0))


def _lanczos_1d(x, tau=3.0):
    """Lanczos-sinc windowed kernel (reference: rfilters/lanczos.cpp)."""
    x = jnp.abs(x)
    pix = jnp.pi * jnp.maximum(x, 1e-6)
    sinc = jnp.sin(pix) / pix
    wind = jnp.sin(pix / tau) / (pix / tau)
    val = sinc * wind
    return jnp.where(x < 1e-6, 1.0, jnp.where(x < tau, val, 0.0))


def filter_weight(name: str, dx, dy):
    """2-D filter weight at offset (dx, dy) in pixels."""
    if name == "gaussian":
        return _gaussian(jnp.sqrt(dx * dx + dy * dy))
    if name == "tent":
        return _tent(dx) * _tent(dy)
    if name == "mitchell":
        return _mitchell_1d(dx) * _mitchell_1d(dy)
    if name == "catmullrom":
        # Catmull-Rom = Mitchell with B=0, C=.5 (reference: catmullrom.cpp).
        return _mitchell_1d(dx, 0.0, 0.5) * _mitchell_1d(dy, 0.0, 0.5)
    if name == "lanczos":
        return _lanczos_1d(dx) * _lanczos_1d(dy)
    raise ValueError(f"unknown rfilter {name!r}")


FILTER_RADIUS = {
    "box": 0,
    "tent": 1,
    "gaussian": 1,
    "mitchell": 2,
    "catmullrom": 2,
    "lanczos": 3,
}


def splat_filtered(image, sqr_image, weight, pixel_idx, values, px, py,
                   width: int, height: int, name: str = "gaussian"):
    """Filtered scatter-add of a sample wave into flat [H*W, 3] buffers.

    px/py are continuous image positions; pixel_idx = the sample's own
    pixel (floor position). Footprint weights are renormalized per sample.
    Negative-lobed filters (mitchell/catmullrom/lanczos) keep their signed
    weights — renormalization uses the signed sum, like the reference's
    develop-time division by accumulated weight.
    """
    r = FILTER_RADIUS[name]
    if r == 0:
        from .film import splat

        return splat(image, sqr_image, weight, pixel_idx, values)

    x = pixel_idx % width
    y = pixel_idx // width
    fx = px - (x.astype(jnp.float32) + 0.5)
    fy = py - (y.astype(jnp.float32) + 0.5)
    taps = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            w = filter_weight(name, dx - fx, dy - fy)
            xn = x + dx
            yn = y + dy
            inside = (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)
            w = jnp.where(inside, w, 0.0)
            idx = jnp.clip(yn, 0, height - 1) * width + jnp.clip(xn, 0, width - 1)
            taps.append((w, idx))
    total = sum(w for w, _ in taps)
    total = jnp.where(jnp.abs(total) > 1e-8, total, 1.0)
    for w, idx in taps:
        wn = w / total
        image = image.at[idx].add(values * wn[..., None])
        sqr_image = sqr_image.at[idx].add(values * values * wn[..., None])
        weight = weight.at[idx].add(wn)
    return image, sqr_image, weight
