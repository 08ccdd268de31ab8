"""Film accumulation: sample splatting and development.

Equivalent of the reference's ImageBlock/hdrfilm path
(reference: mitsuba/include/mitsuba/render/imageblock.h ImageBlock::put,
mitsuba/src/films/hdrfilm.cpp) with a box reconstruction filter. Also keeps
the squared-value accumulator used for variance estimation and
inverse-variance iterate combination
(reference: mitsuba/src/integrators/sdmm/sdmm_wr.h:65-68 putSample,
scripts/combine_renders.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def splat(image: jnp.ndarray, sqr_image: jnp.ndarray, weight: jnp.ndarray,
          pixel_idx: jnp.ndarray, values: jnp.ndarray, mask=None):
    """Scatter-add sample values (and squares) into flat [H*W, 3] buffers."""
    if mask is not None:
        values = jnp.where(mask[..., None], values, 0.0)
        w = jnp.where(mask, 1.0, 0.0)
    else:
        w = jnp.ones(values.shape[:-1])
    image = image.at[pixel_idx].add(values)
    sqr_image = sqr_image.at[pixel_idx].add(values * values)
    weight = weight.at[pixel_idx].add(w)
    return image, sqr_image, weight


def splat_gaussian(image, sqr_image, weight, pixel_idx, values, px, py,
                   width: int, height: int, stddev: float = 0.5):
    """3×3 Gaussian reconstruction splat (reference: rfilters/gaussian.cpp,
    truncated at radius 1.5 px; weights renormalized over the footprint)."""
    import jax.numpy as _jnp

    x = pixel_idx % width
    y = pixel_idx // width
    fx = px - (x.astype(_jnp.float32) + 0.5)
    fy = py - (y.astype(_jnp.float32) + 0.5)
    inv2s2 = 1.0 / (2.0 * stddev * stddev)
    # Accumulate footprint weights first for normalization.
    ws = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            r2 = (dx - fx) ** 2 + (dy - fy) ** 2
            xn = x + dx
            yn = y + dy
            inside = (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)
            w = _jnp.where(inside, _jnp.exp(-r2 * inv2s2), 0.0)
            ws.append((w, _jnp.clip(yn, 0, height - 1) * width + _jnp.clip(xn, 0, width - 1)))
    total = sum(w for w, _ in ws)
    total = _jnp.maximum(total, 1e-12)
    for w, idx in ws:
        wn = w / total
        image = image.at[idx].add(values * wn[..., None])
        sqr_image = sqr_image.at[idx].add(values * values * wn[..., None])
        weight = weight.at[idx].add(wn)
    return image, sqr_image, weight


def develop(image, weight):
    return image / jnp.maximum(weight, 1.0)[..., None]


def variance(image, sqr_image, weight):
    """Per-pixel sample variance of the mean estimate."""
    n = jnp.maximum(weight, 1.0)[..., None]
    mean = image / n
    var = jnp.maximum(sqr_image / n - mean * mean, 0.0) / jnp.maximum(n - 1.0, 1.0)
    return var
