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


def develop(image, weight):
    return image / jnp.maximum(weight, 1.0)[..., None]


def variance(image, sqr_image, weight):
    """Per-pixel sample variance of the mean estimate."""
    n = jnp.maximum(weight, 1.0)[..., None]
    mean = image / n
    var = jnp.maximum(sqr_image / n - mean * mean, 0.0) / jnp.maximum(n - 1.0, 1.0)
    return var
