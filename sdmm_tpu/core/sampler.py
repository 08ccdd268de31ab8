"""Sample generators: independent, stratified, and low-discrepancy.

TPU-native equivalents of the reference sampler plugins
(reference: mitsuba/src/samplers/{independent,stratified,halton,
ldsampler}.cpp and mitsuba/include/mitsuba/render/sampler.h). In wavefront
form a "sampler" is a function from (pixel id, sample index, dimension) to
uniforms; independent uses counter-based Threefry, the QMC samplers use
radical-inverse points with per-pixel Cranley-Patterson rotations so pixels
decorrelate (the reference permutes scrambled digits instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)


def radical_inverse(idx: jnp.ndarray, base: int, n_digits: int = 20) -> jnp.ndarray:
    """Van der Corput radical inverse of integer indices in the given base."""
    inv_base = 1.0 / base
    result = jnp.zeros(idx.shape, dtype=jnp.float32)
    factor = inv_base
    x = idx

    for _ in range(n_digits):
        digit = x % base
        result = result + digit.astype(jnp.float32) * factor
        x = x // base
        factor = factor * inv_base
    return result


def halton_2d(sample_idx: jnp.ndarray, pixel_id: jnp.ndarray, key, dim_pair: int = 0):
    """2-D Halton points with per-pixel Cranley-Patterson rotation."""
    b0 = PRIMES[(2 * dim_pair) % len(PRIMES)]
    b1 = PRIMES[(2 * dim_pair + 1) % len(PRIMES)]
    u = radical_inverse(sample_idx, b0)
    v = radical_inverse(sample_idx, b1)
    # Rotation keyed by pixel: decorrelates pixels, keeps stratification.
    pk = jax.vmap(lambda p: jax.random.uniform(jax.random.fold_in(key, p), (2,)))(
        pixel_id
    )
    return jnp.stack([(u + pk[..., 0]) % 1.0, (v + pk[..., 1]) % 1.0], axis=-1)


def stratified_2d(sample_idx: jnp.ndarray, n_samples: int, pixel_id: jnp.ndarray, key):
    """Stratified 2-D jitter over a ⌈√n⌉×⌈√n⌉ grid per pixel."""
    import math

    res = max(1, int(math.isqrt(n_samples)))
    sx = (sample_idx % res).astype(jnp.float32)
    sy = ((sample_idx // res) % res).astype(jnp.float32)
    pk = jax.vmap(
        lambda p: jax.random.uniform(
            jax.random.fold_in(key, p), (2,)
        )
    )(pixel_id)
    u = (sx + pk[..., 0]) / res
    v = (sy + pk[..., 1]) / res
    return jnp.stack([u % 1.0, v % 1.0], axis=-1)


def _bit_reverse32(x: jnp.ndarray) -> jnp.ndarray:
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return ((x & 0x0000FFFF) << 16) | ((x >> 16) & 0x0000FFFF)


def _sobol_dim2_dirs() -> tuple:
    """Direction numbers for Sobol dimension 2 (Joe-Kuo: s=2, a=1, m=1,3)."""
    v = [0] * 32
    v[0] = 1 << 31
    v[1] = 3 << 30
    for k in range(2, 32):
        v[k] = v[k - 2] ^ (v[k - 2] >> 2) ^ v[k - 1]
    return tuple(v)


_SOBOL_DIRS = _sobol_dim2_dirs()


def sobol_2d(sample_idx: jnp.ndarray, pixel_id: jnp.ndarray, key):
    """First two Sobol dimensions with per-pixel Cranley-Patterson rotation
    (reference: mitsuba/src/samplers/sobol.cpp uses per-pixel digit
    scrambles; rotation gives the same decorrelation in wavefront form)."""
    i = sample_idx.astype(jnp.uint32)
    u = _bit_reverse32(i)
    v = jnp.zeros_like(i)
    for k in range(32):
        bit = ((i >> k) & 1).astype(jnp.uint32)
        v = v ^ bit * jnp.uint32(_SOBOL_DIRS[k])
    scale = jnp.float32(2.0 ** -32)
    pk = jax.vmap(lambda p: jax.random.uniform(jax.random.fold_in(key, p), (2,)))(
        pixel_id
    )
    return jnp.stack(
        [
            (u.astype(jnp.float32) * scale + pk[..., 0]) % 1.0,
            (v.astype(jnp.float32) * scale + pk[..., 1]) % 1.0,
        ],
        axis=-1,
    )


def camera_jitter(
    kind: str, key, pixel_id: jnp.ndarray, sample_idx: jnp.ndarray, n_samples: int
):
    """Pixel-jitter for the camera dimension under the chosen sampler."""
    if kind == "stratified":
        return stratified_2d(sample_idx, n_samples, pixel_id, key)
    if kind == "halton":
        return halton_2d(sample_idx, pixel_id, key)
    if kind == "sobol":
        return sobol_2d(sample_idx, pixel_id, key)
    return jax.random.uniform(key, pixel_id.shape + (2,))


# --- Full-dimension Sobol sequence (reference: src/samplers/sobol.cpp,
# which evaluates arbitrary-dimension Sobol points from direction
# matrices). Direction numbers come from scipy's built-in Joe-Kuo table
# at import time (host side); generation itself is pure jnp.
def _load_sobol_directions(max_dims: int = 64):
    try:
        from scipy.stats import qmc

        s = qmc.Sobol(d=max_dims, scramble=False, bits=32)
        return np.asarray(s._sv, dtype=np.uint32)  # [D, 32]
    except Exception:
        return None


_SOBOL_SV = _load_sobol_directions()


def sobol_nd(sample_idx: jnp.ndarray, n_dims: int, key=None):
    """Sobol' points [N, n_dims] for sample indices (Joe-Kuo directions,
    gray-code order as scipy enumerates them). ``key`` applies a random
    digital (XOR) scramble per dimension — a (t,m,s)-net-preserving
    decorrelation (the reference's sobol.cpp likewise randomizes per
    pixel)."""
    if _SOBOL_SV is None or n_dims > _SOBOL_SV.shape[0]:
        raise ValueError(f"sobol_nd supports up to "
                         f"{0 if _SOBOL_SV is None else _SOBOL_SV.shape[0]} dims")
    sv = jnp.asarray(_SOBOL_SV[:n_dims].astype(np.int64)).astype(jnp.uint32)
    idx = sample_idx.astype(jnp.uint32)
    gray = idx ^ (idx >> 1)
    x = jnp.zeros(sample_idx.shape + (n_dims,), jnp.uint32)
    for b in range(32):
        bit = ((gray >> b) & 1).astype(jnp.uint32)
        x = x ^ (bit[..., None] * sv[None, :, b])
    if key is not None:
        shift = jax.random.randint(
            key, (n_dims,), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
        x = x ^ shift[None, :]
    return (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
