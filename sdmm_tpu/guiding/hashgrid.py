"""Uniform grid spatial structure + density-based sample normalization.

TPU-native equivalents of the reference's grid accelerators and outlier
handling (reference: jmm/hash_grid.h UniformGrid/HashGrid :30,105 and
jmm/outlier_detection.h estimateStateDensity :131 — kNN kd-tree density
used to normalize sample weights). Instead of a pointer-chasing hash table
or a kd-tree kNN, the domain is a dense R³ cell grid: ``find`` is one
floor-divide, density is a segment-sum histogram — both single fused ops
over the whole sample wave.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UniformGrid:
    """Dense uniform grid over an AABB (reference: jmm/hash_grid.h:105)."""

    def __init__(self, lo, hi, resolution: int = 16):
        self.lo = np.asarray(lo, dtype=np.float32)
        self.hi = np.asarray(hi, dtype=np.float32)
        self.res = int(resolution)
        self.n_cells = self.res ** 3

    def device_tables(self) -> dict:
        ext = np.maximum(self.hi - self.lo, 1e-12)
        return {
            "lo": jnp.asarray(self.lo),
            "inv_ext": jnp.asarray(1.0 / ext),
            "res": self.res,
        }


def grid_cell(tables: dict, p: jnp.ndarray) -> jnp.ndarray:
    """Cell id for each point (points clamp to the boundary cells)."""
    res = tables["res"]
    q = (p - tables["lo"]) * tables["inv_ext"]
    ijk = jnp.clip((q * res).astype(jnp.int32), 0, res - 1)
    return (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]


def cell_counts(tables: dict, p: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-cell sample histogram — the lock-free replacement for the
    reference's mutexed push_back (SURVEY §2.4)."""
    res = tables["res"]
    cell = grid_cell(tables, p)
    return jnp.zeros((res ** 3,), jnp.float32).at[cell].add(
        valid.astype(jnp.float32)
    )


def density_at(tables: dict, counts: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sample density (per unit normalized volume) at each point."""
    res = tables["res"]
    cell_volume = 1.0 / (res ** 3)
    return counts[grid_cell(tables, p)] / cell_volume


def normalize_weights(weight: jnp.ndarray, density: jnp.ndarray,
                      valid: jnp.ndarray, clip: float = 20.0) -> jnp.ndarray:
    """Density-normalize sample weights (reference: outlier_detection.h —
    samples in densely-sampled regions are down-weighted so isolated
    high-energy samples don't dominate the fit). The correction factor is
    mean_density/density, clipped to ``clip``×."""
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    mean_density = jnp.sum(jnp.where(valid, density, 0.0)) / n_valid
    factor = jnp.clip(
        mean_density / jnp.maximum(density, 1e-12), 1.0 / clip, clip
    )
    return jnp.where(valid, weight * factor, weight)
