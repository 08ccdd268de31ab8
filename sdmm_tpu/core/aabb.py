"""Axis-aligned bounding boxes (host-side numpy helpers).

Equivalent of the reference's ``AABB`` (reference:
mitsuba/include/mitsuba/core/aabb.h); used at scene-build time and for the
guiding spatial tree domain normalization
(reference: mitsuba/src/integrators/sdmm/volpath_sdmm.cpp:314-332 getAABB).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AABB:
    lo: np.ndarray
    hi: np.ndarray

    @staticmethod
    def empty() -> "AABB":
        return AABB(np.full(3, np.inf), np.full(3, -np.inf))

    def expand(self, pts: np.ndarray) -> "AABB":
        p = np.asarray(pts).reshape(-1, 3)
        return AABB(np.minimum(self.lo, p.min(axis=0)), np.maximum(self.hi, p.max(axis=0)))

    @property
    def extents(self) -> np.ndarray:
        return self.hi - self.lo

    @property
    def max_extent(self) -> float:
        return float(self.extents.max())
