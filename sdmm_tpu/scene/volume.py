"""Mitsuba .vol grid-volume loader.

Reference: mitsuba/src/volume/gridvolume.cpp (binary format: 'VOL' magic,
version 3, int32 encoding id, resolution, channel count, float32 AABB,
then x-fastest float32 samples).
"""

from __future__ import annotations

import struct

import numpy as np


def load_vol(path: str):
    """Returns (density [D, H, W] float32, lo [3], hi [3])."""
    with open(path, "rb") as f:
        magic = f.read(3)
        if magic != b"VOL":
            raise ValueError(f"{path}: not a VOL file")
        version = f.read(1)[0]
        if version != 3:
            raise ValueError(f"{path}: unsupported VOL version {version}")
        enc, xres, yres, zres, channels = struct.unpack("<5i", f.read(20))
        if enc != 1:
            raise ValueError(f"{path}: only float32 encoding supported")
        bbox = struct.unpack("<6f", f.read(24))
        data = np.fromfile(f, dtype="<f4", count=xres * yres * zres * channels)
    grid = data.reshape(zres, yres, xres, channels)[..., 0]
    lo = np.asarray(bbox[:3], dtype=np.float64)
    hi = np.asarray(bbox[3:], dtype=np.float64)
    return grid.astype(np.float32), lo, hi


def save_vol(path: str, density: np.ndarray, lo, hi):
    """Write a version-3 float32 .vol file (for tests/tools)."""
    density = np.asarray(density, dtype=np.float32)
    zres, yres, xres = density.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(bytes([3]))
        f.write(struct.pack("<5i", 1, xres, yres, zres, 1))
        f.write(struct.pack("<6f", *np.asarray(lo, np.float32),
                            *np.asarray(hi, np.float32)))
        density.astype("<f4").tofile(f)
