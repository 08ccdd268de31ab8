"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA/Pallas; host-side build/IO steps that the
reference also runs natively (kd-tree construction, mesh parsing —
reference: mitsuba/include/mitsuba/render/gkdtree.h) live in
native/libsdmm_native.so. Auto-builds with `make` on first use; falls back
to the pure-numpy implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdmm_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SDMM_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bvh_build.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def bvh_build_native(verts: np.ndarray, leaf_size: int = 4) -> dict | None:
    """Native median-split BVH build; layout-compatible with
    render/bvh.py:build_bvh. Returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    n = len(verts)
    if n == 0:
        return None
    max_nodes = 2 * n + 2
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    leaf_start = np.empty(max_nodes, np.int32)
    leaf_count = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    perm = np.empty(n + max_nodes * leaf_size, np.int32)
    n_nodes = ctypes.c_int32(0)
    n_perm = ctypes.c_int32(0)
    ret = lib.bvh_build(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n), ctypes.c_int32(leaf_size),
        node_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        leaf_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        leaf_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        miss.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_nodes), ctypes.byref(n_perm),
    )
    if ret != 0:
        return None
    m = n_nodes.value
    return {
        "lo": node_lo[:m].copy(),
        "hi": node_hi[:m].copy(),
        "leaf_start": leaf_start[:m].copy(),
        "leaf_count": leaf_count[:m].copy(),
        "miss": miss[:m].copy(),
        "perm": perm[: n_perm.value].copy(),
    }


def obj_load_native(path: str):
    """Parse an OBJ with the native loader. Returns (v [T,3,3], n [T,3,3],
    uv [T,3,2]) float64 arrays, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    try:
        lib.obj_load.restype = ctypes.c_int
        lib.obj_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:
        return None
    handle = ctypes.c_void_p()
    n_tris = ctypes.c_int64()
    rc = lib.obj_load(path.encode(), ctypes.byref(handle),
                      ctypes.byref(n_tris))
    if rc != 0:
        return None
    t = int(n_tris.value)
    v = np.empty((t, 3, 3), np.float64)
    n = np.empty((t, 3, 3), np.float64)
    uv = np.empty((t, 3, 2), np.float64)
    if t:
        lib.obj_copy(
            handle,
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            uv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    lib.obj_free(handle)
    return v, n, uv
