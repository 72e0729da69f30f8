"""ctypes bindings to the native host-side topology kernels
(native/topology.cpp). Auto-builds the shared library with make on first
import if a toolchain is available; callers fall back to the numpy
implementations in tssplat_tpu.mesh.surface when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtssplat_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.tss_surface_faces.restype = ctypes.c_int64
    lib.tss_surface_faces.argtypes = [i64p, ctypes.c_int64, i64p]
    lib.tss_tet_face_neighbors.restype = None
    lib.tss_tet_face_neighbors.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
    lib.tss_triangle_edge_neighbors.restype = None
    lib.tss_triangle_edge_neighbors.argtypes = [i64p, ctypes.c_int64, i64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def surface_faces(tets: np.ndarray) -> Optional[np.ndarray]:
    """Boundary faces in original vertex ids, winding preserved; None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int64)
    T = tets.shape[0]
    out = np.empty((4 * T, 3), np.int64)
    n = lib.tss_surface_faces(tets, T, out)
    return out[:n].copy()

def tet_face_neighbors(tets: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int64)
    T = tets.shape[0]
    nbrs = np.empty((T, 4), np.int64)
    degree = np.empty((T,), np.int64)
    lib.tss_tet_face_neighbors(tets, T, nbrs, degree)
    return nbrs, degree


def triangle_edge_neighbors(faces: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int64)
    out = np.empty((faces.shape[0], 3), np.int64)
    lib.tss_triangle_edge_neighbors(faces, faces.shape[0], out)
    return out
