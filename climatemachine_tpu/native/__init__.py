"""Native (C++) host-runtime components, bound via ctypes.

The reference is 100% Julia (SURVEY.md: no C/C++/CUDA files); its
"native" layers are JIT-compiled KernelAbstractions kernels and MPI.
Here the device compute path is XLA; the host-side mesh construction —
face matching (reference Topologies.jl connectmesh role) and Hilbert
space-filling-curve codes (reference BrickMesh.jl:40 hilbertcode) — is
implemented in C++ (``mesh_native.cpp``) because it is the only O(E)
serial host work at setup and hashing-bound in Python for
production-scale meshes.

The shared object is compiled on first use with the system g++ (no
pybind11 dependency — plain C ABI + ctypes) and cached next to the
source; every entry point has a NumPy fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mesh_native.cpp")
_SO = os.path.join(_HERE, "_mesh_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        tmp = _SO + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _SO)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None (fallbacks used)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("CLIMATEMACHINE_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.cm_connect_faces.restype = ctypes.c_int
            lib.cm_connect_faces.argtypes = [
                ctypes.c_int, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.cm_hilbert_codes.restype = None
            lib.cm_hilbert_codes.argtypes = [
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint64),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def connect_faces_native(dim: int, elem_to_vertex: np.ndarray,
                         default_bctags: Optional[np.ndarray] = None):
    """C++ face matching; returns None if the native library is
    unavailable or reports an error (caller falls back to NumPy)."""
    lib = get_lib()
    if lib is None:
        return None
    e2v = np.ascontiguousarray(elem_to_vertex, dtype=np.int64)
    nelem = e2v.shape[0]
    nface = 2 * dim
    neighbor = np.empty((nelem, nface), dtype=np.int64)
    neighbor_face = np.empty((nelem, nface), dtype=np.int64)
    orient = np.empty((nelem, nface), dtype=np.int32)
    bctag = np.empty((nelem, nface), dtype=np.int32)
    if default_bctags is not None:
        db = np.ascontiguousarray(default_bctags, dtype=np.int32)
        db_ptr = db.ctypes.data_as(ctypes.c_void_p)
    else:
        db = None
        db_ptr = None
    rc = lib.cm_connect_faces(
        dim, nelem,
        e2v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        db_ptr,
        neighbor.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        neighbor_face.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        orient.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bctag.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return neighbor, neighbor_face, orient, bctag


def hilbert_codes(points: np.ndarray, nbits: int = 20) -> np.ndarray:
    """Locality-preserving 1-D codes of 2-D/3-D points (reference
    BrickMesh.jl hilbertcode / centroidtocode): quantize each axis to
    ``nbits`` and encode on the Hilbert curve.  NumPy fallback encodes
    with Morton (Z-order) interleave — also locality-preserving, noted
    divergence."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2:
        raise ValueError("points must be [n, dim]")
    n, d = pts.shape
    if d == 2:
        pts = np.concatenate([pts, np.zeros((n, 1))], axis=1)
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-300)
    scaled = ((pts - lo) / span * ((1 << nbits) - 1)).astype(np.uint32)

    lib = get_lib()
    if lib is not None:
        xyz = np.ascontiguousarray(scaled, dtype=np.uint32)
        codes = np.empty(n, dtype=np.uint64)
        lib.cm_hilbert_codes(
            n, nbits,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return codes

    # Morton fallback
    codes = np.zeros(n, dtype=np.uint64)
    for b in range(nbits - 1, -1, -1):
        for j in range(3):
            codes = (codes << np.uint64(1)) | (
                (scaled[:, j].astype(np.uint64) >> np.uint64(b))
                & np.uint64(1))
    return codes


def sfc_order(points: np.ndarray, nbits: int = 20) -> np.ndarray:
    """Element ordering along the space-filling curve (argsort of
    hilbert_codes) — the reference partitions contiguous runs of this
    order across ranks (BrickMesh.jl partition/getpartition)."""
    return np.argsort(hilbert_codes(points, nbits), kind="stable")
