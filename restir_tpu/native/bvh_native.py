"""ctypes bindings for the native C++ SAH/MTBVH builder (bvh.cpp).

The shared library is compiled on first use (g++ -O3) and cached next
to the source; scene/bvh.py's `build_bvh(..., impl="auto")` prefers this
builder and silently falls back to NumPy when no toolchain is present.
Both builders produce bit-identical trees (asserted in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh.cpp")
_LIB = os.path.join(_DIR, "libbvh.so")
_lock = threading.Lock()
_lib = None


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB + ".tmp", _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # Key the build cache on the source hash, not mtimes: git
        # checkouts do not preserve mtimes, and a stale prebuilt .so
        # (possibly compiled -march=native on a different host) must
        # never be silently loaded.
        import hashlib

        with open(_SRC, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        stamp = _LIB + ".sha256"
        stale = True
        if os.path.exists(_LIB) and os.path.exists(stamp):
            with open(stamp) as f:
                stale = f.read().strip() != src_hash
        if stale:
            _compile()
            with open(stamp + ".tmp", "w") as f:
                f.write(src_hash)
            os.replace(stamp + ".tmp", stamp)
        lib = ctypes.CDLL(_LIB)
        lib.build_bvh_native.restype = ctypes.c_int
        lib.build_bvh_native.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # vertices
            ctypes.c_int64,  # n_prims
            ctypes.POINTER(ctypes.c_float),  # bounds_lo
            ctypes.POINTER(ctypes.c_float),  # bounds_hi
            ctypes.POINTER(ctypes.c_int32),  # mt_prim
            ctypes.POINTER(ctypes.c_int32),  # mt_box
            ctypes.POINTER(ctypes.c_int32),  # mt_miss
        ]
        _lib = lib
        return lib


def build_bvh_native(vertices: np.ndarray):
    """vertices: [3N, 3] float32 -> scene.bvh.BVH (same layout as NumPy)."""
    from ..scene.bvh import BVH

    lib = _load()
    verts = np.ascontiguousarray(np.asarray(vertices, np.float32).reshape(-1, 3))
    n = verts.shape[0] // 3
    size = max(2 * n - 1, 1)

    bounds_lo = np.empty((size, 3), np.float32)
    bounds_hi = np.empty((size, 3), np.float32)
    mt_prim = np.empty((6, size), np.int32)
    mt_box = np.empty((6, size), np.int32)
    mt_miss = np.empty((6, size), np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.build_bvh_native(
        verts.ctypes.data_as(fp), n,
        bounds_lo.ctypes.data_as(fp), bounds_hi.ctypes.data_as(fp),
        mt_prim.ctypes.data_as(ip), mt_box.ctypes.data_as(ip),
        mt_miss.ctypes.data_as(ip),
    )
    if rc != 0:
        raise RuntimeError(f"build_bvh_native failed with code {rc}")
    return BVH(
        bounds_lo=bounds_lo, bounds_hi=bounds_hi,
        prim_id=mt_prim, box_id=mt_box, miss=mt_miss, size=size,
    )
