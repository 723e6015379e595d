"""Native (C++) host-side components, built lazily with g++.

The TPU compute path is jax/XLA/Pallas; these are the *runtime* pieces the
reference delegated to native extensions:

* ``fast_obj`` — OBJ mesh parser (hot in the eval stage's mesh re-reads).
* ``knn`` — KD-tree KNN; replaces the CUDA ``simple-knn`` (distCUDA2)
  and the scipy cKDTree metric queries.

Build: ``make -C mpmavatar_tpu/native`` or automatically on first import.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmpmnative.so")
_lib = None


def _build():
    # portable baseline (no -march=native): the .so is built lazily on
    # each machine, but a copied binary must not SIGILL on older CPUs
    srcs = [os.path.join(_DIR, "src", f)
            for f in ("fast_obj.cpp", "knn3.cpp")]
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp",
           "-o", _LIB_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(os.path.join(_DIR, "src", f)) >
            os.path.getmtime(_LIB_PATH)
            for f in os.listdir(os.path.join(_DIR, "src"))):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.obj_count.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int64)]
    lib.obj_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                             ctypes.c_void_p]
    lib.knn3.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                         ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
                         ctypes.c_void_p]
    lib.mean_dist2_knn3.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
    _lib = lib
    return lib


class fast_obj:
    @staticmethod
    def read_obj(path):
        lib = _load()
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        rc = lib.obj_count(str(path).encode(), ctypes.byref(nv),
                           ctypes.byref(nf))
        if rc:
            raise IOError(f"cannot open {path}")
        verts = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        lib.obj_read(str(path).encode(), verts.ctypes.data,
                     faces.ctypes.data)
        return verts, faces


class knn:
    @staticmethod
    def query(points, queries, k):
        """KNN: returns (dist2 (m, k), idx (m, k))."""
        lib = _load()
        points = np.ascontiguousarray(points, np.float32)
        queries = np.ascontiguousarray(queries, np.float32)
        m = len(queries)
        dist2 = np.empty((m, k), np.float32)
        idx = np.empty((m, k), np.int32)
        rc = lib.knn3(points.ctypes.data, len(points), queries.ctypes.data,
                      m, k, dist2.ctypes.data, idx.ctypes.data)
        if rc:
            raise RuntimeError("knn3 failed")
        return dist2, idx

    @staticmethod
    def mean_dist2_3nn(points):
        """distCUDA2 equivalent (scene/gaussian_model.py:190)."""
        lib = _load()
        points = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(points), np.float32)
        rc = lib.mean_dist2_knn3(points.ctypes.data, len(points),
                                 out.ctypes.data)
        if rc:
            raise RuntimeError("mean_dist2_knn3 failed")
        return out
