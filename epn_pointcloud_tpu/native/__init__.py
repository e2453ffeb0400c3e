"""ctypes bindings for the native host-ops library (host_ops.cpp), with
transparent numpy/scipy fallbacks when the shared library isn't built.

Build: `make -C epn_pointcloud_tpu/native` (auto-attempted on first import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libepn_host.so')
_lib = None


def _try_build():
    try:
        subprocess.run(['make', '-C', _HERE], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not _try_build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')

    lib.voxel_downsample.restype = i64
    lib.voxel_downsample.argtypes = [f32p, i64, ctypes.c_float, f32p]
    lib.radius_search.restype = None
    lib.radius_search.argtypes = [f32p, i64, f32p, i64, ctypes.c_float,
                                  i64, i64p, i64p]
    lib.furthest_point_sampling.restype = None
    lib.furthest_point_sampling.argtypes = [f32p, i64, i64, ctypes.c_float,
                                            i64p]
    lib.uniform_resample.restype = None
    lib.uniform_resample.argtypes = [i64, i64, ctypes.c_uint64, i64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Centroid-per-voxel downsample; falls back to data.pc numpy path."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if lib is None:
        from ..data.pc import voxel_downsample_np
        return voxel_downsample_np(pts, voxel_size)
    out = np.empty_like(pts)
    m = lib.voxel_downsample(pts, pts.shape[0], voxel_size, out)
    return out[:m].copy()


def radius_search(support: np.ndarray, queries: np.ndarray, radius: float,
                  max_k: int):
    """Returns (idx [m, max_k] int64 with -1 padding, counts [m] int64):
    support indices within radius, in index order."""
    lib = _load()
    sup = np.ascontiguousarray(support, dtype=np.float32)
    qry = np.ascontiguousarray(queries, dtype=np.float32)
    m = qry.shape[0]
    if lib is None:
        from scipy.spatial import cKDTree
        tree = cKDTree(sup)
        lists = tree.query_ball_point(qry, radius)
        idx = np.full((m, max_k), -1, dtype=np.int64)
        counts = np.zeros(m, dtype=np.int64)
        for i, lst in enumerate(lists):
            lst = sorted(lst)[:max_k]
            counts[i] = len(lst)
            idx[i, :len(lst)] = lst
        return idx, counts
    idx = np.empty((m, max_k), dtype=np.int64)
    counts = np.empty(m, dtype=np.int64)
    lib.radius_search(sup, sup.shape[0], qry, m, radius, max_k, idx, counts)
    return idx, counts


def radius_search_lists(support: np.ndarray, queries: np.ndarray,
                        radius: float, max_k: int = 4096):
    """query_ball_point-style list-of-arrays result."""
    idx, counts = radius_search(support, queries, radius, max_k)
    return [idx[i, :counts[i]] for i in range(len(counts))]


def furthest_point_sampling(points: np.ndarray, m: int,
                            shadow_eps: float = 1e-3) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if lib is None:
        n = pts.shape[0]
        out = np.zeros(m, dtype=np.int64)
        mag = (pts ** 2).sum(1)
        valid = mag > shadow_eps
        temp = np.full(n, np.inf)
        old = 0
        for j in range(1, m):
            d = ((pts - pts[old]) ** 2).sum(1)
            temp = np.minimum(temp, d)
            old = int(np.argmax(np.where(valid, temp, -np.inf)))
            out[j] = old
        return out
    out = np.empty(m, dtype=np.int64)
    lib.furthest_point_sampling(pts, pts.shape[0], m, shadow_eps, out)
    return out


def uniform_resample_index(n: int, m: int, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        rng = np.random.RandomState(seed & 0x7fffffff)
        if n >= m:
            return rng.choice(n, m, replace=False).astype(np.int64)
        extra = rng.choice(n, m - n, replace=True)
        return np.concatenate([np.arange(n), extra]).astype(np.int64)
    out = np.empty(m, dtype=np.int64)
    lib.uniform_resample(n, m, seed, out)
    return out
