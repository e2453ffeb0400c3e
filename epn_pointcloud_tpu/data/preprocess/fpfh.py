"""Normal estimation + FPFH descriptors, pure numpy/scipy (replaces the
open3d `compute_fpfh_feature` used by the reference keypoint mining,
SPConvNets/datasets/preprocess/run_keypoint.py:44-55).

FPFH (Rusu et al., ICRA 2009): per point, the Simplified Point Feature
Histogram over the Darboux-frame angles (alpha, phi, theta) of its radius
neighborhood, 11 bins per angle (33 dims), then re-weighted aggregation over
neighbors:  FPFH(p) = SPFH(p) + (1/k) sum_q SPFH(q) / ||p - q||.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

N_BINS = 11  # open3d convention: 3 x 11 = 33 dims


def estimate_normals(points: np.ndarray, radius: float | None = None,
                     knn: int = 30) -> np.ndarray:
    """Smallest-eigenvector PCA normals (orientation: +z half-space)."""
    tree = cKDTree(points)
    if radius is not None:
        neighbor_lists = tree.query_ball_point(points, radius)
    else:
        _, nn_idx = tree.query(points, k=min(knn, len(points)))
        neighbor_lists = nn_idx

    normals = np.zeros_like(points)
    for i, idx in enumerate(neighbor_lists):
        idx = np.asarray(idx)
        if idx.size < 3:
            normals[i] = (0, 0, 1)
            continue
        nb = points[idx]
        nb = nb - nb.mean(axis=0)
        cov = nb.T @ nb
        evals, evecs = np.linalg.eigh(cov)
        n = evecs[:, 0]
        normals[i] = n if n[2] >= 0 else -n
    return normals


def _pair_features(p_src, n_src, p_tgt, n_tgt):
    """Darboux-frame (alpha, phi, theta) for point pairs [m, 3] each."""
    d = p_tgt - p_src
    dist = np.linalg.norm(d, axis=1)
    dist_safe = np.maximum(dist, 1e-12)
    du = d / dist_safe[:, None]

    # orient so the source has the smaller angle to the connecting line
    cos_s = np.einsum('ij,ij->i', n_src, du)
    cos_t = np.einsum('ij,ij->i', n_tgt, du)
    swap = np.abs(cos_t) > np.abs(cos_s)
    ns = np.where(swap[:, None], n_tgt, n_src)
    nt = np.where(swap[:, None], n_src, n_tgt)
    du = np.where(swap[:, None], -du, du)

    u = ns
    v = np.cross(du, u)
    v_norm = np.linalg.norm(v, axis=1, keepdims=True)
    v = v / np.maximum(v_norm, 1e-12)
    w = np.cross(u, v)

    alpha = np.einsum('ij,ij->i', v, nt)                 # in [-1, 1]
    phi = np.einsum('ij,ij->i', u, du)                   # in [-1, 1]
    theta = np.arctan2(np.einsum('ij,ij->i', w, nt),
                       np.einsum('ij,ij->i', u, nt))     # in [-pi, pi]
    return alpha, phi, theta, dist


def _spfh(points, normals, neighbor_lists):
    """[n, 33] SPFH histograms."""
    n_pts = len(points)
    hist = np.zeros((n_pts, 3 * N_BINS), dtype=np.float64)
    for i, idx in enumerate(neighbor_lists):
        idx = np.asarray([j for j in idx if j != i])
        if idx.size == 0:
            continue
        a, f, t, _ = _pair_features(
            np.repeat(points[i][None], idx.size, 0),
            np.repeat(normals[i][None], idx.size, 0),
            points[idx], normals[idx])
        ba = np.clip(((a + 1) * 0.5 * N_BINS).astype(np.int64), 0, N_BINS - 1)
        bf = np.clip(((f + 1) * 0.5 * N_BINS).astype(np.int64), 0, N_BINS - 1)
        bt = np.clip(((t + np.pi) / (2 * np.pi) * N_BINS).astype(np.int64),
                     0, N_BINS - 1)
        hist[i, :N_BINS] = np.bincount(ba, minlength=N_BINS)
        hist[i, N_BINS:2 * N_BINS] = np.bincount(bf, minlength=N_BINS)
        hist[i, 2 * N_BINS:] = np.bincount(bt, minlength=N_BINS)
        s = idx.size
        hist[i] *= 100.0 / s  # percentage normalization per angle
    return hist


def compute_fpfh(points: np.ndarray, radius: float,
                 normals: np.ndarray | None = None) -> np.ndarray:
    """[n, 33] FPFH features over a radius neighborhood."""
    if normals is None:
        normals = estimate_normals(points, radius=radius)
    tree = cKDTree(points)
    neighbor_lists = tree.query_ball_point(points, radius)
    spfh = _spfh(points, normals, neighbor_lists)

    fpfh = spfh.copy()
    for i, idx in enumerate(neighbor_lists):
        idx = np.asarray([j for j in idx if j != i])
        if idx.size == 0:
            continue
        d = np.linalg.norm(points[idx] - points[i], axis=1)
        wsum = (spfh[idx] / np.maximum(d, 1e-12)[:, None]).sum(axis=0)
        fpfh[i] = spfh[i] + wsum / idx.size
    return fpfh.astype(np.float32)
