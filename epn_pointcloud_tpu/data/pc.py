"""Host-side point-cloud utilities: resampling, normalization, augmentation,
KD-tree searches (rebuild of vgtk/vgtk/pc/{sample,augmentation}.py and
vgtk/vgtk/point3d/normalize.py)."""

from __future__ import annotations

import numpy as np
from scipy.spatial import KDTree
from scipy.spatial.transform import Rotation as sciR

from ..ops.rotation import R_from_euler_np


# --------------------------------------------------------------- resampling

def uniform_resample_index_np(pc: np.ndarray, n_sample: int,
                              rng=None) -> np.ndarray:
    """Down: choice without replacement; up: arange + choice with replacement
    (ref: pc/sample.py:16-27)."""
    rng = rng or np.random
    n_point = pc.shape[0]
    if n_point >= n_sample:
        return rng.choice(n_point, n_sample, replace=False)
    idx = rng.choice(n_point, n_sample - n_point, replace=True)
    return np.concatenate([np.arange(n_point), idx], axis=0)


def uniform_resample_np(pc, n_sample, label=None, rng=None):
    idx = uniform_resample_index_np(pc, n_sample, rng)
    if label is None:
        return idx, pc[idx]
    return idx, pc[idx], label[idx]


# ------------------------------------------------------------ normalization

def centralize_np(pc, batch=False):
    """pc [(b,) 3, p] (ref: point3d/normalize.py:20-22)."""
    axis = 2 if batch else 1
    return pc - pc.mean(axis=axis, keepdims=True)


def normalize_np(pc, batch=False):
    """Center then divide by the max point norm (ref: normalize.py:30-34)."""
    pc = centralize_np(pc, batch)
    axis = 1 if batch else 0
    var = np.sqrt((pc ** 2).sum(axis=axis, keepdims=True))
    return pc / var.max(axis=axis + 1, keepdims=True)


# -------------------------------------------------------------- augmentation

def rotate_point_cloud(data, R=None, max_degree=None, rng=None):
    """Random (or given) SO(3) rotation; returns (rotated [n,3], R [3,3])
    (ref: pc/augmentation.py:58-89)."""
    rng = rng or np.random
    if R is not None:
        rotation_angle = R
    elif max_degree is not None:
        rotation_angle = rng.randint(0, max_degree, 3) * np.pi / 180.0
    else:
        rotation_angle = sciR.random(
            random_state=rng if isinstance(rng, np.random.RandomState) else None
        ).as_matrix()

    if isinstance(rotation_angle, list) or np.asarray(rotation_angle).ndim == 1:
        rotation_matrix = R_from_euler_np(np.asarray(rotation_angle))
    else:
        rotation_angle = np.asarray(rotation_angle)
        assert rotation_angle.shape[0] >= 3 and rotation_angle.shape[1] >= 3
        rotation_matrix = rotation_angle[:3, :3]

    if data is None:
        return None, rotation_matrix
    rotated = (rotation_matrix @ data.reshape(-1, 3).T).T
    return rotated, rotation_matrix


def rotate_point_cloud_90deg(data, normal=None, rng=None):
    """Random multiple-of-90deg rotation about y (ref: augmentation.py:33-55)."""
    rng = rng or np.random
    ang = rng.randint(low=0, high=4) * (np.pi / 2.0)
    c, s = np.cos(ang), np.sin(ang)
    Rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    rotated = data.reshape(-1, 3) @ Rm
    rotated_normal = normal.reshape(-1, 3) @ Rm if normal is not None else None
    return rotated, rotated_normal, Rm


def rotate_point_cloud_with_normal(pc, surface_normal, rng=None):
    """Random rotation about the up (y) axis, applied to points AND normals;
    returns (rotated_pc, rotated_normals) (ref: pc/augmentation.py:119-139)."""
    rng = rng or np.random
    ang = rng.uniform() * 2 * np.pi
    c, s = np.cos(ang), np.sin(ang)
    Rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return pc @ Rm, surface_normal @ Rm


def rotate_perturbation_point_cloud(data, angle_sigma=0.06, angle_clip=0.18,
                                    rng=None):
    """Small random rotation: clipped-Gaussian Euler angles composed
    Rz @ Ry @ Rx, applied as data @ R (ref: pc/augmentation.py:142-163)."""
    rng = rng or np.random
    angles = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
    R = R_from_euler_np(angles)
    return data @ R


def rotate_perturbation_point_cloud_with_normal_som(pc, surface_normal, som,
                                                    angle_sigma=0.06,
                                                    angle_clip=0.18, rng=None):
    """rotate_perturbation_point_cloud applied consistently to points,
    normals, and SOM nodes (ref: pc/augmentation.py:166-192)."""
    rng = rng or np.random
    angles = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
    R = R_from_euler_np(angles)
    return pc @ R, surface_normal @ R, som @ R


def batch_rotate_point_cloud(data, R=None, rng=None):
    """One shared rotation applied to a whole [b, n, 3] batch; R may be a
    3x3 matrix or Euler angles (random SO(3) when None). Returns
    (rotated batch, R) (ref: pc/augmentation.py:92-116; torch there,
    numpy here). R normalization is rotate_point_cloud's (pc.py:53)."""
    _, R = rotate_point_cloud(None, R=R, rng=rng)
    return np.einsum('ij,bnj->bni', R, data), R


def jitter_point_cloud(data, sigma=0.01, clip=0.05, rng=None):
    """(ref: augmentation.py:193-202)"""
    rng = rng or np.random
    assert clip > 0
    return data + np.clip(sigma * rng.randn(*data.shape), -clip, clip)


def crop_point_cloud(data, k=0.05, rng=None):
    """Remove the kN nearest neighbors of a random crop center
    (ref: augmentation.py:205-213)."""
    rng = rng or np.random
    n = data.shape[0]
    center = data[rng.randint(n)]
    d = np.linalg.norm(data - center, axis=1)
    drop = np.argsort(d)[:int(k * n)]
    return np.delete(data, drop, axis=0)


def permute(data, rng=None):
    """Random resample-with-replacement permutation (ref: augmentation.py:215-218)."""
    rng = rng or np.random
    n = data.shape[0]
    return data[rng.choice(n, n, replace=True)]


# ------------------------------------------------------------ host searches

def knn_index_np(pc, k, batch=False):
    """kNN indices via KD-tree, [n,3] -> [n,k] (or per-batch when batch=True).
    The reference declares this API but raises NotImplementedError
    (ref: pc/sample.py:40-41); we provide the working implementation."""
    if batch:
        return np.stack([knn_index_np(p, k) for p in pc])
    _, idx = KDTree(pc).query(pc, k=k)
    return idx.astype(np.int64).reshape(pc.shape[0], k)


def ball_search_np(pc, kpt, knn, search_radius, subsample_ratio=4, rng=None,
                   verbose=False):
    """kNN-ball search with random fill (ref: pc/sample.py:82-111).
    Returns (indices [k, knn] int32 into the subsampled cloud, pc_sub)."""
    rng = rng or np.random
    if subsample_ratio > 1:
        _, pc_sub = uniform_resample_np(pc, pc.shape[0] // subsample_ratio, rng=rng)
    else:
        pc_sub = pc
    nn = min(10000, pc_sub.shape[0])
    tree = KDTree(pc_sub)
    dists, indices = tree.query(pc[kpt], k=nn)
    true_indices = []
    maxcount = 0
    for i in range(len(dists)):
        if dists[i].max() > search_radius:
            lidx = int(np.where(dists[i] > search_radius)[0][0])
            if lidx >= knn:
                true_indices.append(rng.choice(indices[i][:lidx], knn))
            elif lidx <= 1:
                choice = rng.choice(range(1), knn - lidx)
                true_indices.append(np.append(indices[i][:lidx], indices[i][choice]))
            else:
                choice = rng.choice(range(lidx - 1), knn - lidx)
                true_indices.append(np.append(indices[i][:lidx], indices[i][choice]))
        else:
            true_indices.append(rng.choice(indices[i], knn))
            maxcount += 1
    if verbose:
        print('inclusion ratio: ', 1 - float(maxcount) / float(len(dists)))
    return np.array(true_indices, dtype=np.int32), pc_sub


def radius_ball_search_np(pc, kpt, search_radius, maxpoints, rng=None):
    """Radius search returning variable-size patches, subsampled to maxpoints
    (ref: pc/sample.py:115-135)."""
    rng = rng or np.random
    tree = KDTree(pc)
    results = tree.query_ball_point(kpt, search_radius)
    all_pc = []
    for indices in results:
        patch = pc[indices]
        if len(indices) > maxpoints:
            _, patch = uniform_resample_np(patch, maxpoints, rng=rng)
        all_pc.append(patch)
    return all_pc


def voxel_downsample_np(pc: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample (centroid per voxel) — host-side replacement for
    open3d.voxel_down_sample used by the 3DMatch loaders
    (ref: match_3dmatch.py:258)."""
    if voxel_size <= 0:
        return pc
    keys = np.floor(pc / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((counts.shape[0], 3), dtype=np.float64)
    np.add.at(sums, inv, pc)
    return (sums / counts[:, None]).astype(pc.dtype)
