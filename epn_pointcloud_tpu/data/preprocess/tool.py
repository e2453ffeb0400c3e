"""Offline preprocessing config + helpers (rebuild of
SPConvNets/datasets/preprocess/tool.py — same constants; open3d replaced by
in-repo numpy implementations)."""

from __future__ import annotations

import numpy as np


class Config:
    """(ref: preprocess/tool.py:17-48)"""

    def __init__(self):
        self.verbose = False

        # rgbd fusion
        self.depth_scale = 1000
        self.depth_trunc = 6
        self.tsdf_cubic_size = 3.0
        self.frames_per_frag = 50
        self.width = 640
        self.height = 480

        # keypoint selection
        self.subsample_ratio = 20
        self.subsample_maxpoints = 100000
        self.overlap_ratio = 0.3
        self.dist_margin = 0.075

        # fpfh filtering
        self.voxel_size = 0.05
        self.fpfh_radius = 0.15
        self.fpfh_thresh = 0.03

        # ballsearch
        self.search_radius = 0.4
        self.patch_maxpoints = 2048

        # serialization
        self.blocksize = 512
        self.max_patches_per_scene = 1000
        self.num_threads = 8


def read_intrinsic(filepath):
    """3x3 intrinsic matrix from text."""
    return np.loadtxt(filepath, dtype=np.float64)[:3, :3]


def depth_to_points(depth: np.ndarray, K: np.ndarray,
                    depth_scale: float = 1000.0,
                    depth_trunc: float = 6.0):
    """Unproject a depth image (mm) to camera-frame points [n, 3]
    (same math as preprocess/tool.py:generate_point_cloud)."""
    h, w = depth.shape
    z = depth.astype(np.float64) / depth_scale
    valid = (z > 0) & (z < depth_trunc)
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u + 0.5 - cx) * z / fx
    y = (v + 0.5 - cy) * z / fy
    pts = np.stack([x[valid], y[valid], z[valid]], axis=1)
    return pts, valid


def test_scenes_overlap(pc1, pc2, overlap_ratio=0.3, margin=1e-2,
                        verbose=False):
    """Fraction of pc1 with a neighbor in pc2 within `margin`
    (ref: tool.py:test_scenes_overlap). Returns (ok, pc1idx, pc2idx)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(pc2)
    dists, indices = tree.query(pc1, k=1)
    pc1idx = np.argwhere(dists <= margin)[:, 0]
    pc2idx = indices[pc1idx].reshape(-1)
    n_overlap = pc1idx.shape[0]
    n_pts = max(pc1.shape[0], pc2.shape[0])
    if verbose:
        print('Overlap ratio is %f' % (n_overlap / n_pts))
    return n_overlap >= overlap_ratio * n_pts, pc1idx, pc2idx


def save_kpts_list(path, arr):
    with open(path, 'w') as f:
        for idx in arr:
            f.write('%d\n' % idx)
