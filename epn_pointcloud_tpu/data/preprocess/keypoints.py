"""Offline FPFH-based cross-fragment keypoint-pair mining (rebuild of
SPConvNets/datasets/preprocess/run_keypoint.py — overlap test, FPFH distance
filtering, keypoint-pair export to <out>/kpts/<scene>/cloud_bin_A-cloud_bin_B.npy).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
from scipy.spatial import cKDTree

from ...ops.ply import load_ply
from ..pc import uniform_resample_np, voxel_downsample_np
from .fpfh import compute_fpfh
from .tool import Config, test_scenes_overlap


def downsample_and_compute_fpfh(points: np.ndarray, cfg: Config, T=None):
    """(ref: run_keypoint.py:44-55)"""
    pc_down = voxel_downsample_np(points, cfg.voxel_size)
    if T is not None:
        pc_down = pc_down @ T[:3, :3].T + T[:3, 3]
    fpfh = compute_fpfh(pc_down, cfg.fpfh_radius)
    return pc_down, fpfh


def cross_filtering_via_fpfh(points_i, points_j, fpfh_i, fpfh_j, cfg: Config,
                             nonplanar_param: float = -1):
    """Mutual spatial-NN pairs within fpfh_thresh, optional planarity filter
    (ref: run_keypoint.py:60-106). Returns matched (points_i, points_j)."""
    keep_i = np.any(fpfh_i != 0, axis=1)
    keep_j = np.any(fpfh_j != 0, axis=1)
    points_i, fpfh_i = points_i[keep_i], fpfh_i[keep_i]
    points_j, fpfh_j = points_j[keep_j], fpfh_j[keep_j]

    tree_j = cKDTree(points_j)
    dists, indices = tree_j.query(points_i, k=1)
    dist_filter = np.argwhere(dists <= cfg.fpfh_thresh).reshape(-1)
    indices = indices[dist_filter]
    fi = fpfh_i[dist_filter]
    fj = fpfh_j[indices]
    points_i = points_i[dist_filter]
    points_j = points_j[indices]

    if nonplanar_param > 0:
        flags = [idx for idx, (a, b) in enumerate(zip(fi, fj))
                 if a.std() < nonplanar_param and b.std() < nonplanar_param]
        if len(flags) < 128:
            return None, None
        points_i = points_i[flags]
        points_j = points_j[flags]
    return points_i, points_j


def mine_keypoint_pairs(frag_path_i: str, frag_path_j: str, pose_i: np.ndarray,
                        pose_j: np.ndarray, cfg: Config | None = None,
                        rng=None):
    """Mine corresponding keypoint index pairs between two fused fragments.

    Returns int64 [m, 2] indices into the ORIGINAL fragment clouds, or None
    if the fragments don't overlap enough (ref: run_keypoint.py main flow:
    transform to world, overlap test, FPFH cross filter, map back to raw
    cloud indices via nearest neighbor)."""
    cfg = cfg or Config()
    rng = rng or np.random

    pc_i = load_ply(frag_path_i)
    pc_j = load_ply(frag_path_j)
    Ri, ti = pose_i[:3, :3], pose_i[:3, 3]
    Rj, tj = pose_j[:3, :3], pose_j[:3, 3]
    wi = pc_i @ Ri.T + ti
    wj = pc_j @ Rj.T + tj

    sub_i = wi if len(wi) <= cfg.subsample_maxpoints else \
        uniform_resample_np(wi, cfg.subsample_maxpoints, rng=rng)[1]
    sub_j = wj if len(wj) <= cfg.subsample_maxpoints else \
        uniform_resample_np(wj, cfg.subsample_maxpoints, rng=rng)[1]
    ok, _, _ = test_scenes_overlap(
        sub_i[::cfg.subsample_ratio], sub_j[::cfg.subsample_ratio],
        cfg.overlap_ratio, cfg.dist_margin)
    if not ok:
        return None

    down_i, fpfh_i = downsample_and_compute_fpfh(wi, cfg)
    down_j, fpfh_j = downsample_and_compute_fpfh(wj, cfg)
    kp_i, kp_j = cross_filtering_via_fpfh(down_i, down_j, fpfh_i, fpfh_j, cfg)
    if kp_i is None or len(kp_i) == 0:
        return None

    # map matched world-space keypoints back to raw fragment indices
    _, idx_i = cKDTree(wi).query(kp_i, k=1)
    _, idx_j = cKDTree(wj).query(kp_j, k=1)
    return np.stack([idx_i, idx_j], axis=1).astype(np.int64)


def run_keypoint_mining(data_root: str, output_root: str,
                        cfg: Config | None = None, max_pair_gap: int = 3):
    """Walk <data_root>/fused_fragments/<scene>/**, mine pairs for fragments
    within `max_pair_gap` of each other, save
    <output_root>/kpts/<scene>/cloud_bin_A-cloud_bin_B.npy."""
    cfg = cfg or Config()
    frag_root = os.path.join(data_root, 'fused_fragments')
    for scene in sorted(os.listdir(frag_root)):
        scene_dir = os.path.join(frag_root, scene)
        if not os.path.isdir(scene_dir):
            continue
        plys = sorted(glob.glob(os.path.join(scene_dir, 'cloud_bin_*.ply')),
                      key=lambda p: int(re.search(r'_(\d+)\.ply', p).group(1)))
        out_dir = os.path.join(output_root, 'kpts', scene)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(plys)):
            for j in range(i + 1, min(i + 1 + max_pair_gap, len(plys))):
                pose_i = np.loadtxt(os.path.join(
                    scene_dir, f'cloud_bin_{i}_pose.txt'))
                pose_j = np.loadtxt(os.path.join(
                    scene_dir, f'cloud_bin_{j}_pose.txt'))
                pairs = mine_keypoint_pairs(plys[i], plys[j], pose_i, pose_j,
                                            cfg)
                if pairs is not None and len(pairs) >= 128:
                    np.save(os.path.join(
                        out_dir, f'cloud_bin_{i}-cloud_bin_{j}.npy'), pairs)
