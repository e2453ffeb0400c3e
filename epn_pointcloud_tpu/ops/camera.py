"""Pinhole-camera helpers (rebuild of the reference's camera utilities —
vgtk/vgtk/camera is projection stubs; the working math lives in
preprocess/tool.py:generate_point_cloud. Kept minimal and numpy-first)."""

from __future__ import annotations

import numpy as np


def intrinsic_matrix(fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def project(points_cam: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Camera-frame points [n, 3] -> pixel coords [n, 2] (+z forward)."""
    uvw = points_cam @ K.T
    return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-12)


def unproject(pixels: np.ndarray, depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Pixel coords [n, 2] + depth [n] -> camera-frame points [n, 3]."""
    ones = np.ones((len(pixels), 1))
    uv1 = np.concatenate([pixels, ones], axis=1)
    rays = uv1 @ np.linalg.inv(K).T
    return rays * depth[:, None]


def depth_image_to_points(depth: np.ndarray, K: np.ndarray,
                          depth_scale: float = 1000.0,
                          pose_cam2world: np.ndarray | None = None):
    """Depth image (integer millimeters) -> world-frame points
    (ref: preprocess/tool.py:generate_point_cloud math)."""
    from ..data.preprocess.tool import depth_to_points
    pts, valid = depth_to_points(depth, K, depth_scale)
    if pose_cam2world is not None:
        pts = pts @ pose_cam2world[:3, :3].T + pose_cam2world[:3, 3]
    return pts, valid
