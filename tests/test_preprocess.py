"""Preprocess subsystem tests: TSDF fusion, FPFH, keypoint mining."""

import numpy as np
import pytest

from epn_pointcloud_tpu.data.preprocess import fpfh
from epn_pointcloud_tpu.data.preprocess.fusion import TSDFVolume
from epn_pointcloud_tpu.data.preprocess.tool import Config, depth_to_points
from epn_pointcloud_tpu.data.preprocess.tool import test_scenes_overlap as overlap_check


def _render_depth_plane(z_m=1.0, w=64, h=48, fx=50.0):
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
    depth = np.full((h, w), z_m * 1000.0)
    return depth, K


def test_depth_unprojection():
    depth, K = _render_depth_plane(2.0)
    pts, valid = depth_to_points(depth, K)
    assert valid.all()
    np.testing.assert_allclose(pts[:, 2], 2.0)


def test_tsdf_plane_reconstruction():
    """Fusing depth views of a plane reconstructs points near the plane."""
    depth, K = _render_depth_plane(1.0)
    vol = TSDFVolume(voxel_length=0.02, sdf_trunc=0.06)
    vol.integrate(depth, K, np.eye(4))
    vol.integrate(depth, K, np.eye(4))
    pts, nrms = vol.extract_point_cloud(min_weight=1.5)
    assert len(pts) > 50
    # surface is the z=1 plane (in the camera frustum)
    assert np.abs(pts[:, 2] - 1.0).max() < 0.05
    # normals point along +-z
    assert np.abs(nrms[:, 2]).mean() > 0.8


def test_fpfh_invariance_and_discrimination():
    rng = np.random.RandomState(0)
    # a corner structure (3 orthogonal half planes)
    n = 300
    p1 = np.stack([rng.rand(n), rng.rand(n), np.zeros(n)], 1)
    p2 = np.stack([rng.rand(n), np.zeros(n), rng.rand(n)], 1)
    pc = np.concatenate([p1, p2], 0)
    f = fpfh.compute_fpfh(pc, radius=0.3)
    assert f.shape == (2 * n, 33)
    assert np.isfinite(f).all()

    # rotation invariance: FPFH of the rotated cloud matches
    from epn_pointcloud_tpu.ops.rotation import rand_rotation_matrix
    R = rand_rotation_matrix(rng=rng)
    f_rot = fpfh.compute_fpfh(pc @ R.T, radius=0.3)
    # histograms are rotation invariant up to normal-sign/binning noise
    corr = np.corrcoef(f.reshape(-1), f_rot.reshape(-1))[0, 1]
    assert corr > 0.8


def test_overlap_detector():
    rng = np.random.RandomState(1)
    pc1 = rng.rand(500, 3)
    ok, i1, i2 = overlap_check(pc1, pc1 + 1e-4, 0.3, margin=0.01)
    assert ok and len(i1) == 500
    ok2, _, _ = overlap_check(pc1, pc1 + 10.0, 0.3, margin=0.01)
    assert not ok2


def test_normal_estimation_plane():
    rng = np.random.RandomState(2)
    pc = np.stack([rng.rand(200), rng.rand(200), np.zeros(200)], 1)
    normals = fpfh.estimate_normals(pc, knn=10)
    assert np.abs(normals[:, 2]).min() > 0.95
