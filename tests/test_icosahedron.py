"""Geometry statics gates (SURVEY.md §7 stage 1): orthogonality, group
closure, adjacency consistency, anchor subsets, kernel point structure."""

import numpy as np

from epn_pointcloud_tpu.ops import icosahedron as ico
from epn_pointcloud_tpu.ops import kernel_points as kp


def test_group_orthogonality_and_det():
    Rs = ico.get_anchors_full().astype(np.float64)
    assert Rs.shape == (60, 3, 3)
    eye = np.einsum('aij,akj->aik', Rs, Rs)
    assert np.abs(eye - np.eye(3)).max() < 1e-5
    assert np.abs(np.linalg.det(Rs) - 1).max() < 1e-5


def test_group_closure():
    Rs = ico.get_anchors_full().astype(np.float64)
    prod = np.einsum('aij,bjk->abik', Rs, Rs).reshape(-1, 9)
    d = np.abs(prod[:, None, :] - Rs.reshape(60, 9)[None]).sum(-1)
    assert d.min(axis=1).max() < 1e-4


def test_group_distinct_and_identity():
    Rs = ico.get_anchors_full().astype(np.float64)
    d = np.abs(Rs.reshape(60, 1, 9) - Rs.reshape(1, 60, 9)).sum(-1)
    d += np.eye(60) * 100
    assert d.min() > 0.1  # all distinct
    iid = ico.get_identity_index()
    assert np.abs(Rs[iid] - np.eye(3)).max() < 1e-6


def test_trace_idx_right_multiplication():
    """trace_idx[a, k] must equal index(R_a @ Q_k) for a fixed stencil Q —
    the property that makes intra conv equivariant."""
    Rs = ico.get_anchors_full().astype(np.float64)
    ti = ico.get_intra_idx()
    assert ti.shape == (60, 12)
    iid = ico.get_identity_index()
    Q = Rs[ti[iid]]  # stencil = neighborhood of the identity anchor
    for a in range(60):
        expect = np.einsum('ij,kjl->kil', Rs[a], Q)
        got = Rs[ti[a]]
        assert np.abs(expect - got).max() < 1e-4


def test_trace_idx_rows_are_permutation_consistent():
    ti = ico.get_intra_idx()
    # every row has 12 distinct anchors including the anchor itself
    for a in range(60):
        assert len(set(ti[a].tolist())) == 12
        assert a in ti[a]
    # every column is a permutation of 0..59 (right mult by fixed element)
    for k in range(12):
        assert sorted(ti[:, k].tolist()) == list(range(60))


def test_anchor_subsets():
    for k in (1, 20, 40, 60):
        a = ico.get_anchors(k)
        assert a.shape == (k, 3, 3)
    a1 = ico.get_anchors(1)[0]
    assert np.abs(a1 - np.eye(3)).max() < 1e-6


def test_face_adjacency():
    verts, faces = ico.icosahedron_mesh()
    adj = ico.face_adjacency(faces)
    assert adj.shape == (20, 3)
    # adjacency is symmetric
    for f in range(20):
        for g in adj[f]:
            assert f in adj[g]


def test_kernel_points_structure():
    for ks, n in kp.KERNEL_SIZE_TO_NPOINTS.items():
        pts = kp.get_spherical_kernel_points(1.0, ks)
        assert pts.shape == (n, 3)
        r = np.linalg.norm(pts, axis=1)
        assert abs(r.max() - 1.0) < 1e-5
        # first point is the center
        assert r[0] < 1e-6
    # radius scaling
    pts = kp.get_spherical_kernel_points(0.35, 1)
    assert abs(np.linalg.norm(pts, axis=1).max() - 0.35) < 1e-5


def test_kernel_points_66_matches_reference_generator():
    """66-point set is the reference's own procedural grid: 1 + 16 + 49."""
    pts = kp.get_spherical_kernel_points(1.0, 3)
    r = np.round(np.linalg.norm(pts, axis=1), 3)
    counts = {v: int((r == v).sum()) for v in np.unique(r)}
    assert counts == {0.0: 1, 0.5: 16, 1.0: 49}


def test_sphere_points():
    for n in (12, 42, 92, 162):
        p = ico.sphere_points(n)
        assert p.shape == (n, 3)
        assert np.abs(np.linalg.norm(p, axis=1) - 1).max() < 1e-5


def test_ring_and_angular_kernels():
    ang = kp.angular_kernel_points(np.pi, 3)
    assert ang.shape == (3,) and (ang > 0).all() and (ang < np.pi / 2).all()
    rings = kp.ring_kernels(1.0, np.pi, 2)
    assert rings.shape[1] == 2
    intra = kp.intra_angular_kernels(np.pi, 4)
    assert intra.shape == (4,) and intra[0] == 0
