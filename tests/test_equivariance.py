"""Equivariance property tests (SURVEY.md §4: the reference's commented
probes — trainer_modelnet.py:86-98, so3conv/functional.py:242-266 — promoted
to real tests).

Under input rotation by a group element g, anchor-indexed features permute by
pi(a) = index(g^T R_a); invariant heads are unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epn_pointcloud_tpu.ops import icosahedron as ico
from epn_pointcloud_tpu.ops import kernel_points as kp
from epn_pointcloud_tpu.ops import so3conv, sampling
from epn_pointcloud_tpu.nn import layers as L
from epn_pointcloud_tpu.ops.so3conv import SphericalPointCloud


def anchor_permutation(g_idx: int) -> np.ndarray:
    """pi[a] = index of g^T @ R_a in the anchor list."""
    Rs = ico.get_anchors_full().astype(np.float64)
    g = Rs[g_idx]
    target = np.einsum('ji,ajk->aik', g, Rs)   # g^T R_a
    d = np.abs(target.reshape(60, 1, 9) - Rs.reshape(1, 60, 9)).sum(-1)
    pi = np.argmin(d, axis=1)
    assert d.min(axis=1).max() < 1e-4
    return pi


@pytest.fixture(scope='module')
def setup():
    rng = np.random.RandomState(42)
    xyz = rng.uniform(-1, 1, size=(2, 48, 3)).astype(np.float32)
    anchors = jnp.asarray(ico.get_anchors(60))
    kernels = jnp.asarray(kp.get_spherical_kernel_points(0.7 * 0.4, 1))
    return xyz, anchors, kernels


def test_inter_weights_equivariant(setup):
    xyz, anchors, kernels = setup
    g_idx = 7
    pi = anchor_permutation(g_idx)
    g = ico.get_anchors_full()[g_idx]

    xyz_r = xyz @ g.T  # rotate points by g

    gx, _, _, _ = sampling.inter_grouping_ball(jnp.asarray(xyz), 1, 0.4, 8, True)
    gx_r, _, _, _ = sampling.inter_grouping_ball(jnp.asarray(xyz_r), 1, 0.4, 8, True)

    w = so3conv.inter_conv_anchor_weights(gx, anchors, kernels, 0.08)
    w_r = so3conv.inter_conv_anchor_weights(gx_r, anchors, kernels, 0.08)

    # w_r[..., a, k] == w[..., pi(a), k]
    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w)[:, :, :, pi],
                               atol=1e-5)


def test_intra_grouping_commutes_with_permutation(setup):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 5, 60, 4).astype(np.float32))
    ti = jnp.asarray(ico.get_intra_idx())
    for g_idx in (3, 29, 55):
        pi = anchor_permutation(g_idx)
        out = np.asarray(so3conv.intra_so3conv_grouping(ti, feats))
        out_perm = np.asarray(so3conv.intra_so3conv_grouping(ti, feats[:, :, pi]))
        # intra(f o pi) == intra(f) o pi
        np.testing.assert_allclose(out_perm, out[:, :, pi], atol=1e-6)


def test_inter_conv_layer_equivariance(setup):
    """Full InterSO3Conv layer: rotated input -> permuted features."""
    xyz, _, _ = setup
    g_idx = 13
    pi = anchor_permutation(g_idx)
    g = ico.get_anchors_full()[g_idx]

    conv = L.InterSO3Conv(dim_in=1, dim_out=8, kernel_size=1, stride=1,
                          radius=0.4, sigma=0.08, n_neighbor=8,
                          lazy_sample=True, kanchor=60)
    x = so3conv.preprocess_input(jnp.asarray(xyz), 60, False)
    v = conv.init(jax.random.PRNGKey(0), x)
    _, _, _, out = conv.apply(v, x)

    x_r = so3conv.preprocess_input(jnp.asarray((xyz @ g.T).astype(np.float32)),
                                   60, False)
    _, _, _, out_r = conv.apply(v, x_r)

    np.testing.assert_allclose(np.asarray(out_r.feats),
                               np.asarray(out.feats)[:, :, pi], atol=1e-4)


def test_pointnet_head_equivariance(setup):
    xyz, _, _ = setup
    g_idx = 21
    pi = anchor_permutation(g_idx)
    g = ico.get_anchors_full()[g_idx]
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 48, 60, 4).astype(np.float32)

    head = L.PointnetSO3Conv(dim_in=4, dim_out=8, kanchor=60)
    x = SphericalPointCloud(jnp.asarray(xyz), jnp.asarray(feats), None)
    v = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(v, x)                      # [b, a, c]

    x_r = SphericalPointCloud(jnp.asarray((xyz @ g.T).astype(np.float32)),
                              jnp.asarray(feats[:, :, pi]), None)
    out_r = head.apply(v, x_r)

    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out)[:, pi],
                               atol=2e-5)


def test_max_pooled_output_invariance(setup):
    """Max over anchors after equivariant stack is rotation invariant."""
    xyz, _, _ = setup
    g_idx = 44
    g = ico.get_anchors_full()[g_idx]

    conv = L.InterSO3Conv(dim_in=1, dim_out=8, kernel_size=1, stride=1,
                          radius=0.4, sigma=0.08, n_neighbor=8,
                          lazy_sample=True, kanchor=60)
    x = so3conv.preprocess_input(jnp.asarray(xyz), 60, False)
    v = conv.init(jax.random.PRNGKey(0), x)
    _, _, _, out = conv.apply(v, x)
    inv = np.asarray(out.feats.max(axis=2).mean(axis=1))

    x_r = so3conv.preprocess_input(jnp.asarray((xyz @ g.T).astype(np.float32)),
                                   60, False)
    _, _, _, out_r = conv.apply(v, x_r)
    inv_r = np.asarray(out_r.feats.max(axis=2).mean(axis=1))

    np.testing.assert_allclose(inv_r, inv, atol=1e-4)
