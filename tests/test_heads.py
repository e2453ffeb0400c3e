"""Output heads, legacy ZPConv modules, blurring/pooling variants,
KernelPropagation — shape/semantic tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epn_pointcloud_tpu.nn import heads as H
from epn_pointcloud_tpu.nn import layers as L
from epn_pointcloud_tpu.nn import zpconv as Z
from epn_pointcloud_tpu.ops import so3conv
from epn_pointcloud_tpu.ops.so3conv import SphericalPointCloud

RNG = np.random.RandomState(0)
B, P, A, C = 2, 16, 60, 8


def _spc(a=A, c=C, p=P):
    xyz = jnp.asarray(RNG.uniform(-1, 1, (B, p, 3)).astype(np.float32))
    feats = jnp.asarray(RNG.randn(B, p, a, c).astype(np.float32))
    return SphericalPointCloud(xyz, feats, None)


def test_cls_out_block_pointnet_poolings():
    x = _spc()
    for pooling, feat_check in [('max', None), ('mean', None),
                                ('attention', (B, A))]:
        head = H.ClsOutBlockPointnet({'dim_in': C, 'mlp': [16], 'fc': [16],
                                      'k': 40, 'pooling': pooling,
                                      'temperature': 3, 'kanchor': A})
        v = head.init(jax.random.PRNGKey(0), x, train=False)
        logits, feat = head.apply(v, x, train=False)
        assert logits.shape == (B, 40)
        if feat_check:
            assert feat.shape == feat_check
            # attention weights: softmax over anchors in the pooling


def test_cls_out_block_r_with_intra_and_label_debug():
    x = _spc()
    params = {'dim_in': C, 'mlp': [16], 'fc': [16], 'k': 40,
              'pooling': 'attention', 'temperature': 3,
              'intra': [{'args': {'dim_in': 16, 'dim_out': 16}}]}
    head = H.ClsOutBlockR(params)
    v = head.init(jax.random.PRNGKey(0), x.feats, train=False)
    logits, feat = head.apply(v, x.feats, train=False)
    assert logits.shape == (B, 40)

    # ground-truth-label substitution branch (ref: base_so3conv.py:316-336)
    params2 = {'dim_in': C, 'mlp': [16], 'fc': [16], 'k': 40,
               'pooling': 'label', 'temperature': 3}
    head2 = H.ClsOutBlockR(params2)
    label = jnp.asarray(RNG.randint(0, A, (B,)))
    v2 = head2.init(jax.random.PRNGKey(0), x.feats, label, train=False)
    logits2, _ = head2.apply(v2, x.feats, label, train=False)
    assert logits2.shape == (B, 40)


def test_inv_out_blocks():
    x = _spc()
    for cls, args in [
        (H.InvOutBlockR, {'dim_in': C, 'mlp': [16, 8], 'pooling': 'attention',
                          'temperature': 3}),
        (H.InvOutBlockPointnet, {'dim_in': C, 'mlp': [16, 8],
                                 'pooling': 'max', 'kanchor': A}),
        (H.InvOutBlockMVD, {'dim_in': C, 'mlp': [16, 8], 'temperature': 3,
                            'kanchor': A}),
    ]:
        head = cls(args)
        inp = x.feats if cls is H.InvOutBlockR else x
        v = head.init(jax.random.PRNGKey(0), inp, train=False)
        desc, aux = head.apply(v, inp, train=False)
        assert desc.shape == (B, 8)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=1),
                                   1.0, atol=1e-4)


def test_so3_out_block_r():
    x = _spc()
    head = H.SO3OutBlockR({'dim_in': C, 'mlp': [16], 'temperature': 3,
                           'representation': 'quat'})
    v = head.init(jax.random.PRNGKey(0), x.feats, train=False)
    conf, y = head.apply(v, x.feats, train=False)
    assert conf.shape == (B, A) and y.shape == (B, A, 4)
    np.testing.assert_allclose(np.asarray(conf.sum(1)), 1.0, atol=1e-5)


def test_rel_so3_out_block_r_ortho6d():
    x1, x2 = _spc(), _spc()
    head = H.RelSO3OutBlockR({'dim_in': C, 'mlp': [16], 'temperature': 3,
                              'representation': 'ortho6d', 'kanchor': A})
    v = head.init(jax.random.PRNGKey(0), x1.feats, x2.feats, x1.xyz, x2.xyz,
                  train=False)
    conf, y = head.apply(v, x1.feats, x2.feats, x1.xyz, x2.xyz, train=False)
    assert conf.shape == (B, A, A) and y.shape == (B, A, A, 6)
    np.testing.assert_allclose(np.asarray(conf.sum(1)), 1.0, atol=1e-4)


def test_kernel_propagation():
    frag = jnp.asarray(RNG.uniform(-1, 1, (64, 3)).astype(np.float32))
    clouds = jnp.asarray(RNG.uniform(-1, 1, (2, 8, 3)).astype(np.float32))
    kp = L.KernelPropagation(dim_in=1, dim_out=4, n_center=8, kernel_size=1,
                             radius=0.8, sigma=0.3, kanchor=20)
    v = kp.init(jax.random.PRNGKey(0), frag, clouds)
    out = kp.apply(v, frag, clouds)
    assert out.feats.shape == (2, 8, 20, 4)
    assert np.isfinite(np.asarray(out.feats)).all()


def test_zpconv_modules():
    x = _spc(a=12, c=C)
    intra = Z.IntraZPConv(dim_in=C, dim_out=4, kernel_size=3,
                          aperture=np.pi / 2, sigma=0.1, anchor_nn=4,
                          anchor_in=12)
    v = intra.init(jax.random.PRNGKey(0), x)
    out = intra.apply(v, x)
    assert out.feats.shape == (B, P, 12, 4)

    inter = Z.InterZPConv(dim_in=C, dim_out=4, kernel_size=2, stride=2,
                          radius=0.5, aperture=np.pi / 2, sigma=0.1,
                          anchors_dim=12, n_neighbor=8, anchor_nn=4)
    v = inter.init(jax.random.PRNGKey(0), x)
    _, _, out = inter.apply(v, x)
    assert out.feats.shape == (B, P // 2, 12, 4)

    prop = Z.AnchorProp(anchor_in=12, anchor_out=42, sigma=0.1)
    out2 = prop.apply({}, x)
    assert out2.feats.shape == (B, P, 42, C)


def test_inter_blurring_and_pooling():
    x = _spc(a=4, c=C)
    blurred, xyz = so3conv.inter_so3conv_blurring(
        x.xyz, x.feats, n_neighbor=4, radius=0.6, stride=1)
    assert blurred.shape == x.feats.shape
    pooled, xyz2 = so3conv.inter_so3conv_blurring(
        x.xyz, x.feats, n_neighbor=4, radius=0.6, stride=2,
        lazy_sample=True)
    assert pooled.shape == (B, P // 2, 4, C)
    assert xyz2.shape == (B, P // 2, 3)


def test_inter_conv_pooling_mode():
    """xyz_pooling='stride' path (ref: so3conv/functional.py:133-147)."""
    x = _spc(a=20, c=C)
    conv = L.InterSO3Conv(dim_in=C, dim_out=4, kernel_size=1, stride=2,
                          radius=0.6, sigma=0.18, n_neighbor=4,
                          lazy_sample=True, pooling='stride', kanchor=20)
    v = conv.init(jax.random.PRNGKey(0), x)
    _, _, _, out = conv.apply(v, x)
    assert out.feats.shape == (B, P // 2, 20, 4)


def test_initial_anchor_query_math():
    """Weight/count semantics (ref: grouping_cuda_kernel.cu:116-167)."""
    frag = jnp.asarray(np.array([[0.1, 0, 0], [5, 5, 5]], np.float32))
    centers = jnp.zeros((1, 1, 3), jnp.float32)
    kernels = jnp.zeros((2, 3, 3), jnp.float32)  # ks=2, na=3, at the center
    w, cnt = so3conv.initial_anchor_query(frag, centers, kernels,
                                          radius=1.0, sigma=1.0)
    assert w.shape == (1, 1, 3, 2) and cnt.shape == (1, 1, 3, 2)
    # only the first fragment point is within radius -> count 1
    np.testing.assert_allclose(np.asarray(cnt), 1.0)
    # weight = relu(1 - 0.01/1.0) = 0.99 for every (anchor, kernel)
    np.testing.assert_allclose(np.asarray(w), 0.99, atol=1e-5)
