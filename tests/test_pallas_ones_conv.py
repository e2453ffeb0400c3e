"""Pallas occupancy-ones block-0 kernel vs the plain-XLA oracle (interpret
mode on CPU), plus end-to-end equality of the fused ones-input layer path.

Kernel contract: ops/pallas/ones_conv.py (reference math:
vgtk/vgtk/so3conv/functional.py:25-44 occupancy features +
functional.py:180-218 anchor weights; with f == 1 the neighbor contraction
is the plain anchor-weight sum).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epn_pointcloud_tpu.ops import so3conv, sampling, icosahedron as ico
from epn_pointcloud_tpu.ops.pallas import ones_conv as oc


def _oracle_weight_sum(sup, idx, new_xyz, rk, k2, sigma):
    """f32 oracle: gather support rows, |gx - R_a kappa_k|^2, relu, n-sum."""
    b, p2, nt = idx.shape
    g = jnp.take_along_axis(sup, idx.reshape(b, -1, 1), axis=1)
    gx = g.reshape(b, p2, nt, 3) - new_xyz[:, :, None, :]
    gx2 = jnp.sum(gx * gx, -1)
    cross = jnp.einsum('bpnc,akc->bpnak', gx, rk)
    d2 = gx2[..., None, None] + k2[None, None, None, None, :] - 2.0 * cross
    w = jax.nn.relu(1.0 - d2 / sigma)
    return w.sum(axis=2)                                   # [b, p2, na, k]


@pytest.mark.parametrize('B,P2,NT,NA,K,Q', [
    (2, 32, 16, 20, 24, 33),
    (1, 64, 32, 12, 24, 65),
])
def test_ones_kernel_vs_oracle(B, P2, NT, NA, K, Q):
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(B, Q - 1, 3).astype(np.float32) * 0.3)
    sup = sampling.add_shadow_point(xyz)                   # [B, Q, 3]
    new_xyz = jnp.asarray(rng.randn(B, P2, 3).astype(np.float32) * 0.3)
    # real neighbors + some shadow-index pad slots
    idx = rng.randint(0, Q - 1, size=(B, P2, NT)).astype(np.int32)
    idx[:, :, -3:] = Q - 1
    idx = jnp.asarray(idx)
    anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
    ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
    rk = jnp.einsum('aij,kj->aki', anch, ker)
    k2 = jnp.sum(ker ** 2, -1)
    sigma = 0.1

    kt = oc.pick_kt(NA, K)
    assert kt >= K and (NA * kt) % 128 == 0
    assert oc.supported(P2, Q, NT, NA, kt)
    lanes = NA * kt
    tab16 = oc.make_tab16(sup)
    xp8 = oc.make_xp8(new_xyz)
    rk16 = oc.make_rk16_ones(rk, k2, kt, lanes)
    k8 = oc.make_k8_ones(rk, kt, lanes)
    F = oc.ones_weight_sum(idx.reshape(B, 1, P2 * NT), tab16, xp8, rk16,
                           k8, sigma, NT, jnp.float32, True)
    F = F.reshape(B, P2, NA, kt)
    ref = _oracle_weight_sum(sup, idx, new_xyz, rk, k2, sigma)

    # pad kernel slots are exactly zero (BIG |kappa|^2 sentinel)
    assert np.all(np.asarray(F[..., K:]) == 0.0)
    # hi/lo bf16 split: d2 to ~2^-17 relative; /sigma and the n-sum scale it
    np.testing.assert_allclose(np.asarray(F[..., :K]), np.asarray(ref),
                               rtol=1e-2, atol=6e-3)


def test_pick_kt_model_shapes():
    assert oc.pick_kt(60, 24) == 32     # flagship: bitcast view, 0 pad lanes
    assert oc.pick_kt(20, 24) == 32
    assert oc.pick_kt(40, 24) == 32
    assert oc.pick_kt(1, 24) == 0       # na=1 kpconv: padding too costly


def test_separable_block_ones_skip_branch_ab():
    """SeparableSO3ConvBlock(ones_input=True) must equal ones_input=False on
    an all-ones feature input: the strided-skip fast path rebuilds the
    constant instead of gathering it (nn/blocks.py ones-skip branch), which
    is only valid while the occupancy-ones invariant holds — this A/B pins
    the value, not just the shape (advisor round-1 finding)."""
    from epn_pointcloud_tpu.nn.blocks import SeparableSO3ConvBlock

    rng = np.random.RandomState(3)
    b, p, na = 1, 64, 60
    xyz = jnp.asarray(rng.randn(b, p, 3).astype(np.float32) * 0.3)
    x = so3conv.preprocess_input(jnp.asarray(xyz), na, False)
    args = dict(type='separable_block', dim_in=1, dim_out=16, kernel_size=1,
                stride=2, radius=0.4, sigma=0.08, n_neighbor=8, multiplier=2,
                kanchor=na, lazy_sample=False, norm=None,
                activation='relu', pooling='none', dropout_rate=0.0)
    blk = SeparableSO3ConvBlock(args)
    params = blk.init(jax.random.PRNGKey(0), x, train=False,
                      ones_input=False)

    def run(flag):
        _, _, _, out = blk.apply(params, x, train=False, ones_input=flag)
        return np.asarray(out.feats)

    np.testing.assert_array_equal(run(True), run(False))


def test_fused_ones_layer_matches_xla():
    """inter_so3conv_fused(ones_input=True) with the Pallas kernel forced
    (bf16 compute mode) matches the exact f32 XLA ones path, forward and
    dW; zero gradient flows to the (constant-ones) features."""
    rng = np.random.RandomState(1)
    b, p, a, n, K, cout = 2, 64, 20, 16, 24, 32
    xyz = jnp.asarray(rng.randn(b, p, 3).astype(np.float32) * 0.3)
    feats = jnp.ones((b, p, a, 1), jnp.float32)
    anchors = jnp.asarray(ico.get_anchors(a).astype(np.float32))
    kernels = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.2)
    W = jnp.asarray(rng.randn(K, 1, cout).astype(np.float32) * 0.1)

    def run(use_pl, dtype, wv):
        so3conv.set_compute_dtype(dtype)
        try:
            _, _, out, _ = so3conv.inter_so3conv_fused(
                xyz, feats, 2, n, anchors, kernels, 0.4, 0.08, wv,
                lazy_sample=True, anchor_chunk=10, remat=False,
                use_pallas=use_pl, ones_input=True)
            return out
        finally:
            so3conv.set_compute_dtype('fp32')

    ref = run(False, 'fp32', W)
    out = run(True, 'bf16', W)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    g_ref = jax.grad(lambda wv: jnp.sum(jnp.sin(run(False, 'fp32', wv))))(W)
    g_pl = jax.grad(lambda wv: jnp.sum(jnp.sin(run(True, 'bf16', wv))))(W)
    rel = (np.linalg.norm(np.asarray(g_pl) - np.asarray(g_ref))
           / np.linalg.norm(np.asarray(g_ref)))
    assert rel < 2e-2, rel
    def loss_feats(fe):
        so3conv.set_compute_dtype('bf16')
        try:
            _, _, out, _ = so3conv.inter_so3conv_fused(
                xyz, fe, 2, n, anchors, kernels, 0.4, 0.08, W,
                lazy_sample=True, anchor_chunk=10, remat=False,
                use_pallas=True, ones_input=True)
            return jnp.sum(jnp.sin(out))
        finally:
            so3conv.set_compute_dtype('fp32')

    g_f = jax.grad(loss_feats)(feats)
    assert np.all(np.asarray(g_f) == 0.0)
