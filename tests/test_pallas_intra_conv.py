"""Pallas fused intra-conv kernel vs the dense oracle (interpret mode).

Contract: ops/pallas/intra_conv.py — out[b,p,a,d] = sum_{k,c}
f[b,p,trace_idx[a,k],c] W[k,c,d] (ref: vgtk so3conv/functional.py:221-268
+ modules.py:48-55), forward in Pallas and the XLA custom-VJP backward.
"""

import numpy as np
import jax
import jax.numpy as jnp

from epn_pointcloud_tpu.ops import icosahedron as ico
from epn_pointcloud_tpu.ops.pallas.intra_conv import intra_conv


def test_intra_kernel_vs_oracle():
    rng = np.random.RandomState(0)
    ti = ico.get_intra_idx()
    na, nk = ti.shape
    b, p, c, d = 2, 16, 32, 48
    f = jnp.asarray(rng.randn(b, p, na, c).astype(np.float32))
    W = jnp.asarray(rng.randn(nk, c, d).astype(np.float32) * 0.1)
    w2 = jnp.transpose(W, (1, 0, 2)).reshape(c, nk * d)
    tit = tuple(map(tuple, ti.tolist()))

    out = intra_conv(f.reshape(b, p, na * c), w2, tit, 8, True)
    ref = jnp.einsum('bpakc,kcd->bpad', f[:, :, ti, :], W)
    np.testing.assert_allclose(np.asarray(out.reshape(b, p, na, d)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_pl(f, w2):
        return jnp.sum(jnp.sin(
            intra_conv(f.reshape(b, p, na * c), w2, tit, 8, True)))

    def loss_ref(f, w2):
        Wl = w2.reshape(c, nk, d).transpose(1, 0, 2)
        return jnp.sum(jnp.sin(
            jnp.einsum('bpakc,kcd->bpad', f[:, :, ti, :], Wl)))

    g1 = jax.grad(loss_pl, argnums=(0, 1))(f, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(f, w2)
    np.testing.assert_allclose(np.asarray(g1[0].reshape(b, p, na, c)),
                               np.asarray(g2[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-3)


def test_intra_kernel_pads_unaligned_point_count():
    """p=4 < the 8-sublane tile (deepest block of small configs) — the
    kernel pads rows and slices back (regression: ZeroDivisionError in the
    tile-size search)."""
    rng = np.random.RandomState(1)
    ti = ico.get_intra_idx()
    na, nk = ti.shape
    b, p, c, d = 2, 4, 16, 24
    f = jnp.asarray(rng.randn(b, p, na, c).astype(np.float32))
    W = jnp.asarray(rng.randn(nk, c, d).astype(np.float32) * 0.1)
    w2 = jnp.transpose(W, (1, 0, 2)).reshape(c, nk * d)
    tit = tuple(map(tuple, ti.tolist()))
    out = intra_conv(f.reshape(b, p, na * c), w2, tit, 64, True)
    assert out.shape == (b, p, na * d)
    ref = jnp.einsum('bpakc,kcd->bpad', f[:, :, ti, :], W)
    np.testing.assert_allclose(np.asarray(out.reshape(b, p, na, d)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_intra_prenorm_kernel_vs_oracle():
    """intra_conv_prenorm == intra_conv(act(f*scale+shift)) — forward and
    grads w.r.t. f, scale/shift, and W (interpret mode)."""
    from epn_pointcloud_tpu.ops.pallas.intra_conv import intra_conv_prenorm
    rng = np.random.RandomState(2)
    # small synthetic balanced adjacency (each input anchor appears exactly
    # nk times): the full 60x12 group unrolls 720 lane-block adds per traced
    # kernel and takes minutes in interpret mode; the real-group math is
    # covered by test_intra_kernel_vs_oracle. This test checks the prenorm
    # epilogue + custom VJP plumbing only.
    na, nk = 8, 3
    ti = np.stack([(np.arange(na) + k) % na for k in range(nk)], axis=1)
    b, p, c, d = 1, 8, 16, 24
    f = jnp.asarray(rng.randn(b, p, na * c).astype(np.float32))
    W = jnp.asarray(rng.randn(nk, c, d).astype(np.float32) * 0.1)
    w2 = jnp.transpose(W, (1, 0, 2)).reshape(c, nk * d)
    tit = tuple(map(tuple, ti.tolist()))
    scale = jnp.asarray(rng.rand(b, na * c).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(b, na * c).astype(np.float32) * 0.3)
    ss = jnp.zeros((b, 8, na * c), jnp.float32)
    ss = ss.at[:, 0].set(scale).at[:, 1].set(shift)

    for act in ('leaky_relu', 'relu'):
        def loss_pl(f, ss, w2):
            return jnp.sum(jnp.sin(
                intra_conv_prenorm(f, ss, w2, tit, act, 0.01, 8, True)))

        def loss_ref(f, ss, w2):
            z = f * ss[:, 0:1] + ss[:, 1:2]
            z = getattr(jax.nn, act)(z)
            return jnp.sum(jnp.sin(intra_conv(z, w2, tit, 8, True)))

        o1 = intra_conv_prenorm(f, ss, w2, tit, act, 0.01, 8, True)
        z = getattr(jax.nn, act)(f * scale[:, None] + shift[:, None])
        o2 = intra_conv(z, w2, tit, 8, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)

        g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(f, ss, w2)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(f, ss, w2)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-3)


def test_norm_scale_shift_mode_matches_apply():
    """InstanceNorm/BatchNorm packed scale_shift mode: x*scale+shift equals
    the applied normalization."""
    from epn_pointcloud_tpu.nn.layers import BatchNorm, InstanceNorm
    rng = np.random.RandomState(3)
    b, p, groups, c = 3, 32, 5, 8
    x = jnp.asarray(rng.randn(b, p, groups * c).astype(np.float32))

    m = InstanceNorm(groups=groups)
    y = m.apply({}, x)
    scale, shift = m.apply({}, x, scale_shift=True)
    np.testing.assert_allclose(np.asarray(x * scale[:, None] + shift[:, None]),
                               np.asarray(y), rtol=1e-5, atol=1e-5)

    m = BatchNorm(groups=groups)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial affine + running stats
    v = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size, v)
    y, _ = m.apply(v, x, train=True, mutable=['batch_stats'])
    (scale, shift), _ = m.apply(v, x, train=True, scale_shift=True,
                                mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(x * scale[:, None] + shift[:, None]),
                               np.asarray(y), rtol=1e-4, atol=1e-4)


def test_intra_prenorm_multitile_grid_and_padding():
    """The prenorm backward's VMEM-persistent dscale/dshift accumulation
    across POINT TILES and its re-zeroing across BATCHES (pl.when on
    program_id) — exercised with b=2, p//t=4, plus an unaligned p_total
    (padded rows must contribute nothing). The small-grid test above never
    runs those paths."""
    from epn_pointcloud_tpu.ops.pallas.intra_conv import (intra_conv,
                                                          intra_conv_prenorm)
    rng = np.random.RandomState(7)
    na, nk = 8, 3
    ti = np.stack([(np.arange(na) + k) % na for k in range(nk)], axis=1)
    tit = tuple(map(tuple, ti.tolist()))
    c, d = 16, 24
    for b, p in ((2, 32), (1, 27)):       # multi-batch/multi-tile; unaligned
        f = jnp.asarray(rng.randn(b, p, na * c).astype(np.float32))
        W = jnp.asarray(rng.randn(nk, c, d).astype(np.float32) * 0.1)
        w2 = jnp.transpose(W, (1, 0, 2)).reshape(c, nk * d)
        scale = jnp.asarray(rng.rand(b, na * c).astype(np.float32) + 0.5)
        shift = jnp.asarray(rng.randn(b, na * c).astype(np.float32) * 0.3)
        ss = jnp.zeros((b, 8, na * c), jnp.float32)
        ss = ss.at[:, 0].set(scale).at[:, 1].set(shift)

        def loss_pl(f, ss, w2):
            return jnp.sum(jnp.sin(intra_conv_prenorm(
                f, ss, w2, tit, 'leaky_relu', 0.01, 8, True)))

        def loss_ref(f, ss, w2):
            z = jax.nn.leaky_relu(f * ss[:, 0:1] + ss[:, 1:2], 0.01)
            return jnp.sum(jnp.sin(intra_conv(z, w2, tit, 8, True)))

        o1 = intra_conv_prenorm(f, ss, w2, tit, 'leaky_relu', 0.01, 8, True)
        z = jax.nn.leaky_relu(f * scale[:, None] + shift[:, None], 0.01)
        o2 = intra_conv(z, w2, tit, 8, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)
        g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(f, ss, w2)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(f, ss, w2)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-3)
