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
