"""Grouped 1x1-conv Pallas kernel (packed skip path) vs einsum oracle,
forward + grads, interpret mode. Contract: ops/pallas/grouped_conv.py
(ref: the 1x1 Conv2d skip in base_so3conv.py:197-212)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epn_pointcloud_tpu.ops.pallas.grouped_conv import (grouped_conv1x1,
                                                        pick_g, supported)


@pytest.mark.parametrize('c,d', [(64, 64), (64, 128), (128, 128), (32, 64)])
def test_grouped_conv_vs_oracle(c, d):
    na = 12          # small anchor count divisible by every g here
    assert supported(c, d, na)
    rng = np.random.RandomState(0)
    b, p = 2, 16
    x = jnp.asarray(rng.randn(b, p, na * c).astype(np.float32))
    w = jnp.asarray(rng.randn(c, d).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(d).astype(np.float32))

    out = grouped_conv1x1(x, w, bias, na, True)
    ref = (jnp.einsum('bpac,cd->bpad', x.reshape(b, p, na, c), w)
           + bias).reshape(b, p, na * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_pl(x, w, bias):
        return jnp.sum(jnp.sin(grouped_conv1x1(x, w, bias, na, True)))

    def loss_ref(x, w, bias):
        y = (jnp.einsum('bpac,cd->bpad', x.reshape(b, p, na, c), w)
             + bias).reshape(b, p, na * d)
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_grouped_conv_pads_unaligned_rows():
    na, c, d = 4, 64, 64
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, na * c).astype(np.float32))
    w = jnp.asarray(rng.randn(c, d).astype(np.float32) * 0.1)
    bias = jnp.zeros((d,), jnp.float32)
    out = grouped_conv1x1(x, w, bias, na, True)
    ref = jnp.einsum('bpac,cd->bpad', x.reshape(1, 5, na, c),
                     w).reshape(1, 5, na * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pick_g():
    assert pick_g(64, 64, 60) == 2
    assert pick_g(128, 128, 60) == 1
    assert pick_g(256, 256, 60) == 1
    assert pick_g(32, 64, 60) == 4
    assert pick_g(128, 64, 60) == 2
    assert pick_g(1, 64, 60) is None
