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


def test_grouped_conv_anchor_tp_shard_map():
    """The grouped 1x1 conv under a dp x tp shard_map (feats fiber sharded
    over 'anchor', one shared [c, d] weight replicated) equals the
    single-device kernel, forward and gradients."""
    import jax
    from jax.sharding import PartitionSpec as P
    from epn_pointcloud_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8-device backend')
    m = pmesh.make_mesh(n_data=2, n_anchor=4)
    na, c, d = 8, 64, 64                 # na_local = 2, pick_g(64,64,2) = 2
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 16, na * c).astype(np.float32))
    w = jnp.asarray(rng.randn(c, d).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(d).astype(np.float32))

    na_l = na // pmesh.axis_size(m, 'anchor')
    fn = pmesh.named_shard_map(
        lambda xx, ww, bb: grouped_conv1x1(xx, ww, bb, na_l, True),
        m, in_specs=[P('data', None, 'anchor'), P(), P()],
        out_specs=P('data', None, 'anchor'))

    ref = lambda xx, ww, bb: grouped_conv1x1(xx, ww, bb, na, True)
    o1 = jax.jit(fn)(x, w, bias)
    o2 = jax.jit(ref)(x, w, bias)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda xx, ww, bb: (f(xx, ww, bb) ** 2).sum()

    g1 = jax.jit(jax.grad(loss(fn), argnums=(0, 1, 2)))(x, w, bias)
    g2 = jax.jit(jax.grad(loss(ref), argnums=(0, 1, 2)))(x, w, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_moments_anchor_tp_shard_map():
    """The Pallas moments kernel under the dp x tp shard_map (per-lane sums
    are anchor-local in the packed layout) equals plain jnp reductions."""
    import jax
    from jax.sharding import PartitionSpec as P
    from epn_pointcloud_tpu.ops.pallas import moments as plm
    from epn_pointcloud_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8-device backend')
    m = pmesh.make_mesh(n_data=2, n_anchor=4)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 32, 4 * 128).astype(np.float32))
    fn = pmesh.named_shard_map(
        lambda xx: plm.moments_sums(xx, True), m,
        in_specs=[P('data', None, 'anchor')],
        out_specs=(P('data', 'anchor'),) * 2)
    s, sq = jax.jit(fn)(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(x.sum(1)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sq),
                               np.asarray((x ** 2).sum(1)),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('c,d,bs,bm', [(64, 64, 1, 2), (64, 128, 1, 1)])
def test_grouped_conv_skip_epilogue_vs_oracle(c, d, bs, bm):
    """Fused separable-block tail: conv + skip scale/shift + act + main
    scale/shift + act + residual add, vs the composed oracle
    (contract: grouped_conv1x1_skip_epilogue; ref base_so3conv.py:197-212)."""
    from epn_pointcloud_tpu.ops.pallas.grouped_conv import (
        grouped_conv1x1_skip_epilogue)
    na = 12
    rng = np.random.RandomState(3)
    b, p = 2, 16
    x = jnp.asarray(rng.randn(b, p, na * c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, p, na * d).astype(np.float32))
    w = jnp.asarray(rng.randn(c, d).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(d).astype(np.float32))

    def mk_ss(nb):
        ss = np.zeros((nb, 8, na * d), np.float32)
        ss[:, 0] = rng.rand(nb, na * d) + 0.5
        ss[:, 1] = rng.randn(nb, na * d)
        return jnp.asarray(ss)

    ssk, ssm = mk_ss(bs), mk_ss(bm)

    out = grouped_conv1x1_skip_epilogue(x, w, bias, ssk, y, ssm, na,
                                        act='leaky_relu', interpret=True)

    def leaky(u):
        return jnp.where(u > 0, u, 0.01 * u)

    conv = (jnp.einsum('bpac,cd->bpad', x.reshape(b, p, na, c), w)
            + bias).reshape(b, p, na * d)
    sk = leaky(conv * ssk[:, 0:1, :] + ssk[:, 1:2, :])
    ym = leaky(y * ssm[:, 0:1, :] + ssm[:, 1:2, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ym + sk),
                               rtol=1e-5, atol=1e-5)


def test_fused_tail_block_wiring_cpu(monkeypatch):
    """End-to-end parity of the SeparableSO3ConvBlock fused-tail path
    (scale/shift packing, bias fold, residual) against the composed path on
    identical variables — on CPU via EPN_FUSE_TAIL_FORCE=1 + interpret mode
    (the gate is otherwise TPU-only, so this block-level wiring was only
    exercised on chip; round-3 advisor finding)."""
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt

    opt = default_opt(**{'model.model': 'cls_so3net_pn',
                         'model.input_num': 1024,
                         'model.kanchor': 60,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 1024, 3).astype(np.float32) * 0.3)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(
        jax.random.PRNGKey(0), x)

    monkeypatch.delenv('EPN_FUSE_TAIL_FORCE', raising=False)
    ref_logits = jax.jit(
        lambda xx: model.apply(variables, xx, train=False)[0])(x)

    monkeypatch.setenv('EPN_FUSE_TAIL_FORCE', '1')
    fused_logits = jax.jit(
        lambda xx: model.apply(variables, xx, train=False)[0])(x)

    np.testing.assert_allclose(np.asarray(fused_logits),
                               np.asarray(ref_logits), rtol=1e-4, atol=1e-4)
