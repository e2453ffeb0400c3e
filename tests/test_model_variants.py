"""Model-variant coverage: kanchor in {1, 40}, kpconv mode, knownatt debug,
attention2 pooling, normals input features."""

import numpy as np
import jax
import jax.numpy as jnp

from epn_pointcloud_tpu import models
from epn_pointcloud_tpu.app.config import default_opt
from epn_pointcloud_tpu.ops import so3conv

RNG = np.random.RandomState(0)


def _opt(**kw):
    base = {'model.model': 'cls_so3net_pn', 'model.input_num': 64,
            'model.kanchor': 40, 'model.flag': 'max'}
    base.update(kw)
    return default_opt(**base)


def test_cls_kanchor40():
    opt = _opt()
    model = models.build_model_from(opt)
    x = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
    v = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    logits, _ = model.apply(v, x, train=False)
    assert logits.shape == (2, 40)


def test_cls_kpconv_single_anchor():
    """kpconv flag forces na=1 (ref: cls_so3net_pn.py:64)."""
    opt = _opt(**{'model.kpconv': True})
    model = models.build_model_from(opt)
    assert model.params['na'] == 1
    x = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
    v = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    logits, _ = model.apply(v, x, train=False)
    assert logits.shape == (2, 40)


def test_cls_attention2_pooling():
    opt = _opt(**{'model.flag': 'attention2'})
    model = models.build_model_from(opt)
    x = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
    v = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    logits, feat = model.apply(v, x, train=False)
    assert logits.shape == (2, 40)


def test_normals_occupancy_features():
    """6-dim input appends per-anchor rotated normals
    (ref: so3conv/functional.py:25-44)."""
    pc = jnp.asarray(RNG.randn(2, 16, 6).astype(np.float32))
    feats = so3conv.get_occupancy_features(pc, 20)
    assert feats.shape == (2, 16, 20, 4)
    np.testing.assert_allclose(np.asarray(feats[..., 0]), 1.0)
    # single-anchor branch
    feats1 = so3conv.get_occupancy_features(pc, 1)
    assert feats1.shape == (2, 16, 1, 4)


def test_preprocess_add_center():
    pc = jnp.asarray(RNG.randn(2, 16, 3).astype(np.float32))
    sp = so3conv.preprocess_input(pc, 20, add_center=True)
    # first point replaced by the centroid (ref: base_so3conv.py:16-23)
    np.testing.assert_allclose(np.asarray(sp.xyz[:, 0]),
                               np.asarray(pc.mean(axis=1)), atol=1e-6)
    assert sp.feats.shape == (2, 16, 20, 1)


def test_builder_formula_regression():
    """Pin the derived hyperparameters at the reference defaults
    (ref: cls_so3net_pn.py:79-127 with input_num=1024)."""
    opt = default_opt(**{'model.model': 'cls_so3net_pn',
                         'model.input_num': 1024, 'model.kanchor': 60,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    p = model.params
    args0 = p['backbone'][0][0]['args']   # block0 layer0
    assert args0['stride'] == 2
    assert args0['n_neighbor'] == 32      # 2 * int(0.4*1024*0.04)
    assert abs(args0['radius'] - 0.2) < 1e-9
    assert abs(args0['sigma'] - 0.5 * 0.2 ** 2) < 1e-9
    args01 = p['backbone'][0][1]['args']  # block0 layer1
    assert args01['stride'] == 1
    assert args01['n_neighbor'] == 16
    assert abs(args01['radius'] - 0.2 * 2 ** 0.5) < 1e-9
    args10 = p['backbone'][1][0]['args']  # block1 layer0
    assert args10['n_neighbor'] == 32     # 2 * int(0.4*512*0.08)
    assert abs(args10['sigma'] - 2 * 0.5 * 0.2 ** 2 * 2) < 1e-9  # doubled twice
    assert p['outblock']['k'] == 40
    assert p['backbone'][0][0]['type'] == 'separable_block'

    # inv model: sigma scales by stride, neighbor x int(input/1024)
    opt2 = default_opt(**{'model.model': 'inv_so3net_pn',
                          'model.input_num': 2048, 'model.kanchor': 60,
                          'model.search_radius': 0.4})
    m2 = models.build_model_from(opt2)
    a0 = m2.params['backbone'][0][0]['args']
    assert a0['stride'] == 4              # int(2 * 2048/1024)
    assert m2.params['outblock']['mlp'] == [128, 64]
