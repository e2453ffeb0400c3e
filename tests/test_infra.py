"""Infrastructure tests: config parser, LR schedule, summary EMA, checkpoint
round-trip, native host ops, transforms, LRF utils, plotting."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epn_pointcloud_tpu.app import config as config_lib
from epn_pointcloud_tpu.app.logger import Summary, Timer
from epn_pointcloud_tpu.parallel import make_lr_schedule
from epn_pointcloud_tpu import native
from epn_pointcloud_tpu.ops import transform as tf
from epn_pointcloud_tpu.eval import lrf
from epn_pointcloud_tpu.ops import icosahedron as ico


def test_config_parser_groups_and_defaults():
    opt = config_lib.parse_args(['experiment', '-d', '/tmp/x',
                                 '--kanchor', '20', '-b', '4',
                                 '--init-lr', '0.01'])
    # flattened groups on the top namespace (ref: parse_config.py:20-28)
    assert opt.dataset_path == '/tmp/x'
    assert opt.batch_size == 4
    assert opt.seed == 2913                      # ref default
    # nested groups
    assert opt.model.kanchor == 20
    assert opt.model.input_num == 1024
    assert opt.train_lr.init_lr == 0.01
    assert opt.train_lr.decay_step == 10000
    assert opt.train_loss.temperature == 3
    assert opt.mode == opt.run_mode == 'train'
    d = config_lib.dump_args(opt)
    assert d['model']['kanchor'] == 20


def test_lr_schedule_matches_reference_semantics():
    """lr = init * rate^(counter // decay_step) (ref: vgtk/utils.py:49-68)."""
    sched = make_lr_schedule(1e-3, 'exp_decay', decay_rate=0.5, decay_step=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(9)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(5e-4)
    assert float(sched(25)) == pytest.approx(2.5e-4)
    const = make_lr_schedule(1e-3, 'constant')
    assert float(const(12345)) == pytest.approx(1e-3)


def test_summary_ema():
    s = Summary()
    s.register(['Loss'])
    s.update({'Loss': 10.0})
    assert s.get_item('Loss') == 10.0            # first value not averaged
    s.update({'Loss': 0.0})
    assert s.get_item('Loss') == pytest.approx(9.0)  # 0.9 momentum
    assert 'Loss: 9.0000' in s.get()


def test_checkpoint_roundtrip(tmp_path):
    from flax import serialization
    from epn_pointcloud_tpu.nn.layers import Dense1x1
    m = Dense1x1(4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    payload = serialization.to_bytes(v)
    v2 = serialization.from_bytes(v, payload)
    np.testing.assert_allclose(np.asarray(v['params']['kernel']),
                               np.asarray(v2['params']['kernel']))


def test_native_voxel_downsample_matches_numpy():
    from epn_pointcloud_tpu.data.pc import voxel_downsample_np
    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3).astype(np.float32)
    a = native.voxel_downsample(pts, 0.2)
    b = voxel_downsample_np(pts, 0.2)
    # same voxel set (order may differ): compare sorted centroids
    np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0),
                               atol=1e-5)


def test_native_radius_search_matches_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.RandomState(1)
    sup = rng.rand(300, 3).astype(np.float32)
    qry = sup[::20]
    idx, counts = native.radius_search(sup, qry, 0.2, 64)
    tree = cKDTree(sup)
    ref = tree.query_ball_point(qry, 0.2)
    for i, lst in enumerate(ref):
        got = set(idx[i, :counts[i]].tolist())
        assert got == set(lst)


def test_native_fps_matches_device_semantics():
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops import sampling
    rng = np.random.RandomState(2)
    pts = rng.randn(64, 3).astype(np.float32)
    a = native.furthest_point_sampling(pts, 16)
    b = np.asarray(sampling.furthest_point_sampling(
        jnp.asarray(pts[None]), 16))[0]
    np.testing.assert_array_equal(a, b)


def test_transforms():
    rng = np.random.RandomState(3)
    pts = rng.rand(10, 3).astype(np.float32)
    from epn_pointcloud_tpu.ops.rotation import rand_rotation_matrix
    R = rand_rotation_matrix(rng=rng).astype(np.float32)
    t = rng.rand(3).astype(np.float32)
    T = tf.Rt_to_hom_np(R, t)
    out = tf.transform_np(tf.to_hom_np(pts), T)[:, :3]
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)
    out2 = np.asarray(tf.rotate(jnp.asarray(pts), jnp.asarray(R)))
    np.testing.assert_allclose(out2, pts @ R.T, atol=1e-5)


def test_lrf_transform_identity():
    """transform_anchor_feat with T=I must be (near) identity."""
    rng = np.random.RandomState(4)
    anchors = ico.sphere_points(12)
    feats = rng.rand(2, 12, 5).astype(np.float32)
    out = lrf.transform_anchor_feat(feats, anchors, np.eye(3), sigma=1e-3)
    np.testing.assert_allclose(out, feats, atol=1e-2)


def test_lrf_pca_transform_shapes():
    rng = np.random.RandomState(5)
    anchors = ico.sphere_points(12)
    feats = rng.rand(3, 12, 5).astype(np.float32)
    out = lrf.pca_transform(feats, anchors)
    assert out.shape == feats.shape
    assert np.isfinite(out).all()


def test_plot_utils(tmp_path):
    from epn_pointcloud_tpu.utils import plot
    rng = np.random.RandomState(6)
    xyz = rng.rand(1, 50, 3).astype(np.float32)
    freqs = rng.rand(1, 4, 50)
    p = str(tmp_path / 'efov.ply')
    plot.visualize_point_efov(xyz, freqs, p)
    assert os.path.exists(p)
    feats = np.concatenate([rng.randn(20, 8), rng.randn(20, 8) + 5])
    labels = np.array([0] * 20 + [1] * 20)
    p2 = str(tmp_path / 'tsne.png')
    plot.tsne_plot(feats, labels, p2)
    assert os.path.exists(p2)


def test_timer():
    t = Timer()
    t.set_point('x')
    assert t.get_point('x') >= 0
    assert t.reset_point('x') >= 0


def test_summary_update_async_matches_eager():
    """Deferred (device-scalar) updates flush in submission order and give
    the same EMA as eager updates (up to the f32 cast of array scalars),
    including interleaved eager 'Time' channels (the train_iter pattern)."""
    from epn_pointcloud_tpu.app.logger import Summary
    import numpy as np
    a, b = Summary(), Summary()
    for s in (a, b):
        s.register(['Loss', 'Time'])
    rng = np.random.RandomState(0)
    for i in range(20):
        v, t = float(rng.rand()), float(rng.rand())
        a.update({'Loss': v})
        a.update({'Time': t})
        b.update_async({'Loss': np.float32(v)})   # array scalar, like jax
        b.update({'Time': t})
        if i % 7 == 0:
            b.get()                                   # interleaved flushes
    # equal up to the f32 cast of the array scalars
    assert abs(a.get_item('Loss') - b.get_item('Loss')) < 1e-6
    assert a.get_item('Time') == b.get_item('Time')
    assert b.counters == a.counters
