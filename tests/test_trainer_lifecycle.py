"""Trainer lifecycle: train iterations, checkpoint save, resume, eval —
end to end on CPU with a tiny synthetic config (SURVEY.md §3.5 semantics)."""

import glob
import os

import numpy as np
import pytest

from epn_pointcloud_tpu.app import config as config_lib
from epn_pointcloud_tpu.data import synthetic


@pytest.fixture(scope='module')
def mn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('mn_life'))
    synthetic.make_modelnet_tree(root, n_cats=2, n_train=4, n_test=2,
                                 n_points=200)
    return root


def _make_opt(mn_root, tmp_path, **kw):
    opt = config_lib.parse_args(['experiment', '-d', mn_root,
                                 '--input-num', '128', '--kanchor', '20',
                                 '-b', '4', '-i', '2', '-lf', '1',
                                 '--save-freq', '100000',
                                 '--model-dir', str(tmp_path)])
    opt.model.flag = 'attention'
    opt.model.model = 'cls_so3net_pn'
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def test_train_save_resume_eval(mn_root, tmp_path):
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet

    opt = _make_opt(mn_root, tmp_path)
    t = TrainerModelNet(opt)
    t.train()
    assert t.iter_counter == 2

    # reference-layout run dir artifacts (trainer.py:33-55)
    assert os.path.exists(os.path.join(t.root_dir, 'opt.txt'))
    assert os.path.exists(os.path.join(t.root_dir, 'log.txt'))
    assert os.path.exists(os.path.join(t.root_dir, 'params.json'))

    t._save_network('Iter2')
    ckpts = glob.glob(os.path.join(t.ckpt_dir, '*_net_Iter2.ckpt'))
    assert len(ckpts) == 1

    # resume into a fresh trainer: params must match bit-exactly
    opt2 = _make_opt(mn_root, tmp_path, resume_path=ckpts[0])
    t2 = TrainerModelNet(opt2)
    import jax
    leaves1 = jax.tree_util.tree_leaves(t.state.params)
    leaves2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    acc = t2.eval()
    assert 0.0 <= acc <= 1.0


def test_trainer_anchor_tp_mesh(mn_root, tmp_path):
    """--mesh-anchor 2 trains on a ('data','anchor') mesh (4 x 2 on the
    8-virtual-device CPU backend) and produces finite stats."""
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet

    opt = _make_opt(mn_root, tmp_path, mesh_anchor=2)
    t = TrainerModelNet(opt)
    assert t.mesh.devices.shape == (4, 2)
    t.train()
    assert np.isfinite(t.summary.get_item('Loss'))
    from epn_pointcloud_tpu.parallel import set_global_mesh
    set_global_mesh(None)


def test_distributed_helpers_single_process():
    """init_distributed is a no-op single-process; process_slice covers the
    batch; global_batch_from_local round-trips through the mesh sharding."""
    import jax
    from epn_pointcloud_tpu.parallel import (global_batch_from_local,
                                             init_distributed, make_mesh,
                                             process_slice)
    assert init_distributed() == 0
    assert process_slice(8) == slice(0, 8)
    mesh = make_mesh()
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    g = global_batch_from_local(x, mesh)
    assert g.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(g), x)


def test_multi_step_dispatch_matches_single(mn_root, tmp_path):
    """--steps-per-dispatch=2 (scan over stacked batches) must produce the
    same parameters as the per-step dispatch on the same data stream
    (dropout off; the only rng use is dropout, so streams coincide)."""
    import jax
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet

    opt1 = _make_opt(mn_root, tmp_path, num_iterations=4)
    t1 = TrainerModelNet(opt1)
    t1.train()
    assert t1.iter_counter == 4

    opt2 = _make_opt(mn_root, tmp_path, num_iterations=4,
                     steps_per_dispatch=2)
    t2 = TrainerModelNet(opt2)
    t2.train()
    assert t2.iter_counter == 4

    leaves1 = jax.tree_util.tree_leaves(t1.state.params)
    leaves2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # EMA'd channels agree too (Summary applied the [n]-vector stats)
    assert abs(t1.summary.get_item('Loss')
               - t2.summary.get_item('Loss')) < 1e-3
