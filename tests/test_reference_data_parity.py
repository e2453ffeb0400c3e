"""Data-pipeline parity against the reference dataset code.

Runs the reference's ``Dataloader_ModelNet40`` / ``Dataloader_ModelNet40Alignment``
(SPConvNets/datasets/modelnet40.py:14-160, imported through
tests/reference_harness.py) and this framework's loaders on a SHARED
synthetic .mat fixture tree, comparing outputs:

  * deterministic no_augmentation path: bit-exact (pc, label, R, R_label);
  * stored-R eval path (testR with an 'R' key in the .mat): bit-exact;
  * stochastic train path: bit-exact under seed pinning — both pipelines
    draw the same RNG primitives in the same order (np.random.choice for
    the resample, scipy Rotation.random for the SO(3) draw), so seeding
    np.random for the reference and handing ours an identically-seeded
    RandomState must reproduce identical samples;
  * Alignment dataset (pc pair, T, per-anchor R, R_label): bit-exact under
    the same pinning.

Run under the reference anchor convention so R_label indices (identity=29)
and per-anchor targets line up.
"""

import os
import sys

import numpy as np
import pytest
import scipy.io as sio

sys.path.insert(0, os.path.dirname(__file__))

import reference_harness as rh  # noqa: E402

from epn_pointcloud_tpu.data import synthetic  # noqa: E402
from epn_pointcloud_tpu.ops import icosahedron  # noqa: E402


@pytest.fixture()
def reference_mode():
    icosahedron.set_convention('reference')
    yield
    icosahedron.set_convention('native')


@pytest.fixture(scope='module')
def mat_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('modelnet_fixture'))
    synthetic.make_modelnet_tree(root, n_cats=3, n_train=4, n_test=3,
                                 n_points=1400, seed=5)
    # a stored-R testR sample (the reference eval path uses data['R'] when
    # present, modelnet40.py:64-65)
    from scipy.spatial.transform import Rotation
    d = os.path.join(root, 'airplane', 'testR')
    fn = os.path.join(d, 'airplane_0000.mat')
    data = dict(sio.loadmat(fn))
    data['R'] = Rotation.random(random_state=11).as_matrix()
    sio.savemat(fn, {k: v for k, v in data.items()
                     if not k.startswith('__')})
    return root


def _ref_opt(root, mode, input_num=1024, no_augmentation=False):
    opt = rh.build_ref_opt()
    opt.dataset_path = root
    opt.mode = mode
    opt.no_augmentation = no_augmentation
    opt.model.input_num = input_num
    return opt


def _match_items(ref_ds, our_ds):
    """Yield (ref_index, our_index) pairs matched by file path (the
    reference's os.listdir order is unspecified)."""
    ref_by_path = {p: i for i, p in enumerate(ref_ds.all_data)}
    for j, p in enumerate(our_ds.all_data):
        assert p in ref_by_path, f'our loader found {p} the reference missed'
    assert len(ref_by_path) == len(our_ds.all_data)
    return [(ref_by_path[p], j) for j, p in enumerate(our_ds.all_data)]


def _to_np(v):
    return v.numpy() if hasattr(v, 'numpy') else np.asarray(v)


def test_modelnet_no_augmentation_bit_exact(reference_mode, mat_tree):
    rh.install_stubs()
    from SPConvNets.datasets.modelnet40 import Dataloader_ModelNet40 as Ref
    from epn_pointcloud_tpu.data.modelnet40 import Dataloader_ModelNet40

    opt = _ref_opt(mat_tree, 'test', no_augmentation=True)
    ref_ds = Ref(opt)
    our_ds = Dataloader_ModelNet40(opt)
    assert len(ref_ds) == len(our_ds) > 0

    for ri, oi in _match_items(ref_ds, our_ds):
        ref = ref_ds[ri]
        ours = our_ds[oi]
        np.testing.assert_array_equal(ours['pc'], _to_np(ref['pc']))
        assert int(ours['label']) == int(_to_np(ref['label']).flatten()[0])
        np.testing.assert_array_equal(ours['R'], np.asarray(ref['R'],
                                                            np.float32))
        assert int(ours['R_label']) == int(_to_np(ref['R_label']).flatten()[0])
        assert int(ours['R_label']) == 29  # ref hardcode, modelnet40.py:61


def test_modelnet_stored_R_bit_exact(reference_mode, mat_tree):
    rh.install_stubs()
    from SPConvNets.datasets.modelnet40 import Dataloader_ModelNet40 as Ref
    from epn_pointcloud_tpu.data.modelnet40 import Dataloader_ModelNet40

    opt = _ref_opt(mat_tree, 'testR', no_augmentation=False)
    ref_ds = Ref(opt)
    our_ds = Dataloader_ModelNet40(opt)

    pairs = [(ri, oi) for ri, oi in _match_items(ref_ds, our_ds)
             if 'airplane_0000' in our_ds.all_data[oi]]
    assert pairs, 'stored-R fixture not found'
    ri, oi = pairs[0]
    ref = ref_ds[ri]           # deterministic: rotate by the stored R
    ours = our_ds[oi]
    np.testing.assert_array_equal(ours['pc'], _to_np(ref['pc']))
    np.testing.assert_allclose(ours['R'], np.asarray(ref['R'], np.float32),
                               rtol=0, atol=0)
    assert int(ours['R_label']) == int(_to_np(ref['R_label']).flatten()[0])


def test_modelnet_train_stochastic_seed_pinned(reference_mode, mat_tree):
    rh.install_stubs()
    from SPConvNets.datasets.modelnet40 import Dataloader_ModelNet40 as Ref
    from epn_pointcloud_tpu.data.modelnet40 import Dataloader_ModelNet40

    opt = _ref_opt(mat_tree, 'train', no_augmentation=False)
    ref_ds = Ref(opt)
    our_ds = Dataloader_ModelNet40(opt)
    assert len(ref_ds) == len(our_ds) > 0

    for k, (ri, oi) in enumerate(_match_items(ref_ds, our_ds)):
        seed = 1000 + k
        np.random.seed(seed)          # reference draws from global np.random
        ref = ref_ds[ri]
        our_ds.rng = np.random.RandomState(seed)  # ours from a local stream
        ours = our_ds[oi]
        np.testing.assert_array_equal(ours['pc'], _to_np(ref['pc']))
        # ours returns R as f32 (device input contract); the pipeline math
        # itself is f64-identical — compare at the f32 cast
        np.testing.assert_array_equal(
            ours['R'], np.asarray(ref['R'], np.float32))
        assert int(ours['R_label']) == int(_to_np(ref['R_label']).flatten()[0])


def test_alignment_loader_seed_pinned(reference_mode, mat_tree):
    rh.install_stubs()
    from SPConvNets.datasets.modelnet40 import (
        Dataloader_ModelNet40Alignment as Ref)
    from epn_pointcloud_tpu.data.modelnet40 import (
        Dataloader_ModelNet40Alignment)

    opt = _ref_opt(mat_tree, 'train')
    ref_ds = Ref(opt)
    our_ds = Dataloader_ModelNet40Alignment(opt)
    assert len(ref_ds) == len(our_ds) > 0

    for k, (ri, oi) in enumerate(_match_items(ref_ds, our_ds)):
        seed = 2000 + k
        np.random.seed(seed)
        ref = ref_ds[ri]
        our_ds.rng = np.random.RandomState(seed)
        ours = our_ds[oi]
        np.testing.assert_array_equal(ours['pc'], _to_np(ref['pc']))
        np.testing.assert_array_equal(ours['T'], _to_np(ref['T']))
        # per-anchor R targets: same T, same anchors; the reference composes
        # them via batched matmuls (rotation.py:521-526), ours via one einsum
        # — identical math, last-ulp f32 noise from contraction order
        np.testing.assert_allclose(ours['R'], _to_np(ref['R']),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(ours['R_label']).flatten(),
            _to_np(ref['R_label']).flatten())
