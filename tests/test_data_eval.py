"""Dataset loaders + 3DMatch evaluation pipeline tests (host-side, no TPU)."""

import os

import numpy as np
import pytest

from epn_pointcloud_tpu.app.config import default_opt
from epn_pointcloud_tpu.data import pc as pctk
from epn_pointcloud_tpu.data import synthetic
from epn_pointcloud_tpu.data.modelnet40 import (
    DataLoader, Dataloader_ModelNet40, Dataloader_ModelNet40Alignment)
from epn_pointcloud_tpu.eval import evaluation_3dmatch as e3d
from epn_pointcloud_tpu.eval.retrieval import modelnet_retrieval_mAP
from epn_pointcloud_tpu.ops.ply import load_ply, save_ply


@pytest.fixture(scope='module')
def mn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('mn'))
    synthetic.make_modelnet_tree(root, n_cats=3, n_train=5, n_test=3,
                                 n_points=300)
    return root


@pytest.fixture(scope='module')
def dm_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('dm'))
    synthetic.make_3dmatch_tree(root, n_frags=3, n_points=2000, n_kpts=16)
    return root


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).rand(50, 3).astype(np.float32)
    p_ascii = str(tmp_path / 'a.ply')
    p_bin = str(tmp_path / 'b.ply')
    save_ply(p_ascii, pts)
    save_ply(p_bin, pts, c='r', binary=True)
    np.testing.assert_allclose(load_ply(p_ascii), pts, atol=1e-5)
    np.testing.assert_allclose(load_ply(p_bin), pts, atol=1e-6)


def test_modelnet_loader(mn_root):
    opt = default_opt(dataset_path=mn_root, **{'model.input_num': 64})
    opt.mode = 'train'
    ds = Dataloader_ModelNet40(opt)
    assert len(ds) == 3 * 5
    item = ds[0]
    assert item['pc'].shape == (64, 3)
    assert 0 <= item['R_label'] < 60
    # normalized: max norm ~ 1 before rotation (rotation preserves norms)
    assert abs(np.linalg.norm(item['pc'], axis=1).max() - 1.0) < 1e-4

    dl = DataLoader(ds, batch_size=4, shuffle=True)
    batch = next(iter(dl))
    assert batch['pc'].shape == (4, 64, 3)
    assert batch['label'].shape == (4,)


def test_modelnet_unrotated_R_label_is_identity_anchor(mn_root):
    """no_augmentation samples must label the IDENTITY anchor — the
    reference hardcodes 29 because its identity anchor sits at index 29
    (SPConvNets/datasets/modelnet40.py:61); ours sits wherever
    get_identity_index() says (regression for the transcribed literal)."""
    from epn_pointcloud_tpu.ops import icosahedron
    opt = default_opt(dataset_path=mn_root, **{'model.input_num': 64})
    opt.mode = 'train'
    opt.no_augmentation = True
    ds = Dataloader_ModelNet40(opt)
    item = ds[0]
    idx = icosahedron.get_identity_index()
    assert int(item['R_label']) == idx
    np.testing.assert_allclose(
        icosahedron.get_anchors()[idx], np.eye(3), atol=1e-6)


def test_modelnet_same_seed_same_stream(mn_root):
    """Determinism contract (reference seed 2913, options.py:17): two loaders
    built with the same seed must produce identical batches — regression for
    the salted-``hash(mode)`` seeding bug."""
    def first_batch():
        opt = default_opt(dataset_path=mn_root, **{'model.input_num': 64})
        opt.mode = 'train'
        ds = Dataloader_ModelNet40(opt)
        return next(iter(DataLoader(ds, batch_size=4, shuffle=True)))

    a, b = first_batch(), first_batch()
    np.testing.assert_array_equal(a['pc'], b['pc'])
    np.testing.assert_array_equal(a['R'], b['R'])
    np.testing.assert_array_equal(a['R_label'], b['R_label'])


def test_modelnet_alignment_loader(mn_root):
    opt = default_opt(dataset_path=mn_root, **{'model.input_num': 64})
    opt.mode = 'train'
    ds = Dataloader_ModelNet40Alignment(opt)
    assert len(ds) == 5  # airplane only
    item = ds[0]
    assert item['pc'].shape == (2, 64, 3)
    assert item['R'].shape == (60, 3, 3)
    assert item['R_label'].shape == (60,)
    # pair consistency: pc_src = T @ pc_tgt
    np.testing.assert_allclose(item['pc'][0], item['pc'][1] @ item['T'].T,
                               atol=1e-4)


def test_fragment_loader(dm_root):
    from epn_pointcloud_tpu.data.match_3dmatch import FragmentLoader
    opt = default_opt(dataset_path=dm_root, **{'model.input_num': 64})
    opt.mode = 'train'
    ds = FragmentLoader(opt, search_radius=0.4, npt=4)
    assert len(ds) == 2
    item = ds[0]
    assert item['src'].shape == (4, 64, 3)
    assert item['tgt'].shape == (4, 64, 3)
    assert item['T'].shape == (3, 3)
    # T is a rotation
    np.testing.assert_allclose(item['T'] @ item['T'].T, np.eye(3), atol=1e-4)


def test_scene_eval_loader_and_cache(dm_root):
    from epn_pointcloud_tpu.data.match_3dmatch import SceneEvalLoader
    opt = default_opt(dataset_path=dm_root, **{'model.input_num': 64})
    ds = SceneEvalLoader(opt, 'synth-scene')
    assert len(ds) == 3
    item = ds[0]
    assert item['clouds'].shape == (16, 64, 3)
    assert os.path.exists(ds.grouped_path(0))   # cache written
    item2 = ds[0]                               # cache hit path
    np.testing.assert_allclose(item['clouds'], item2['clouds'])


def test_evaluate_scene_with_perfect_features(dm_root):
    """With ground-truth-aligned descriptors, recall must be 100%."""
    scene = 'synth-scene'
    feat_dir = os.path.join(dm_root, 'feats')
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.RandomState(0)

    # perfect features: descriptor = world location of the keypoint (+noise)
    import re
    for i in range(3):
        kpts = np.loadtxt(os.path.join(dm_root, scene, '01_Keypoints',
                                       f'cloud_bin_{i}Keypoints.txt'),
                          dtype=np.int64)
        frag = load_ply(os.path.join(dm_root, scene, f'cloud_bin_{i}.ply'))
        pose = np.load(os.path.join(dm_root, 'fused_fragments', scene,
                                    'seq-01', f'cloud_bin_{i}.pose.npy'))
        world = frag[kpts] @ pose[:3, :3].T + pose[:3, 3]
        np.save(os.path.join(feat_dir, f'feature{i}.npy'),
                world + 1e-4 * rng.randn(*world.shape))

    results = e3d.evaluate_scene(dm_root, feat_dir, scene, num_thread=1)
    assert results[0][0] == 0.05
    assert results[0][1] == 100.0
    assert os.path.exists(os.path.join(feat_dir, 'recall.txt'))


def test_evaluate_scene_with_random_features_low_recall(dm_root):
    scene = 'synth-scene'
    feat_dir = os.path.join(dm_root, 'feats_rand')
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    for i in range(3):
        np.save(os.path.join(feat_dir, f'feature{i}.npy'), rng.randn(16, 8))
    results = e3d.evaluate_scene(dm_root, feat_dir, scene, num_thread=1)
    assert results[0][1] < 100.0


def test_retrieval_map():
    rng = np.random.RandomState(0)
    # two well-separated clusters -> perfect precision@1
    feats = np.concatenate([rng.randn(10, 4), rng.randn(10, 4) + 20], 0)
    labels = np.array([0] * 10 + [1] * 10)
    assert modelnet_retrieval_mAP(feats, labels, 1) == 1.0


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 1.0, 1.0]],
                   dtype=np.float32)
    out = pctk.voxel_downsample_np(pts, 0.1)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.0005, 1.0], atol=1e-6)


def test_gt_log_roundtrip(dm_root):
    pairs, transforms = e3d.read_gt_log(
        os.path.join(dm_root, 'synth-scene', 'gt.log'))
    assert pairs.shape == (2, 2)
    assert transforms.shape == (2, 4, 4)
    # valid rigid transforms
    R = transforms[:, :3, :3]
    np.testing.assert_allclose(np.einsum('bij,bkj->bik', R, R),
                               np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)


def test_augmentation_variants():
    rng = np.random.RandomState(3)
    pc = rng.randn(64, 3).astype(np.float64)
    nrm = rng.randn(64, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    # with_normal: one shared y-axis rotation; dot(pc, normal) preserved
    rp, rn = pctk.rotate_point_cloud_with_normal(pc, nrm, rng=rng)
    np.testing.assert_allclose((rp * rn).sum(1), (pc * nrm).sum(1), atol=1e-9)
    np.testing.assert_allclose(rp[:, 1], pc[:, 1], atol=1e-9)  # up axis fixed

    # perturbation: small rotation, angle bounded by sqrt(3)*clip
    out = pctk.rotate_perturbation_point_cloud(pc, rng=rng)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(pc, axis=1), atol=1e-9)
    R, _, _, _ = np.linalg.lstsq(pc, out, rcond=None)
    ang = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    assert ang < np.sqrt(3.0) * 0.18 + 1e-6

    # som variant rotates all three consistently
    som = rng.randn(8, 3)
    p2, n2, s2 = pctk.rotate_perturbation_point_cloud_with_normal_som(
        pc, nrm, som, rng=rng)
    np.testing.assert_allclose((p2 * n2).sum(1), (pc * nrm).sum(1), atol=1e-9)
    np.testing.assert_allclose(np.linalg.norm(s2, axis=1),
                               np.linalg.norm(som, axis=1), atol=1e-9)

    # batch rotate: one shared R over the batch
    batch = rng.randn(4, 32, 3)
    rot, R = pctk.batch_rotate_point_cloud(batch, rng=rng)
    np.testing.assert_allclose(rot, np.einsum('ij,bnj->bni', R, batch),
                               atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    rot2, R2 = pctk.batch_rotate_point_cloud(batch, R=[0.1, 0.2, 0.3])
    assert R2.shape == (3, 3)
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-9)


def test_knn_index_np():
    rng = np.random.RandomState(5)
    pts = rng.randn(50, 3)
    idx = pctk.knn_index_np(pts, 4)
    assert idx.shape == (50, 4)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    brute = np.argsort(d2, axis=1, kind='stable')[:, :4]
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(d2, idx, 1), axis=1),
        np.sort(np.take_along_axis(d2, brute, 1), axis=1), atol=1e-12)
    bidx = pctk.knn_index_np(np.stack([pts, pts]), 4, batch=True)
    assert bidx.shape == (2, 50, 4)
