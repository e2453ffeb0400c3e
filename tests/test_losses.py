"""Loss-function semantics: multi-task detection in all three settings,
attention CE variants, triplet equivariance term (SURVEY.md §2.4)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sciR

from epn_pointcloud_tpu import losses
from epn_pointcloud_tpu.ops import icosahedron as ico
from epn_pointcloud_tpu.ops.rotation import (label_relative_rotation_np,
                                             rotation_from_quaternion)

RNG = np.random.RandomState(0)


def _rand_R(n):
    return sciR.random(n, random_state=RNG).as_matrix().astype(np.float32)


def test_multitask_alignment_setting_perfect_prediction():
    """With ground-truth quaternions supplied, angular error ~ 0 and the
    selected-anchor L2 ~ 0 (ref loss.py:140-181 semantics)."""
    anchors = ico.get_anchors(60)
    b, na = 2, 60
    T = _rand_R(b)
    R = np.zeros((b, na, 3, 3), np.float32)
    label = np.zeros((b, na), np.int64)
    for i in range(b):
        Ri, li = label_relative_rotation_np(anchors, T[i])
        R[i], label[i] = Ri, li

    # perfect logits: one-hot at the true label; perfect y: quat of R target
    wts = np.zeros((b, na, na), np.float32)
    y = np.zeros((b, na, na, 4), np.float32)
    for i in range(b):
        for src in range(na):
            wts[i, label[i, src], src] = 10.0
            q = sciR.from_matrix(R[i, src]).as_quat()  # (x,y,z,w)
            y[i, label[i, src], src] = [q[3], q[0], q[1], q[2]]  # (w,x,y,z)

    loss, aux = losses.multi_task_detection_loss(
        jnp.asarray(anchors), jnp.asarray(wts), jnp.asarray(label),
        jnp.asarray(y), jnp.asarray(R), jnp.asarray(T), nr=4)
    assert float(aux['r_acc']) == 1.0
    assert float(aux['l2_loss']) < 1e-4
    assert float(np.mean(np.asarray(aux['angular_error']))) < 0.02
    # pred_R should recover T
    np.testing.assert_allclose(np.asarray(aux['pred_R']), T, atol=0.02)


def test_multitask_canonical_setting():
    anchors = ico.get_anchors(60)
    b, na = 2, 60
    gt = _rand_R(b)
    # gt_R[a] = relative rotation anchors[label]^T ... use the same recipe as
    # the alignment targets but with scalar labels = nearest anchor
    from epn_pointcloud_tpu.ops.rotation import rotation_distance_np
    R = np.zeros((b, na, 3, 3), np.float32)
    label = np.zeros((b,), np.int64)
    for i in range(b):
        # canonical residuals: R[a] = anchors[a]^T gt (so anchors[a] @ R[a] = gt)
        R[i] = np.einsum('aji,jk->aik', anchors, gt[i])
        _, label[i], _ = rotation_distance_np(gt[i], anchors)

    wts = np.zeros((b, na), np.float32)
    y = np.zeros((b, na, 4), np.float32)
    for i in range(b):
        wts[i, label[i]] = 10.0
        for a in range(na):
            q = sciR.from_matrix(R[i, a]).as_quat()
            y[i, a] = [q[3], q[0], q[1], q[2]]

    loss, aux = losses.multi_task_detection_loss(
        jnp.asarray(anchors), jnp.asarray(wts), jnp.asarray(label),
        jnp.asarray(y), jnp.asarray(R), None, nr=4)
    assert float(aux['r_acc']) == 1.0
    # prediction = anchors[pred] @ R[pred] == gt; true_R = gt_R at the
    # identity anchor == gt (identity anchor index 0 in our ordering)
    np.testing.assert_allclose(np.asarray(aux['pred_R']), gt, atol=1e-3)
    assert float(np.mean(np.asarray(aux['angular_error']))) < 1e-2


def test_multitask_na1_setting():
    anchors = ico.get_anchors(1)
    b = 3
    gt = _rand_R(b)
    q = sciR.from_matrix(gt).as_quat()
    y = np.stack([q[:, 3], q[:, 0], q[:, 1], q[:, 2]], 1).astype(np.float32)
    wts = np.ones((b, 1), np.float32)
    loss, aux = losses.multi_task_detection_loss(
        jnp.asarray(anchors), jnp.asarray(wts), jnp.zeros((b,), jnp.int32),
        jnp.asarray(y), jnp.asarray(np.tile(gt[:, None], (1, 1, 1, 1))),
        jnp.asarray(gt), nr=4)
    assert float(np.mean(np.asarray(aux['angular_error']))) < 1e-3


def test_attention_ce_modes():
    pred = jnp.asarray(RNG.randn(4, 10).astype(np.float32))
    label = jnp.asarray(RNG.randint(0, 10, 4))
    wts = jnp.asarray(RNG.randn(4, 60).astype(np.float32))
    rlabel = jnp.asarray(RNG.randint(0, 60, 4))
    l_def, aux = losses.attention_cross_entropy(pred, label, wts, rlabel,
                                                'default', 2.0)
    l_no, _ = losses.attention_cross_entropy(pred, label, wts, rlabel,
                                             'no_reg', 2.0)
    assert float(l_def) == float(aux['cls_loss'] + 2.0 * aux['r_loss'])
    assert float(l_no) == float(aux['cls_loss'])
    l_sched, _ = losses.attention_cross_entropy(
        pred, label, wts, rlabel, 'schedule', 2.0, iter_counter=0,
        pretrain_step=100)
    # at step 0 the cls term has zero weight
    assert float(l_sched) == float((2.0 + 1.0) * aux['r_loss'])


def test_attention_ce_subset_relabeling():
    """kanchor<60: full-group rotation labels are relabeled to the nearest
    subset anchor (not zeroed) before the attention CE."""
    remap = ico.anchor_subset_relabel_map(20)
    assert remap.shape == (60,)
    # in-subset anchors map to themselves (subset = anchors[::3])
    np.testing.assert_array_equal(remap[::3], np.arange(20))
    assert remap.min() >= 0 and remap.max() < 20

    pred = jnp.asarray(RNG.randn(4, 10).astype(np.float32))
    label = jnp.asarray(RNG.randint(0, 10, 4))
    wts = jnp.asarray(RNG.randn(4, 20).astype(np.float32))
    rlabel = jnp.asarray(np.array([1, 17, 43, 59]))  # incl. out-of-subset
    _, aux = losses.attention_cross_entropy(pred, label, wts, rlabel)
    # r_loss equals the CE against the remapped labels
    expect, _ = losses.cross_entropy(wts, jnp.asarray(remap)[rlabel])
    np.testing.assert_allclose(float(aux['r_loss']), float(expect), rtol=1e-6)
    assert float(aux['r_loss']) > 0.0


def test_triplet_equivariance_term():
    anchors = jnp.asarray(ico.get_anchors(60))
    b, c, na = 4, 6, 60
    src = jnp.asarray(RNG.randn(b, c).astype(np.float32))
    tgt = src + 0.01
    equi = jnp.asarray(RNG.randn(b, na, c).astype(np.float32))
    T = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1)))
    total, aux = losses.triplet_equivariance_loss(
        src, tgt, equi, equi, T, anchors, 'soft', 1.0, alpha=0.5)
    assert np.isfinite(float(total))
    # with T=I the interpolation is (near) identity -> equi distance diag ~ 0
    assert float(aux['equi']['fpos']) < 0.05


def test_so3_interpolate_identity():
    anchors = jnp.asarray(ico.get_anchors(60))
    feat = jnp.asarray(RNG.randn(2, 60, 5).astype(np.float32))
    T = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)))
    out = losses.so3_interpolate(feat, T, anchors, sigma=1e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-2)


def test_so3_interpolate_group_rotation_permutes():
    """Rotating by a group element == permuting the anchor axis."""
    anchors_np = ico.get_anchors(60).astype(np.float64)
    anchors = jnp.asarray(anchors_np.astype(np.float32))
    feat = jnp.asarray(RNG.randn(1, 60, 4).astype(np.float32))
    g = 17
    T = jnp.asarray(anchors_np[g].astype(np.float32))[None]
    out = np.asarray(losses.so3_interpolate(feat, T, anchors, sigma=1e-3))
    # expected permutation: feature at anchor a comes from anchor idx(R_g^T? )
    # derive numerically: for each a, nearest anchor to R^T @ anchor_a
    tgt = np.einsum('ji,ajk->aik', anchors_np[g], anchors_np)
    d = np.einsum('aij,bij->ab', tgt, anchors_np)
    perm = np.argmax(d, axis=1)
    np.testing.assert_allclose(out[0], np.asarray(feat)[0, perm], atol=1e-2)
