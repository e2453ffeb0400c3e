"""fp32 parity of the rebuilt layers vs PyTorch formulations of the reference
math (SURVEY.md §7 stage 3 gate). torch (CPU) is used as the oracle; weights
are shared between frameworks."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from epn_pointcloud_tpu.nn import layers as L
from epn_pointcloud_tpu.ops import rotation as rot
from epn_pointcloud_tpu import losses


def test_basic_so3conv_matches_torch_matmul():
    """ref: so3conv/modules.py:48-55 — x.view(b, c1*k, p*a); W @ x."""
    rng = np.random.RandomState(0)
    b, p, a, k, c1, c2 = 2, 5, 4, 3, 6, 7
    x = rng.randn(b, p, a, k, c1).astype(np.float32)
    W = rng.randn(k, c1, c2).astype(np.float32)

    out = np.asarray(jnp.einsum('bpakc,kcd->bpad', jnp.asarray(x), jnp.asarray(W)))

    # torch oracle in the reference layout [b, c1, k, p, a]
    xt = torch.from_numpy(x).permute(0, 4, 3, 1, 2).contiguous()
    # reference W is [c_out, c_in, k] flattened to [c_out, c_in*k] (k fastest)
    Wt = torch.from_numpy(W).permute(2, 1, 0).reshape(c2, c1 * k)
    xt_flat = xt.reshape(b, c1 * k, p * a)
    ot = torch.matmul(Wt, xt_flat).reshape(b, c2, p, a)
    ot = ot.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out, ot, atol=1e-5)


def test_instance_norm_matches_torch():
    """ref: base_so3conv.py:107 nn.InstanceNorm2d(c, affine=False)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 5, 6).astype(np.float32)   # [b, p, a, c]
    m = L.InstanceNorm()
    out = np.asarray(m.apply({}, jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)   # [b, c, p, a]
    ot = torch.nn.InstanceNorm2d(6, affine=False)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ot, atol=1e-5)


def test_batch_norm_matches_torch_train_and_eval():
    """ref: BatchNorm2d default eps=1e-5 momentum=0.1 affine=True."""
    rng = np.random.RandomState(2)
    x1 = rng.randn(4, 7, 5, 6).astype(np.float32)
    x2 = rng.randn(4, 7, 5, 6).astype(np.float32)

    m = L.BatchNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True)
    out1, mut = m.apply(v, jnp.asarray(x1), train=True, mutable=['batch_stats'])
    v = {**v, **mut}
    out_eval, _ = m.apply(v, jnp.asarray(x2), train=False,
                          mutable=['batch_stats'])

    bn = torch.nn.BatchNorm2d(6)
    xt1 = torch.from_numpy(x1).permute(0, 3, 1, 2)
    ot1 = bn(xt1).detach().permute(0, 2, 3, 1).numpy()
    bn.eval()
    ot_eval = bn(torch.from_numpy(x2).permute(0, 3, 1, 2)).detach() \
        .permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(out1), ot1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_eval), ot_eval, atol=1e-4)


def test_leaky_relu_matches_torch():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    np.testing.assert_allclose(np.asarray(jax.nn.leaky_relu(jnp.asarray(x))),
                               F.leaky_relu(torch.from_numpy(x)).numpy(),
                               atol=1e-7)


def test_quaternion_to_matrix_matches_torch_reference():
    """ref: rotation.py:379-417 (note the reference normalizes then builds
    the matrix from (w,x,y,z) components)."""
    rng = np.random.RandomState(3)
    q = rng.randn(8, 4).astype(np.float32)
    out = np.asarray(rot.rotation_from_quaternion(jnp.asarray(q)))

    qt = torch.from_numpy(q)
    qn = qt / torch.clamp_min(qt.pow(2).sum(1, keepdim=True).sqrt(), 1e-8)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    xw, yw, zw = qx * qw, qy * qw, qz * qw
    row0 = torch.stack([1 - 2 * yy - 2 * zz, 2 * xy - 2 * zw, 2 * xz + 2 * yw], 1)
    row1 = torch.stack([2 * xy + 2 * zw, 1 - 2 * xx - 2 * zz, 2 * yz - 2 * xw], 1)
    row2 = torch.stack([2 * xz - 2 * yw, 2 * yz + 2 * xw, 1 - 2 * xx - 2 * yy], 1)
    Rt = torch.stack([row0, row1, row2], 1).numpy()
    np.testing.assert_allclose(out, Rt, atol=1e-5)
    # valid rotations
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)


def test_ortho6d_to_matrix_is_rotation():
    rng = np.random.RandomState(4)
    o = rng.randn(8, 6).astype(np.float32)
    R = np.asarray(rot.rotation_from_ortho6d(jnp.asarray(o)))
    np.testing.assert_allclose(np.einsum('bij,bkj->bik', R, R),
                               np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_mean_matches_torch_svd_formulation():
    """ref: rotation.py:481-518 — chordal L2 mean with det correction."""
    rng = np.random.RandomState(5)
    from scipy.spatial.transform import Rotation as sciR
    Rs = sciR.random(12, random_state=rng).as_matrix().reshape(2, 6, 3, 3) \
        .astype(np.float32)
    w = np.abs(rng.rand(2, 6)).astype(np.float32)
    out = np.asarray(losses.so3_mean(jnp.asarray(Rs), jnp.asarray(w)))

    Rt, wt = torch.from_numpy(Rs), torch.from_numpy(w)
    Ce = torch.sum(wt[:, :, None, None] * Rt, dim=1)
    cu, cd, cv = torch.svd(Ce)
    cvT = cv.transpose(1, 2)
    dets = torch.det(torch.matmul(cu, cvT))
    mask = torch.diag(torch.tensor([0., 0., 1.]))[None]
    mask2 = torch.diag(torch.tensor([1., 1., 0.]))[None]
    D = mask * dets[:, None, None] + mask2
    ot = torch.einsum('bij,bjk,bkl->bil', cu, D, cvT).numpy()

    # SVD is unique up to sign conventions; the composed mean must agree
    np.testing.assert_allclose(out, ot, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-4)


def test_acos_safe_matches_torch_reference():
    """ref: spconv/functional.py:138-143."""
    x = np.linspace(-1.2, 1.2, 41).astype(np.float32)
    out = np.asarray(rot.acos_safe(jnp.asarray(x)))

    xt = torch.from_numpy(x)
    eps = 1e-4
    sign = torch.sign(xt)
    slope = np.arccos(1 - eps) / eps
    ot = torch.where(abs(xt) <= 1 - eps, torch.acos(xt.clamp(-1 + eps, 1 - eps)),
                     torch.acos(sign * (1 - eps)) - slope * sign * (abs(xt) - 1 + eps))
    np.testing.assert_allclose(out, ot.numpy(), atol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(6)
    pred = rng.randn(8, 10).astype(np.float32)
    label = rng.randint(0, 10, 8)
    loss, acc = losses.cross_entropy(jnp.asarray(pred), jnp.asarray(label))
    lt = F.cross_entropy(torch.from_numpy(pred), torch.from_numpy(label))
    np.testing.assert_allclose(float(loss), float(lt), atol=1e-5)


def test_softplus_beta_matches_torch():
    """triplet 'soft' mode uses softplus(diff, beta=margin)."""
    x = np.linspace(-3, 3, 13).astype(np.float32)
    for m in (0.5, 1.0, 2.0):
        mine = np.asarray(jax.nn.softplus(jnp.asarray(x) * m) / m)
        ref = F.softplus(torch.from_numpy(x), beta=m).numpy()
        # fp32 exp/log implementations differ slightly between frameworks
        np.testing.assert_allclose(mine, ref, atol=5e-4)


def test_triplet_loss_matches_torch_formulation():
    rng = np.random.RandomState(7)
    src = rng.randn(6, 16).astype(np.float32)
    tgt = (src + 0.1 * rng.randn(6, 16)).astype(np.float32)

    loss, aux = losses.triplet_batch_loss(jnp.asarray(src), jnp.asarray(tgt),
                                          'soft', margin=1.0)

    # torch oracle (ref: loss.py:280-318)
    st, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    x2 = (st * st).sum(1, keepdim=True).repeat(1, 6)
    y2 = (tt * tt).sum(1, keepdim=True).repeat(1, 6)
    d = torch.sqrt(torch.clamp(x2 + y2.t() - 2 * st @ tt.t(), min=1e-6))
    fp = torch.diagonal(d)
    N = 6
    lbl = torch.arange(N).view(N, 1).expand(N, N)
    is_neg = lbl.ne(lbl.t())
    cn, _ = torch.min(torch.reshape(d[is_neg], (N, -1)), 1)
    lt = F.softplus(fp - cn, beta=1.0).mean()
    np.testing.assert_allclose(float(loss), float(lt), atol=1e-5)


def test_euler_sin_cos_to_matrix_is_rotation():
    """rotation_from_euler_sin_cos (ref: rotation.py:422-440): valid rotations
    for normalized (sin, cos) inputs; identity at zero angles; matches the
    reference's row formula."""
    rng = np.random.RandomState(11)
    ang = rng.uniform(-np.pi, np.pi, (16, 3))
    sc = np.stack([np.sin(ang[:, 0]), np.cos(ang[:, 0]),
                   np.sin(ang[:, 1]), np.cos(ang[:, 1]),
                   np.sin(ang[:, 2]), np.cos(ang[:, 2])], axis=1)
    R = np.asarray(rot.rotation_from_euler_sin_cos(jnp.asarray(sc)))
    np.testing.assert_allclose(np.einsum('bij,bkj->bik', R, R),
                               np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)
    ident = rot.rotation_from_euler_sin_cos(
        jnp.asarray([[0.0, 1.0, 0.0, 1.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(ident)[0], np.eye(3), atol=1e-6)
    # reference row layout: row1 = [c2*c3, -s2, c2*s3]
    s1, c1, s2, c2, s3, c3 = sc.T
    np.testing.assert_allclose(R[:, 0, 0], c2 * c3, atol=1e-5)
    np.testing.assert_allclose(R[:, 0, 1], -s2, atol=1e-5)
    np.testing.assert_allclose(R[:, 2, 1], s1 * c2, atol=1e-5)
