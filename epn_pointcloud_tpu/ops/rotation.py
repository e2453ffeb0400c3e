"""Rotation math: host-side (numpy) utilities and device-side (jax) maps.

Rebuild of vgtk/vgtk/functional/rotation.py (reference file:line cited per
function). Device functions are pure jnp and jit/vmap-safe; host functions are
numpy and used by data pipelines.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side (numpy)
# ---------------------------------------------------------------------------

def rand_rotation_matrix(deflection: float = 1.0, randnums=None,
                         rng: np.random.RandomState | None = None) -> np.ndarray:
    """Uniform random rotation via Arvo's method (ref: rotation.py:65-113)."""
    if randnums is None:
        rng = rng or np.random
        randnums = rng.uniform(size=(3,))
    theta, phi, z = randnums
    theta = theta * 2.0 * deflection * np.pi
    phi = phi * 2.0 * np.pi
    z = z * 2.0 * deflection
    r = np.sqrt(z)
    V = np.array([np.sin(phi) * r, np.cos(phi) * r, np.sqrt(2.0 - z)])
    st, ct = np.sin(theta), np.cos(theta)
    R = np.array(((ct, st, 0), (-st, ct, 0), (0, 0, 1)))
    return (np.outer(V, V) - np.eye(3)).dot(R)


def R_from_euler_np(angles: np.ndarray) -> np.ndarray:
    """Rz(c) @ Ry(b) @ Rx(a) from angles [a, b, c]
    (ref: vgtk/pc/augmentation.py:16-33)."""
    a, b, c = angles
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def rotation_distance_np(r0: np.ndarray, r1: np.ndarray):
    """Trace-based rotation distance to a set of anchors
    (ref: rotation.py:350-369).

    r0 [3,3] or [b,3,3]; r1 [n,3,3] (usually the anchors).
    Returns (traces, argmax idx[, diff matrices for the 2-D case]).
    """
    if r0.ndim == 3:
        # traces[b, n] = trace(r1[n] @ r0[b].T)
        traces = np.einsum('nij,bij->bn', r1, r0)
        return traces, np.argmax(traces, axis=1).astype(np.int32)
    diff_r = np.einsum('nji,jk->nik', r1, r0)  # r1^T @ r0
    traces = np.einsum('nii->n', diff_r)
    return traces, int(np.argmax(traces)), diff_r


def label_relative_rotation_np(anchors: np.ndarray, T: np.ndarray):
    """Per-anchor relative-rotation targets (ref: rotation.py:521-526).

    anchors [na,3,3], T [3,3].
    Returns (R_target [na,3,3], label [na]) where for each source anchor a,
    label[a] = argmax_b trace(anchors[b]^T T anchors[a])-ish per the reference
    einsum, and R_target[a] is the residual rotation.
    """
    T_from_anchors = np.einsum('abc,bj,ijk->aick', anchors, T, anchors)
    label = np.argmax(np.einsum('abii->ab', T_from_anchors), axis=1)
    R_target = T_from_anchors[np.arange(label.shape[0]), label]
    return R_target, label.astype(np.int64)


def rotation_matrix_to_euler(R: np.ndarray) -> np.ndarray:
    """XYZ euler extraction (ref: rotation.py:45-62)."""
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy >= 1e-6:
        return np.array([np.arctan2(R[2, 1], R[2, 2]),
                         np.arctan2(-R[2, 0], sy),
                         np.arctan2(R[1, 0], R[0, 0])])
    return np.array([np.arctan2(-R[1, 2], R[1, 1]),
                     np.arctan2(-R[2, 0], sy), 0.0])


# ---------------------------------------------------------------------------
# Device-side (jax)
# ---------------------------------------------------------------------------

def acos_safe(x, eps: float = 1e-4):
    """acos with linear extrapolation near |x|=1 for stable gradients
    (ref: vgtk/spconv/functional.py:138-143)."""
    sign = jnp.sign(x)
    slope = np.arccos(1 - eps) / eps
    return jnp.where(jnp.abs(x) <= 1 - eps,
                     jnp.arccos(jnp.clip(x, -1 + eps, 1 - eps)),
                     jnp.arccos(sign * (1 - eps)) - slope * sign * (jnp.abs(x) - 1 + eps))


def rotation_from_quaternion(q):
    """[b,4] (w,x,y,z) -> [b,3,3] (ref: rotation.py:379-417, Zhou et al.)."""
    norm = jnp.sqrt(jnp.sum(q ** 2, axis=1, keepdims=True))
    q = q / jnp.maximum(norm, 1e-8)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    m = jnp.stack([
        1 - 2 * yy - 2 * zz, 2 * xy - 2 * zw, 2 * xz + 2 * yw,
        2 * xy + 2 * zw, 1 - 2 * xx - 2 * zz, 2 * yz - 2 * xw,
        2 * xz - 2 * yw, 2 * yz + 2 * xw, 1 - 2 * xx - 2 * yy,
    ], axis=1)
    return m.reshape(-1, 3, 3)


def rotation_from_ortho6d(o):
    """[b,6] -> [b,3,3] via Gram-Schmidt (ref: rotation.py:443-478)."""
    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)

    x = normalize(o[:, 0:3])
    z = normalize(jnp.cross(x, o[:, 3:6]))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=2)


def rotation_from_euler_sin_cos(euler_sin_cos):
    """[b,6] (s1,c1,s2,c2,s3,c3) -> [b,3,3] rotation matrices
    (ref: rotation.py:422-440)."""
    s1, c1 = euler_sin_cos[:, 0], euler_sin_cos[:, 1]
    s2, c2 = euler_sin_cos[:, 2], euler_sin_cos[:, 3]
    s3, c3 = euler_sin_cos[:, 4], euler_sin_cos[:, 5]
    m = jnp.stack([
        c2 * c3, -s2, c2 * s3,
        c1 * s2 * c3 + s1 * s3, c1 * c2, c1 * s2 * s3 - s1 * c3,
        s1 * s2 * c3 - c1 * s3, s1 * c2, s1 * s2 * s3 + c1 * c3,
    ], axis=1)
    return m.reshape(-1, 3, 3)


def so3_mean(Rs, weights=None):
    """Chordal L2 mean of rotations via SVD (ref: rotation.py:481-518).

    Rs [b,n,3,3], weights [b,n] or None -> [b,3,3].

    Note on conventions: torch.svd returns V while jnp.linalg.svd returns
    V^H; the determinant correction keeps the result in SO(3) either way.
    """
    if weights is None:
        Ce = jnp.sum(Rs, axis=1)
    else:
        Ce = jnp.sum(weights[:, :, None, None] * Rs, axis=1)
    u, _, vt = jnp.linalg.svd(Ce)
    dets = jnp.linalg.det(jnp.einsum('bij,bjk->bik', u, vt))
    D = jnp.zeros_like(Ce).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    D = D.at[:, 2, 2].set(dets)
    return jnp.einsum('bij,bjk,bkl->bil', u, D, vt)


def angle_from_R(R):
    """Rotation angle from matrices [.., 3, 3] (ref: loss.py:212-213)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return acos_safe(0.5 * (tr - 1))


def mean_angular_error(pred_R, gt_R):
    """Per-element angular error (ref: loss.py:215-218)."""
    R_diff = jnp.einsum('bij,bkj->bik', pred_R, gt_R)
    return angle_from_R(R_diff)
