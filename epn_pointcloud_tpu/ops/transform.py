"""Homogeneous/rigid transform helpers (rebuild of
vgtk/vgtk/transform/operator.py — jnp versions of the torch ops plus the
numpy variants). Layout: points [(b,) p, {3|4}] channels-last."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_hom(pc, rotate_only: bool = False):
    """[(b,) p, 3] -> [(b,) p, 4] (pad 1, or 0 for direction vectors)."""
    pad = 0.0 if rotate_only else 1.0
    ones = jnp.full(pc.shape[:-1] + (1,), pad, dtype=pc.dtype)
    return jnp.concatenate([pc, ones], axis=-1)


def from_hom(pc):
    return pc[..., :-1]


def to_hom_np(pc, rotate_only: bool = False):
    pad = 0.0 if rotate_only else 1.0
    ones = np.full(pc.shape[:-1] + (1,), pad, dtype=pc.dtype)
    return np.concatenate([pc, ones], axis=-1)


def from_hom_np(pc):
    """Drop the homogeneous coordinate, [..., 4] -> [..., 3]
    (ref: point3d/homography.py from_hom_np)."""
    return pc[..., :3]


def R_to_hom_np(R: np.ndarray) -> np.ndarray:
    """[3,3] -> [4,4]"""
    T = np.eye(4, dtype=R.dtype)
    T[:3, :3] = R
    return T


def Rt_to_hom_np(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    T = np.eye(4, dtype=R.dtype)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def transform(x, T):
    """Apply a homogeneous transform. x [(b,) p, 4]; T [(b,) 4, 4]."""
    assert x.shape[-1] == 4, 'homography required'
    return jnp.einsum('...ij,...pj->...pi', T, x)


def transform_np(x, T):
    assert x.shape[-1] == 4, 'homography required'
    return np.einsum('...ij,...pj->...pi', T, x)


def rotate(x, R):
    """Rotate points. x [(b,) p, 3]; R [(b,) 3, 3] or homogeneous [.., 4, 4]."""
    if R.shape[-1] == 4:
        R = R[..., :3, :3]
    return jnp.einsum('...ij,...pj->...pi', R, x)


def rotate_np(x, R):
    if R.shape[-1] == 4:
        R = R[..., :3, :3]
    return np.einsum('...ij,...pj->...pi', R, x)
