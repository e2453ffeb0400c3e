"""Legacy ZPConv modules — the alternative ring-kernel formulation kept for
API/capability parity (ref: vgtk/vgtk/spconv/modules.py:16-149; not used by
the three shipped models, which use the SO3 path)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..ops import icosahedron, kernel_points, sampling, so3conv
from ..ops.so3conv import SphericalPointCloud
from .layers import so3conv_weight_init


@functools.lru_cache(maxsize=None)
def _sphere_anchors(n: int) -> np.ndarray:
    return icosahedron.sphere_points(n)


class BasicZPConv(fnn.Module):
    """Like BasicSO3Conv but WITH a bias initialized to 1e-3
    (ref: spconv/modules.py:16-49). [b,p,a,k,c_in] -> [b,p,a,c_out]."""
    dim_in: int
    dim_out: int
    kernel_size: int
    debug: bool = False

    @fnn.compact
    def __call__(self, x):
        if self.debug:
            W = jnp.ones((self.kernel_size, self.dim_in, self.dim_out), x.dtype)
            return jnp.einsum('bpakc,kcd->bpad', x, W)
        W = self.param('W',
                       so3conv_weight_init(self.dim_in, self.dim_out,
                                           self.kernel_size),
                       (self.kernel_size, self.dim_in, self.dim_out))
        bias = self.param('bias',
                          lambda key, shape, dtype=jnp.float32:
                          jnp.full(shape, 1e-3, dtype),
                          (self.dim_out,))
        return jnp.einsum('bpakc,kcd->bpad', x, W) + bias


class IntraZPConv(fnn.Module):
    """Angular-bin intra conv over anchor directions
    (ref: spconv/modules.py:54-91)."""
    dim_in: int
    dim_out: int
    kernel_size: int
    aperture: float
    sigma: float
    anchor_nn: int
    anchor_in: int
    anchor_out: Optional[int] = None

    @fnn.compact
    def __call__(self, x: SphericalPointCloud) -> SphericalPointCloud:
        a_in = jnp.asarray(_sphere_anchors(self.anchor_in))
        a_out_n = self.anchor_out or self.anchor_in
        a_out = jnp.asarray(_sphere_anchors(a_out_n))
        kernels = jnp.asarray(
            kernel_points.intra_angular_kernels(self.aperture, self.kernel_size))
        intra_idx, intra_w = so3conv.intra_kernel_weights(
            a_in, a_out, kernels, self.anchor_nn, self.aperture, self.sigma)
        feats = so3conv.intra_zpconv_grouping_naive(intra_idx, intra_w, x.feats)
        feats = BasicZPConv(self.dim_in, self.dim_out,
                            int(kernels.shape[0]))(feats)
        return SphericalPointCloud(x.xyz, feats, a_out)


class InterZPConv(fnn.Module):
    """Ring-kernel spatial conv (ref: spconv/modules.py:95-131)."""
    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    aperture: float
    sigma: float
    anchors_dim: int
    n_neighbor: int
    anchor_nn: int
    multiplier: int = 3
    lazy_sample: bool = True

    @fnn.compact
    def __call__(self, x: SphericalPointCloud, inter_idx=None, inter_w=None):
        anchors = jnp.asarray(_sphere_anchors(self.anchors_dim))
        rings = jnp.asarray(kernel_points.ring_kernels(
            self.radius, self.aperture, self.kernel_size,
            multiplier=self.multiplier))

        if inter_idx is None:
            grouped_xyz, inter_idx, _, new_xyz = sampling.inter_grouping_ball(
                x.xyz, self.stride, self.radius, self.n_neighbor,
                self.lazy_sample)
            inter_w = so3conv.inter_zpconv_anchor_weights(
                grouped_xyz, anchors, rings, self.sigma)
        else:
            new_xyz = x.xyz

        feats = sampling.add_shadow_feature(x.feats)
        feats = so3conv.inter_zpconv_grouping_naive(inter_idx, inter_w, feats)
        feats = BasicZPConv(self.dim_in, self.dim_out,
                            int(rings.shape[0]))(feats)
        return inter_idx, inter_w, SphericalPointCloud(new_xyz, feats, anchors)


class AnchorProp(fnn.Module):
    """kNN anchor-direction interpolation (ref: spconv/modules.py:134-149)."""
    anchor_in: int
    anchor_out: int
    sigma: float
    k: int = 6

    @fnn.compact
    def __call__(self, x: SphericalPointCloud) -> SphericalPointCloud:
        a_in = jnp.asarray(_sphere_anchors(self.anchor_in))
        a_out = jnp.asarray(_sphere_anchors(self.anchor_out))
        idx, w = so3conv.compute_anchor_weights(a_in, a_out, k=self.k,
                                                sigma=self.sigma)
        feats = so3conv.anchor_prop(x.feats, idx, w)
        return SphericalPointCloud(x.xyz, feats, a_out)
