"""Output heads: classification, invariant descriptor, rotation regression.

Rebuild of SPConvNets/utils/base_so3conv.py:217-731 (channels-last layouts:
features [b, p, a, c]; pooled anchor features [b, a, c]).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ..ops import so3conv as _so3f
from ..ops.so3conv import SphericalPointCloud
from .layers import BatchNorm, Dense1x1, InstanceNorm, PointnetSO3Conv
from .blocks import IntraSO3ConvBlock


def _one_hot_like(label, num: int):
    return jax.nn.one_hot(label, num, dtype=jnp.float32)


class ClsOutBlockR(fnn.Module):
    """Legacy classification head with intra convs and anchor attention
    (ref: base_so3conv.py:217-356).

    feats [b, p, a, c] -> (logits [b, k], out_feat)
    """
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, feats, label=None, train: bool = True):
        p = self.params
        x = _so3f.unpack_feats(feats, p.get('kanchor', 1))
        for c in p['mlp']:
            x = Dense1x1(c)(x)
            x = jax.nn.relu(BatchNorm()(x, train=train))

        out_feat = x
        x = x.mean(axis=1, keepdims=True)            # mean pool over points

        for intraparams in p.get('intra', []):
            skip = x
            x_sp = IntraSO3ConvBlock(**intraparams['args'])(
                SphericalPointCloud(None, x, None), train=train)
            skip = Dense1x1(intraparams['args']['dim_out'])(skip)
            skip = jax.nn.relu(BatchNorm()(skip, train=train))
            x = x_sp.feats + skip

        pooling = p.get('pooling', 'max')
        if pooling == 'mean':
            x = x.mean(axis=2).mean(axis=1)
        elif pooling == 'debug':
            x = x[:, :, 0].mean(axis=1)
        elif pooling == 'max':
            x = x.mean(axis=1).max(axis=1)
        elif label is not None:
            # ground-truth-attention debug branch (ref: :316-336)
            x = x.mean(axis=1)                       # [b, a, c]
            label = label.reshape(label.shape[0], -1).squeeze()
            conf = _one_hot_like(label, x.shape[1])  # [b, a]
            x = (x * conf[..., None]).sum(axis=1)
        elif pooling.startswith('attention'):
            x = x.mean(axis=1)                       # [b, a, c]
            out_ch = 1 if pooling == 'attention' else x.shape[-1]
            att = Dense1x1(out_ch)(x)                # [b, a, 1|c]
            out_feat = att
            conf = jax.nn.softmax(att * p['temperature'], axis=1)
            x = (x * conf).sum(axis=1)
        else:
            raise NotImplementedError(f'Pooling mode {pooling}')

        for c in p['fc']:
            x = jax.nn.relu(Dense1x1(c)(x))
        x = Dense1x1(p['k'])(x)
        return x, out_feat.squeeze()


class ClsOutBlockPointnet(fnn.Module):
    """Classification head: 1x1 convs + BN -> PointnetSO3Conv -> BN/relu ->
    anchor pooling -> linear (ref: base_so3conv.py:358-448).

    SphericalPointCloud -> (logits [b, k], out_feat [b, a] for attention)
    """
    params: Dict[str, Any]
    debug: bool = False

    @fnn.compact
    def __call__(self, x: SphericalPointCloud, label=None, train: bool = True):
        p = self.params
        na = p['kanchor']
        packed = x.feats.ndim == 3 and na > 1

        if self.debug:
            x_out = _so3f.unpack_feats(x.feats, na)
            return x_out[..., :40].mean(axis=(1, 2)), None

        c_in = p['dim_in']
        if packed:
            # stay in the packed [b, p, na*c] layout through the mlp convs
            # (the 4D unpack is a physical re-tile; Dense1x1/BatchNorm both
            # have packed modes), unpack once for the pointnet
            x_out = x.feats
            for c in p['mlp']:
                x_out = Dense1x1(c)(x_out, packed_groups=na)
                x_out = jax.nn.relu(BatchNorm(groups=na)(x_out, train=train))
                c_in = c
            x_out = _so3f.unpack_feats(x_out, na)    # [b, p, a, c]
        else:
            x_out = _so3f.unpack_feats(x.feats, na)  # [b, p, a, c]
            for c in p['mlp']:
                x_out = Dense1x1(c)(x_out)
                x_out = jax.nn.relu(BatchNorm()(x_out, train=train))
                c_in = c

        out_feat = x_out
        x_in = SphericalPointCloud(x.xyz, out_feat, x.anchors)
        x_out = PointnetSO3Conv(c_in, c_in, na)(x_in)  # [b, a, c]
        x_out = jax.nn.relu(BatchNorm()(x_out, train=train))

        pooling = p.get('pooling', 'max')
        if pooling == 'mean':
            x_out = x_out.mean(axis=1)
        elif pooling == 'debug':
            x_out = x_out[:, 0]
        elif pooling == 'max':
            x_out = x_out.max(axis=1)
        elif pooling.startswith('attention'):
            # f32 attention logits (they feed the anchor-classification loss)
            att = Dense1x1(1)(x_out.astype(jnp.float32))   # [b, a, 1]
            out_feat = att.squeeze(-1)               # [b, a]
            conf = jax.nn.softmax(att * p['temperature'], axis=1)
            x_out = (x_out * conf.astype(x_out.dtype)).sum(axis=1)
        else:
            raise NotImplementedError(f'Pooling mode {pooling}')

        # f32 logits regardless of the activation compute dtype (softmax/CE
        # stability; the backbone may run bf16)
        x_out = Dense1x1(p['k'])(x_out.astype(jnp.float32))
        return x_out, (out_feat.squeeze() if out_feat.ndim > 2 else out_feat)


class InvOutBlockR(fnn.Module):
    """Invariant descriptor head, conv variant (ref: base_so3conv.py:450-519).

    feats [b, p, a, c] -> (L2-normalized descriptor [b, c_out], out_feat)
    """
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, feats, train: bool = True):
        p = self.params
        mlp = p['mlp']
        x = _so3f.unpack_feats(feats, p.get('kanchor', 1))
        for i, c in enumerate(mlp):
            x = Dense1x1(c)(x)
            if i != len(mlp) - 1:
                x = jax.nn.relu(InstanceNorm()(x, train=train))

        out_feat = x.mean(axis=1)                    # [b, a, c]
        pooling = p.get('pooling', 'max')
        if pooling == 'mean':
            x = x.mean(axis=2).mean(axis=1)
        elif pooling == 'debug':
            x = x[:, :, 0].mean(axis=1)
        elif pooling == 'max':
            x = x.mean(axis=1).max(axis=1)
        elif pooling == 'attention':
            x = x.mean(axis=1)                       # [b, a, c]
            att = Dense1x1(1)(x)                     # [b, a, 1]
            conf = jax.nn.softmax(att * p['temperature'], axis=1)
            x = (x * conf).sum(axis=1)
            out_feat = conf.squeeze(-1)
        else:
            raise NotImplementedError(f'Pooling mode {pooling}')

        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x, out_feat


class InvOutBlockPointnet(fnn.Module):
    """Invariant descriptor head, pointnet variant
    (ref: base_so3conv.py:522-570)."""
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, x: SphericalPointCloud, train: bool = True):
        p = self.params
        c_in, c_out, na = p['dim_in'], p['mlp'][-1], p['kanchor']
        x = SphericalPointCloud(x.xyz, _so3f.unpack_feats(x.feats, na),
                                x.anchors)
        x_out = PointnetSO3Conv(c_in, c_out, na)(x)  # [b, a, c]
        out_feat = x_out

        pooling = p.get('pooling', 'max')
        if pooling == 'mean':
            x_out = x_out.mean(axis=1)
        elif pooling == 'max':
            x_out = x_out.max(axis=1)
        elif pooling == 'attention':
            att = Dense1x1(1)(x_out)
            conf = jax.nn.softmax(att * p['temperature'], axis=1)
            x_out = (x_out * conf).sum(axis=1)
        else:
            raise NotImplementedError(f'Pooling mode {pooling}')

        def l2n(v, axis):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)
        return l2n(x_out, 1), l2n(out_feat, -1)


class InvOutBlockMVD(fnn.Module):
    """Invariant descriptor head with multi-view-style anchor attention
    (ref: base_so3conv.py:572-613). The live head for 3DMatch.

    SphericalPointCloud -> (descriptor [b, c_out], attn [b, p, a, c])
    """
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, x: SphericalPointCloud, train: bool = True):
        p = self.params
        c_in, c_out, na = p['dim_in'], p['mlp'][-1], p['kanchor']
        x = SphericalPointCloud(x.xyz, _so3f.unpack_feats(x.feats, na),
                                x.anchors)

        attn = Dense1x1(c_in)(x.feats)
        attn = jax.nn.relu(attn)
        attn = Dense1x1(c_in)(attn)
        attn = jax.nn.softmax(attn, axis=2)          # over anchors

        x_out = (x.feats * attn).sum(axis=2, keepdims=True)  # [b, p, 1, c]
        x_in = SphericalPointCloud(x.xyz, x_out, None)
        x_out = PointnetSO3Conv(c_in, c_out, na)(x_in)       # [b, 1, c_out]
        x_out = x_out.reshape(x_out.shape[0], -1)

        x_out = x_out / jnp.maximum(
            jnp.linalg.norm(x_out, axis=1, keepdims=True), 1e-12)
        return x_out, attn


class SO3OutBlockR(fnn.Module):
    """Single-shape rotation regression head (ref: base_so3conv.py:617-658).
    feats [b, p, a, c] -> (confidence [b, a], y [b, a, nr]).

    Note: the reference hardcodes a 4-channel regressor and would crash on a
    3-D input to its Conv2d attention (dead code there); we honor the
    `representation` param and apply the attention per anchor.
    """
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, feats, train: bool = True):
        p = self.params
        nr = 4 if p.get('representation', 'quat') == 'quat' else 6
        x = _so3f.unpack_feats(feats, p.get('kanchor', 1))
        for c in p['mlp']:
            x = jax.nn.relu(Dense1x1(c)(x))
        x = x.mean(axis=1)                           # [b, a, c]
        att = Dense1x1(1)(x).squeeze(-1)             # [b, a]
        confidence = jax.nn.softmax(att * p['temperature'], axis=1)
        y = Dense1x1(nr)(x)                          # [b, a, nr]
        return confidence, y


class RelSO3OutBlockR(fnn.Module):
    """Relative rotation regression head (ref: base_so3conv.py:661-731).

    (f1, f2 [b,p,a,c], x1, x2 [b,p,3]) ->
      confidence [b, na_tgt, na_src] (softmax over na_tgt),
      y          [b, na_tgt, na_src, nr]
    """
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, f1, f2, x1, x2, train: bool = True):
        p = self.params
        c_in, na = p['dim_in'], p['kanchor']
        rp = p['representation']
        if rp == 'quat':
            nr = 4
        elif rp == 'ortho6d':
            nr = 6
        else:
            raise KeyError(f'Unrecognized representation of rotation: {rp}')

        f1 = _so3f.unpack_feats(f1, na)
        f2 = _so3f.unpack_feats(f2, na)
        pointnet = PointnetSO3Conv(c_in, c_in, na)
        f1 = jax.nn.relu(pointnet(SphericalPointCloud(x1, f1, None)))  # [b,a,c]
        f2 = jax.nn.relu(pointnet(SphericalPointCloud(x2, f2, None)))

        nb = f1.shape[0]
        # x_out[b, i, j] = concat(f1[b, j], f2[b, i])  (ref: :707-710)
        f1e = jnp.broadcast_to(f1[:, None, :, :], (nb, na, na, f1.shape[-1]))
        f2e = jnp.broadcast_to(f2[:, :, None, :], (nb, na, na, f2.shape[-1]))
        x_out = jnp.concatenate([f1e, f2e], axis=-1)

        for c in p['mlp']:
            x_out = jax.nn.relu(Dense1x1(c)(x_out))

        att = Dense1x1(1)(x_out).squeeze(-1)         # [b, na, na]
        confidence = jax.nn.softmax(att * p['temperature'], axis=1)
        y = Dense1x1(nr)(x_out)                      # [b, na, na, nr]
        return confidence, y
