"""Relative-rotation regression model (ref: SPConvNets/models/reg_so3net.py).

Input is a pair of clouds [nb, 2, np, 3]; the pair is concatenated on the
batch axis, run through a shared backbone, split back, and fed to
RelSO3OutBlockR (ref: reg_so3net.py:31-47). Builder arithmetic replicated
verbatim (reg_so3net.py:54-178): sigma doubles per level, the strided-layer
neighbor is 2*int(...) (recomputed, not *=2), InstanceNorm throughout.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as fnn

from ..nn.blocks import BasicSO3ConvBlock
from ..nn.heads import RelSO3OutBlockR
from ..ops import icosahedron, so3conv


class RegSO3ConvModel(fnn.Module):
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, x, train: bool = True):
        # [nb, 2, np, 3] -> [2*nb, np, 3]
        x = jnp.concatenate([x[:, 0], x[:, 1]], axis=0)
        ones = x.shape[-1] == 3   # no normals -> occupancy-ones features
        x = so3conv.preprocess_input(x, self.params['na'], False)
        for bi, block_param in enumerate(self.params['backbone']):
            # plain-occupancy input features are constant ones -> block0's
            # neighbor-feature gather is skipped (ones_input fast path)
            x = BasicSO3ConvBlock(block_param)(
                x, train=train, ones_input=(bi == 0 and ones))
        nb = x.feats.shape[0] // 2
        f1, f2 = x.feats[:nb], x.feats[nb:]
        x1, x2 = x.xyz[:nb], x.xyz[nb:]
        confidence, quats = RelSO3OutBlockR(self.params['outblock'])(
            f1, f2, x1, x2, train=train)
        return confidence, quats

    def get_anchor(self):
        return jnp.asarray(icosahedron.get_anchors())


def build_model(opt,
                mlps=((32, 32), (64, 64), (128, 128), (256,)),
                out_mlps=(256, 128, 64),
                strides=(2, 2, 2, 2),
                initial_radius_ratio=0.2,
                sampling_ratio=0.8,
                sampling_density=0.5,
                kernel_density=1,
                kernel_multiplier=2,
                input_radius=1.0,
                sigma_ratio=0.5,
                xyz_pooling=None,
                to_file=None):
    strides = list(strides)
    input_num = opt.model.input_num
    dropout_rate = opt.model.dropout_rate
    temperature = opt.train_loss.temperature
    representation = opt.model.representation
    na = 1 if opt.model.kpconv else opt.model.kanchor

    if input_num > 1024:
        sampling_ratio /= (input_num / 1024)
        strides[0] = int(2 * (input_num / 1024))

    params = {'name': 'Invariant SO3Conv Model', 'backbone': [], 'na': na}
    dim_in = 1

    n_layer = len(mlps)
    stride_current = 1
    stride_multipliers = [stride_current]
    for i in range(n_layer):
        stride_current *= 2
        stride_multipliers.append(stride_current)

    num_centers = [int(input_num / m) for m in stride_multipliers]
    radius_ratio = [initial_radius_ratio * m ** sampling_density
                    for m in stride_multipliers]
    radii = [r * input_radius for r in radius_ratio]
    weighted_sigma = [sigma_ratio * radii[0] ** 2]
    for idx, s in enumerate(strides):
        weighted_sigma.append(weighted_sigma[idx] * 2)

    for i, block in enumerate(mlps):
        block_param = []
        for j, dim_out in enumerate(block):
            lazy_sample = i != 0 or j != 0
            stride_conv = i == 0 or xyz_pooling != 'stride'
            neighbor = int(sampling_ratio * num_centers[i]
                           * radius_ratio[i] ** (1 / sampling_density))
            kernel_size = 1
            if j == 0:
                inter_stride = strides[i]
                nidx = i if i == 0 else i + 1
                if stride_conv:
                    neighbor = 2 * int(sampling_ratio * num_centers[i]
                                       * radius_ratio[i] ** (1 / sampling_density))
                    kernel_size = 1
            else:
                inter_stride = 1
                nidx = i + 1

            block_type = 'inter_block' if na != 60 else 'separable_block'
            block_param.append({
                'type': block_type,
                'args': {
                    'dim_in': dim_in,
                    'dim_out': dim_out,
                    'kernel_size': kernel_size,
                    'stride': inter_stride,
                    'radius': radii[nidx],
                    'sigma': weighted_sigma[nidx],
                    'n_neighbor': neighbor,
                    'lazy_sample': lazy_sample,
                    'dropout_rate': dropout_rate,
                    'multiplier': kernel_multiplier,
                    'activation': 'leaky_relu',
                    'pooling': xyz_pooling,
                    'kanchor': na,
                },
            })
            dim_in = dim_out
        params['backbone'].append(block_param)

    params['outblock'] = {
        'dim_in': dim_in,
        'mlp': list(out_mlps),
        'fc': [64],
        'k': 40,
        'kanchor': na,
        'representation': representation,
        'temperature': temperature,
    }

    if to_file is not None:
        with open(to_file, 'w') as f:
            json.dump(params, f)

    return RegSO3ConvModel(params)


def build_model_from(opt, outfile_path=None):
    return build_model(opt, to_file=outfile_path)
