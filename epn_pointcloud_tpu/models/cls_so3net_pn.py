"""ModelNet40 classification model (ref: SPConvNets/models/cls_so3net_pn.py).

The builder replicates the reference's hyperparameter derivation verbatim
(cls_so3net_pn.py:43-167): num_centers = input_num / 2^i, radius_ratio =
initial_radius_ratio * mult^sampling_density, sigma doubling per stride,
neighbor = int(sampling_ratio * nc * rr^(1/sampling_density)) with the x2 at
strided layers, separable blocks iff kanchor == 60 — including the int()
truncations, which change model capacity.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as fnn

from ..nn.blocks import BasicSO3ConvBlock
from ..nn.heads import ClsOutBlockPointnet
from ..ops import icosahedron, so3conv


class ClsSO3ConvModel(fnn.Module):
    """Backbone blocks + ClsOutBlockPointnet (ref: cls_so3net_pn.py:15-39)."""
    params: Dict[str, Any]

    @fnn.compact
    def __call__(self, x, rlabel=None, train: bool = True):
        # x: [nb, np, 3]
        ones = x.shape[-1] == 3   # no normals -> occupancy-ones features
        x = so3conv.preprocess_input(x, self.params['na'], False)
        for bi, block_param in enumerate(self.params['backbone']):
            # plain-occupancy input features are constant ones -> block0's
            # neighbor-feature gather is skipped (ones_input fast path)
            x = BasicSO3ConvBlock(block_param)(
                x, train=train, ones_input=(bi == 0 and ones))
        return ClsOutBlockPointnet(self.params['outblock'])(x, rlabel, train=train)

    def get_anchor(self):
        return jnp.asarray(icosahedron.get_anchors())


def build_model(opt,
                mlps=((64, 64), (128, 128), (256, 256), (256,)),
                out_mlps=(256,),
                strides=(2, 2, 2, 2),
                initial_radius_ratio=0.2,
                sampling_ratio=0.4,
                sampling_density=0.5,
                kernel_density=1,
                kernel_multiplier=2,
                input_radius=1.0,
                sigma_ratio=0.5,
                xyz_pooling=None,
                so3_pooling='max',
                to_file=None):
    """Derive the full block-parameter tree (ref: cls_so3net_pn.py:43-167).
    Returns (model, params_dict)."""
    strides = list(strides)
    input_num = opt.model.input_num
    dropout_rate = opt.model.dropout_rate
    temperature = opt.train_loss.temperature
    so3_pooling = opt.model.flag
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
                    neighbor *= 2
            else:
                inter_stride = 1
                nidx = i + 1

            block_type = 'inter_block' if na < 60 else 'separable_block'
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
                    'norm': 'BatchNorm2d',
                },
            })
            dim_in = dim_out
        params['backbone'].append(block_param)

    params['outblock'] = {
        'dim_in': dim_in,
        'mlp': list(out_mlps),
        'fc': [64],
        'k': 40,
        'pooling': so3_pooling,
        'temperature': temperature,
        'kanchor': na,
    }

    if to_file is not None:
        with open(to_file, 'w') as f:
            json.dump(params, f)

    return ClsSO3ConvModel(params)


def build_model_from(opt, outfile_path=None):
    return build_model(opt, to_file=outfile_path)
