"""Pallas dispatch-gate regression tests.

The TPU fast paths are guarded by shape gates (ops/so3conv.py
fused_layer_gate, ops/pallas/{inter_conv,ones_conv,ball_query,moments}
.supported) that QUIETLY fall back to XLA formulations when they reject a
shape. A gate regression would silently cost 5-10x and still pass every
numeric test — so this file asserts that every layer shape derived from the
three live model builders actually takes the kernel path.

Layer shapes come from the same params trees the models run
(models/{cls_so3net_pn,inv_so3net_pn,reg_so3net}.build_model), so a builder
change that breaks fusability fails here immediately.
"""

import types

import numpy as np
import pytest

from epn_pointcloud_tpu.models import (cls_so3net_pn, inv_so3net_pn,
                                       reg_so3net)
from epn_pointcloud_tpu.ops import so3conv
from epn_pointcloud_tpu.ops.pallas import ball_query as plbq
from epn_pointcloud_tpu.ops.pallas import inter_conv as plic
from epn_pointcloud_tpu.ops.pallas import moments as plm
from epn_pointcloud_tpu.ops.pallas import ones_conv as ploc


def _opt(model='cls_so3net_pn', kanchor=60, input_num=1024):
    return types.SimpleNamespace(
        model=types.SimpleNamespace(input_num=input_num, dropout_rate=0.0,
                                    kanchor=kanchor, kpconv=False,
                                    flag='attention',
                                    representation='quat',
                                    search_radius=0.4),
        train_loss=types.SimpleNamespace(temperature=3.0),
    )


def _layer_shapes(params, input_num):
    """Walk the builder params tree -> per-layer dicts with the running
    point count (p1 -> p2 across strides), mirroring BasicSO3ConvBlock."""
    out = []
    p = input_num
    for bi, block in enumerate(params['backbone']):
        for li, layer in enumerate(block):
            a = layer['args']
            p2 = -(-p // a['stride'])
            out.append(dict(block=bi, layer=li, p1=p, p2=p2,
                            stride=a['stride'], n_neighbor=a['n_neighbor'],
                            c_in=a['dim_in'], c_out=a['dim_out'],
                            na=a['kanchor'], radius=a['radius']))
            p = p2
    return out


def _models():
    # kanchor 20/40 are the declared throughput frontier (BASELINE.md) —
    # a de-fusion there silently costs 5-10x on exactly the configs the
    # 10k/s re-scope depends on, so they get the same gate coverage.
    return [
        ('cls', cls_so3net_pn.build_model(_opt()), 1024),
        ('cls_ka40', cls_so3net_pn.build_model(_opt(kanchor=40)), 1024),
        ('cls_ka20', cls_so3net_pn.build_model(_opt(kanchor=20)), 1024),
        ('inv', inv_so3net_pn.build_model(_opt('inv_so3net_pn')), 1024),
        ('reg', reg_so3net.build_model(_opt('reg_so3net')), 1024),
    ]


N_KERNEL = 24  # kernel_size 1 everywhere in the builders -> kpsphere24


@pytest.mark.parametrize('name,model,input_num',
                         _models(), ids=lambda v: v if isinstance(v, str) else '')
def test_fused_inter_conv_gate(name, model, input_num):
    layers = _layer_shapes(model.params, input_num)
    assert layers, name
    for L in layers:
        if L['block'] == 0 and L['layer'] == 0:
            # block0 (occupancy-ones input, c_in=1) runs the dedicated
            # ones kernel instead — checked separately below
            continue
        chunk = so3conv.auto_anchor_chunk(L['na'], L['c_in'],
                                          L['n_neighbor'])
        assert so3conv.fused_layer_gate(
            L['p1'], L['stride'], L['n_neighbor'], N_KERNEL, L['c_in'],
            L['na'], chunk), f"{name} block{L['block']}.{L['layer']}: {L}"


@pytest.mark.parametrize('name,model,input_num',
                         _models(), ids=lambda v: v if isinstance(v, str) else '')
def test_ones_conv_gate_block0(name, model, input_num):
    L = _layer_shapes(model.params, input_num)[0]
    kt = ploc.pick_kt(L['na'], N_KERNEL)
    nt = ploc.pick_nt(L['n_neighbor'])
    assert ploc.supported(L['p2'], L['p1'] + 1, nt, L['na'], kt), \
        f'{name} block0 ones-conv gate rejected: {L}'


@pytest.mark.parametrize('name,model,input_num',
                         _models(), ids=lambda v: v if isinstance(v, str) else '')
def test_ball_query_gate(name, model, input_num):
    for L in _layer_shapes(model.params, input_num):
        # support includes the shadow point appended by the grouping
        assert plbq.supported(L['p2'], L['p1'] + 1, L['n_neighbor']), \
            f"{name} block{L['block']}.{L['layer']}: {L}"


@pytest.mark.parametrize('name,model,input_num',
                         _models(), ids=lambda v: v if isinstance(v, str) else '')
def test_moments_gate(name, model, input_num):
    """Packed-norm moments kernel must accept every backbone activation
    shape [b, p2, na*c_out]."""
    for L in _layer_shapes(model.params, input_num):
        assert plm.supported(L['p2'], L['na'] * L['c_out']), \
            f"{name} block{L['block']}.{L['layer']}: {L}"


def test_gate_helper_matches_reference_chunks():
    """auto_anchor_chunk stays a divisor of na with 128-aligned lane blocks
    (the Mosaic constraint layer_fusable enforces)."""
    for c_in in (32, 64, 128, 256):
        for nn in (16, 32, 64):
            ch = so3conv.auto_anchor_chunk(60, c_in, nn)
            assert 60 % ch == 0
            assert (ch * c_in) % 128 == 0 or ch == 60
