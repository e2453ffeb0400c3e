"""PyTorch-reference weight import (compat mode).

Converts a reference ``state_dict`` (SPConvNets models, channels-first torch)
into this framework's flax variable tree (channels-last), enabling full-model
numeric-parity runs and reuse of reference-trained checkpoints. Must be used
together with ``icosahedron.set_convention('reference')`` so anchors, kernel
points, the 60x12 intra adjacency, and the ball-query fill quirk match the
layouts the weights were trained against.

Key layout mappings (ref file:line):
  * BasicSO3Conv W  [d, c*k] (view of [d, c, k], so3conv/modules.py:35-41)
      -> flax [k, c, d]
  * Conv2d 1x1      [d, c, 1, 1]   -> Dense1x1 kernel [c, d]
  * Conv1d 1        [d, c, 1]      -> Dense1x1 kernel [c, d]
  * Linear          [d, c]         -> Dense1x1 kernel [c, d]
  * BatchNorm2d/1d  weight/bias/running_mean/running_var
      -> params scale/bias + batch_stats mean/var (nn/layers.py BatchNorm)

Model structure map (all three live models):
  backbone.{i}.blocks.{j}.{inter_conv,intra_conv,skip_conv,norm}
      (SPConvNets/utils/base_so3conv.py:128-215)
    -> BasicSO3ConvBlock_{i}/SeparableSO3ConvBlock_{j}/... , or
       BasicSO3ConvBlock_{i}/InterSO3ConvBlock_{j}/... for kanchor < 60
  outblock.* per head:
    ClsOutBlockPointnet (base_so3conv.py:358-448), InvOutBlockMVD (:572-613),
    RelSO3OutBlockR (:661-731).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict into plain numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _so3_w(w: np.ndarray, k: int) -> np.ndarray:
    """ref [d, c*k] (c-major, k-minor) -> flax [k, c, d]."""
    d = w.shape[0]
    c = w.shape[1] // k
    return np.ascontiguousarray(np.transpose(w.reshape(d, c, k), (2, 1, 0)))


def _conv1x1_w(w: np.ndarray) -> np.ndarray:
    """ref Conv2d/Conv1d 1x1 weight [d, c, ...] -> Dense1x1 kernel [c, d]."""
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _linear_w(w: np.ndarray) -> np.ndarray:
    """ref Linear weight [d, c] -> Dense1x1 kernel [c, d]."""
    return np.ascontiguousarray(w.T)


class _Importer:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.consumed = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f'reference state_dict missing {key!r}')
        self.consumed.add(key)
        return self.sd[key]

    def unconsumed(self):
        """Unused TRAINABLE/statistic keys (buffers like anchors / kernels /
        intra_idx / num_batches_tracked are constants here, not weights)."""
        skip = re.compile(
            r'\.(anchors|kernels|intra_idx|num_batches_tracked)$')
        return sorted(k for k in self.sd
                      if k not in self.consumed and not skip.search(k))


def _fill_batchnorm(imp, params_bn, stats_bn, ref_base):
    params_bn['scale'] = imp.take(f'{ref_base}.weight').astype(np.float32)
    params_bn['bias'] = imp.take(f'{ref_base}.bias').astype(np.float32)
    if stats_bn is not None:
        stats_bn['mean'] = imp.take(
            f'{ref_base}.running_mean').astype(np.float32)
        stats_bn['var'] = imp.take(
            f'{ref_base}.running_var').astype(np.float32)


def _fill_dense(imp, params_d, ref_base, kind='conv'):
    w = imp.take(f'{ref_base}.weight')
    params_d['kernel'] = (_linear_w(w) if kind == 'linear'
                          else _conv1x1_w(w)).astype(np.float32)
    bias_key = f'{ref_base}.bias'
    if 'bias' in params_d:
        params_d['bias'] = imp.take(bias_key).astype(np.float32)


def _fill_separable_block(imp, params_blk, stats_blk, ref_base):
    """SeparableSO3ConvBlock_{j} <- backbone.{i}.blocks.{j} (separable_block,
    ref base_so3conv.py:168-212)."""
    # inter conv
    inter_p = params_blk['InterSO3ConvBlock_0']
    w = imp.take(f'{ref_base}.inter_conv.conv.basic_conv.W')
    kshape = inter_p['InterSO3Conv_0']['W'].shape  # [k, c, d]
    inter_p['InterSO3Conv_0']['W'] = _so3_w(w, kshape[0]).astype(np.float32)
    if 'BatchNorm_0' in inter_p:
        st = (stats_blk or {}).get('InterSO3ConvBlock_0', {})
        _fill_batchnorm(imp, inter_p['BatchNorm_0'], st.get('BatchNorm_0'),
                        f'{ref_base}.inter_conv.norm')
    # intra conv (only when kanchor > 1; InstanceNorm there has no params)
    if 'IntraSO3ConvBlock_0' in params_blk:
        w = imp.take(f'{ref_base}.intra_conv.conv.basic_conv.W')
        tgt = params_blk['IntraSO3ConvBlock_0']['IntraSO3Conv_0']
        tgt['W'] = _so3_w(w, tgt['W'].shape[0]).astype(np.float32)
    # skip conv + block norm
    _fill_dense(imp, params_blk['Dense1x1_0'], f'{ref_base}.skip_conv')
    if 'BatchNorm_0' in params_blk:
        _fill_batchnorm(imp, params_blk['BatchNorm_0'],
                        (stats_blk or {}).get('BatchNorm_0'),
                        f'{ref_base}.norm')


def _fill_inter_block(imp, params_blk, stats_blk, ref_base):
    """InterSO3ConvBlock_{j} <- backbone.{i}.blocks.{j} (inter_block,
    kanchor < 60; ref base_so3conv.py:88-126: .conv + .norm)."""
    w = imp.take(f'{ref_base}.conv.basic_conv.W')
    tgt = params_blk['InterSO3Conv_0']
    tgt['W'] = _so3_w(w, tgt['W'].shape[0]).astype(np.float32)
    if 'BatchNorm_0' in params_blk:
        _fill_batchnorm(imp, params_blk['BatchNorm_0'],
                        (stats_blk or {}).get('BatchNorm_0'),
                        f'{ref_base}.norm')


def _fill_backbone(imp, params, stats):
    for top in sorted(k for k in params if k.startswith('BasicSO3ConvBlock_')):
        i = int(top.rsplit('_', 1)[1])
        for blk in sorted(params[top]):
            j = int(blk.rsplit('_', 1)[1])
            ref_base = f'backbone.{i}.blocks.{j}'
            st = (stats.get(top, {}) if stats else {}).get(blk)
            if blk.startswith('SeparableSO3ConvBlock'):
                _fill_separable_block(imp, params[top][blk], st, ref_base)
            elif blk.startswith('InterSO3ConvBlock'):
                _fill_inter_block(imp, params[top][blk], st, ref_base)
            else:
                raise ValueError(f'unknown backbone child {top}/{blk}')


def _fill_cls_head(imp, head_p, head_s):
    """ClsOutBlockPointnet (ref base_so3conv.py:358-448)."""
    n_norm = len([k for k in head_p if k.startswith('BatchNorm_')])
    n_mlp = n_norm - 1
    n_dense = len([k for k in head_p if k.startswith('Dense1x1_')])
    attention = n_dense == n_mlp + 2
    for t in range(n_mlp):
        _fill_dense(imp, head_p[f'Dense1x1_{t}'], f'outblock.linear.{t}')
        _fill_batchnorm(imp, head_p[f'BatchNorm_{t}'],
                        (head_s or {}).get(f'BatchNorm_{t}'),
                        f'outblock.norm.{t}')
    _fill_dense(imp, head_p['PointnetSO3Conv_0']['Dense1x1_0'],
                'outblock.pointnet.embed')
    _fill_batchnorm(imp, head_p[f'BatchNorm_{n_mlp}'],
                    (head_s or {}).get(f'BatchNorm_{n_mlp}'),
                    f'outblock.norm.{n_mlp}')
    t = n_mlp
    if attention:
        _fill_dense(imp, head_p[f'Dense1x1_{t}'], 'outblock.attention_layer')
        t += 1
    _fill_dense(imp, head_p[f'Dense1x1_{t}'], 'outblock.fc2', kind='linear')


def _fill_inv_mvd_head(imp, head_p, head_s):
    """InvOutBlockMVD (ref base_so3conv.py:572-613): attention_layer =
    Sequential(Conv2d, ReLU, Conv2d), pointnet embed."""
    _fill_dense(imp, head_p['Dense1x1_0'], 'outblock.attention_layer.0')
    _fill_dense(imp, head_p['Dense1x1_1'], 'outblock.attention_layer.2')
    _fill_dense(imp, head_p['PointnetSO3Conv_0']['Dense1x1_0'],
                'outblock.pointnet.embed')


def _fill_rel_head(imp, head_p, head_s):
    """RelSO3OutBlockR (ref base_so3conv.py:661-731)."""
    _fill_dense(imp, head_p['PointnetSO3Conv_0']['Dense1x1_0'],
                'outblock.pointnet.embed')
    n_dense = len([k for k in head_p if k.startswith('Dense1x1_')])
    n_mlp = n_dense - 2
    for t in range(n_mlp):
        _fill_dense(imp, head_p[f'Dense1x1_{t}'], f'outblock.linear.{t}')
    _fill_dense(imp, head_p[f'Dense1x1_{n_mlp}'], 'outblock.attention_layer')
    _fill_dense(imp, head_p[f'Dense1x1_{n_mlp + 1}'],
                'outblock.regressor_layer')


_HEADS = {
    'ClsOutBlockPointnet_0': _fill_cls_head,
    'InvOutBlockMVD_0': _fill_inv_mvd_head,
    'RelSO3OutBlockR_0': _fill_rel_head,
}


def import_state_dict(variables, state_dict,
                      strict: bool = True) -> Dict[str, Any]:
    """Convert a reference state_dict into a flax variable tree shaped like
    ``variables`` (the output of ``model.init``).

    Returns a NEW plain-dict tree {'params': ..., 'batch_stats': ...} with
    every leaf taken from the reference weights. With strict=True (default),
    raises if any reference weight is left unused or any flax leaf shape
    mismatches.
    """
    import jax

    sd = state_dict_to_numpy(state_dict)
    ref_tree = jax.tree_util.tree_map(np.asarray, _unfreeze(variables))
    params = ref_tree['params']
    stats = ref_tree.get('batch_stats')

    imp = _Importer(sd)
    _fill_backbone(imp, params, stats)
    for head_name, fill in _HEADS.items():
        if head_name in params:
            fill(imp, params[head_name],
                 (stats or {}).get(head_name))
            break
    else:
        raise ValueError(
            f'no known head in flax params: {sorted(params)[:5]} ...')

    if strict:
        left = imp.unconsumed()
        if left:
            raise ValueError(f'unconsumed reference weights: {left}')
        # shape check against the original tree
        orig = jax.tree_util.tree_leaves(_unfreeze(variables))
        new = jax.tree_util.tree_leaves(ref_tree)
        for o, n in zip(orig, new):
            if tuple(o.shape) != tuple(n.shape):
                raise ValueError(
                    f'shape mismatch after import: {o.shape} vs {n.shape}')
    return ref_tree


def _unfreeze(tree):
    try:
        from flax.core import unfreeze
        return unfreeze(tree)
    except Exception:
        return dict(tree)
