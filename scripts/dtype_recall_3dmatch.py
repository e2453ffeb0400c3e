"""bf16-vs-fp32 on the ACTUAL 3DMatch feature-match recall protocol.

Round-4 verdict item: the dtype table proved bf16 for classification, but
descriptor matching is a nearest-neighbor structure — a 0.966 cosine can
flip mutual-NN matches. This script trains ONE inv_so3net_pn checkpoint on
synthetic 3DMatch data (the dm_r1c recipe, bf16 production mode), then runs
the full eval entry point (descriptor extraction -> evaluate_scene ->
recall at tau in {0.05, 0.1, 0.2}; ref protocol
SPConvNets/datasets/evaluation_3dmatch.py:126-205) once per compute dtype
from that single checkpoint, and reports:

  * the recall table per dtype (the contract metric),
  * per-fragment descriptor cosine between dtypes,
  * mutual-NN match agreement between dtypes per fragment pair (the
    NN-structure stability the cosine alone cannot prove).

Usage: python scripts/dtype_recall_3dmatch.py [--iters 400]
"""

from __future__ import annotations

import argparse
import copy
import os
import os.path as osp
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = 'synth-scene'


def build_opt(root, mode, dtype, exp_id):
    from epn_pointcloud_tpu.app.config import default_opt
    opt = default_opt(**{
        'model.model': 'inv_so3net_pn', 'model.input_num': 1024,
        'model.search_radius': 0.4, 'model.flag': 'attention',
        'model.output_num': 32, 'model.dropout_rate': 0.0})
    opt.dataset_path = root
    opt.dataset = 'kpts'
    opt.seed = 2913
    opt.no_augmentation = True
    opt.compute_dtype = dtype
    opt.experiment_id = exp_id
    opt.mode = mode
    opt.save_freq = 10 ** 9
    opt.log_freq = 50
    opt.train_loss.loss_type = 'soft'
    opt.train_loss.equi_alpha = 0.0
    if mode == 'train':
        opt.npt = 16
        opt.batch_size = 1
    else:
        opt.npt = 24
        opt.batch_size = 8
    return opt


def mutual_nn_matches(fa, fb):
    """Mutual nearest-neighbor keypoint matches between two fragments'
    descriptor sets (the protocol's match structure)."""
    d = ((fa[:, None, :] - fb[None, :, :]) ** 2).sum(-1)
    ab = d.argmin(1)
    ba = d.argmin(0)
    mutual = ba[ab] == np.arange(fa.shape[0])
    return {(i, int(ab[i])) for i in np.nonzero(mutual)[0]}


CKPT = '/tmp/dtype3dm_study.ckpt'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=2500)
    ap.add_argument('--root', default='/tmp/dtype3dm_synth48')
    ap.add_argument('--train-dtype', default='bf16',
                    help='dtype for the training leg; an fp32-trained twin '
                         '(identical seed/data) gives the accuracy-level '
                         'comparison, since cross-dtype SERVING of one '
                         'checkpoint measures distribution shift, not '
                         'dtype accuracy cost (measured: bf16-trained ckpt '
                         'recalls 50%% served bf16, 0%% served fp32)')
    ap.add_argument('--stage', default='all', choices=['all', 'train',
                                                       'eval'])
    args = ap.parse_args()

    from epn_pointcloud_tpu.data import synthetic
    from epn_pointcloud_tpu.app.trainer_3dmatch import Trainer3DMatch

    if not osp.isdir(osp.join(args.root, SCENE)):
        # dense room: every keypoint ball must hold >= 1024 real points
        # (see tests/test_reference_entrypoint_parity.py fixture rationale);
        # 48 keypoints so per-pair inlier ratios have resolution below
        # tau2=0.05 granularity
        synthetic.make_3dmatch_tree(
            args.root, scene=SCENE, n_frags=3, n_points=32000, n_kpts=48,
            seed=11, extent=(2.0, 2.0, 1.6), kpt_margin=0.45)

    if args.stage in ('all', 'train'):
        # ---- train once per --train-dtype (dm_r1c recipe)
        td = args.train_dtype
        topt = build_opt(args.root, 'train', td, f'dtype3dm_t{td}')
        topt.num_iterations = args.iters
        trainer = Trainer3DMatch(topt)
        t0 = time.perf_counter()
        trainer.train()
        print(f'train[{td}]: {args.iters} iters in '
              f'{time.perf_counter() - t0:.0f}s')
        path = (CKPT[:-5] if td == 'bf16' else f'{CKPT[:-5]}_fp32')
        trainer._save_network('final', path=path)
        del trainer
        if args.stage == 'train':
            return
    ckpt = CKPT

    # ---- (a) cross-dtype SERVING of the bf16-trained checkpoint
    feats, recalls = {}, {}
    for dtype in ('bf16', 'fp32'):
        eopt = build_opt(args.root, 'eval', dtype, f'dtype3dm_{dtype}')
        eopt.resume_path = ckpt
        ev = Trainer3DMatch(eopt)
        results = ev.eval([SCENE])
        recalls[dtype] = results[SCENE]
        fdir = osp.join('data/evaluate/3DMatch', eopt.experiment_id, SCENE,
                        '32_dim')
        feats[dtype] = [np.load(osp.join(fdir, f'feature{i}.npy'))
                        for i in range(3)]
        del ev

    # ---- (b) matched-dtype accuracy comparison: fp32-trained twin served
    # fp32 vs the bf16 pair above (identical seed/data/schedule)
    fp32_ckpt = f'{CKPT[:-5]}_fp32.ckpt'
    if osp.exists(fp32_ckpt):
        eopt = build_opt(args.root, 'eval', 'fp32', 'dtype3dm_tfp32')
        eopt.resume_path = fp32_ckpt
        ev = Trainer3DMatch(eopt)
        results = ev.eval([SCENE])
        print('\nmatched-dtype accuracy (recall, identical seed/data):')
        print('  bf16-trained, bf16-served: ' + '  '.join(
            f'tau{t:.2f}={r:.4f}' for t, r in recalls['bf16']))
        print('  fp32-trained, fp32-served: ' + '  '.join(
            f'tau{t:.2f}={r:.4f}' for t, r in results[SCENE]))
        del ev

    # ---- report
    print('\nrecall table (tau2, recall):')
    for dtype in ('bf16', 'fp32'):
        print(f'  {dtype}: ' + '  '.join(
            f'tau{t:.2f}={r:.4f}' for t, r in recalls[dtype]))

    print('\nper-fragment descriptor cosine bf16 vs fp32:')
    for i, (a, b) in enumerate(zip(feats['bf16'], feats['fp32'])):
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        cos = (an * bn).sum(1)
        print(f'  frag {i}: mean {cos.mean():.5f}  min {cos.min():.5f}')

    print('\nmutual-NN match agreement bf16 vs fp32 (per fragment pair):')
    for i in range(3):
        for j in range(i + 1, 3):
            m16 = mutual_nn_matches(feats['bf16'][i], feats['bf16'][j])
            m32 = mutual_nn_matches(feats['fp32'][i], feats['fp32'][j])
            inter = len(m16 & m32)
            union = len(m16 | m32)
            print(f'  pair ({i},{j}): bf16 {len(m16)} matches, fp32 '
                  f'{len(m32)}, identical {inter} '
                  f'(jaccard {inter / max(union, 1):.3f})')


if __name__ == '__main__':
    main()
