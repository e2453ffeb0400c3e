"""Throughput-vs-accuracy sweep over kanchor configs (60 / 40 / 20).

Runs the synthetic rotated-classification protocol (the reference's testR
protocol, SPConvNets/datasets/modelnet40.py:53-74, on the synthetic
ModelNet tree) for each anchor count with identical data, seed, and
schedule, then measures inference throughput — producing the table that
scopes the 10k clouds/s target against the model's accuracy cost
(reduced anchor subsets per vgtk/so3conv/functional.py:281-289).

Run on TPU:
  python scripts/kanchor_sweep.py [--iters 3000] [--cats 12] [--kanchors 60,40,20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def train_and_eval(kanchor: int, root: str, iters: int, batch: int,
                   dtype: str = 'bf16'):
    import jax
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet

    opt = default_opt(**{'dataset_path': root, 'model.input_num': 1024,
                         'model.kanchor': kanchor, 'model.flag': 'attention',
                         'model.model': 'cls_so3net_pn',
                         'compute_dtype': dtype,
                         'num_iterations': iters,
                         'experiment_id': f'kanchor_sweep_k{kanchor}'})
    opt.batch_size = batch
    trainer = TrainerModelNet(opt)
    t0 = time.perf_counter()
    for i in range(iters):
        trainer.step()
        if (i + 1) % 500 == 0:
            trainer._print_running_stats(f'k{kanchor} iter {i + 1}')
    # param readback closes the timing window (block_until_ready does not
    # reliably wait on the tunnel backend; CLAUDE.md)
    float(jax.tree_util.tree_leaves(trainer.state.params)[0].reshape(-1)[0])
    train_wall = time.perf_counter() - t0
    acc = trainer.eval()
    return float(acc), train_wall


def bench_inference(kanchor: int, batch=32, input_num=1024, iters=20):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    cps, dt = bench.bench_forward(batch=batch, input_num=input_num,
                                  iters=iters, kanchor=kanchor)
    return cps, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=4000)
    ap.add_argument('--cats', type=int, default=30)
    ap.add_argument('--batch', type=int, default=12)
    ap.add_argument('--kanchors', default='60,40,20')
    ap.add_argument('--skip-train', action='store_true',
                    help='throughput only')
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'fp32'],
                    help='training/inference compute dtype (the '
                         'bf16-vs-fp32 accuracy-delta experiment)')
    args = ap.parse_args()

    from epn_pointcloud_tpu.data import synthetic
    # hard=True: per-class shape *distributions* with per-sample parameter
    # jitter, so testR accuracy is bounded by rotation-invariant feature
    # quality (the quantity kanchor controls) instead of memorization —
    # the fixed-geometry classes saturate every config at 100%.
    root = os.path.join(tempfile.gettempdir(),
                        f'kanchor_sweep_hard_c{args.cats}')
    if not os.path.exists(os.path.join(root, 'airplane')):
        synthetic.make_modelnet_tree(root, n_cats=args.cats, n_train=60,
                                     n_test=12, n_points=2048, hard=True)

    rows = []
    for k in [int(x) for x in args.kanchors.split(',')]:
        cps, dt = bench_inference(k)
        acc = train_wall = None
        if not args.skip_train:
            acc, train_wall = train_and_eval(k, root, args.iters,
                                             args.batch, args.dtype)
        rows.append({'kanchor': k, 'dtype': args.dtype,
                     'clouds_per_sec': round(cps, 1),
                     'step_ms': round(dt * 1e3, 2),
                     'testR_acc': acc if acc is None else round(100 * acc, 2),
                     'train_wall_s': train_wall and round(train_wall, 1)})
        print(json.dumps(rows[-1]), flush=True)

    print('\n| kanchor | inference clouds/s (b32) | testR acc (%) |')
    print('|---|---|---|')
    for r in rows:
        print(f"| {r['kanchor']} | {r['clouds_per_sec']} | "
              f"{r['testR_acc']} |")


if __name__ == '__main__':
    main()
