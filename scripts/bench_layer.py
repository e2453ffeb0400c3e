"""Micro-benchmark one fused inter-conv Pallas layer on the real TPU.

Chains iterations with a data dependency (CLAUDE.md: block_until_ready
under-reports through the tunnel) by feeding each step's output back into
the support table (shapes line up when c == d; otherwise a scalar fold).

Usage:
  python scripts/bench_layer.py --layer b0l1 [--budget MB] [--chunk AC]
Layers: b0l1 b1l0 b1l1 b2l0 b2l1 b3l0
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = {
    # p_out, p_in, c_in, c_out, n_neighbor, radius, sigma, stride
    'b0l1': (512, 512, 64, 64, 16, 0.28284271, 0.04, 1),
    'b1l0': (256, 512, 64, 128, 32, 0.4, 0.08, 2),
    'b1l1': (256, 256, 128, 128, 16, 0.4, 0.08, 1),
    'b2l0': (128, 256, 128, 256, 32, 0.56568542, 0.16, 2),
    'b2l1': (128, 128, 256, 256, 16, 0.56568542, 0.16, 1),
    'b3l0': (64, 128, 256, 256, 32, 0.8, 0.32, 2),
    # 3DMatch inv_so3net_pn backbone shapes (bench at --batch 48): narrow
    # channels + nn=64 strided layers (tp=2)
    'ib0l1': (512, 512, 32, 32, 32, 0.28284271, 0.04, 1),
    'ib1l0': (256, 512, 32, 64, 64, 0.4, 0.08, 2),
    'ib1l1': (256, 256, 64, 64, 32, 0.4, 0.08, 1),
    'ib2l0': (128, 256, 64, 128, 64, 0.56568542, 0.16, 2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--layer', default='b0l1')
    ap.add_argument('--budget', type=float, default=0, help='VMEM MB for '
                    'n_sub picking (0 = module default)')
    ap.add_argument('--chunk', type=int, default=0, help='anchor chunk '
                    '(0 = model auto rule)')
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--kg', type=int, default=0, help='learned-GEMM slab '
                    'grouping lane target (0 = module default)')
    ap.add_argument('--pair', type=int, default=-1,
                    help='anchor-paired BD GEMMs: 1/0 (-1 = module default)')
    ap.add_argument('--packed', default='auto',
                    help="packed narrow-c W-fused kernel: auto/1/0")
    ap.add_argument('--srows', type=int, default=0,
                    help='packed fs store row batch (0 = module default)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops import so3conv
    from epn_pointcloud_tpu.ops.pallas import inter_conv as plic
    from epn_pointcloud_tpu.nn.layers import _anchors_const, _kernels_const

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)
    if args.budget > 0:
        plic.set_vmem_budget(int(args.budget * 1024 * 1024))
    if args.kg > 0:
        plic.set_kg_target(args.kg)
    if args.pair >= 0:
        plic.set_pair(bool(args.pair))
    if args.packed != 'auto':
        plic.set_packed_mode(bool(int(args.packed)))
    if args.srows > 0:
        plic.set_packed_srows(args.srows)

    p_out, p_in, c_in, c_out, nn, radius, sigma, stride = LAYERS[args.layer]
    na, k = 60, 24
    chunk = args.chunk
    if chunk <= 0:
        cands = [x for x in (10, 12, 15, 20, 30, na)
                 if na % x == 0 and (x * c_in) % 128 == 0]
        chunk = (cands[0] if c_in <= 64 and nn <= 16
                 else max(x for x in cands if x <= 30))

    rng = np.random.RandomState(0)
    b = args.batch
    xyz = jnp.asarray(rng.randn(b, p_in, 3).astype(np.float32) * 0.3)
    feats = jnp.asarray(
        rng.randn(b, p_in, na * c_in).astype(np.float32)).astype(jnp.bfloat16)
    W = jnp.asarray(rng.randn(k, c_in, c_out).astype(np.float32) * 0.05)
    anchors = jnp.asarray(_anchors_const(na))
    kernels = jnp.asarray(_kernels_const(radius, 1))

    def layer(f):
        _, _, out, _ = so3conv.inter_so3conv_fused(
            xyz, f, stride, nn, anchors, kernels, radius, sigma, W,
            lazy_sample=True, anchor_chunk=chunk, remat=False,
            packed_io=True)
        return out

    @jax.jit
    def chain(f):
        def body(carry, _):
            out = layer(carry)
            if out.shape == carry.shape:
                nxt = out
            else:
                nxt = carry * (1.0 + 1e-6 * out.astype(carry.dtype).mean())
            return nxt, out.mean()
        _, outs = jax.lax.scan(body, f, None, length=args.iters)
        return outs

    # timing closed by a float() readback of the chained result —
    # block_until_ready does not wait on the tunnel backend (CLAUDE.md)
    float(chain(feats)[-1])
    t0 = time.perf_counter()
    float(chain(feats)[-1])
    dt = (time.perf_counter() - t0 - 0.023) / args.iters
    print(f'{args.layer} chunk={chunk} budget={args.budget or "default"}MB '
          f'kg={args.kg or "default"}: {dt * 1e3:.3f} ms/layer-call')


if __name__ == '__main__':
    main()
