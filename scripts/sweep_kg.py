"""On-chip sweep of the learned-GEMM kernel-slab grouping target (_KG_TARGET)
per flagship layer. One process so the tunnel/init cost is paid once.

Usage: python scripts/sweep_kg.py [--layers b0l1,b1l0,...] [--kgs 256,512,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_layer import LAYERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--layers', default='b0l1,b1l0,b1l1,b2l0,b2l1,b3l0')
    ap.add_argument('--kgs', default='512,1024,2048')
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops import so3conv
    from epn_pointcloud_tpu.ops.pallas import inter_conv as plic
    from epn_pointcloud_tpu.nn.layers import _anchors_const, _kernels_const

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)

    for lname in args.layers.split(','):
        p_out, p_in, c_in, c_out, nn, radius, sigma, stride = LAYERS[lname]
        na, k = 60, 24
        cands = [x for x in (10, 12, 15, 20, 30, na)
                 if na % x == 0 and (x * c_in) % 128 == 0]
        chunk = (cands[0] if c_in <= 64 and nn <= 16
                 else max(x for x in cands if x <= 30))

        rng = np.random.RandomState(0)
        b = args.batch
        xyz = jnp.asarray(rng.randn(b, p_in, 3).astype(np.float32) * 0.3)
        feats = jnp.asarray(rng.randn(b, p_in, na * c_in)
                            .astype(np.float32)).astype(jnp.bfloat16)
        W = jnp.asarray(rng.randn(k, c_in, c_out).astype(np.float32) * 0.05)
        anchors = jnp.asarray(_anchors_const(na))
        kernels = jnp.asarray(_kernels_const(radius, 1))

        for kg in [int(x) for x in args.kgs.split(',')]:
            plic.set_kg_target(kg)

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
                        nxt = carry * (1.0
                                       + 1e-6 * out.astype(carry.dtype).mean())
                    return nxt, out.mean()
                _, outs = jax.lax.scan(body, f, None, length=args.iters)
                return outs

            try:
                # float() readback closes the window (block_until_ready
                # does not wait on the tunnel backend — CLAUDE.md)
                float(chain(feats)[-1])
                t0 = time.perf_counter()
                float(chain(feats)[-1])
                dt = (time.perf_counter() - t0 - 0.023) / args.iters
                print(f'{lname} kg={kg}: {dt * 1e3:.3f} ms', flush=True)
            except Exception as e:
                print(f'{lname} kg={kg}: FAILED {type(e).__name__}: '
                      f'{str(e)[:150]}', flush=True)


if __name__ == '__main__':
    main()
