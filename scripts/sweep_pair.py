"""On-chip A/B of the anchor-paired BD GEMM (_PAIR) per flagship layer.

Usage: python scripts/sweep_pair.py [--layers b0l1,b1l0]
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
    ap.add_argument('--layers', default='b0l1,b1l0')
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

        for pair_on in (False, True):
            plic.set_pair(pair_on)

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

            # backward too: pairing changes the bwd kernel structure
            @jax.jit
            def chain_bwd(f):
                def loss(ff):
                    out = layer(ff)
                    return (out.astype(jnp.float32) ** 2).mean()
                def body(carry, _):
                    l, g = jax.value_and_grad(loss)(carry)
                    return carry * (1.0 + 0.0 * l) + 0.0 * g, l
                _, ls = jax.lax.scan(body, f, None, length=args.iters)
                return ls

            for name, fn in (('fwd', chain), ('fwd+bwd', chain_bwd)):
                try:
                    # float() readback closes the window (block_until_ready
                    # does not wait on the tunnel backend — CLAUDE.md)
                    float(fn(feats)[-1])
                    t0 = time.perf_counter()
                    float(fn(feats)[-1])
                    dt = (time.perf_counter() - t0 - 0.023) / args.iters
                    print(f'{lname} pair={pair_on} {name}: '
                          f'{dt * 1e3:.3f} ms', flush=True)
                except Exception as e:
                    print(f'{lname} pair={pair_on} {name}: FAILED '
                          f'{type(e).__name__}: {str(e)[:150]}', flush=True)
        plic.set_pair(True)


if __name__ == '__main__':
    main()
