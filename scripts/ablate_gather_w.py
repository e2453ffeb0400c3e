"""Ablate the W-fused inter-conv kernel piece by piece ON CHIP to find what
actually limits a layer: monkeypatch variants of _fwd_gather_w_kernel that
skip one stage each (numerics are garbage; only the timing signal matters).

Usage: python scripts/ablate_gather_w.py --layer b0l1 [--variants full,...]
Variants:
  full        unmodified kernel
  noonehot    one-hot build replaced by a constant (select GEMM kept)
  noselect    select GEMM replaced by a tab slice broadcast
  nod2        d2/affine dot replaced by a constant BD operand
  nobd        BD GEMM replaced by a constant f slab
  now         learned W GEMM skipped (acc = fs[0] slab)
  nofs        fs scratch stores skipped (f consumed by a cheap reduce)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_layer import LAYERS


def make_kernel(variant):
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

    def kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref, w2_ref, out_ref, fs,
               acc, *, sigma, tp, kt, nt, n_sub, ac, c, d):
        gdt = tab_ref.dtype
        prec = ic._precision(gdt)
        idxv = idx_ref[0, 0]
        rows = idxv.shape[0]
        qp = tab_ref.shape[1]
        if variant == 'noonehot':
            s_onehot = jnp.full((rows, qp), 0.001, gdt)
        else:
            iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
            s_onehot = (iot == idxv[:, None]).astype(gdt)
        if variant == 'noselect':
            reps = rows // qp if rows >= qp else 1
            g_all = jnp.concatenate(
                [tab_ref[0]] * reps, axis=0)[:rows]
        else:
            g_all = jax.lax.dot_general(
                s_onehot, tab_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)
        s = tp * nt
        t = n_sub * tp
        grp = max(1, 8 // tp)
        for a in range(ac):
            if variant == 'nod2':
                wp_all = None
            else:
                wp_all = jax.lax.dot_general(
                    rk8k_ref[a], gx8_ref[0],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            pend = []
            for st in range(n_sub):
                if variant == 'nod2':
                    bd = jnp.full((tp * kt, s), 0.01, gdt)
                else:
                    wp = wp_all[:, st * s:(st + 1) * s]
                    bd = jnp.maximum(wp, 0.0).astype(gdt)
                if variant == 'nobd':
                    f = bd[:, :c] * 1.0001
                else:
                    g_sub = g_all[st * s:(st + 1) * s, a * c:(a + 1) * c]
                    f = jax.lax.dot_general(
                        bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(gdt)
                if variant == 'nofs':
                    # consume f without the slab stores: fold into out later
                    pend.append(f[:8])
                    if len(pend) == grp:
                        fs[:, 0:grp * tp, :] = jnp.concatenate(
                            [x[:tp].reshape(1, tp, c) for x in pend] * kt,
                            axis=0) if False else fs[:, 0:grp * tp, :]
                        pend = []
                    continue
                pend.append(f.reshape(kt, tp, c))
                if len(pend) == grp:
                    blk = (pend[0] if grp == 1
                           else jnp.concatenate(pend, axis=1))
                    off = a * t + (st + 1 - grp) * tp
                    fs[:, off:off + grp * tp, :] = blk
                    pend = []
        acc[:] = jnp.zeros_like(acc)
        if variant == 'now':
            acc[:] += fs[0, :, :d] if c >= d else jnp.pad(
                fs[0], ((0, 0), (0, d - c)))
        else:
            kg = 1
            while kg < kt and kg * c < 256 and kt % (kg * 2) == 0:
                kg *= 2
            for k0 in range(0, kt, kg):
                lhs = (fs[k0] if kg == 1 else jnp.concatenate(
                    [fs[k0 + i] for i in range(kg)], axis=1))
                acc[:] += jax.lax.dot_general(
                    lhs, w2_ref[k0 * c:(k0 + kg) * c, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
        for a in range(ac):
            out_ref[0, :, a * d:(a + 1) * d] = (
                acc[a * t:(a + 1) * t].astype(out_ref.dtype))
    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--layer', default='b0l1')
    ap.add_argument('--variants', default='full,noonehot,nod2,nobd,now')
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops import so3conv
    from epn_pointcloud_tpu.ops.pallas import inter_conv as ic
    from epn_pointcloud_tpu.nn.layers import _anchors_const, _kernels_const

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)

    p_out, p_in, c_in, c_out, nn, radius, sigma, stride = LAYERS[args.layer]
    na, k = 60, 24
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

    orig = ic._fwd_gather_w_kernel
    for variant in args.variants.split(','):
        ic._fwd_gather_w_kernel = (orig if variant == 'full'
                                   else make_kernel(variant))

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

        try:
            chain(feats).block_until_ready()
            t0 = time.perf_counter()
            r = chain(feats)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
            print(f'{args.layer} {variant:10s}: {dt * 1e3:8.3f} ms',
                  flush=True)
        except Exception as e:
            print(f'{args.layer} {variant:10s}: FAILED '
                  f'{type(e).__name__}: {str(e)[:120]}', flush=True)
    ic._fwd_gather_w_kernel = orig


if __name__ == '__main__':
    main()
