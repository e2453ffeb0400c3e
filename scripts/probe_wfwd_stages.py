"""Stage-cost attribution for the W-fused inter-conv forward kernel.

Clones _fwd_gather_w_kernel with pipeline stages removed CUMULATIVELY
(learned GEMM -> fs stores -> BD GEMMs -> one-hot select -> BD build +
epilogue) and times each variant on the real chip at a flagship layer's
exact shapes.  Successive differences attribute device time to each stage;
the final variant is the irreducible streaming + out-write floor.

Usage: python scripts/probe_wfwd_stages.py [--layer b0l1] [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = {  # p_out(q), qp, c_in, d_out, nn, sigma
    'b0l1': (512, 512, 64, 64, 16, 0.04),
    'b1l0': (256, 512, 64, 128, 32, 0.08),
    'b1l1': (256, 256, 128, 128, 16, 0.08),
    'b2l0': (128, 256, 128, 256, 32, 0.16),
    'b2l1': (128, 128, 256, 256, 16, 0.16),
    'b3l0': (64, 128, 256, 256, 32, 0.32),
    # 3DMatch inv backbone (probe at --batch 48): tp=2 strided narrow layer
    'ib1l0': (256, 512, 32, 64, 64, 0.08),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--layer', default='b0l1')
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--chunk', type=int, default=0)
    ap.add_argument('--stages', default='full,nolearn,nostore,nobd,nosel,nowp')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

    q, qp, c, d, nn, sigma = LAYERS[args.layer]
    b, na, k = args.batch, 60, 24
    kt = k  # 24 is already a multiple of 8
    nt = nn
    tp = 128 // nt
    # mirror the model's auto rule (which also guarantees ac*c % 128 == 0;
    # e.g. c=32 layers need ac=20, not 30)
    from epn_pointcloud_tpu.ops.so3conv import auto_anchor_chunk
    ac = args.chunk or auto_anchor_chunk(na, c, nn)
    gdt = jnp.bfloat16

    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(b, qp, na * c).astype(np.float32)).astype(gdt)
    idx = jnp.asarray(rng.randint(0, qp, (b, 1, q * nt)).astype(np.int32))
    grouped = jnp.asarray(
        (rng.randn(b, q, nt, 3) * 0.1).astype(np.float32))
    gx8 = ic.make_gx8(grouped, nt)
    kern = jnp.asarray(rng.randn(k, 3).astype(np.float32) * 0.2)
    anchors = jnp.tile(jnp.eye(3)[None], (na, 1, 1))
    rk = jnp.einsum('aij,kj->aki', anchors, kern)
    k2 = jnp.sum(kern * kern, axis=-1)
    rk8k = ic.make_rk8_kmajor(rk, k2, tp, kt, sigma).astype(gdt)
    w2 = jnp.asarray(rng.randn(kt * c, d).astype(np.float32) * 0.05).astype(gdt)

    n_sub = ic._pick_n_sub_gather_w(q, tp, kt, nt, c, d, ac, qp,
                                    jnp.dtype(gdt).itemsize)
    assert n_sub > 0
    pair = ic._pick_pair(ac, c)
    rk8k_p = ic._pair_rk8k(rk8k, tp * kt, pair) if pair > 1 else rk8k

    def kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref, w2_ref, out_ref, fs,
               acc, *, stage):
        prec = ic._precision(gdt)
        s = tp * nt
        t = n_sub * tp
        r = tp * kt
        grp = max(1, 8 // tp)
        rows = t * nt
        sel = stage in ('full', 'nolearn', 'nostore', 'nobd')
        use_wp = stage != 'nowp'
        acc[:] = jnp.zeros_like(acc)
        if sel:
            idxv = idx_ref[0, 0]
            iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
            s_onehot = (iot == idxv[:, None]).astype(gdt)
            g_all = jax.lax.dot_general(
                s_onehot, tab_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)
            if stage == 'nobd':
                # keep the select alive (8-row slab: sublane writes need
                # 8-alignment on this Mosaic)
                acc[0:8, :] += g_all[0:8, :d].astype(jnp.float32)
        for g in range(ac // pair):
            if use_wp:
                wp_all = jax.lax.dot_general(
                    rk8k_ref[g], gx8_ref[0],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            pend = [[] for _ in range(pair)]
            for st in range(n_sub):
                if use_wp:
                    wp = wp_all[:, st * s:(st + 1) * s]
                    bd = jnp.maximum(wp, 0.0).astype(gdt)
                else:
                    bd = jnp.zeros((pair * r, s), gdt)
                if stage in ('full', 'nolearn', 'nostore'):
                    g_sub = g_all[st * s:(st + 1) * s,
                                  g * pair * c:(g + 1) * pair * c]
                    f2 = jax.lax.dot_general(
                        bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(gdt)
                else:
                    f2 = jnp.concatenate([bd[:, :c]] * pair, axis=1)
                if stage in ('full', 'nolearn'):
                    for i in range(pair):
                        a = g * pair + i
                        f = f2[i * r:(i + 1) * r, i * c:(i + 1) * c]
                        pend[i].append(f.reshape(kt, tp, c))
                        if len(pend[i]) == grp:
                            blk = (pend[i][0] if grp == 1
                                   else jnp.concatenate(pend[i], axis=1))
                            off = a * t + (st + 1 - grp) * tp
                            fs[:, off:off + grp * tp, :] = blk
                            pend[i] = []
                else:
                    # keep-alive add; f2's stand-in lane width can be
                    # narrower than d (bd has s=128 lanes; c can exceed it)
                    w = min(d, f2.shape[1])
                    acc[0:8, 0:w] += f2[0:8, 0:w].astype(jnp.float32)
        if stage == 'full':
            kg = ic._pick_kg(kt, c)
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
                acc[a * (n_sub * tp):(a + 1) * (n_sub * tp)].astype(
                    out_ref.dtype))

    results = {}
    for stage in args.stages.split(','):
        @jax.jit
        def chain(tab0, stage=stage):
            def body(carry, _):
                out = pl.pallas_call(
                    functools.partial(kernel, stage=stage),
                    grid=(b, na // ac, q // (n_sub * tp)),
                    in_specs=[
                        pl.BlockSpec((1, 16, n_sub * tp * nt),
                                     lambda bb, ci, pt: (bb, 0, pt)),
                        pl.BlockSpec((1, 1, n_sub * tp * nt),
                                     lambda bb, ci, pt: (bb, 0, pt)),
                        pl.BlockSpec((1, qp, ac * c),
                                     lambda bb, ci, pt: (bb, 0, ci)),
                        pl.BlockSpec((ac // pair, 16, pair * tp * kt),
                                     lambda bb, ci, pt: (ci, 0, 0)),
                        pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, n_sub * tp, ac * d),
                                           lambda bb, ci, pt: (bb, pt, ci)),
                    out_shape=jax.ShapeDtypeStruct((b, q, na * d), gdt),
                    scratch_shapes=[
                        pltpu.VMEM((kt, ac * n_sub * tp, c), gdt),
                        pltpu.VMEM((ac * n_sub * tp, d), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(gx8, idx, carry, rk8k_p, w2)
                if out.shape == carry.shape:
                    nxt = out
                else:
                    nxt = carry * (1.0 + jnp.bfloat16(1e-6)
                                   * out[0, 0, 0].astype(carry.dtype))
                return nxt, ()
            c2, _ = jax.lax.scan(body, tab0, None, length=args.iters)
            return jnp.float32(c2[0, 0, 0])

        float(chain(tab))
        t0 = time.perf_counter()
        float(chain(tab))
        dt = (time.perf_counter() - t0 - 0.025) / args.iters
        results[stage] = dt
        print(f'{args.layer} b{b} stage={stage:8s} n_sub={n_sub} pair={pair} '
              f'ac={ac}: {dt * 1e3:7.3f} ms', flush=True)

    names = list(results)
    for a, bn in zip(names, names[1:]):
        print(f'  {a:8s} - {bn:8s} = {(results[a] - results[bn]) * 1e3:7.3f} '
              f'ms', flush=True)


if __name__ == '__main__':
    main()
