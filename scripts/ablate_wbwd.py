"""Ablate the fully-fused inter-conv BACKWARD kernel stage by stage ON CHIP
(numerics are garbage; only the timing signal matters) — hunting the tp=4
strided-layer outliers (bwd/fwd 2.4-3.3x where MACs predict ~2.1x).

Usage: python scripts/ablate_wbwd.py --layer b1l0 [--variants full,nodg,...]
Variants:
  full     unmodified backward
  noselect select GEMM replaced by a slice broadcast (g_all constant-ish)
  nodacc   dacc regroup copies skipped (constant dacc)
  nodfs    dFs slab GEMMs skipped (constant dFs)
  nof2     f recompute + fs stores skipped
  nodg     per-(anchor, subtile) dg GEMMs + dgs stores skipped
  nodtab   the dtab accumulate GEMM skipped
  nodw     the dW2 accumulation GEMMs skipped
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LAYERS = {  # p2, q, nn, c_in, d_out
    'b0l1': (512, 512, 16, 64, 64),
    'b1l0': (256, 512, 32, 64, 128),
    'b1l1': (256, 256, 16, 128, 128),
    'b2l0': (128, 256, 32, 128, 256),
    'b2l1': (128, 128, 16, 256, 256),
    'b3l0': (64, 128, 32, 256, 256),
}
NA, K, AC, SIGMA = 60, 24, 20, 0.1


def make_bwd_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

    def kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref, w2_ref, dout_ref,
               dtab_ref, dw2_ref, fs, dFs, dacc, dgs, *, sigma, tp, kt, nt,
               n_sub, ac, c, d, pair=1):
        gdt = tab_ref.dtype
        prec = ic._precision(gdt)
        pt = pl.program_id(2)
        first_all = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                     & (pt == 0))

        @pl.when(pt == 0)
        def _zero_dtab():
            dtab_ref[...] = jnp.zeros_like(dtab_ref)

        @pl.when(first_all)
        def _zero_dw2():
            dw2_ref[...] = jnp.zeros_like(dw2_ref)

        idxv = idx_ref[0, 0]
        rows = idxv.shape[0]
        qp = tab_ref.shape[1]
        iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
        s_onehot = (iot == idxv[:, None]).astype(gdt)
        if variant == 'noselect':
            reps = -(-rows // qp)
            g_all = jnp.concatenate([tab_ref[0]] * reps, axis=0)[:rows, :]
        else:
            g_all = jax.lax.dot_general(
                s_onehot, tab_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)
        s = tp * nt
        t = n_sub * tp
        grp = max(1, 8 // tp)
        if variant != 'nodacc':
            for a in range(ac):
                dacc[a * t:(a + 1) * t, :] = dout_ref[0, :, a * d:(a + 1) * d]
        kg = ic._pick_kg(kt, c)
        if variant != 'nodfs':
            for k0 in range(0, kt, kg):
                blk = jax.lax.dot_general(
                    dacc[:], w2_ref[k0 * c:(k0 + kg) * c, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec).astype(gdt)
                for i in range(kg):
                    dFs[k0 + i] = blk[:, i * c:(i + 1) * c]
        r = tp * kt
        for g in range(ac // pair):
            wp_all = jax.lax.dot_general(
                rk8k_ref[g], gx8_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            pend = [[] for _ in range(pair)]
            for st in range(n_sub):
                wp = wp_all[:, st * s:(st + 1) * s]
                bd = jnp.maximum(wp, 0.0).astype(gdt)
                if variant != 'nof2':
                    g_sub = g_all[st * s:(st + 1) * s,
                                  g * pair * c:(g + 1) * pair * c]
                    f2 = jax.lax.dot_general(
                        bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(gdt)
                for i in range(pair):
                    a = g * pair + i
                    if variant != 'nof2':
                        f = f2[i * r:(i + 1) * r, i * c:(i + 1) * c]
                        pend[i].append(f.reshape(kt, tp, c))
                        if len(pend[i]) == grp:
                            blk = (pend[i][0] if grp == 1
                                   else jnp.concatenate(pend[i], axis=1))
                            off = a * t + (st + 1 - grp) * tp
                            fs[:, off:off + grp * tp, :] = blk
                            pend[i] = []
                    if variant != 'nodg':
                        bd_a = bd[i * r:(i + 1) * r, :]
                        dF_ast = dFs[:, a * t + st * tp:
                                     a * t + (st + 1) * tp, :]
                        dg_sub = jax.lax.dot_general(
                            bd_a, dF_ast.reshape(kt * tp, c),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(gdt)
                        dgs[st * s:(st + 1) * s, a * c:(a + 1) * c] = dg_sub
        if variant != 'nodtab':
            dtab_ref[0] += jax.lax.dot_general(
                s_onehot, dgs[:], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        if variant != 'nodw':
            for k0 in range(0, kt, kg):
                lhs = (fs[k0] if kg == 1 else jnp.concatenate(
                    [fs[k0 + i] for i in range(kg)], axis=1))
                dw2_ref[k0 * c:(k0 + kg) * c, :] += jax.lax.dot_general(
                    lhs, dacc[:].astype(gdt),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--layer', default='b1l0')
    ap.add_argument('--batch', type=int, default=12)
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--variants',
                    default='full,noselect,nodacc,nodfs,nof2,nodg,nodtab,nodw')
    ap.add_argument('--chunk', type=int, default=AC)
    ap.add_argument('--mode', default='merged', choices=['merged', 'split'])
    args = ap.parse_args()
    ac = args.chunk
    if args.mode == 'split' and set(args.variants.split(',')) != {'full'}:
        # the variant monkeypatch replaces ic._bwd_gather_w_kernel (merged
        # kernel); _call_gather_w_bwd_split calls _bwd_kernel_dtab /
        # _bwd_kernel_dw2 directly, so non-'full' variants would silently
        # time the unmodified split kernels and mislabel the deltas
        raise SystemExit('--mode split only supports --variants full '
                         '(stage ablation patches the merged kernel only)')

    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

    p, q, nn, c, d = LAYERS[args.layer]
    nt, tp, kt, _ = ic.plan(nn, K)
    rng = np.random.RandomState(0)
    B = args.batch
    gx = jnp.asarray(rng.randn(B, p, nn, 3).astype(np.float32) * 0.3)
    gx8 = ic.make_gx8(gx, nt)
    anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
    ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
    rk = jnp.einsum('aij,kj->aki', anch, ker)
    k2 = jnp.sum(ker ** 2, -1)
    rk8k = ic.make_rk8_kmajor(rk, k2, tp, kt, SIGMA)
    qp = -(-q // 8) * 8
    tab = jnp.asarray(rng.randn(B, qp, NA * c)).astype(jnp.bfloat16)
    idxn = rng.randint(0, q, size=(B, p, nn)).astype(np.int32)
    idxn = np.pad(idxn, ((0, 0), (0, 0), (0, nt - nn)), constant_values=q)
    idx3 = jnp.asarray(idxn.reshape(B, 1, p * nt))
    w2 = jnp.asarray(rng.randn(kt * c, d)).astype(jnp.bfloat16)
    dout = jnp.asarray(rng.randn(B, p, NA * d)).astype(jnp.bfloat16)

    orig = ic._bwd_gather_w_kernel
    for variant in args.variants.split(','):
        ic._bwd_gather_w_kernel = make_bwd_kernel(variant)

        @jax.jit
        def chain(dout0):
            def body(carry, _):
                call = (ic._call_gather_w_bwd_split if args.mode == 'split'
                        else ic._call_gather_w_bwd)
                dtab, dw = call(
                    gx8, idx3, tab, rk8k, w2, carry, SIGMA, tp, kt, nt, ac,
                    False, c, d)
                nxt = carry * (1.0 + 1e-9 * dtab.mean().astype(carry.dtype))
                return nxt, dw.mean()
            _, outs = jax.lax.scan(body, dout0, None, length=args.iters)
            return outs[-1].astype(jnp.float32)

        # float() readback: block_until_ready does NOT wait on this tunnel
        # (CLAUDE.md) — the round-3 numbers from this script predate that
        # discovery and must be re-measured
        float(chain(dout))
        t0 = time.perf_counter()
        float(chain(dout))
        dt = (time.perf_counter() - t0 - 0.025) / args.iters
        print(f'{args.layer} ac={ac} {args.mode} {variant:9s}: '
              f'{dt * 1e3:7.3f} ms', flush=True)
    ic._bwd_gather_w_kernel = orig


if __name__ == '__main__':
    main()
