"""Microbenchmark: in-kernel row-select strategies for the W-fused inter
conv's megagather (the dominant cost of the flagship step).

Selecting [rows] support rows from a VMEM-resident [qp, lanes] table:
  onehot   — the shipped formulation: (iota == idx) bf16 one-hot, MXU GEMM
             [rows, qp] x [qp, lanes]; rows*qp*lanes MACs.
  dyngather— tpu.dynamic_gather via jnp.take_along_axis(axis=0) on a
             sublane-padded table (Mosaic requires in/idx/out same shape,
             jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule);
             bandwidth-ish cost instead of MACs.

Per-grid-step shapes from the flagship layers (scripts/bench_layer.py):
rows = point-tile queries * padded neighbors, qp = support rows (+shadow,
ceil8), lanes = anchor_chunk * c_in.

Usage: python scripts/bench_select.py [--iters 30] [--reps 40]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# (name, rows, qp, lanes) — per-grid-step select shapes; reps scales the
# in-kernel repetition so one pallas_call is long enough to time.
SHAPES = [
    ('b0l1ish', 1024, 520, 640),
    ('b1l0ish', 1024, 520, 1280),
    ('b1l1ish', 512, 264, 1280),
    ('b2l1ish', 512, 136, 2560),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--reps', type=int, default=40)
    ap.add_argument('--dtype', default='bf16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def onehot_kernel(idx_ref, tab_ref, out_ref, *, reps, rows, qp):
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for r in range(reps):
            idxv = idx_ref[0] + r  # defeat CSE
            iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
            s_onehot = (iot == idxv[:, None]).astype(dt)
            acc += jax.lax.dot_general(
                s_onehot, tab_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        out_ref[...] = acc.astype(out_ref.dtype)

    def dyngather_kernel(idx_ref, tab_ref, out_ref, pad, *, reps, rows, qp):
        lanes = tab_ref.shape[1]
        # pad the table to the gather row count once (scratch persists
        # within the call); rows beyond qp are never indexed
        pad[:qp, :] = tab_ref[...]
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        for r in range(reps):
            idxv = idx_ref[0] + r
            idx2 = jnp.broadcast_to(idxv[:, None], (rows, lanes))
            g = jnp.take_along_axis(pad[...], idx2, axis=0)
            acc += g.astype(jnp.float32)
        out_ref[...] = acc.astype(out_ref.dtype)

    for name, rows, qp, lanes in SHAPES:
        rng = np.random.RandomState(0)
        idx = jnp.asarray(rng.randint(0, qp, size=(1, rows)).astype(np.int32))
        tab = jnp.asarray(rng.randn(qp, lanes).astype(np.float32)).astype(dt)
        out_shape = jax.ShapeDtypeStruct((rows, lanes), dt)

        variants = {}
        variants['onehot'] = pl.pallas_call(
            functools.partial(onehot_kernel, reps=args.reps, rows=rows,
                              qp=qp),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        variants['dyngather'] = pl.pallas_call(
            functools.partial(dyngather_kernel, reps=args.reps, rows=rows,
                              qp=qp),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((rows, lanes), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        for vname, call in variants.items():
            @jax.jit
            def chain(idx, tab, call=call):
                def body(carry, _):
                    o = call(idx, carry[:qp] if carry.shape[0] != qp
                             else carry)
                    nxt = o[:qp, :lanes].astype(dt)
                    return nxt, o.mean()
                _, outs = jax.lax.scan(body, tab, None, length=args.iters)
                return outs

            try:
                chain(idx, tab).block_until_ready()
                t0 = time.perf_counter()
                chain(idx, tab).block_until_ready()
                dt_s = (time.perf_counter() - t0) / (args.iters * args.reps)
                macs = rows * qp * lanes
                tf = 2 * macs / dt_s / 1e12
                gb = rows * lanes * jnp.dtype(dt).itemsize / dt_s / 1e9
                print(f'{name} {vname:10s}: {dt_s * 1e6:9.2f} us/select '
                      f'({tf:6.1f} TF/s-equiv, {gb:7.1f} GB/s copy)',
                      flush=True)
            except Exception as e:
                print(f'{name} {vname:10s}: FAILED {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
