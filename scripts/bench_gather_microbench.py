"""Microbenchmark: strategies for the per-layer feature megagather.

The inter-conv layers gather [b, p*nt] rows of width na*c+8 from a
[b, q, na*c+8] support table (~2 GB/layer/step on the flagship bench).
XLA's TPU gather runs at ~160 GB/s — far under HBM. Candidates measured
here on the real chip:

  xla_gather     take_along_axis (current production path)
  xla_onehot     one-hot einsum at the XLA level (materializes S)
  pallas_onehot  in-kernel one-hot build + MXU GEMM (the fused-kernel plan:
                 S stays in VMEM, support block re-read per point block)
  gemm_calib     plain big GEMM of the same FLOP count (MXU calibration)

Run: python scripts/bench_gather_microbench.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=10, warmup=2):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    # chain via a scan with a data dependency so the tunnel can't hide work
    def body(carry, _):
        o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return carry + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, None

    chained = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                           length=iters)[0])
    chained()  # compile
    t0 = time.perf_counter()
    r = chained()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def make_inputs(b, p, nt, q, L, dtype):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(b, q, L).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, q, size=(b, p * nt)).astype(np.int32))
    return table, idx


def xla_gather(table, idx):
    return jnp.take_along_axis(table, idx[:, :, None], axis=1,
                               mode='promise_in_bounds')


def xla_onehot(table, idx, q_pad):
    S = jax.nn.one_hot(idx, q_pad, dtype=table.dtype)        # [b, r, q~]
    tp = jnp.pad(table, ((0, 0), (0, q_pad - table.shape[1]), (0, 0)))
    return jnp.einsum('brq,bql->brl', S, tp,
                      preferred_element_type=jnp.float32).astype(table.dtype)


def _onehot_kernel(idx_ref, table_ref, out_ref, *, q_pad, rows):
    idxv = idx_ref[0, 0]                                     # [rows] int32
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, q_pad), 1)
    S = (iot == idxv[:, None]).astype(table_ref.dtype)       # [rows, q~]
    out_ref[0] = jax.lax.dot_general(
        S, table_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def pallas_onehot(table, idx, q_pad, rows_blk):
    b, q, L = table.shape
    r = idx.shape[1]
    tablep = jnp.pad(table, ((0, 0), (0, q_pad - q), (0, 0)))
    idx3 = idx.reshape(b, 1, r)
    out_shape = jax.ShapeDtypeStruct((b, r, L), table.dtype)
    return pl.pallas_call(
        functools.partial(_onehot_kernel, q_pad=q_pad, rows=rows_blk),
        grid=(b, r // rows_blk),
        in_specs=[
            pl.BlockSpec((1, 1, rows_blk), lambda bb, rr: (bb, 0, rr)),
            pl.BlockSpec((1, q_pad, L), lambda bb, rr: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_blk, L), lambda bb, rr: (bb, rr, 0)),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * q_pad * L,
            bytes_accessed=table.size * table.dtype.itemsize
            + b * r * L * table.dtype.itemsize,
            transcendentals=0),
    )(idx3, tablep)


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    b, p, nt, q, na, c = 32, 512, 16, 513, 60, 64
    L = na * c + 8
    q_pad = 640  # 513 -> multiple of 128 for clean tiling
    for dtype in (jnp.bfloat16,):
        table, idx = make_inputs(b, p, nt, q, L, dtype)
        rows = b * p * nt
        gbytes = rows * L * np.dtype(dtype).itemsize / 1e9

        t = timed(lambda tb, ix: xla_gather(tb, ix), table, idx)
        print(f'xla_gather    {t*1e3:8.2f} ms   {gbytes/t:7.1f} GB/s')

        t = timed(lambda tb, ix: xla_onehot(tb, ix, q_pad), table, idx)
        fl = 2 * rows * q_pad * L
        print(f'xla_onehot    {t*1e3:8.2f} ms   {gbytes/t:7.1f} GB/s '
              f'{fl/t/1e12:6.1f} TF/s')

        for rows_blk in (256, 512, 1024):
            t = timed(lambda tb, ix: pallas_onehot(tb, ix, q_pad, rows_blk),
                      table, idx)
            print(f'pallas_onehot rows_blk={rows_blk:5d} {t*1e3:8.2f} ms   '
                  f'{gbytes/t:7.1f} GB/s {fl/t/1e12:6.1f} TF/s')

        # MXU calibration GEMM: same contraction shape per batch elem
        A = jnp.asarray(np.random.randn(8192, 1024).astype(np.float32)).astype(dtype)
        B = jnp.asarray(np.random.randn(1024, L).astype(np.float32)).astype(dtype)

        def calib(A, B):
            def body(carry, _):
                o = jax.lax.dot(carry, B, preferred_element_type=jnp.float32)
                return (A + o[:1, :1024].astype(A.dtype) * 1e-30), None
            return jax.lax.scan(body, A, None, length=32)[0]

        t = timed(calib, A, B)
        fl = 2 * 32 * 8192 * 1024 * L
        print(f'gemm_calib    {t*1e3:8.2f} ms   {fl/t/1e12:6.1f} TF/s')


if __name__ == '__main__':
    main()
