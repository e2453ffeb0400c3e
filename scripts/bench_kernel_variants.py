"""Microbenchmark harness for the Pallas inter-conv kernel variants.

Times fused_gather_neighbor_conv (and the unfused fused_neighbor_conv) on
the flagship layer shapes via jax.profiler device timings (wall timing lies
through the tunnel). Run on TPU:  python scripts/bench_kernel_variants.py
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

# flagship cls layers: (name, p, q, nn, c_in, b)
LAYERS = [
    ('B0L1', 512, 513, 16, 64, 32),
    ('B1L0', 256, 513, 32, 64, 32),
    ('B1L1', 256, 257, 16, 128, 32),
    ('B2L0', 128, 257, 32, 128, 32),
    ('B2L1', 128, 129, 16, 256, 32),
    ('B3L0', 64, 129, 32, 256, 32),
]
NA, K, AC = 60, 24, 20
SIGMA = 0.1


def device_ms(fn, *args, reps=3):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    os.system('rm -rf /tmp/prof_kv')
    with jax.profiler.trace('/tmp/prof_kv'):
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        time.sleep(0.2)
    tot = 0.0
    for fp in glob.glob('/tmp/prof_kv/**/*.trace.json.gz', recursive=True):
        with gzip.open(fp, 'rt') as fh:
            d = json.load(fh)
        for e in d.get('traceEvents', []):
            if e.get('ph') == 'X' and e.get('pid') == 3 and e.get('tid') == 3:
                tot += e['dur']
    return tot / reps / 1e3


def layer_inputs(p, q, nn, c, b, seed=0):
    rng = np.random.RandomState(seed)
    nt, tp, kt, _ = ic.plan(nn, K)
    gx = jnp.asarray(rng.randn(b, p, nn, 3).astype(np.float32) * 0.3)
    gx8 = ic.make_gx8(gx, nt)
    anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
    ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
    rk = jnp.einsum('aij,kj->aki', anch, ker)
    rk8 = ic.make_rk8(rk, jnp.sum(ker ** 2, -1), tp, kt)
    qp = -(-q // 8) * 8
    tab = jnp.asarray(rng.randn(b, qp, NA * c).astype(np.float32)).astype(jnp.bfloat16)
    idx = rng.randint(0, q, size=(b, p, nn)).astype(np.int32)
    idx = jnp.asarray(np.pad(idx, ((0, 0), (0, 0), (0, nt - nn)),
                             constant_values=q - 1))
    idx3 = idx.reshape(b, 1, p * nt)
    return gx8, idx3, tab, rk8, (nt, tp, kt, qp)


def main():
    assert jax.default_backend() == 'tpu'
    total = 0.0
    for name, p, q, nn, c, b in LAYERS:
        gx8, idx3, tab, rk8, (nt, tp, kt, qp) = layer_inputs(p, q, nn, c, b)
        ms = device_ms(
            lambda gx8, idx3, tab, rk8: ic.fused_gather_neighbor_conv(
                gx8, idx3, tab, rk8, SIGMA, tp, kt, nt, AC, False),
            gx8, idx3, tab, rk8)
        bd_flops = 2 * b * p * NA * (tp * kt) * nt * c
        s_flops = 2 * b * p * nt * qp * NA * c
        print(f'{name}: {ms:7.2f} ms   bd+s flops {(bd_flops+s_flops)/1e9:7.0f} G '
              f'-> {(bd_flops+s_flops)/ms/1e9:6.1f} TF/s')
        total += ms
    print(f'total kernel: {total:.1f} ms')


if __name__ == '__main__':
    main()


def main_w():
    """Per-layer device time of fused_gather_conv_w (+ implied learned GEMM)."""
    assert jax.default_backend() == 'tpu'
    total = 0.0
    for name, p, q, nn, c, b in LAYERS:
        d = {'B0L1': 64, 'B1L0': 128, 'B1L1': 128, 'B2L0': 256,
             'B2L1': 256, 'B3L0': 256}[name]
        gx8, idx3, tab, rk8, (nt, tp, kt, qp) = layer_inputs(p, q, nn, c, b)
        rng = np.random.RandomState(1)
        anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
        ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
        rk = jnp.einsum('aij,kj->aki', anch, ker)
        rk8k = ic.make_rk8_kmajor(rk, jnp.sum(ker ** 2, -1), tp, kt)
        w2 = jnp.asarray(rng.randn(kt * c, d).astype(np.float32) * 0.05
                         ).astype(jnp.bfloat16)
        ms = device_ms(
            lambda gx8, idx3, tab, rk8k, w2: ic.fused_gather_conv_w(
                gx8, idx3, tab, rk8k, rk8, w2, SIGMA, tp, kt, nt, AC, False),
            gx8, idx3, tab, rk8k, w2)
        bd = 2 * b * p * NA * (tp * kt) * nt * c
        s = 2 * b * p * nt * qp * NA * c
        lg = 2 * b * p * NA * kt * c * d
        d2f = 2 * b * p * nt * (tp * kt) * 16 * NA
        print(f'{name}: {ms:7.2f} ms  bd {bd/1e9:5.0f}G s {s/1e9:5.0f}G '
              f'learned {lg/1e9:5.0f}G d2 {d2f/1e9:5.0f}G '
              f'-> {(bd+s+lg+d2f)/ms/1e9:6.1f} TF/s')
        total += ms
    print(f'total W-fused kernel: {total:.1f} ms')


if __name__ == '__main__' and os.environ.get('BENCH_W'):
    main_w()
