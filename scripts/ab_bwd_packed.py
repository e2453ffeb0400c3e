"""A/B the packed vs standard split-backward kernels for one layer shape on
the real chip (device-trace timing via bench_wbwd.device_ms)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from epn_pointcloud_tpu.ops.pallas import inter_conv as ic
from bench_wbwd import device_ms

K, NA, SIGMA = 24, 60, 0.1
CASES = {  # name: (B, p2, q, nn, c, d, AC)
    'b0l1': (12, 512, 512, 16, 64, 64, 10),
    'b1l0': (12, 256, 512, 32, 64, 128, 30),
    'ib1l0': (48, 256, 512, 64, 32, 64, 20),
    'ib0l1': (48, 512, 512, 32, 32, 32, 20),
    'ib1l1': (48, 256, 256, 32, 64, 64, 30),
    'ib2l0': (48, 128, 256, 64, 64, 128, 30),
}


def main():
    name = sys.argv[1]
    modes = sys.argv[2:] or ['1', '0']
    B, p, q, nn, c, d, AC = CASES[name]
    nt, tp, kt, _ = ic.plan(nn, K)
    rng = np.random.RandomState(0)
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
    for mode in modes:
        # modes: '1' both halves packed, '0' neither, 'dtab'/'dw2' only
        # that, 'merged' = one-kernel backward
        if mode == 'merged':
            ms = device_ms(lambda *a: ic._call_gather_w_bwd(
                a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC,
                False, c, d), gx8, idx3, tab, rk8k, w2, dout)
            print(f'{name} b{B} AC={AC} merged: bwd {ms:.2f} ms', flush=True)
            continue
        if mode in ('0', '1'):
            ic.set_packed_mode(bool(int(mode)))
            ic.set_packed_bwd(None, None)
        else:
            ic.set_packed_mode(True)
            ic.set_packed_bwd(dtab=(mode == 'dtab'), dw2=(mode == 'dw2'))
        ms = device_ms(lambda *a: ic._call_gather_w_bwd_split(
            a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC,
            False, c, d), gx8, idx3, tab, rk8k, w2, dout)
        print(f'{name} b{B} AC={AC} packed={mode}: split bwd {ms:.2f} ms',
              flush=True)
    ic.set_packed_mode('auto')
    ic.set_packed_bwd(None, None)


if __name__ == '__main__':
    main()
