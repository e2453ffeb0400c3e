"""Microbench: W-fused inter-conv forward vs fully-fused backward kernel,
per flagship layer at the training batch (b=12). Times via device trace."""
import glob, gzip, json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from epn_pointcloud_tpu.ops.pallas import inter_conv as ic

LAYERS = [  # (name, p2, q, nn, c_in, d_out)
    ('B0L1', 512, 512, 16, 64, 64),
    ('B1L0', 256, 512, 32, 64, 128),
    ('B1L1', 256, 256, 16, 128, 128),
    ('B2L0', 128, 256, 32, 128, 256),
    ('B2L1', 128, 128, 16, 256, 256),
    ('B3L0', 64, 128, 32, 256, 256),
]
NA, K, AC, B, SIGMA = 60, 24, 20, 12, 0.1

def device_ms(fn, *args, reps=3):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    os.system('rm -rf /tmp/prof_wb')
    with jax.profiler.trace('/tmp/prof_wb'):
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        time.sleep(0.2)
    tot = 0.0
    for fp in glob.glob('/tmp/prof_wb/**/*.trace.json.gz', recursive=True):
        with gzip.open(fp, 'rt') as fh:
            d = json.load(fh)
        pids = {e['pid'] for e in d.get('traceEvents', [])
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and ('TPU' in e['args'].get('name','') or '/device' in e['args'].get('name',''))}
        for e in d.get('traceEvents', []):
            if e.get('ph') == 'X' and e.get('pid') in pids and 'custom-call' in str(e.get('args',{}).get('long_name','')):
                tot += e['dur']
    return tot / reps / 1e3

def main():
    assert jax.default_backend() == 'tpu'
    rng = np.random.RandomState(0)
    for name, p, q, nn, c, d in LAYERS:
        nt, tp, kt, _ = ic.plan(nn, K)
        gx = jnp.asarray(rng.randn(B, p, nn, 3).astype(np.float32) * 0.3)
        gx8 = ic.make_gx8(gx, nt)
        anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
        ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
        rk = jnp.einsum('aij,kj->aki', anch, ker)
        k2 = jnp.sum(ker ** 2, -1)
        rk8 = ic.make_rk8(rk, k2, tp, kt, SIGMA)
        rk8k = ic.make_rk8_kmajor(rk, k2, tp, kt, SIGMA)
        qp = -(-q // 8) * 8
        tab = jnp.asarray(rng.randn(B, qp, NA * c)).astype(jnp.bfloat16)
        idxn = rng.randint(0, q, size=(B, p, nn)).astype(np.int32)
        idxn = np.pad(idxn, ((0,0),(0,0),(0,nt-nn)), constant_values=q)
        idx3 = jnp.asarray(idxn.reshape(B, 1, p * nt))
        w2 = jnp.asarray(rng.randn(kt * c, d)).astype(jnp.bfloat16)
        dout = jnp.asarray(rng.randn(B, p, NA * d)).astype(jnp.bfloat16)

        fwd_ms = device_ms(lambda *a: ic.fused_gather_conv_w(
            a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC, False),
            gx8, idx3, tab, rk8k, rk8, w2)
        bwd_call = (ic._call_gather_w_bwd_split
                    if tp <= ic._BWD_SPLIT_TP_MAX else ic._call_gather_w_bwd)
        bwd_ms = device_ms(lambda *a: bwd_call(
            a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC, False, c, d),
            gx8, idx3, tab, rk8k, w2, dout)
        print(f'{name}: fwd {fwd_ms:6.2f} ms   bwd {bwd_ms:6.2f} ms   ratio {bwd_ms/max(fwd_ms,1e-9):.2f}')


def sweep():
    import epn_pointcloud_tpu.ops.pallas.inter_conv as icm
    rng = np.random.RandomState(0)
    for name, p, q, nn, c, d in LAYERS:
        nt, tp, kt, _ = ic.plan(nn, K)
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
        idxn = np.pad(idxn, ((0,0),(0,0),(0,nt-nn)), constant_values=q)
        idx3 = jnp.asarray(idxn.reshape(B, 1, p * nt))
        w2 = jnp.asarray(rng.randn(kt * c, d)).astype(jnp.bfloat16)
        dout = jnp.asarray(rng.randn(B, p, NA * d)).astype(jnp.bfloat16)
        row = []
        for mult in (2, 4, 8, 16):
            icm._BWD_BUDGET_MULT = mult
            ms = device_ms(lambda *a: ic._call_gather_w_bwd(
                a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC,
                False, c, d), gx8, idx3, tab, rk8k, w2, dout)
            row.append(f'x{mult}: {ms:6.2f}')
        print(f'{name}: ' + '  '.join(row))

if 'sweep' in sys.argv:
    main = sweep


def sweep_fwd():
    import epn_pointcloud_tpu.ops.pallas.inter_conv as icm
    rng = np.random.RandomState(0)
    for name, p, q, nn, c, d in LAYERS:
        nt, tp, kt, _ = ic.plan(nn, K)
        gx = jnp.asarray(rng.randn(B, p, nn, 3).astype(np.float32) * 0.3)
        gx8 = ic.make_gx8(gx, nt)
        anch = jnp.asarray(rng.randn(NA, 3, 3).astype(np.float32))
        ker = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 0.3)
        rk = jnp.einsum('aij,kj->aki', anch, ker)
        k2 = jnp.sum(ker ** 2, -1)
        rk8 = ic.make_rk8(rk, k2, tp, kt, SIGMA)
        rk8k = ic.make_rk8_kmajor(rk, k2, tp, kt, SIGMA)
        qp = -(-q // 8) * 8
        tab = jnp.asarray(rng.randn(B, qp, NA * c)).astype(jnp.bfloat16)
        idxn = rng.randint(0, q, size=(B, p, nn)).astype(np.int32)
        idxn = np.pad(idxn, ((0,0),(0,0),(0,nt-nn)), constant_values=q)
        idx3 = jnp.asarray(idxn.reshape(B, 1, p * nt))
        w2 = jnp.asarray(rng.randn(kt * c, d)).astype(jnp.bfloat16)
        row = []
        for mb in (5, 10, 20, 40):
            icm.set_vmem_budget(mb * 2 ** 20)
            ms = device_ms(lambda *a: ic.fused_gather_conv_w(
                a[0], a[1], a[2], a[3], a[4], a[5], SIGMA, tp, kt, nt, AC, False),
                gx8, idx3, tab, rk8k, rk8, w2)
            row.append(f'{mb}MB: {ms:5.2f}')
        icm.set_vmem_budget(10 * 2 ** 20)
        print(f'{name}: ' + '  '.join(row))


if __name__ == '__main__':
    (sweep_fwd if 'fwd' in sys.argv else sweep if 'sweep' in sys.argv else main)()
