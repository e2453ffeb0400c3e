"""Microbench: intra-conv Pallas forward/backward per flagship layer (b=12)."""
import glob, gzip, json, os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from epn_pointcloud_tpu.ops.pallas import intra_conv as icx
from epn_pointcloud_tpu.ops import icosahedron

LAYERS = [('B0', 512, 64), ('B0b', 512, 64), ('B1', 256, 128),
          ('B1b', 256, 128), ('B2', 128, 256), ('B2b', 128, 256),
          ('B3', 64, 256)]
B, NA, NK = 12, 60, 12

def device_ms(fn, *args, reps=3):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    os.system('rm -rf /tmp/prof_ix')
    with jax.profiler.trace('/tmp/prof_ix'):
        for _ in range(reps):
            o = f(*args)
        jax.block_until_ready(o)
        time.sleep(0.2)
    tot = 0.0
    for fp in glob.glob('/tmp/prof_ix/**/*.trace.json.gz', recursive=True):
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
    ti = icosahedron.get_intra_idx()
    ti_t = tuple(tuple(int(v) for v in r) for r in np.asarray(ti))
    rng = np.random.RandomState(0)
    tf, tb = 0., 0.
    for name, p, c in LAYERS:
        d = c
        f = jnp.asarray(rng.randn(B, p, NA * c)).astype(jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(c, NK * d)).astype(jnp.bfloat16)
        do = jnp.asarray(rng.randn(B, p, NA * d)).astype(jnp.bfloat16)
        fwd_ms = device_ms(lambda f, w2: icx.intra_conv(f, w2, ti_t), f, w2)
        bwd_ms = device_ms(
            lambda f, do, w2: icx._bwd_pallas(f, do, w2, np.asarray(ti_t), 64, False),
            f, do, w2)
        tf += fwd_ms; tb += bwd_ms
        print(f'{name} p={p} c={c}: fwd {fwd_ms:6.2f} ms  bwd {bwd_ms:6.2f} ms  ratio {bwd_ms/max(fwd_ms,1e-9):.2f}')
    print(f'total fwd {tf:.2f}  bwd {tb:.2f}')


def sweep():
    ti = icosahedron.get_intra_idx()
    rng = np.random.RandomState(0)
    for name, p, c in [('B0', 512, 64), ('B1', 256, 128), ('B2', 128, 256), ('B3', 64, 256)]:
        d = c
        f = jnp.asarray(rng.randn(B, p, NA * c)).astype(jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(c, NK * d)).astype(jnp.bfloat16)
        do = jnp.asarray(rng.randn(B, p, NA * d)).astype(jnp.bfloat16)
        row = []
        for cap, t in ((12, 64), (24, 64), (48, 64), (24, 128), (48, 128)):
            icx._FALL_CAP_MB = cap
            try:
                ms = device_ms(lambda f, do, w2: icx._bwd_pallas(f, do, w2, np.asarray(ti), t, False), f, do, w2)
                row.append(f'cap{cap}/t{t}: {ms:5.2f}')
            except Exception as e:
                row.append(f'cap{cap}/t{t}: FAIL')
        print(f'{name} p={p} c={c}: ' + '  '.join(row))

if __name__ == '__main__':
    (sweep if 'sweep' in sys.argv else main)()
