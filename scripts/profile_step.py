"""Capture a jax.profiler trace of the flagship inference (or training) step
and print a per-op duration summary from the trace-viewer JSON.

Usage: python scripts/profile_step.py [--train] [--topk 40]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = '/tmp/epn_trace'


def run_flagship(train=False, kanchor=60, model_name='cls_so3net_pn',
                 batch=None):
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(train)

    opt = default_opt(**{'model.model': model_name,
                         'model.input_num': 1024,
                         'model.kanchor': kanchor,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    if batch is None:
        batch = 12 if train else 32
    x = jnp.asarray(rng.randn(batch, 1024, 3).astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)

    if train:
        from functools import partial
        from epn_pointcloud_tpu import losses
        from epn_pointcloud_tpu.parallel import (create_train_state,
                                                 make_lr_schedule)
        label = jnp.asarray(rng.randint(0, 40, batch))
        rlabel = jnp.asarray(rng.randint(0, 60, batch))
        state = create_train_state(model, variables, make_lr_schedule(1e-3))

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, pc, label, rlabel):
            def loss_fn(params):
                (pred, feat), mut = state.apply_fn(
                    {'params': params, 'batch_stats': state.batch_stats}, pc,
                    None, train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.PRNGKey(0)})
                loss, aux = losses.attention_cross_entropy(pred, label, feat,
                                                           rlabel)
                return loss, (aux, mut)
            grads, (aux, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            return state.replace(batch_stats=mut['batch_stats']), aux['cls_loss']

        state, _ = step(state, x, label, rlabel)
        state, _ = step(state, x, label, rlabel)
        jax.block_until_ready(state.params)
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(3):
                state, loss = step(state, x, label, rlabel)
            jax.block_until_ready(loss)
    else:
        @jax.jit
        def fwd(x):
            return model.apply(variables, x, train=False)[0]
        fwd(x).block_until_ready()
        fwd(x).block_until_ready()
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(5):
                out = fwd(x)
            out.block_until_ready()


def summarize(topk=40, full=False):
    files = glob.glob(TRACE_DIR + '/**/*.trace.json.gz', recursive=True)
    assert files, f'no trace under {TRACE_DIR}'
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # device-side complete events: pid with 'TPU' in process name
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    dev_pids = {p for p, n in pid_names.items()
                if 'TPU' in n or 'tpu' in n or '/device' in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        name = e.get('name', '')
        dur = e.get('dur', 0) / 1e3  # ms
        # strip fusion suffixes/uids (keep full names under --full)
        base = name if full else re.sub(r'[.\d]+$', '', name)
        tot[base] += dur
        cnt[base] += 1
        wall += dur
    print(f'trace: {path}')
    print(f'total device-op time: {wall:.1f} ms (across iters)')
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:topk]
    for name, ms in rows:
        print(f'{ms:9.2f} ms  x{cnt[name]:<4d} {name[:110]}')


if __name__ == '__main__':
    train = '--train' in sys.argv
    topk = 40
    kanchor = 60
    model_name = 'cls_so3net_pn'
    batch = None
    if '--topk' in sys.argv:
        topk = int(sys.argv[sys.argv.index('--topk') + 1])
    if '--kanchor' in sys.argv:
        kanchor = int(sys.argv[sys.argv.index('--kanchor') + 1])
    if '--model' in sys.argv:
        model_name = sys.argv[sys.argv.index('--model') + 1]
    if '--batch' in sys.argv:
        batch = int(sys.argv[sys.argv.index('--batch') + 1])
    if '--summarize-only' not in sys.argv:
        run_flagship(train=train, kanchor=kanchor, model_name=model_name,
                     batch=batch)
    summarize(topk, full='--full' in sys.argv)
