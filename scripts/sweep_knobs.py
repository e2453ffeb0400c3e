"""Full-model forward-throughput sweep over the Pallas inter-conv knobs
(anchor chunk / VMEM budget / kg lane target / pair / gpk) at a given
kanchor — the dedicated kanchor=20/40 optimization pass (round-4 item #3).

Traces every knob combo up front (knob globals only affect tracing), then
compiles ALL executables concurrently (remote compiles parallelize ~2x),
then times serially with the chained-scan + float() readback method.

Usage:
  python scripts/sweep_knobs.py --kanchor 20 --batch 32 \
      --combos "chunk=10;chunk=20;chunk=20,budget=20;chunk=20,kg=1024"
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_combo(s: str) -> dict:
    out = {}
    if s:
        for kv in s.split(','):
            k, v = kv.split('=')
            out[k.strip()] = float(v) if '.' in v else int(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kanchor', type=int, default=20)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--input-num', type=int, default=1024)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--model', default='cls_so3net_pn')
    ap.add_argument('--combos', default='')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv
    from epn_pointcloud_tpu.ops.pallas import inter_conv as plic

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)

    combos = [parse_combo(c) for c in args.combos.split(';')] or [{}]

    rng = np.random.RandomState(0)
    x_np = rng.randn(args.batch, args.input_num, 3).astype(np.float32)
    x = jnp.asarray(x_np)
    extra = ({'model.flag': 'attention'}
             if args.model != 'reg_so3net' else
             {'model.representation': 'quat'})
    opt = default_opt(**{'model.model': args.model,
                         'model.input_num': args.input_num,
                         'model.kanchor': args.kanchor, **extra})

    def apply_knobs(combo):
        plic.set_vmem_budget(int(combo.get('budget', 10) * 1024 * 1024))
        plic.set_kg_target(int(combo.get('kg', 512)))
        plic.set_pair(bool(combo.get('pair', 1)))
        packed = combo.get('packed', 'auto')
        plic.set_packed_mode(packed if packed == 'auto' else bool(packed))
        plic.set_packed_srows(int(combo.get('srows', 8)))
        so3conv.set_anchor_chunk_override(int(combo.get('chunk', 0)) or None)

    # trace all combos (host-only; knob globals are baked in at trace time)
    lowered = []
    model = models.build_model_from(opt)
    variables = None
    for combo in combos:
        apply_knobs(combo)
        if variables is None:
            variables = jax.jit(
                lambda r, xx: model.init(r, xx, train=False))(
                    jax.random.PRNGKey(0), x)

        def chain(v, xx):
            def body(c, _):
                out = model.apply(v, c, train=False)
                out = out[0] if isinstance(out, tuple) else out
                dep = (jnp.mean(out.astype(jnp.float32)) * 1e-24
                       ).astype(c.dtype)
                return c + dep, ()
            cfin, _ = jax.lax.scan(body, xx, None, length=args.iters)
            return jnp.sum(cfin)
        lowered.append(jax.jit(chain).lower(
            jax.eval_shape(lambda: variables), x))
        print(f'traced {combo}', flush=True)

    # concurrent remote compiles
    with ThreadPoolExecutor(min(4, len(lowered))) as ex:
        compiled = list(ex.map(lambda lo: lo.compile(), lowered))
    print('compiled all', flush=True)

    # serial timing: chain closed by a float() readback, ~23 ms RTT off
    for combo, comp in zip(combos, compiled):
        float(comp(variables, x))        # warm upload
        t0 = time.perf_counter()
        float(comp(variables, x))
        dt = (time.perf_counter() - t0 - 0.023) / args.iters
        print(f'k{args.kanchor} b{args.batch} {combo}: {dt * 1e3:.2f} '
              f'ms/step = {args.batch / dt:.1f} clouds/s', flush=True)


if __name__ == '__main__':
    main()
