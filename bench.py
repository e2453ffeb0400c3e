"""Benchmark: flagship-model inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: BASELINE.json configs[1] — ModelNet40 classification, full
60-anchor icosahedral group, 1024-point clouds, batch 32, single chip.
vs_baseline is measured against the driver target of 10,000 clouds/sec/chip
(the reference publishes no throughput numbers; BASELINE.md).

Extra per-config numbers go to stderr; the JSON contract line is stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_CLOUDS_PER_SEC = 10_000.0


def bench_forward(batch=32, input_num=1024, kanchor=60, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    # production precision: bf16 neighbor-feature stream + conv weights with
    # fp32 accumulation (parity tests run the fp32 default)
    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)  # inference: no activation memory to save

    opt = default_opt(**{'model.model': 'cls_so3net_pn',
                         'model.input_num': input_num,
                         'model.kanchor': kanchor,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, input_num, 3).astype(np.float32))
    init_fn = jax.jit(lambda rng, x: model.init(rng, x, train=False))
    variables = init_fn(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(x):
        logits, _ = model.apply(variables, x, train=False)
        return logits

    # compile + warmup
    for _ in range(warmup):
        fwd(x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_train(batch=12, input_num=1024, kanchor=60, iters=10):
    """Training-step throughput at the reference training batch
    (run_modelnet.py:10) — reported to stderr when BENCH_EXTRA=1."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import losses, models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv
    from epn_pointcloud_tpu.parallel import create_train_state, make_lr_schedule

    so3conv.set_compute_dtype('bf16')   # production precision
    so3conv.set_remat(True)             # training: save activation memory

    opt = default_opt(**{'model.model': 'cls_so3net_pn',
                         'model.input_num': input_num,
                         'model.kanchor': kanchor,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, input_num, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, 40, batch))
    rlabel = jnp.asarray(rng.randint(0, kanchor, batch))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    state = create_train_state(model, variables, make_lr_schedule(1e-3))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, pc, label, rlabel):
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

    # Chain `iters` steps inside ONE dispatch (lax.scan with the state as
    # carry): per-call dispatch through the device tunnel is heavy for a
    # donated state pytree and would otherwise dominate wall time.
    @partial(jax.jit, donate_argnums=(0,))
    def train_chain(state, pc, label, rlabel):
        def body(st, _):
            st, loss = train_step(st, pc, label, rlabel)
            return st, loss
        return jax.lax.scan(body, state, None, length=iters)

    state, loss = train_step(state, x, label, rlabel)  # warm the body
    state, losses_ = train_chain(state, x, label, rlabel)
    float(losses_[-1])                                 # compile + warmup
    t0 = time.perf_counter()
    state, losses_ = train_chain(state, x, label, rlabel)
    float(losses_[-1])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_descriptor_extraction(batch=48, input_num=1024, kanchor=60,
                                iters=10):
    """3DMatch patch-descriptor extraction throughput (BASELINE configs[3]:
    inv_so3net_pn, radius-0.4 patches)."""
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)

    opt = default_opt(**{'model.model': 'inv_so3net_pn',
                         'model.input_num': input_num,
                         'model.kanchor': kanchor,
                         'model.search_radius': 0.4,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(batch, input_num, 3) * 0.2).astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=False)[0]

    fwd(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_rotation(batch=8, input_num=1024, kanchor=60, iters=10):
    """Relative-rotation regression forward throughput (BASELINE rotation-
    alignment workload: reg_so3net, pair input, run_modelnet_rotation.py
    defaults b8)."""
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    so3conv.set_compute_dtype('bf16')
    so3conv.set_remat(False)

    opt = default_opt(**{'model.model': 'reg_so3net',
                         'model.input_num': input_num,
                         'model.kanchor': kanchor,
                         'model.representation': 'quat'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 2, input_num, 3).astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(x):
        conf, y = model.apply(variables, x, train=False)
        return conf

    fwd(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_train_e2e(batch=12, iters=30):
    """END-TO-END trainer wall-clock (host data pipeline + dispatch +
    device step + deferred metrics) through the real TrainerModelNet loop
    on a synthetic on-disk dataset — the number a user's training job sees,
    vs bench_train's pure device step."""
    import tempfile

    import jax
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet
    from epn_pointcloud_tpu.data import synthetic

    root = os.path.join(tempfile.gettempdir(), 'bench_mn5_synth')
    if not os.path.exists(os.path.join(root, 'airplane')):
        synthetic.make_modelnet_tree(root, n_cats=5, n_train=24, n_test=4,
                                     n_points=2048)
    opt = default_opt(**{'dataset_path': root, 'model.input_num': 1024,
                         'model.kanchor': 60, 'model.flag': 'attention',
                         'model.model': 'cls_so3net_pn',
                         'compute_dtype': 'bf16', 'num_iterations': 5,
                         'steps_per_dispatch': 8,
                         'experiment_id': 'bench_e2e'})
    opt.batch_size = batch
    trainer = TrainerModelNet(opt)
    for _ in range(2):                        # compile + warm the pipeline
        trainer.step()
    jax.block_until_ready(trainer.state.params)
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        trainer.timer.set_point('train_iter')
        consumed = trainer.step() or 1
        trainer.summary.update(
            {'Time': trainer.timer.reset_point('train_iter') / consumed})
        if done % 12 == 0:
            trainer._print_running_stats(f'bench iter {done}')
        done += consumed
    jax.block_until_ready(trainer.state.params)
    dt = (time.perf_counter() - t0) / done
    return batch / dt, dt


def main():
    clouds_per_sec, step_time = bench_forward()
    print(f'[bench] step_time={step_time * 1e3:.2f} ms  '
          f'throughput={clouds_per_sec:.1f} clouds/s', file=sys.stderr)

    # secondary contract metrics (train + descriptor extraction): emitted as
    # additional stdout JSON lines BEFORE the primary line, so a last-line
    # parser still records the headline inference metric
    extra_lines = []
    try:
        tput, dt = bench_train()
        print(f'[bench] train step_time={dt * 1e3:.1f} ms  '
              f'throughput={tput:.1f} clouds/s (b12, attention)',
              file=sys.stderr)
        extra_lines.append({
            'metric': 'modelnet40_cls_60anchor_b12_1024pt_train_throughput',
            'value': round(tput, 2), 'unit': 'clouds/sec/chip',
            'vs_baseline': round(tput / TARGET_CLOUDS_PER_SEC, 4)})
    except Exception as e:  # never break the JSON contract
        print(f'[bench] train bench skipped: {e}', file=sys.stderr)
    try:
        dput, ddt = bench_descriptor_extraction()
        print(f'[bench] 3dmatch descriptor extraction '
              f'{dput:.1f} patches/s ({ddt * 1e3:.1f} ms @ b48)',
              file=sys.stderr)
        extra_lines.append({
            'metric': '3dmatch_inv_60anchor_b48_1024pt_descriptor_throughput',
            'value': round(dput, 2), 'unit': 'patches/sec/chip',
            'vs_baseline': round(dput / TARGET_CLOUDS_PER_SEC, 4)})
    except Exception as e:
        print(f'[bench] descriptor bench skipped: {e}', file=sys.stderr)
    try:
        gput, gdt = bench_rotation()
        print(f'[bench] rotation alignment (reg_so3net, pair b8): '
              f'{gput:.1f} pairs/s ({gdt * 1e3:.1f} ms)', file=sys.stderr)
        extra_lines.append({
            'metric': 'modelnet_rot_reg_60anchor_b8_1024pt_pair_throughput',
            'value': round(gput, 2), 'unit': 'pairs/sec/chip',
            'vs_baseline': round(gput / TARGET_CLOUDS_PER_SEC, 4)})
    except Exception as e:
        print(f'[bench] rotation bench skipped: {e}', file=sys.stderr)
    try:
        eput, edt = bench_train_e2e()
        print(f'[bench] end-to-end trainer loop {edt * 1e3:.1f} '
              f'ms/iter wall ({eput:.1f} clouds/s incl. host pipeline)',
              file=sys.stderr)
        extra_lines.append({
            'metric': 'modelnet40_cls_train_end_to_end_wall_throughput',
            'value': round(eput, 2), 'unit': 'clouds/sec/chip',
            'vs_baseline': round(eput / TARGET_CLOUDS_PER_SEC, 4)})
    except Exception as e:  # never break the JSON contract
        print(f'[bench] e2e trainer bench skipped: {e}', file=sys.stderr)

    if os.environ.get('BENCH_EXTRA'):
        rput, rdt = bench_forward(kanchor=20)
        print(f'[bench-extra] reduced config kanchor=20: '
              f'{rput:.1f} clouds/s ({rdt * 1e3:.1f} ms @ b32)',
              file=sys.stderr)

    for line in extra_lines:
        print(json.dumps(line))
    print(json.dumps({
        'metric': 'modelnet40_cls_60anchor_b32_1024pt_inference_throughput',
        'value': round(clouds_per_sec, 2),
        'unit': 'clouds/sec/chip',
        'vs_baseline': round(clouds_per_sec / TARGET_CLOUDS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
