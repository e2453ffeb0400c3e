"""On-chip model-variant sweep: drives kanchor {1,20,40,60}, kpconv, and
fp32-vs-bf16 train/forward configs on the REAL TPU. CPU interpret tests
cannot catch Mosaic VMEM OOMs (the fp32 c=256 intra-conv backward OOM
shipped green through the suite) — run this after kernel/tiling changes:

  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python scripts/variant_sweep.py
"""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from epn_pointcloud_tpu import models, losses
from epn_pointcloud_tpu.app.config import default_opt
from epn_pointcloud_tpu.ops import so3conv
from epn_pointcloud_tpu.parallel import create_train_state, make_lr_schedule

def drive(name, kanchor=60, kpconv=False, dtype='bf16', train=False, batch=4,
          model_name='cls_so3net_pn', input_num=1024):
    so3conv.set_compute_dtype(dtype)
    so3conv.set_remat(train)
    ov = {'model.model': model_name, 'model.input_num': input_num,
          'model.kanchor': kanchor, 'model.flag': 'attention'}
    opt = default_opt(**ov)
    if kpconv:
        opt.model.kpconv = True
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, input_num, 3).astype(np.float32))
    t0 = time.time()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), x)
    if not train:
        out = jax.jit(lambda x: model.apply(variables, x, train=False)[0])(x)
        jax.block_until_ready(out)
        assert np.isfinite(np.asarray(out)).all()
        print(f'{name}: fwd OK {tuple(out.shape)} ({time.time()-t0:.0f}s)', flush=True)
        return
    label = jnp.asarray(rng.randint(0, 40, batch))
    rlabel = jnp.asarray(rng.randint(0, kanchor, batch))
    state = create_train_state(model, variables, make_lr_schedule(1e-3))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, pc, label, rlabel):
        def loss_fn(params):
            (pred, feat), mut = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats}, pc,
                None, train=True, mutable=['batch_stats'],
                rngs={'dropout': jax.random.PRNGKey(0)})
            loss, aux = losses.attention_cross_entropy(pred, label, feat, rlabel)
            return loss, (aux, mut)
        grads, (aux, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=mut['batch_stats']), aux['cls_loss']

    state, loss = step(state, x, label, rlabel)
    lv = float(loss)
    assert np.isfinite(lv), lv
    print(f'{name}: train OK loss={lv:.3f} ({time.time()-t0:.0f}s)', flush=True)

drive('cls kanchor=40 bf16 fwd', kanchor=40)
drive('cls kanchor=20 bf16 train', kanchor=20, train=True)
drive('cls kanchor=1 bf16 fwd', kanchor=1)
drive('cls kpconv bf16 fwd', kpconv=True)
drive('cls kanchor=60 fp32 train b4', dtype='fp32', train=True)
drive('cls kanchor=40 fp32 train b4', kanchor=40, dtype='fp32', train=True)
print('variant sweep complete')
