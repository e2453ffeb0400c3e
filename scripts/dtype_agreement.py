"""bf16-vs-fp32 numerics on FIXED weights (the production-precision caveat).

Measures, on identical weights and inputs (flagship cls + 3DMatch inv
models), the logit cosine / top-1 agreement and descriptor cosine between
the production bf16 mode (`ops.so3conv.set_compute_dtype('bf16')`) and the
fp32 parity mode. Companion to the kanchor accuracy sweep's --dtype runs
(scripts/kanchor_sweep.py), which measure the end-to-end trained-accuracy
delta. Run on TPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cos(a, b):
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


def run(model_name: str, batch: int):
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    opt = default_opt(**{'model.model': model_name,
                         'model.input_num': 1024,
                         'model.kanchor': 60,
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    v = rng.randn(batch, 1024, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = rng.rand(batch, 1024, 1).astype(np.float32) ** (1 / 3)
    x = jnp.asarray(v * r)
    variables = jax.jit(lambda r_, x_: model.init(r_, x_, train=False))(
        jax.random.PRNGKey(0), x)

    outs = {}
    for dt in ('fp32', 'bf16'):
        so3conv.set_compute_dtype(dt)
        y = jax.jit(lambda x_: model.apply(variables, x_, train=False)[0])(x)
        outs[dt] = np.asarray(y, np.float32)
    so3conv.set_compute_dtype('fp32')
    cos = _cos(outs['fp32'], outs['bf16'])
    row = {'model': model_name, 'batch': batch,
           'cosine_min': float(cos.min()), 'cosine_mean': float(cos.mean())}
    if model_name == 'cls_so3net_pn':
        row['top1_agreement'] = float(
            (outs['fp32'].argmax(-1) == outs['bf16'].argmax(-1)).mean())
    return row


def main():
    import json
    for name, b in (('cls_so3net_pn', 32), ('inv_so3net_pn', 16)):
        print(json.dumps(run(name, b)), flush=True)


if __name__ == '__main__':
    main()
