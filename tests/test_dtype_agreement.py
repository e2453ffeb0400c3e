"""bf16-vs-fp32 production-precision agreement assertion (suite-level).

The full on-chip measurement lives in scripts/dtype_agreement.py (results in
BASELINE.md); this test asserts the same fixed-weight agreement bound on the
CPU backend so a precision-policy regression (a stray f32->bf16 cast in the
wrong place, a dropped f32 accumulation) fails in CI. The bf16 path here is
XLA's CPU bf16 emulation — same rounding semantics as the TPU MXU inputs
(round-to-nearest-even bf16 operands, f32 accumulation), so the agreement
statistic transfers.
"""

import numpy as np
import pytest


@pytest.mark.parametrize('model_name,batch,bound', [
    ('cls_so3net_pn', 4, 0.999),
    # inv descriptors: the production mode's weakest agreement (on-chip
    # min cosine 0.9664, BASELINE.md dtype table) AND the one feeding a
    # nearest-neighbor metric — a stray cast in the inv head must fail CI.
    # Bound calibrated under the 0.9664 chip measurement with CPU-emulation
    # margin. NOTE (round-5 recall study): serving dtype must match the
    # TRAINING dtype — a bf16-trained checkpoint served fp32 loses the
    # match structure entirely (recall 50% -> 0%); this bound guards the
    # fixed-weight forward agreement, not cross-dtype serving.
    ('inv_so3net_pn', 2, 0.95),
])
def test_bf16_fp32_fixed_weight_agreement(model_name, batch, bound):
    import jax
    import jax.numpy as jnp
    from epn_pointcloud_tpu import models
    from epn_pointcloud_tpu.app.config import default_opt
    from epn_pointcloud_tpu.ops import so3conv

    opt = default_opt(**{'model.model': model_name,
                         'model.input_num': 1024,
                         'model.kanchor': 20,   # CPU-friendly config
                         'model.flag': 'attention'})
    model = models.build_model_from(opt)
    rng = np.random.RandomState(0)
    v = rng.randn(batch, 1024, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    x = jnp.asarray(v * rng.rand(batch, 1024, 1).astype(np.float32) ** (1 / 3))
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=False))(
        jax.random.PRNGKey(0), x)

    outs = {}
    try:
        for dt in ('fp32', 'bf16'):
            so3conv.set_compute_dtype(dt)
            outs[dt] = np.asarray(jax.jit(
                lambda xx: model.apply(variables, xx, train=False)[0])(x),
                np.float32)
    finally:
        so3conv.set_compute_dtype('fp32')

    a = outs['fp32'].reshape(batch, -1).astype(np.float64)
    b = outs['bf16'].reshape(batch, -1).astype(np.float64)
    cos = (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-30)
    assert cos.min() >= bound, (
        f'bf16 production mode diverged from fp32: cosine min {cos.min():.6f}'
        f' < {bound} (policy: bf16 operands, f32 accumulation — see '
        f'BASELINE.md dtype table)')
