"""Pallas TPU kernel: per-lane moment partials for normalization layers.

Why: InstanceNorm/BatchNorm stats are reductions over the point (and anchor)
axes of [b, p, a, c] activations. XLA lowers those 4D reduces with a p-minor
layout preference, which forces a pathological layout copy of the activation
tensor at every norm (~0.6 ms per layer, 6.6 ms/step on the flagship model —
profiled; the tensors themselves are only ~0.15 ms of HBM bandwidth). This
kernel reads the activation in its natural packed [b, rows, L] layout, one
row-tile per grid step, and accumulates f32 per-lane sum / sum-of-squares in
VMEM-resident output blocks (grid-constant index maps — the dW/dtab pattern).
The tiny [b, L] results are then folded to per-(b, c) or per-c statistics in
XLA at negligible cost, and the normalize itself becomes a pure elementwise
op that fuses into neighboring producers/consumers with no layout churn.

Reference norm semantics being served: torch nn.InstanceNorm2d(affine=False)
/ nn.BatchNorm2d (vgtk base_so3conv.py:107) — the statistics themselves are
computed by the callers in nn/layers.py from these partials.

Backward is pure elementwise XLA (dx = dsum + 2*x*dsq), defined as a custom
VJP so the forward kernel stays opaque to autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sum_ref, sq_ref):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)          # [T, L]
    sum_ref[0, 0, :] += jnp.sum(x, axis=0)
    sq_ref[0, 0, :] += jnp.sum(x * x, axis=0)


def supported(rows: int, lanes: int) -> bool:
    return lanes % 128 == 0 and rows >= 8


def _pick_tile(rows: int) -> int:
    t = min(512, rows)
    while rows % t != 0:
        t -= 8
    return max(t, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moments_sums(x: jnp.ndarray, interpret: bool = False):
    """x [b, rows, L] -> (sum [b, L], sumsq [b, L]) in f32.

    rows must be a multiple of 8 and L a multiple of 128 (callers pad rows
    with zeros — zero rows do not perturb either sum).
    """
    return _moments_fwd(x, interpret)[0]


def _moments_fwd(x, interpret):
    b, rows, lanes = x.shape
    xp, rp = x, rows
    t = _pick_tile(rows)
    if rp % t != 0:  # rows < 8 or not 8-aligned: zero-pad (sums unaffected)
        pad = -rp % t
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        rp += pad
    out_shape = [jax.ShapeDtypeStruct((b, 1, lanes), jnp.float32),
                 jax.ShapeDtypeStruct((b, 1, lanes), jnp.float32)]
    s, sq = pl.pallas_call(
        _kernel,
        grid=(b, rp // t),
        in_specs=[pl.BlockSpec((1, t, lanes), lambda bb, rt: (bb, rt, 0))],
        out_specs=[pl.BlockSpec((1, 1, lanes), lambda bb, rt: (bb, 0, 0)),
                   pl.BlockSpec((1, 1, lanes), lambda bb, rt: (bb, 0, 0))],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=3 * xp.size, bytes_accessed=xp.size * xp.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp)
    return (s[:, 0], sq[:, 0]), x


def _moments_bwd(interpret, x, grads):
    dsum, dsq = grads
    dx = dsum[:, None, :] + 2.0 * x.astype(jnp.float32) * dsq[:, None, :]
    return (dx.astype(x.dtype),)


moments_sums.defvjp(_moments_fwd, _moments_bwd)
