"""Pallas TPU kernel: grouped (per-anchor) 1x1 conv on packed activations.

The separable block's skip connection applies one [c, d] weight to every
anchor's channel block of the packed [b, p, na*c] activation (ref: the 1x1
Conv2d skip in base_so3conv.py:197-212). XLA's >=3-D dot emitters pick
p-minor output layouts (layout copies around every neighboring norm/act
fusion), and the flat-2D-GEMM workaround pays two PHYSICAL reshapes per conv
(~0.8 ms/layer on the flagship: splitting the lane dim re-tiles).

Here each grid step keeps a point tile VMEM-resident and runs na/g MXU GEMMs

    out[:, i*(g*d):(i+1)*(g*d)] = x[:, i*(g*c):(i+1)*(g*c)] @ W_bd

where W_bd = blockdiag(W, ..., W) [g*c, g*d] groups g consecutive anchors so
every lane slice/store is 128-aligned (g = 128/gcd(c,128), MAC inflation g
only on the weight side — negligible vs the reshape copies it removes).
I/O stays in the packed row-major layout: zero reshapes, zero layout copies.

Backward: dx via the transposed block-diag GEMMs; dW accumulated across grid
steps in a VMEM-persistent out block (zero at first step — the dW/dtab
pattern), with the g x g block-diagonal cross terms discarded outside. dbias
is a plain XLA reduce of the cotangent.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_g(c: int, d: int, na: int):
    """Anchors per GEMM group: smallest g with 128-aligned g*c and g*d that
    divides na. None when the shape can't be tiled this way."""
    g = 128 // math.gcd(c, 128)
    if (g * d) % 128 != 0:
        g2 = g * (128 // math.gcd(g * d, 128))
        g = g2
    if (g * c) % 128 != 0 or (g * d) % 128 != 0 or na % g != 0:
        return None
    return g


def supported(c: int, d: int, na: int) -> bool:
    return pick_g(c, d, na) is not None


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, acc, *, ng, gc, gd):
    w = w_ref[:]                                          # [g*c, g*d]
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    bias = b_ref[0, 0:1, :]                               # [1, na*d] f32
    for i in range(ng):
        xi = x_ref[0, :, i * gc:(i + 1) * gc]             # [T, g*c]
        acc[:, i * gd:(i + 1) * gd] = jax.lax.dot_general(
            xi, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = (acc[:] + bias).astype(out_ref.dtype)


def _bwd_kernel(x_ref, do_ref, w_ref, dx_ref, dw_ref, acc, xall, doall,
                *, ng, gc, gd, t):
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    w = w_ref[:]                                          # [g*c, g*d]
    x = x_ref[0]
    do = do_ref[0]
    for i in range(ng):
        do_i = do[:, i * gd:(i + 1) * gd]                 # [T, g*d]
        acc[:, i * gc:(i + 1) * gc] = jax.lax.dot_general(
            do_i, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        xall[i * t:(i + 1) * t, :] = x[:, i * gc:(i + 1) * gc]
        doall[i * t:(i + 1) * t, :] = do_i
    dx_ref[0] = acc[:].astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        xall[:], doall[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [g*c, g*d]


def _act_f32(u, act, alpha):
    """Activation on an f32 tile with torch subgradient semantics at 0
    (masks use > 0; see nn/layers._leaky_relu_torch)."""
    if act == 'leaky_relu':
        return jnp.where(u > 0, u, alpha * u)
    if act == 'relu':
        return jnp.maximum(u, 0.0)
    assert act in (None, 'none'), act
    return u


def _fwd_skip_kernel(x_ref, w_ref, b_ref, ssk_ref, y_ref, ssm_ref, out_ref,
                     acc, *, ng, gc, gd, act, alpha):
    """grouped conv + the whole separable-block tail in one pass:

        out = act(y * ssm0 + ssm1) + act((x @ W_bd + bias) * ssk0 + ssk1)

    y = raw intra-conv output (its InstanceNorm folded to per-lane
    scale/shift), ssk = the skip norm folded the same way. The conv result,
    the normed/activated skip, and the normed/activated main branch never
    exist in HBM — this replaces three XLA elementwise passes per separable
    layer (skip norm+act, main norm+act, residual add) plus the conv
    output's HBM round trip (ref block structure: base_so3conv.py:197-212).
    Inference-only (no VJP): training keeps the composable path."""
    w = w_ref[:]                                          # [g*c, g*d]
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    bias = b_ref[0, 0:1, :]                               # [1, na*d] f32
    for i in range(ng):
        xi = x_ref[0, :, i * gc:(i + 1) * gc]             # [T, g*c]
        acc[:, i * gd:(i + 1) * gd] = jax.lax.dot_general(
            xi, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    sk = _act_f32((acc[:] + bias) * ssk_ref[0, 0:1, :] + ssk_ref[0, 1:2, :],
                  act, alpha)
    ym = _act_f32(y_ref[0].astype(jnp.float32) * ssm_ref[0, 0:1, :]
                  + ssm_ref[0, 1:2, :], act, alpha)
    out_ref[0] = (ym + sk).astype(out_ref.dtype)


def grouped_conv1x1_skip_epilogue(x3, w, bias, ss_skip, y3, ss_main, na,
                                  act='leaky_relu', alpha=0.01,
                                  interpret=False):
    """Fused separable-block tail (see _fwd_skip_kernel).

    x3 [b, p, na*c] block input (packed); w [c, d]; bias [d];
    ss_skip [bs, 8, na*d] f32 per-lane (scale row 0, shift row 1) of the skip
    norm (bs == 1 broadcasts: eval-mode BatchNorm); y3 [b, p, na*d] raw intra
    output; ss_main [bm, 8, na*d] its InstanceNorm fold. Inference-only.
    """
    b, p_total, L = x3.shape
    c, d = w.shape
    assert L == na * c and y3.shape == (b, p_total, na * d)
    g = pick_g(c, d, na)
    x3, p = _pad_rows(x3, p_total)
    y3, _ = _pad_rows(y3, p_total)
    t = _pick_t(p, na * (c + 2 * d))
    wbd = _block_diag(w.astype(x3.dtype), g)
    brow = jnp.tile(bias.astype(jnp.float32), na)
    b8 = jnp.zeros((1, 8, na * d), jnp.float32).at[0, 0].set(brow)
    sb, mb = ss_skip.shape[0], ss_main.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_skip_kernel, ng=na // g, gc=g * c, gd=g * d,
                          act=act, alpha=float(alpha)),
        grid=(b, p // t),
        in_specs=[
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((g * c, g * d), lambda bb, pt: (0, 0)),
            pl.BlockSpec((1, 8, na * d), lambda bb, pt: (0, 0, 0)),
            pl.BlockSpec((1, 8, na * d),
                         (lambda bb, pt: (bb, 0, 0)) if sb > 1
                         else (lambda bb, pt: (0, 0, 0))),
            pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, 8, na * d),
                         (lambda bb, pt: (bb, 0, 0)) if mb > 1
                         else (lambda bb, pt: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p, na * d), y3.dtype),
        scratch_shapes=[pltpu.VMEM((t, na * d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * na * g * c * d,
            bytes_accessed=(x3.size + 2 * b * p * na * d) * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, wbd, b8, ss_skip.astype(jnp.float32), y3,
      ss_main.astype(jnp.float32))
    return out[:, :p_total] if p > p_total else out


def _pad_rows(x, p_total):
    p = p_total + (-p_total) % 8
    if p > p_total:
        x = jnp.pad(x, ((0, 0), (0, p - p_total), (0, 0)))
    return x, p


def _pick_t(p, lanes_out, budget_mb=6):
    t = 8
    while t < 512 and t < p and 2 * t * lanes_out * 4 <= budget_mb * 2 ** 20:
        t *= 2
    while p % t != 0:
        t -= 8
    return max(t, 8)


def _block_diag(w, g):
    if g == 1:
        return w
    return jax.scipy.linalg.block_diag(*([w] * g))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def grouped_conv1x1(x3, w, bias, na, interpret=False):
    """[b, p, na*c] x [c, d] (+bias [d]) -> [b, p, na*d], packed layout."""
    return _fwd(x3, w, bias, na, interpret)


def _fwd(x3, w, bias, na, interpret):
    b, p_total, L = x3.shape
    c, d = w.shape
    assert L == na * c
    g = pick_g(c, d, na)
    x3, p = _pad_rows(x3, p_total)
    t = _pick_t(p, na * d)
    wbd = _block_diag(w.astype(x3.dtype), g)              # [g*c, g*d]
    brow = jnp.tile(bias.astype(jnp.float32), na)         # [na*d]
    b8 = jnp.zeros((1, 8, na * d), jnp.float32).at[0, 0].set(brow)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ng=na // g, gc=g * c, gd=g * d),
        grid=(b, p // t),
        in_specs=[
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((g * c, g * d), lambda bb, pt: (0, 0)),
            pl.BlockSpec((1, 8, na * d), lambda bb, pt: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p, na * d), x3.dtype),
        scratch_shapes=[pltpu.VMEM((t, na * d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * na * g * c * d,
            bytes_accessed=(x3.size + b * p * na * d) * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, wbd, b8)
    return out[:, :p_total] if p > p_total else out


def _gc_fwd(x3, w, bias, na, interpret):
    return grouped_conv1x1(x3, w, bias, na, interpret), (x3, w)


def _gc_bwd(na, interpret, res, dout):
    x3, w = res
    b, p_total, L = x3.shape
    c, d = w.shape
    g = pick_g(c, d, na)
    x3, p = _pad_rows(x3, p_total)
    dout, _ = _pad_rows(dout, p_total)
    t = _pick_t(p, na * max(c, d), budget_mb=4)
    # bound the stacked-operand scratches [na/g*t, g*c/d]
    while t > 8 and (na // g) * t * g * max(c, d) * x3.dtype.itemsize \
            > 16 * 2 ** 20:
        t -= 8
    while p % t != 0:
        t -= 8
    wbd = _block_diag(w.astype(x3.dtype), g)
    dx, dwbd = pl.pallas_call(
        functools.partial(_bwd_kernel, ng=na // g, gc=g * c, gd=g * d, t=t),
        grid=(b, p // t),
        in_specs=[
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((g * c, g * d), lambda bb, pt: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((g * c, g * d), lambda bb, pt: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, p, na * c), x3.dtype),
                   jax.ShapeDtypeStruct((g * c, g * d), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((t, na * c), jnp.float32),
            pltpu.VMEM(((na // g) * t, g * c), x3.dtype),
            pltpu.VMEM(((na // g) * t, g * d), x3.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * na * g * c * d,
            bytes_accessed=2 * (x3.size + b * p * na * d) * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, dout, wbd)
    # diagonal blocks of the g x g block-diag product are the real dW
    dw = sum(dwbd[i * c:(i + 1) * c, i * d:(i + 1) * d] for i in range(g))
    dbias = dout[:, :p_total].astype(jnp.float32).sum(axis=(0, 1)) \
        .reshape(na, d).sum(axis=0)
    return ((dx[:, :p_total] if p > p_total else dx),
            dw.astype(w.dtype), dbias)


grouped_conv1x1.defvjp(_gc_fwd, _gc_bwd)
