"""Pallas TPU kernel: fused block-0 inter conv for occupancy-ones input.

The first conv layer of every model consumes occupancy features that are
identically 1 (ref: base_so3conv.py:16-23 preprocess_input ->
so3conv/functional.py:25-44), so the neighbor contraction degenerates to a
pure anchor-weight sum

    F[p, a, k] = sum_n relu(1 - |gx[p,n] - R_a kappa_k|^2 / sigma)

(ref anchor weights: so3conv/functional.py:180-218). The XLA formulation of
this path cost ~8 ms/step on the flagship model: a dispatch-bound [q,3]
row gather (3 ms), VPU broadcast-add/relu/reduce fusions over the
[b,p,n,a,k] weight tensor, and f32->bf16/layout copies into the next layer.

This kernel computes the whole thing in one pass per point tile with the
support coordinates VMEM-resident, using an absolute-coordinate expansion
that needs NO per-neighbor coordinate gather at the XLA level:

    d2[(p,n), (a,k)] = |xn|^2 - 2 xn.(xp + kappa) + |xp + kappa|^2
                     = [sel @ RK16]              (neighbor terms, MXU)
                       - 2 xn.xp                 (per-row, VPU lane reduce)
                       + 2 xp.kappa + |xp|^2     (per-(point, lane), tiny MXU)

where sel = onehot(idx) @ tab16 selects per-neighbor rows of the
pre-assembled support table tab16[q]: paired hi/lo bf16 splits of the
coordinate terms AND the coefficients (slot layout in make_tab16), so ONE
K=16 bf16 dot reconstructs every product to ~2^-18 relative (additive
split — raw f32 bit-halves would form NaN patterns).

Lanes l = a*kt + k cover all anchors at once (padded to a multiple of 128
with |kappa|^2 = BIG sentinel columns => w = 0). The n-sum is a sublane
segment reduce of the [t, nt, L] relu block. Output is the packed
[b, p2, L] weight-sum; the learned W contraction (so3conv/modules.py:48-55)
runs outside as one well-shaped XLA GEMM on a bitcast view.

Gradients: the output depends only on input coordinates (the features are
the constant 1), so the custom VJP is identically zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lanes_for(na: int, kt: int) -> int:
    return _round_up(na * kt, 128)


def pick_kt(na: int, k: int) -> int:
    """Smallest kt >= k with na*kt % 128 == 0, so the [b, p2, L] output is a
    pure bitcast view of [b, p2, na, kt] (no lane-dim slice before the
    learned GEMM). Returns 0 when the padding would exceed 4x the real
    kernel count (kernel falls back to the XLA path)."""
    kt = _round_up(k, 8)
    while (na * kt) % 128 != 0:
        kt += 8
    return kt if kt <= 4 * k else 0


def pick_nt(n_neighbor: int) -> int:
    """Neighbor slots padded to a power of two <= 128 so tp = 128 // nt
    point-rows tile the idx lane dim exactly."""
    nt = 1
    while nt < n_neighbor:
        nt *= 2
    return nt if nt <= 128 else 0


def _hilo(v: jnp.ndarray):
    """f32 -> (hi, lo) additive bf16 split, both returned as exact f32."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (v - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


def make_tab16(xyz_shadow: jnp.ndarray) -> jnp.ndarray:
    """[b, q, 3] support coords (shadow row included) -> [b, q~, 16] bf16
    table rows; q~ = ceil8(q), pad rows zero (an all-zero row is never
    selected: pad indices point at the shadow row, whose |xn|^2 ~ 3e8 kills
    the weight).

    Slot layout (paired with make_rk16_ones so every product in the K=16
    dot is accurate to ~2^-18 relative — a single-bf16 coefficient's 2^-9
    rounding, amplified by 1/sigma, was measured at 1% of the weight sum):
      0-2  xn_hi      x coeff -2k_hi      8-10 xn_lo   x coeff -2k_hi
      3    |xn|^2_hi  x 1                 11   |xn|^2_lo x 1
      4    1          x |kappa|^2_hi      12   1        x |kappa|^2_lo
      5-7  xn_hi      x coeff -2k_lo      13-15 0
    """
    b, q, _ = xyz_shadow.shape
    x2 = jnp.sum(xyz_shadow * xyz_shadow, axis=-1, keepdims=True)
    xhi, xlo = _hilo(xyz_shadow)
    x2hi, x2lo = _hilo(x2)
    one = jnp.ones((b, q, 1), jnp.float32)
    tab = jnp.concatenate([
        xhi, x2hi, one, xhi,
        xlo, x2lo, one, jnp.zeros((b, q, 3), jnp.float32)],
        axis=-1).astype(jnp.bfloat16)                        # [b, q, 16]
    qp = _round_up(q, 8)
    if qp > q:
        tab = jnp.pad(tab, ((0, 0), (0, qp - q), (0, 0)))
    return tab


def make_rk16_ones(rk: jnp.ndarray, k2: jnp.ndarray, kt: int,
                   lanes: int) -> jnp.ndarray:
    """[na, k, 3] rotated kernels + [k] squared norms -> [16, lanes] f32
    coefficient operand (lane l = a*kt + k_slot; pad slots/lanes carry
    |kappa|^2 = BIG => w = 0). Slot pairing: see make_tab16 — hi/lo splits
    of -2*kappa and |kappa|^2 ride the otherwise-zero slots, so the dot
    reconstructs (xn_hi+xn_lo)(-2k_hi) + xn_hi(-2k_lo) + |xn|^2 + |kappa|^2
    with only the xn_lo*k_lo ~ 2^-18 cross term dropped."""
    na, k, _ = rk.shape
    mhi, mlo = _hilo(-2.0 * jnp.asarray(rk, jnp.float32))
    k2hi, k2lo = _hilo(jnp.broadcast_to(
        jnp.asarray(k2, jnp.float32).reshape(1, k, 1), (na, k, 1)))
    one = jnp.ones((na, k, 1), jnp.float32)
    zero3 = jnp.zeros((na, k, 3), jnp.float32)
    base = jnp.concatenate([
        mhi, one, k2hi, mlo,
        mhi, one, k2lo, zero3], axis=-1)                     # [na, k, 16]
    if kt > k:
        pad = (jnp.zeros((na, kt - k, 16), jnp.float32)
               .at[:, :, 4].set(_BIG))
        base = jnp.concatenate([base, pad], axis=1)          # [na, kt, 16]
    cols = base.reshape(na * kt, 16)
    if lanes > na * kt:
        lpad = (jnp.zeros((lanes - na * kt, 16), jnp.float32)
                .at[:, 4].set(_BIG))
        cols = jnp.concatenate([cols, lpad], axis=0)         # [lanes, 16]
    return jnp.transpose(cols)                               # [16, lanes]


def make_k8_ones(rk: jnp.ndarray, kt: int, lanes: int) -> jnp.ndarray:
    """[na, k, 3] -> [8, lanes] f32 operand for the per-point correction
    2 xp.kappa + |xp|^2 (dotted with xp8 = [2 xp, |xp|^2, 1, 0...])."""
    na, k, _ = rk.shape
    base = jnp.concatenate([
        rk, jnp.ones((na, k, 1), rk.dtype),
        jnp.zeros((na, k, 4), rk.dtype)], axis=-1)           # [na, k, 8]
    if kt > k:
        # pad kernel slots still get the |xp|^2 term; their BIG |kappa|^2
        # in rk16 zeroes the weight regardless
        pad = (jnp.zeros((na, kt - k, 8), rk.dtype)
               .at[:, :, 3].set(1.0))
        base = jnp.concatenate([base, pad], axis=1)
    cols = base.reshape(na * kt, 8)
    if lanes > na * kt:
        cols = jnp.pad(cols, ((0, lanes - na * kt), (0, 0)))
    return jnp.transpose(cols).astype(jnp.float32)           # [8, lanes]


def make_xp8(new_xyz: jnp.ndarray) -> jnp.ndarray:
    """[b, p2, 3] query coords -> [b, p2, 8] f32 [2 xp, |xp|^2, 1, 0...]."""
    b, p2, _ = new_xyz.shape
    p2sq = jnp.sum(new_xyz * new_xyz, axis=-1, keepdims=True)
    return jnp.concatenate([
        2.0 * new_xyz, p2sq, jnp.ones((b, p2, 1), new_xyz.dtype),
        jnp.zeros((b, p2, 3), new_xyz.dtype)], axis=-1)


def _kernel(idx_ref, tab_ref, xp8_ref, rk16_ref, k8_ref, out_ref, *,
            sigma, nt, t):
    lanes = rk16_ref.shape[1]
    qp = tab_ref.shape[1]
    rows = t * nt
    inv_sigma = jnp.float32(1.0 / sigma)

    idxv = idx_ref[0, 0]                                     # [rows] int32
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [rows, 16]
    # exact: one-hot selection of bf16 rows (Mosaic requires a 32-bit acc)
    sel = sel.astype(jnp.bfloat16)

    # neighbor terms: ONE K=16 bf16 dot sums hi and lo halves
    d2n = jax.lax.dot_general(
        sel, rk16_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [rows, L] f32

    xp8 = xp8_ref[0]                                         # [t, 8] f32
    xp_rows = jnp.broadcast_to(xp8[:, None, :], (t, nt, 8)).reshape(rows, 8)
    self8 = sel[:, :8].astype(jnp.float32) + sel[:, 8:].astype(jnp.float32)
    # -2 xn.xp: xp8 lanes 0-2 hold 2*xp; lanes 3+ of the product are masked
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 8), 1)
    mask = (lane < 3).astype(jnp.float32)
    corr1 = -jnp.sum(self8 * xp_rows * mask, axis=1,
                     keepdims=True)                          # [rows, 1]
    # 2 xp.kappa + |xp|^2 per (point, lane)
    corr2 = jax.lax.dot_general(
        xp8, k8_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                 # [t, L]

    d2 = (d2n + corr1).reshape(t, nt, lanes) + corr2[:, None, :]
    w = jax.nn.relu(1.0 - d2 * inv_sigma)
    out_ref[0] = jnp.sum(w, axis=1).astype(out_ref.dtype)    # [t, L]


def _pick_t(p2: int, nt: int, qp: int, lanes: int) -> int:
    """Points per grid step: the idx block lane dim t*nt must be a
    multiple of 128, t must divide p2, and the [t*nt, lanes] d2/w working
    set must fit the VMEM budget. Returns 0 if unsatisfiable."""
    tp = max(1, 128 // nt)
    budget = 24 * 1024 * 1024
    per_row = 4 * lanes + 2 * qp + 8 * lanes  # d2 + onehot + w/broadcasts
    rows = max(tp * nt, budget // per_row)
    t = min(p2, max(tp, (rows // nt) // tp * tp))
    while t >= tp and p2 % t != 0:
        t -= tp
    return t if t >= tp and p2 % t == 0 else 0


def supported(p2: int, q: int, nt: int, na: int, kt: int) -> bool:
    qp = _round_up(q, 8)
    return (0 < nt <= 128 and kt > 0 and q <= 4096
            and lanes_for(na, kt) == na * kt
            and _pick_t(p2, nt, qp, lanes_for(na, kt)) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ones_weight_sum(idx3, tab16, xp8, rk16, k8, sigma, nt, out_dtype=None,
                    interpret=False):
    """idx3 [b, 1, p2*nt] int32; tab16 [b, q~, 16] bf16 (make_tab16);
    xp8 [b, p2, 8] f32 (make_xp8); rk16 [16, L] f32 (make_rk16_ones);
    k8 [8, L] f32 (make_k8_ones). Returns [b, p2, L] weight sums
    (lane l = a*kt + k; pad lanes are exactly 0)."""
    return _ones_fwd(idx3, tab16, xp8, rk16, k8, sigma, nt, out_dtype,
                     interpret)[0]


def _ones_fwd(idx3, tab16, xp8, rk16, k8, sigma, nt, out_dtype, interpret):
    b = idx3.shape[0]
    rows = idx3.shape[2]
    p2 = rows // nt
    qp = tab16.shape[1]
    lanes = rk16.shape[1]
    t = _pick_t(p2, nt, qp, lanes)
    odt = out_dtype or jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, sigma=float(sigma), nt=nt, t=t),
        grid=(b, p2 // t),
        in_specs=[
            pl.BlockSpec((1, 1, t * nt), lambda bb, pt: (bb, 0, pt)),
            pl.BlockSpec((1, qp, 16), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, t, 8), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((16, lanes), lambda bb, pt: (0, 0)),
            pl.BlockSpec((8, lanes), lambda bb, pt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, lanes), lambda bb, pt: (bb, pt, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p2, lanes), odt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p2 * nt * (qp * 16 + 16 * lanes),
            bytes_accessed=(idx3.size * 4 + b * p2 * lanes
                            * jnp.dtype(odt).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(idx3, tab16, xp8, rk16, k8)
    return out, None


def _ones_fwd_vjp(idx3, tab16, xp8, rk16, k8, sigma, nt, out_dtype,
                  interpret):
    out, _ = _ones_fwd(idx3, tab16, xp8, rk16, k8, sigma, nt, out_dtype,
                       interpret)
    return out, (idx3.shape, tab16, xp8, rk16, k8)


def _ones_bwd_vjp(sigma, nt, out_dtype, interpret, res, dout):
    # output depends only on (constant) input coordinates: zero cotangents
    del dout
    idx_shape, tab16, xp8, rk16, k8 = res
    return (np.zeros(idx_shape, jax.dtypes.float0),
            jnp.zeros_like(tab16), jnp.zeros_like(xp8),
            jnp.zeros_like(rk16), jnp.zeros_like(k8))


ones_weight_sum.defvjp(_ones_fwd_vjp, _ones_bwd_vjp)
