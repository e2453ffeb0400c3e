"""Pallas TPU kernel: fused intra (rotation-group) SO(3) convolution.

Math (ref: vgtk/vgtk/so3conv/functional.py:221-268 + the BasicSO3Conv matmul
so3conv/modules.py:48-55), with the static 60x12 icosahedral group adjacency
trace_idx:

    out[b, p, a, d] = sum_k sum_c f[b, p, trace_idx[a, k], c] W[k, c, d]

TPU story: anchor-axis gathers lower to while-loops of dynamic slices (the
repo's original sin, ~300 ms/step), and the one-hot GEMM reformulations pay
60/12x (single folded GEMM) or a [b,p,60,12,d] HBM intermediate (two-stage).
Here each grid step keeps a tile of points VMEM-resident and runs the TRUE
MACs as 60 per-input-anchor MXU GEMMs

    y_x[T, K*D] = f[:, x*C:(x+1)*C] @ W2         (W2 = W as [C, K*D])

scattering each k-block of y_x into its unique target anchor's output lanes
(for fixed input anchor x and kernel slot k the group structure gives exactly
one output anchor a with trace_idx[a, k] == x) — 720 static lane-block
accumulations in a f32 VMEM scratch, no HBM intermediates at all.

Backward runs as plain XLA einsums (the dY intermediate is materialized only
during training's backward pass, where the gather-free forward already paid
for itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FALL_CAP_MB = 24


def _pairs(trace_idx: np.ndarray):
    """pairs[x] = [(a, k)] with trace_idx[a, k] == x (exactly K per x)."""
    na, nk = trace_idx.shape
    pairs = [[] for _ in range(na)]
    for a in range(na):
        for k in range(nk):
            pairs[int(trace_idx[a, k])].append((a, k))
    return pairs


def _apply_prenorm(f, ss, act, alpha):
    """z = act((f32(f) * scale + shift).astype(f.dtype)) — the deferred
    norm-apply + activation of the preceding inter conv, fused into this
    kernel's load path (saves a full read+write pass over the packed
    activation per layer). ss rows: 0 = per-lane scale, 1 = per-lane shift."""
    u = f.astype(jnp.float32) * ss[0:1, :] + ss[1:2, :]
    # activation in f32 (bf16 compares don't lower on this Mosaic target).
    # `u > 0` (not >=): torch subgradient semantics at exactly 0 — see
    # nn/blocks.py _leaky_relu_torch.
    if act == 'leaky_relu':
        u = jnp.where(u > 0, u, alpha * u)
    elif act == 'relu':
        u = jnp.maximum(u, 0.0)
    return u.astype(f.dtype)


def _kernel(f_ref, w2_ref, out_ref, acc, *, pairs, na, nk, c, d):
    w2 = w2_ref[:]                                        # [C, K*D]
    prec = (jax.lax.Precision.HIGHEST if f_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc[:] = jnp.zeros_like(acc)
    for x in range(na):
        fx = f_ref[0, :, x * c:(x + 1) * c]               # [T, C]
        yx = jax.lax.dot_general(
            fx, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [T, K*D]
        for a, k in pairs[x]:
            acc[:, a * d:(a + 1) * d] += yx[:, k * d:(k + 1) * d]
    out_ref[0] = acc[:].astype(out_ref.dtype)


def _kernel_prenorm(f_ref, ss_ref, w2_ref, out_ref, acc, *, pairs, na, nk,
                    c, d, act, alpha):
    w2 = w2_ref[:]                                        # [C, K*D]
    prec = (jax.lax.Precision.HIGHEST if f_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    z = _apply_prenorm(f_ref[0], ss_ref[0], act, alpha)   # [T, na*C]
    acc[:] = jnp.zeros_like(acc)
    for x in range(na):
        fx = z[:, x * c:(x + 1) * c]                      # [T, C]
        yx = jax.lax.dot_general(
            fx, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [T, K*D]
        for a, k in pairs[x]:
            acc[:, a * d:(a + 1) * d] += yx[:, k * d:(k + 1) * d]
    out_ref[0] = acc[:].astype(out_ref.dtype)


def _fwd_pallas(f_flat, w2, trace_idx, t, interpret, ss=None, act=None,
                alpha=0.01):
    b, p_total, nac = f_flat.shape
    na, nk = trace_idx.shape
    c = nac // na
    d = w2.shape[1] // nk
    pairs = _pairs(trace_idx)
    # sublane-align the point dim (Mosaic block rows must be multiples of 8;
    # the flagship strides keep p a power of two, but small configs reach
    # p=4 at the deepest block)
    p = p_total + (-p_total) % 8
    if p > p_total:
        f_flat = jnp.pad(f_flat, ((0, 0), (0, p - p_total), (0, 0)))
    while p % t != 0:
        t -= 8
    if ss is None:
        kern = functools.partial(_kernel, pairs=pairs, na=na, nk=nk, c=c, d=d)
        in_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((w2.shape[0], w2.shape[1]), lambda bb, pt: (0, 0)),
        ]
        operands = (f_flat, w2)
    else:
        kern = functools.partial(_kernel_prenorm, pairs=pairs, na=na, nk=nk,
                                 c=c, d=d, act=act, alpha=alpha)
        in_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, 8, na * c), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((w2.shape[0], w2.shape[1]), lambda bb, pt: (0, 0)),
        ]
        operands = (f_flat, ss, w2)
    out = pl.pallas_call(
        kern,
        grid=(b, p // t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p, na * d), f_flat.dtype),
        scratch_shapes=[pltpu.VMEM((t, na * d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * na * c * nk * d,
            bytes_accessed=(f_flat.size * f_flat.dtype.itemsize
                            + b * p * na * d * f_flat.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:, :p_total] if p > p_total else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def intra_conv(f_flat, w2, trace_idx_tuple, t=64, interpret=False):
    """out[b, p, (a d)] from f [b, p, (x c)] and W2 [c, (k d)].

    trace_idx_tuple: the static [60, 12] adjacency as a tuple-of-tuples
    (hashable for the custom_vjp nondiff machinery).
    """
    ti = np.asarray(trace_idx_tuple, dtype=np.int64)
    return _fwd_pallas(f_flat, w2, ti, t, interpret)


def _intra_fwd(f_flat, w2, trace_idx_tuple, t, interpret):
    out = intra_conv(f_flat, w2, trace_idx_tuple, t, interpret)
    return out, (f_flat, w2)


def _bwd_kernel(f_ref, do_ref, w2km_ref, df_ref, dw2_ref, acc, fall, doall,
                *, trace, na, nk, c, d, t):
    """Fused backward, output-anchor-major: per output anchor a, ONE wide
    GEMM dY_a = dout_a @ W_km^T gives all K df contributions (scattered to
    the input anchors trace[a, k] with static lane-block adds), while the
    stacked operands F_all[(a, t), (k, c)] = f[:, trace[a, k]] and
    DO_all[(a, t), :] = dout_a turn dW into ONE [K*C, na*T] x [na*T, D]
    GEMM per grid step. The previous input-anchor-major formulation ran
    720 tiny GEMMs and 720 [C, D] VMEM read-modify-writes per grid step
    and measured 3x the forward instead of the 2x its MACs predict."""
    prec = (jax.lax.Precision.HIGHEST if f_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    f = f_ref[0]                                          # [T, na*c]
    do = do_ref[0]                                        # [T, na*d]
    w2km = w2km_ref[:]                                    # [K*C, D]
    acc[:] = jnp.zeros_like(acc)
    for a in range(na):
        do_a = do[:, a * d:(a + 1) * d]                   # [T, D]
        doall[a * t:(a + 1) * t, :] = do_a
        for k in range(nk):
            x = trace[a][k]
            fall[a * t:(a + 1) * t, k * c:(k + 1) * c] = (
                f[:, x * c:(x + 1) * c])
        y_a = jax.lax.dot_general(
            do_a, w2km, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [T, K*C]
        for k in range(nk):
            x = trace[a][k]
            acc[:, x * c:(x + 1) * c] += y_a[:, k * c:(k + 1) * c]
    df_ref[0] = acc[:].astype(df_ref.dtype)
    dw2_ref[...] += jax.lax.dot_general(
        fall[:], doall[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [K*C, D]


def _bwd_kernel_prenorm(f_ref, ss_ref, do_ref, w2km_ref, df_ref, dw2_ref,
                        dsa_ref, dsh_ref, acc, fall, doall, *, trace, na,
                        nk, c, d, t, act, alpha):
    """_bwd_kernel with the prenorm epilogue differentiated in-kernel:
    z = act(f*scale+shift) is recomputed on the VMEM-resident tile (the lazy
    XLA recompute paid ~2 extra HBM passes per layer), dz -> df via the
    activation mask and scale, and dscale/dshift accumulate across point
    tiles in VMEM-persistent [8, L] out blocks (zeroed at each batch's first
    tile — the dW pattern). Zero-padded rows are harmless: their dout rows
    are zero, so every contribution vanishes."""
    prec = (jax.lax.Precision.HIGHEST if f_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    @pl.when(pl.program_id(1) == 0)
    def _zero_ss():
        dsa_ref[...] = jnp.zeros_like(dsa_ref)
        dsh_ref[...] = jnp.zeros_like(dsh_ref)

    f = f_ref[0]                                          # [T, na*c]
    ss = ss_ref[0]
    scale = ss[0:1, :]
    shift = ss[1:2, :]
    u = f.astype(jnp.float32) * scale + shift             # [T, L] f32
    # masks use `u > 0`: torch subgradient semantics at exactly 0 (torch
    # leaky_relu backward gives alpha there, relu backward gives 0)
    if act == 'leaky_relu':
        z = jnp.where(u > 0, u, alpha * u).astype(f.dtype)
        mask = jnp.where(u > 0, 1.0, alpha)
    elif act == 'relu':
        z = jnp.maximum(u, 0.0).astype(f.dtype)
        mask = (u > 0).astype(jnp.float32)
    else:
        z = u.astype(f.dtype)
        mask = None
    do = do_ref[0]                                        # [T, na*d]
    w2km = w2km_ref[:]                                    # [K*C, D]
    acc[:] = jnp.zeros_like(acc)
    for a in range(na):
        do_a = do[:, a * d:(a + 1) * d]                   # [T, D]
        doall[a * t:(a + 1) * t, :] = do_a
        for k in range(nk):
            x = trace[a][k]
            fall[a * t:(a + 1) * t, k * c:(k + 1) * c] = (
                z[:, x * c:(x + 1) * c])
        y_a = jax.lax.dot_general(
            do_a, w2km, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [T, K*C]
        for k in range(nk):
            x = trace[a][k]
            acc[:, x * c:(x + 1) * c] += y_a[:, k * c:(k + 1) * c]
    du = acc[:] if mask is None else acc[:] * mask        # [T, L] f32
    df_ref[0] = (du * scale).astype(df_ref.dtype)
    dsa_ref[0] += (du * f.astype(jnp.float32)).reshape(
        t // 8, 8, du.shape[1]).sum(axis=0)               # [8, L]
    dsh_ref[0] += du.reshape(t // 8, 8, du.shape[1]).sum(axis=0)
    dw2_ref[...] += jax.lax.dot_general(
        fall[:], doall[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [K*C, D]


def _bwd_pallas(f_flat, dout, w2, trace_idx, t, interpret, ss=None,
                act=None, alpha=0.01):
    b, p_total, nac = f_flat.shape
    na, nk = trace_idx.shape
    c = nac // na
    d = w2.shape[1] // nk
    p = p_total + (-p_total) % 8
    if p > p_total:
        f_flat = jnp.pad(f_flat, ((0, 0), (0, p - p_total), (0, 0)))
        dout = jnp.pad(dout, ((0, 0), (0, p - p_total), (0, 0)))
    # cap T so the [na*T, K*C] stacked-operand scratch stays bounded. The
    # caps are empirically calibrated on chip (the true VMEM demand also
    # carries double-buffered windows, f32 accumulators, and Mosaic's
    # stack-allocated per-anchor GEMM partials, which scale worse than
    # itemsize-linear): bf16 c=d=256 runs at T=64 (fall 22.5 MB, the
    # flagship training tile), while fp32 c=d=256 OOMs at T=32 (fall
    # 22.5 MB too) and passes at T=24 — hence the tighter fp32 cap.
    cap_mb = _FALL_CAP_MB if f_flat.dtype.itemsize <= 2 else 18
    while (t > 8 and na * t * nk * c * f_flat.dtype.itemsize
           > cap_mb * 2 ** 20):
        t -= 8
    while p % t != 0:
        t -= 8
    # k-major weight layout for the single-GEMM dY/dW formulation
    w2km = jnp.transpose(w2.reshape(c, nk, d), (1, 0, 2)).reshape(nk * c, d)
    trace = tuple(tuple(int(v) for v in row) for row in trace_idx)
    if ss is None:
        kern = functools.partial(_bwd_kernel, trace=trace, na=na, nk=nk,
                                 c=c, d=d, t=t)
        in_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((nk * c, d), lambda bb, pt: (0, 0)),
        ]
        operands = (f_flat, dout, w2km)
        out_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((nk * c, d), lambda bb, pt: (0, 0)),
        ]
        out_shape = [jax.ShapeDtypeStruct((b, p, na * c), f_flat.dtype),
                     jax.ShapeDtypeStruct((nk * c, d), jnp.float32)]
    else:
        kern = functools.partial(_bwd_kernel_prenorm, trace=trace, na=na,
                                 nk=nk, c=c, d=d, t=t, act=act, alpha=alpha)
        in_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, 8, na * c), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, t, na * d), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((nk * c, d), lambda bb, pt: (0, 0)),
        ]
        operands = (f_flat, ss, dout, w2km)
        out_specs = [
            pl.BlockSpec((1, t, na * c), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((nk * c, d), lambda bb, pt: (0, 0)),
            pl.BlockSpec((1, 8, na * c), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, 8, na * c), lambda bb, pt: (bb, 0, 0)),
        ]
        out_shape = [jax.ShapeDtypeStruct((b, p, na * c), f_flat.dtype),
                     jax.ShapeDtypeStruct((nk * c, d), jnp.float32),
                     jax.ShapeDtypeStruct((b, 8, na * c), jnp.float32),
                     jax.ShapeDtypeStruct((b, 8, na * c), jnp.float32)]
    res = pl.pallas_call(
        kern,
        grid=(b, p // t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((t, na * c), jnp.float32),
                        pltpu.VMEM((na * t, nk * c), f_flat.dtype),
                        pltpu.VMEM((na * t, d), f_flat.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * na * c * nk * d,
            bytes_accessed=2 * f_flat.size * f_flat.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    df, dw2km = res[0], res[1]
    dw2 = jnp.transpose(dw2km.reshape(nk, c, d), (1, 0, 2)).reshape(c, nk * d)
    df = df[:, :p_total] if p > p_total else df
    if ss is None:
        return df, dw2
    dscale = res[2].sum(axis=1)                            # [b, L] f32
    dshift = res[3].sum(axis=1)
    return df, dw2, dscale, dshift


def _intra_bwd(trace_idx_tuple, t, interpret, res, dout):
    f_flat, w2 = res
    ti = np.asarray(trace_idx_tuple, dtype=np.int64)
    df, dw2 = _bwd_pallas(f_flat, dout, w2, ti, t, interpret)
    return df.astype(f_flat.dtype), dw2.astype(w2.dtype)


intra_conv.defvjp(_intra_fwd, _intra_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def intra_conv_prenorm(f_flat, ss, w2, trace_idx_tuple, act='leaky_relu',
                       alpha=0.01, t=64, interpret=False):
    """intra_conv with the PRECEDING inter-conv's norm-apply + activation
    fused into the kernel's load path:

        out = intra_conv(act(f * scale + shift), w2)

    ss: [b, 8, na*c] f32 — row 0 = per-lane scale, row 1 = per-lane shift
    (rows 2-7 padding for the 8-sublane block tile). The scale/shift come
    from InstanceNorm/BatchNorm stats computed outside (the stats pass reads
    f once regardless); fusing the APPLY saves one full read+write pass over
    the packed activation per layer (~0.4 ms/layer on the flagship).

    Backward runs fully in-kernel too (_bwd_kernel_prenorm): z is
    recomputed on the VMEM-resident tile, dz -> df via the activation mask
    and scale, dscale/dshift accumulate across point tiles in VMEM (the
    lazy XLA-recompute form paid ~2 extra HBM passes per layer).
    """
    ti = np.asarray(trace_idx_tuple, dtype=np.int64)
    return _fwd_pallas(f_flat, w2, ti, t, interpret, ss=ss, act=act,
                       alpha=alpha)


def _prenorm_fwd(f_flat, ss, w2, trace_idx_tuple, act, alpha, t, interpret):
    out = intra_conv_prenorm(f_flat, ss, w2, trace_idx_tuple, act, alpha, t,
                             interpret)
    return out, (f_flat, ss, w2)


def _prenorm_bwd(trace_idx_tuple, act, alpha, t, interpret, res, dout):
    f_flat, ss, w2 = res
    ti = np.asarray(trace_idx_tuple, dtype=np.int64)
    df, dw2, dscale, dshift = _bwd_pallas(f_flat, dout, w2, ti, t, interpret,
                                          ss=ss, act=act, alpha=alpha)
    dss = jnp.zeros_like(ss)
    dss = dss.at[:, 0, :].set(dscale).at[:, 1, :].set(dshift)
    return df.astype(f_flat.dtype), dss, dw2.astype(w2.dtype)


intra_conv_prenorm.defvjp(_prenorm_fwd, _prenorm_bwd)
