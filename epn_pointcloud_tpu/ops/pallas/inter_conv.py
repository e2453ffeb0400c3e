"""Pallas TPU kernel: fused SO(3) inter-convolution core (block-diagonal MXU
formulation, v2).

Computes, tile-resident in VMEM (never materializing the [b,p,n,a,k] anchor
weights in HBM):

    d2[p,n,a,k] = |gx[p,n]|^2 + |kappa_k|^2 - 2 gx[p,n] . (R_a kappa_k)
    w = relu(1 - d2 / sigma)
    F[p,a,k,c] = sum_n w[p,n,a,k] * G[p,n,a,c]

matching the reference inter conv math (vgtk/vgtk/so3conv/functional.py:
180-218 anchor weights + spconv/functional.py:372-390 grouping). The
downstream (k*c1) x c2 learned contraction (so3conv/modules.py:48-55) stays
outside as a well-shaped XLA GEMM.

Why a kernel at all: per point the neighbor reduction is a [K, N] x [N, C]
GEMM with K~24, N~16-32 — far too small to tile the 128x128 MXU, so XLA
either emits pathological tiny batched GEMMs or a VPU mul-reduce (the
previous default; VPU-bound at ~250 ms/step on the flagship model). Here
TP = 128/N points share one large GEMM through a block-diagonal left operand

    BD[(t,k), (t',n)] = [t == t'] * w[t,n,k]          ([TP*K~, 128])
    F_sub             = BD @ G_sub                     ([TP*K~, C])

and BD itself comes out of ONE small MXU dot in exactly that layout, with no
transposes, concats, or lane reshapes anywhere: fold the squared norms AND
the block-diagonal mask into a 16-vector inner product

    gx16 = [x, y, z, |gx|^2, 1, 0,0,0, onehot(t')]  (lanes = points*nbrs)
    rk16 = [(2/s) R_a kappa, -1/s, 1 - |kappa|^2/s, 0,0,0, -BIG*(j != t)]
    w'[(t,k), (t',n)] = rk16[(t,k)] . gx16[(t',n)]
                      = 1 - d2/sigma - BIG * [t != t']

so max(w', 0) is the masked BD operand directly — the kernel's inner loop
is one dot, one max+cast, one dot. The whole 1 - d2/sigma affine is folded
into the rk16 operand because the epilogue runs on the VPU over the full
inflated [R, S] operand: at 4 VPU ops/element it measured comparable to the
kernels' entire MXU time. (The dot keeps an f32 accumulator/output — Mosaic
rejects narrower matmul accs — so a cast to the compute dtype remains.)

Padding: K -> K~ (multiple of 8; MXU pass count is unchanged and the pad
fraction is pure overhead downstream) with sentinel rows => d2 = BIG => w=0;
N -> N~ (divisor of 128) with shadow gather indices => G rows are zero.

Every slice in the kernel is static (Python loops over subtiles and anchors);
Mosaic pitfalls from v1 (dynamic value slicing under fori_loop, 4-lane
operands) are gone.

Gradients: parameters receive gradients only through G — w depends only on
input coordinates — so the custom VJP uses a mirrored Pallas kernel that
builds BD^T (the same dot with the operands' roles swapped) and computes
dG_sub = BD^T @ dF_sub.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9

# VMEM working-set budget for the n_sub (point-subtiles per grid step)
# pickers. Larger blocks amortize per-grid-step overheads (block streaming
# setup, pipeline bubbles) — measured dominant on narrow-channel layers
# whose MXU work per step is small. v5e has 128 MB VMEM; the hard cap is
# the 100 MB vmem_limit_bytes on each pallas_call.
_VMEM_BUDGET = 10 * 1024 * 1024
_BWD_BUDGET_MULT = 8
# Lane width the learned-GEMM kernel-slab grouping targets (kg*c >= this):
# slabs concat along lanes so the (k,c) contraction runs as few long-K GEMMs
# instead of kt short-K passes. Swept on chip (scripts/sweep_kg.py):
# 512 wins on b0l1 (18.78 -> 18.07 ms), flat elsewhere; 2048 no better.
_KG_TARGET = 512


def set_vmem_budget(nbytes: int):
    global _VMEM_BUDGET
    _VMEM_BUDGET = int(nbytes)


def set_kg_target(lanes: int):
    global _KG_TARGET
    _KG_TARGET = int(lanes)


# Anchor-paired BD GEMMs in the W-fused kernels: for c < 128 the BD GEMM's
# N dim (= c) half-fills the 128-lane MXU; stacking two anchors' BD rows
# against their contiguous two-anchor lane block runs one [2R, S] x [S, 2C]
# GEMM whose off-diagonal blocks are discarded — 2x the MACs at full lane
# width and double the M fill. Measured net win on the c=64 flagship layers
# (b0l1/b1l0, scripts/bench_layer.py).
_PAIR = True


def set_pair(on: bool):
    global _PAIR
    _PAIR = bool(on)


def _pick_pair(ac: int, c: int) -> int:
    if not _PAIR:
        return 1
    # fill the 128 lanes: pair*c == 128 where divisibility allows. The
    # off-diagonal MAC waste grows with pair (pair x vs the unpaired form),
    # but on the narrow-channel layers (3DMatch inv backbone, c=32) the
    # unpaired dots are [96, 128]x[128, 32] — so small that fill/latency
    # dominates; pair=4 halves the dot count at full lane width (measured
    # win on the inv model, scripts/bench_layer.py inv shapes).
    for pair in (4, 2):
        if pair * c == 128 and ac % pair == 0:
            return pair
    return 2 if (c < 128 and ac % 2 == 0) else 1


def _pair_rk8k(rk8k: jnp.ndarray, r: int, pair: int = 2) -> jnp.ndarray:
    """[NA, 16, R] k-major operand -> [NA//pair, 16, pair*R] anchor-paired."""
    na = rk8k.shape[0]
    return (rk8k.reshape(na // pair, pair, 16, r).swapaxes(1, 2)
            .reshape(na // pair, 16, pair * r))


def _pick_kg(kt: int, c: int) -> int:
    kg = 1
    while kg < kt and kg * c < _KG_TARGET and kt % (kg * 2) == 0:
        kg *= 2
    return kg


def _pick_gpk(kt: int, c: int) -> int:
    """FAILED EXPERIMENT (round 4), kept as a record: packing gpk kernel
    slots along lanes in the fs scratch would make narrow-channel (c < 128)
    layers' fs stores lane-dense (measured 38.8 ms of fs stores + 11.3 ms
    of learned-GEMM reads on the c=32 3DMatch inv B1L0 layer, b48 — 77% of
    that kernel's runtime, all tile-padding waste). But building the packed
    [tp, gpk*c] block requires a lane concatenation of f2 slices taken at
    non-zero sublane/lane offsets, and real Mosaic rejects it ('Not
    implemented: result/input offset mismatch on non-concat dimension' on
    tpu.concatenate — interpret mode accepts it, so CPU tests pass). The
    real fix is the PACKED kernel below (_fwd_gather_w_packed_kernel): the
    anchor-paired BD GEMM already emits [pair*R, pair*C] whose diagonal
    blocks are extracted with lane MASKS (register VPU ops, no concat) into
    a lane-dense [R, pair*C] value, stored 2-D with kernel slots along
    LANES; the learned contraction then runs as one [T, K~*pair*C] GEMM per
    anchor group against a block-diagonal-expanded weight."""
    return 1


# ---------------------------------------------------------------------------
# Packed W-fused forward (narrow channels): the per-anchor fs stores of the
# standard W-fused kernel are lane-padded c/128 at c < 128 (38.8 ms of the
# 3DMatch ib1l0 layer's 64.7 ms, round-4 stage attribution). Here the
# anchor-paired BD GEMM's [pair*R, pair*C] output has its pair diagonal
# [R, C] blocks summed into ONE lane-dense [R, pair*C] value via lane masks
# (fd[r, i*c+cc] = f2[i*R+r, i*c+cc]; off-diagonal cross-anchor blocks are
# masked off), which is stored per kernel slot into a 2-D scratch
#     fs[T, (AC/pair) * K~ * (pair*C)]        lanes ordered (g, k, i, cc)
# at 128-aligned lane offsets (pair*C == 128). The learned contraction is
# then ONE MXU GEMM per anchor group g:
#     out_g [T, pair*D] = fs[:, g] @ W2bd [K~*pair*C, pair*D]
# where W2bd[(k,i,cc),(i',dd)] = [i==i'] W[k,cc,dd] (block-diagonal expanded
# in XLA outside the kernel). MACs inflate by pair on the learned GEMM, but
# it runs with full 128-lane operands and M = T instead of kt short-K
# passes, and the fs round trip is lane-dense.
# ---------------------------------------------------------------------------

# 'auto': packed kernel for c <= _PACKED_C_MAX when its shape gates hold;
# True/False force for sweeps (scripts/bench_layer.py --packed).
_PACKED_MODE = 'auto'
_PACKED_C_MAX = 64
# rows per fs store (multiple of 8 and of tp); sweepable on chip
_PACKED_SROWS = 8
# per-half overrides for the split backward (None = follow _PACKED_MODE);
# chip A/B (scripts/ab_bwd_packed.py, b1l0 + ib0l1): the TALL-layout packed
# dW2 half wins on both c=64 and c=32 (13.59 -> 13.25 ms b1l0 b12;
# 92.4 -> 85.2 ms ib0l1 b48); the packed dTab half is neutral-to-negative
# (its dgs stores are a smaller fraction and the pair concat costs more
# than the density buys) — default OFF, kernel kept for sweeps.
_PACKED_BWD_DTAB = False
_PACKED_BWD_DW2 = None


def set_packed_bwd(dtab=None, dw2=None):
    global _PACKED_BWD_DTAB, _PACKED_BWD_DW2
    _PACKED_BWD_DTAB, _PACKED_BWD_DW2 = dtab, dw2


def set_packed_mode(mode):
    global _PACKED_MODE
    _PACKED_MODE = mode


def set_packed_srows(srows: int):
    global _PACKED_SROWS
    _PACKED_SROWS = int(srows)


def _pick_pair_packed(ac: int, c: int, d: int) -> int:
    """Packed-kernel pair: pair*c must fill the 128 lanes exactly, the
    anchor chunk must split into pairs, and the out-store lane offsets
    (pair*d) must be 128-aligned."""
    pair, rem = divmod(128, c)
    if rem != 0 or pair < 2:
        return 0
    if ac % pair != 0 or (pair * d) % 128 != 0:
        return 0
    return pair


def _packed_wanted(c: int) -> bool:
    if _PACKED_MODE == 'auto':
        return c <= _PACKED_C_MAX
    return bool(_PACKED_MODE)


def _pick_n_sub_gather_w_packed(p: int, tp: int, kt: int, nt: int, c: int,
                                d: int, pair: int, ac: int, qp: int,
                                g_itemsize: int) -> int:
    """Subtiles per block for the packed W-fused forward."""
    grp = max(1, _PACKED_SROWS // tp)
    budget = _VMEM_BUDGET * 4
    lpg = kt * pair * c                          # lanes per anchor group
    fixed = (qp * ac * c + lpg * pair * d) * g_itemsize
    per_sub = (16 * tp * nt * 4                  # gx16 rows
               + tp * nt * 4                     # idx rows
               + tp * nt * qp * g_itemsize       # one-hot S
               + 2 * tp * nt * ac * c * g_itemsize   # gathered g (f32+gdt)
               + tp * (ac // pair) * lpg * g_itemsize  # fs rows
               + 2 * tp * ac * d * 4)            # out rows + og f32
    n_sub = max(grp, (budget - 2 * fixed) // (2 * per_sub))
    n_sub = min(n_sub, p // tp)
    while n_sub >= grp and ((p // tp) % n_sub != 0 or n_sub % grp != 0):
        n_sub -= 1
    return n_sub if n_sub >= grp else 0


def _select_g_all(idx_ref, tab_ref, gdt, prec):
    """One-hot MXU megagather of the support-table block: returns
    (s_onehot [rows, Q~], g_all [rows, AC*C])."""
    idxv = idx_ref[0, 0]
    rows = idxv.shape[0]
    qp = tab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    g_all = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(gdt)                            # [rows, AC*C]
    return s_onehot, g_all


def _build_packed_fs(gx8_ref, g_all, rk8k_ref, fs, *, tp, kt, nt, n_sub, ac,
                     c, pair, gdt, prec, tall=False):
    """Select-free packed conv pass: anchor-paired BD GEMMs whose pair
    diagonal [R, C] blocks are reduced with lane masks (register VPU ops —
    the lane concat this replaces is Mosaic-illegal, see _pick_gpk) into
    lane-dense [R, pair*C] values, stored per kernel slot into a 2-D
    scratch:

      wide (forward):  fs [T, (AC/pair) * K~ * (pair*C)]  lanes (g,k,i,cc)
      tall (dW2 bwd):  fs [(AC/pair) * T, K~ * (pair*C)]  rows (g, t)

    The tall layout puts the anchor group in ROWS so the dW2 contraction
    (which sums over anchors AND points) is a single dot over all rows.
    """
    s = tp * nt
    r = tp * kt
    pc = pair * c                                              # == 128
    lpg = kt * pc
    t = n_sub * tp
    grp = max(1, _PACKED_SROWS // tp)
    # lane-block index (which anchor-of-pair each lane belongs to)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (r, pc), 1) // c
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        pend = []
        for st in range(n_sub):
            wp = wp_all[:, st * s:(st + 1) * s]             # [pair*R, S]
            bd = jnp.maximum(wp, 0.0).astype(gdt)
            g_sub = g_all[st * s:(st + 1) * s,
                          g * pc:(g + 1) * pc]              # [S, pair*C]
            f2 = jax.lax.dot_general(
                bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                     # [pair*R, pair*C] f32
            # masked-diagonal reduction
            fd = jnp.where(lane_blk == 0, f2[0:r, :], 0.0)
            for i in range(1, pair):
                fd = fd + jnp.where(lane_blk == i,
                                    f2[i * r:(i + 1) * r, :], 0.0)
            pend.append(fd.astype(gdt))                     # [R, pair*C]
            if len(pend) == grp:
                off_r = (g * t if tall else 0) + (st + 1 - grp) * tp
                off_l = 0 if tall else g * lpg
                for k in range(kt):
                    blk = (pend[0][k * tp:(k + 1) * tp] if grp == 1 else
                           jnp.concatenate(
                               [q[k * tp:(k + 1) * tp] for q in pend],
                               axis=0))                     # [grp*tp, pc]
                    fs[off_r:off_r + grp * tp,
                       off_l + k * pc:off_l + (k + 1) * pc] = blk
                pend = []


def _fwd_gather_w_packed_kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref,
                                w2bd_ref, out_ref, fs, *, sigma, tp, kt, nt,
                                n_sub, ac, c, d, pair):
    """Gather + BD conv + learned GEMM with lane-dense narrow-c layout."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    _, g_all = _select_g_all(idx_ref, tab_ref, gdt, prec)
    _build_packed_fs(gx8_ref, g_all, rk8k_ref, fs, tp=tp, kt=kt, nt=nt,
                     n_sub=n_sub, ac=ac, c=c, pair=pair, gdt=gdt, prec=prec)
    lpg = kt * pair * c
    for g in range(ac // pair):
        og = jax.lax.dot_general(
            fs[:, g * lpg:(g + 1) * lpg], w2bd_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # [T, pair*D]
        out_ref[0, :, g * pair * d:(g + 1) * pair * d] = (
            og.astype(out_ref.dtype))


def _call_gather_w_packed(gx8, idx3, tab, rk8k, w2, sigma, tp, kt, nt, ac,
                          interpret, c, d, pair):
    b = gx8.shape[0]
    na = rk8k.shape[0]
    assert na % ac == 0, (na, ac)
    qp = tab.shape[1]
    p = gx8.shape[2] // nt
    gdt = tab.dtype
    n_sub = _pick_n_sub_gather_w_packed(p, tp, kt, nt, c, d, pair, ac, qp,
                                        jnp.dtype(gdt).itemsize)
    assert n_sub > 0, (p, tp, kt, nt, c, d, pair, ac, qp)
    t = n_sub * tp
    r = tp * kt
    rk8k_p = _pair_rk8k(rk8k, r, pair)
    # block-diagonal-expanded weight: rows (k, i, cc), cols (i', dd)
    w3 = w2.reshape(kt, c, d)
    eye = jnp.eye(pair, dtype=w2.dtype)
    w2bd = jnp.einsum('kcd,ij->kicjd', w3, eye).reshape(
        kt * pair * c, pair * d)
    out_shape = jax.ShapeDtypeStruct((b, p, na * d), gdt)
    return pl.pallas_call(
        functools.partial(_fwd_gather_w_packed_kernel, sigma=float(sigma),
                          tp=tp, kt=kt, nt=nt, n_sub=n_sub, ac=ac, c=c,
                          d=d, pair=pair),
        grid=(b, na // ac, p // t),
        in_specs=[
            pl.BlockSpec((1, 16, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, qp, ac * c), lambda bb, ci, pt: (bb, 0, ci)),
            pl.BlockSpec((ac // pair, 16, pair * r),
                         lambda bb, ci, pt: (ci, 0, 0)),
            pl.BlockSpec((kt * pair * c, pair * d),
                         lambda bb, ci, pt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, ac * d),
                               lambda bb, ci, pt: (bb, pt, ci)),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((t, (ac // pair) * kt * pair * c), gdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * na * (tp * kt) * nt * c
                   + 2 * b * p * nt * qp * na * c
                   + 2 * b * p * na * kt * c * d * pair),
            bytes_accessed=(tab.size * tab.dtype.itemsize
                            + b * p * na * d * 4
                            + (na // ac) * gx8.size // b
                            * gx8.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, tab, rk8k_p, w2bd)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan(n_neighbor: int, k: int):
    """(N~, TP, K~, R) for a neighbor count and kernel-point count.

    K~ only needs sublane (8) alignment — MXU pass count is identical for
    M in (tp*K~, next multiple of 128), so the smaller K~ wins: it shrinks
    the F tensor and the downstream learned GEMM by the pad fraction."""
    nt = 16
    while nt < n_neighbor:
        nt *= 2
    if nt > 128:
        raise ValueError(f'n_neighbor {n_neighbor} > 128 unsupported')
    tp = 128 // nt
    kt = _round_up(k, 8)
    return nt, tp, kt, tp * kt


def supported(n_neighbor: int, c_in: int) -> bool:
    """Shape gate: the kernel pays off (and tiles cleanly) only for real
    channel counts; tiny-C layers (block0 occupancy input) stay on the XLA
    mul-reduce path."""
    return n_neighbor <= 128 and c_in >= 32


def layer_fusable(p2: int, n_neighbor: int, k: int, c_in: int, na: int,
                  chunk: int, onehot: bool) -> bool:
    """Mosaic tiling gate for a whole fused layer (call before committing to
    the Pallas path; violations fall back to the XLA formulation).

    - The point grid walks tiles of TP rows: p2 must divide into them (small
      configs reach p2 < TP at deep strides).
    - The anchor-chunk grid dimension offsets (chunk*c_in)-wide lane blocks,
      which Mosaic requires to be 128-aligned — unless one chunk covers the
      whole lane dim, which only matches the array when no coordinate lanes
      are appended (the one-hot gather path)."""
    nt, tp, _, _ = plan(n_neighbor, k)
    if p2 % tp != 0:
        return False
    return (chunk * c_in) % 128 == 0 or (chunk == na and onehot)


def make_rk8(rk: jnp.ndarray, k2: jnp.ndarray, tp: int, kt: int,
             sigma: float) -> jnp.ndarray:
    """[AC, K, 3] rotated kernels + [K] squared norms -> [AC, 16, TP*K~]
    pre-tiled affine+mask-fold operand (see module docstring).

    The whole affine w' = 1 - d2/sigma is folded into the operand (scale by
    -1/sigma, bake 1 - |kappa|^2/sigma into the constant lane, mask rows at
    -BIG), so the kernel epilogue is a single max(x, 0) — the previous
    relu(1 - d2/sigma) epilogue was ~4 VPU ops over the full inflated
    [R, S] BD operand and measured comparable to the kernels' MXU time."""
    import numpy as np
    ac, k, _ = rk.shape
    inv_s = 1.0 / float(sigma)
    base = jnp.concatenate([
        (2.0 * inv_s) * rk,
        jnp.full((ac, k, 1), -inv_s, rk.dtype),
        jnp.broadcast_to(1.0 - inv_s * k2.reshape(1, k, 1), (ac, k, 1)),
        jnp.zeros((ac, k, 3), rk.dtype),
    ], axis=-1)                                            # [AC, K, 8]
    if kt > k:
        # sentinel: w' = -BIG on pad kernel rows (pad neighbor rows land
        # even lower: their gx2 slot is BIG and scales by -1/sigma)
        pad = jnp.zeros((ac, kt - k, 8), rk.dtype).at[:, :, 4].set(-_BIG)
        base = jnp.concatenate([base, pad], axis=1)        # [AC, K~, 8]
    tiled = jnp.tile(base, (1, tp, 1))                     # [AC, TP*K~, 8]
    # mask fold: component 8+j of row (t, k) is -BIG for j != t, so the dot
    # with gx16's onehot(t') lands below 0 exactly off the block diagonal
    t_of_row = np.repeat(np.arange(tp), kt)                # [TP*K~]
    mrows = -_BIG * (np.arange(8)[None, :] != t_of_row[:, None])
    mrows = mrows * (np.arange(8)[None, :] < tp)           # zero unused slots
    mask_fold = jnp.broadcast_to(
        jnp.asarray(mrows, rk.dtype)[None], (ac, tp * kt, 8))
    full = jnp.concatenate([tiled, mask_fold], axis=-1)    # [AC, TP*K~, 16]
    return jnp.transpose(full, (0, 2, 1))                  # [AC, 16, TP*K~]


def make_gx8(grouped_xyz: jnp.ndarray, nt: int) -> jnp.ndarray:
    """[B, P, N, 3] local coords -> [B, 16, P*N~] distance+mask-fold
    operand."""
    import numpy as np
    b, p, n, _ = grouped_xyz.shape
    gx2 = jnp.sum(grouped_xyz * grouped_xyz, axis=-1, keepdims=True)
    gx8 = jnp.concatenate([
        grouped_xyz, gx2,
        jnp.ones((b, p, n, 1), grouped_xyz.dtype),
        jnp.zeros((b, p, n, 3), grouped_xyz.dtype),
    ], axis=-1)                                            # [B, P, N, 8]
    if nt > n:
        # pad rows carry |gx|^2 = BIG so every kernel point sees d2 = BIG
        # => w = 0 (exact zero contribution in forward AND backward)
        pad = jnp.zeros((b, p, nt - n, 8), gx8.dtype).at[..., 3].set(_BIG)
        gx8 = jnp.concatenate([gx8, pad], axis=2)
    gx8 = gx8.reshape(b, p * nt, 8)
    # mask fold: onehot of the row's subtile slot t' = (s // nt) mod tp
    tp = 128 // nt
    s_idx = np.arange(p * nt)
    onehot = (np.arange(8)[None, :] == ((s_idx // nt) % tp)[:, None])
    onehot = jnp.broadcast_to(
        jnp.asarray(onehot, gx8.dtype)[None], (b, p * nt, 8))
    gx16 = jnp.concatenate([gx8, onehot], axis=-1)         # [B, P*N~, 16]
    return jnp.transpose(gx16, (0, 2, 1))


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _conv_body(gx8, g_of, rk8_ref, out_ref, *, sigma, tp, kt, nt, n_sub,
               ac, c, gdt):
    """Shared forward inner loop: per anchor, one masked-d2 dot and one
    block-diagonal GEMM per subtile. `g_of(a)` yields the [T*N~, C]
    neighbor-major feature block for anchor a."""
    s = tp * nt
    prec = _precision(gdt)
    for a in range(ac):
        # one wide K=16 dot per anchor: masked affine w' = 1 - d2/sigma for
        # every subtile at once (fold baked into rk8; see make_rk8). The dot
        # emits the compute dtype directly, so the epilogue is ONE max.
        wp_all = jax.lax.dot_general(
            rk8_ref[a], gx8, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # [R, T*N~]
        g_a = g_of(a)                                          # [T*N~, C]
        for st in range(n_sub):
            wp = wp_all[:, st * s:(st + 1) * s]                # [R, S]
            bd = jnp.maximum(wp, 0.0).astype(gdt)
            g_sub = g_a[st * s:(st + 1) * s, :]
            f = jax.lax.dot_general(
                bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                                # [R, C]
            out_ref[0, a, st * tp:(st + 1) * tp] = (
                f.reshape(tp, kt, c).astype(out_ref.dtype))


def _fwd_kernel(gx8_ref, g_ref, rk8_ref, out_ref, *, sigma, tp, kt, nt,
                n_sub, ac, c):
    # G is neighbor-major with flat (anchor, channel) lanes — the layout
    # the big row-gather produces with zero reshuffling
    _conv_body(gx8_ref[0], lambda a: g_ref[0, :, a * c:(a + 1) * c],
               rk8_ref, out_ref, sigma=sigma, tp=tp, kt=kt, nt=nt,
               n_sub=n_sub, ac=ac, c=c, gdt=g_ref.dtype)


def _fwd_gather_kernel(gx8_ref, idx_ref, tab_ref, rk8_ref, out_ref, *,
                       sigma, tp, kt, nt, n_sub, ac, c):
    """Forward with the megagather fused in: instead of streaming gathered
    [T*N~, AC*C] feature rows from HBM (written there by an XLA gather or
    one-hot GEMM), stream the [Q~, AC*C] support table once per anchor
    chunk and select rows in VMEM with a one-hot MXU GEMM — the 2 GB/layer
    HBM round trip of the gathered tensor disappears. Exact: one-hot rows
    select with fp32 accumulation."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    idxv = idx_ref[0, 0]                                       # [T*N~] int32
    rows = idxv.shape[0]
    qp = tab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)              # [T*N~, Q~]
    g_all = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(gdt)                            # [T*N~, AC*C]
    _conv_body(gx8_ref[0], lambda a: g_all[:, a * c:(a + 1) * c],
               rk8_ref, out_ref, sigma=sigma, tp=tp, kt=kt, nt=nt,
               n_sub=n_sub, ac=ac, c=c, gdt=gdt)


def _bwd_kernel(gx8_ref, df_ref, rk8_ref, dg_ref, *, sigma, tp, kt, nt,
                n_sub, ac, c):
    s = tp * nt
    r = tp * kt
    gdt = dg_ref.dtype
    prec = _precision(gdt)
    gx8 = gx8_ref[0]                                           # [16, T*N~]
    for a in range(ac):
        wpt_all = jax.lax.dot_general(
            gx8, rk8_ref[a], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # [T*N~, R]
        for st in range(n_sub):
            wpt = wpt_all[st * s:(st + 1) * s, :]              # [S, R]
            bdt = jnp.maximum(wpt, 0.0).astype(gdt)
            df_sub = df_ref[0, a, st * tp:(st + 1) * tp]       # [TP, K~, C]
            df2 = df_sub.reshape(r, c).astype(gdt)
            dg = jax.lax.dot_general(
                bdt, df2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                                # [S, C]
            dg_ref[0, st * s:(st + 1) * s, a * c:(a + 1) * c] = (
                dg.astype(dg_ref.dtype))


def _pick_n_sub(p: int, tp: int, kt: int, nt: int, c: int, ac: int,
                g_itemsize: int, o_itemsize: int) -> int:
    """Subtiles per block under a ~6 MB double-buffered VMEM budget."""
    budget = min(_VMEM_BUDGET, 24 * 1024 * 1024)
    per_sub = (16 * tp * nt * 4                # gx16 block rows
               + ac * tp * nt * c * g_itemsize  # G block
               + ac * tp * kt * c * o_itemsize)  # out block
    n_sub = max(1, budget // (2 * per_sub))
    while (p // tp) % n_sub != 0:
        n_sub -= 1
    return n_sub


def _pick_n_sub_gather(p: int, tp: int, kt: int, nt: int, c: int, ac: int,
                       qp: int, g_itemsize: int, o_itemsize: int) -> int:
    """Subtiles per block for the gather-fused kernel: the support-table
    block is grid-step-fixed; S and the gathered G scale with n_sub."""
    budget = min(_VMEM_BUDGET, 32 * 1024 * 1024)
    fixed = qp * ac * c * g_itemsize               # support table block
    per_sub = (16 * tp * nt * 4                    # gx16 block rows
               + tp * nt * 4                       # idx rows
               + tp * nt * qp * g_itemsize         # one-hot S
               + 2 * tp * nt * ac * c * g_itemsize  # gathered G (f32 + gdt)
               + ac * tp * kt * c * o_itemsize)    # out block
    n_sub = max(1, (budget - 2 * fixed) // (2 * per_sub))
    n_sub = min(n_sub, p // tp)
    while (p // tp) % n_sub != 0:
        n_sub -= 1
    return n_sub


def gather_fusable(q: int, ac: int, c: int, itemsize: int) -> bool:
    """Gate for the gather-fused forward: the whole support-table anchor
    chunk must fit VMEM comfortably alongside the working set."""
    qp = _round_up(q, 8)
    return qp * ac * c * itemsize <= 4 * 1024 * 1024 and qp <= 2048


def _call_gather(gx8, idx3, tab, rk8, out_shape, sigma, tp, kt, nt, ac,
                 interpret, c):
    """pallas_call wiring for the gather-fused forward kernel.

    idx3 [B, 1, P*N~] int32 neighbor rows; tab [B, Q~, NA*C] support table
    (shadow row included, padded to Q~ = ceil8(q)); gx8/rk8 as in _call."""
    b = gx8.shape[0]
    na = rk8.shape[0]
    assert na % ac == 0, (na, ac)
    qp = tab.shape[1]
    p = gx8.shape[2] // nt
    n_sub = _pick_n_sub_gather(p, tp, kt, nt, c, ac, qp,
                               tab.dtype.itemsize, out_shape.dtype.itemsize)
    t = n_sub * tp
    return pl.pallas_call(
        functools.partial(_fwd_gather_kernel, sigma=float(sigma), tp=tp,
                          kt=kt, nt=nt, n_sub=n_sub, ac=ac, c=c),
        grid=(b, p // t, na // ac),
        in_specs=[
            pl.BlockSpec((1, 16, t * nt), lambda bb, pt, ci: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t * nt), lambda bb, pt, ci: (bb, 0, pt)),
            pl.BlockSpec((1, qp, ac * c), lambda bb, pt, ci: (bb, 0, ci)),
            pl.BlockSpec((ac, 16, tp * kt), lambda bb, pt, ci: (ci, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ac, t, kt, c),
                               lambda bb, pt, ci: (bb, ci, pt, 0, 0)),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * na * (tp * kt) * nt * c
                   + 2 * b * p * nt * qp * na * c),
            bytes_accessed=(tab.size * tab.dtype.itemsize * (p // t)
                            + int(np.prod(out_shape.shape))
                            * out_shape.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, tab, rk8)


def _call(kernel, gx8, gdata, rk8, out_shape, sigma, tp, kt, nt, ac,
          gdata_p_dim, out_p_dim, interpret, gdata_c):
    """Shared pallas_call wiring for the forward and backward kernels.

    The neighbor-major tensor (G forward / dG backward) is
    [B, P*N~, NA*C] — flat (anchor, channel) lanes, exactly the row-gather
    layout; the kernel-point tensor (F forward / dF backward) is
    [B, NA, P, K~, C]. Which operand is which swaps between forward and
    backward ({gdata,out}_p_dim 'flat' / 'tiled'). Anchors are covered in
    chunks of `ac` by a third grid dimension whose index_map offsets the
    lane blocks — no anchor-chunk slicing/copies at the XLA level."""
    b = gx8.shape[0]
    na = rk8.shape[0]
    assert na % ac == 0, (na, ac)
    c = gdata_c
    p = gx8.shape[2] // nt
    n_sub = _pick_n_sub(p, tp, kt, nt, c, ac, gdata.dtype.itemsize,
                        out_shape.dtype.itemsize)
    t = n_sub * tp
    s = tp * nt

    def spec_flat():
        return pl.BlockSpec((1, t * nt, ac * c),
                            lambda bb, pt, ci: (bb, pt, ci))

    def spec_tiled():
        return pl.BlockSpec((1, ac, t, kt, c),
                            lambda bb, pt, ci: (bb, ci, pt, 0, 0))

    gdata_spec = spec_flat() if gdata_p_dim == 'flat' else spec_tiled()
    out_spec = spec_flat() if out_p_dim == 'flat' else spec_tiled()

    return pl.pallas_call(
        functools.partial(kernel, sigma=float(sigma), tp=tp, kt=kt, nt=nt,
                          n_sub=n_sub, ac=ac, c=c),
        grid=(b, p // t, na // ac),
        in_specs=[
            pl.BlockSpec((1, 16, t * nt), lambda bb, pt, ci: (bb, 0, pt)),
            gdata_spec,
            pl.BlockSpec((ac, 16, tp * kt), lambda bb, pt, ci: (ci, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * na * (tp * kt) * nt * c,
            bytes_accessed=(gdata.size * gdata.dtype.itemsize
                            + int(np.prod(out_shape.shape))
                            * out_shape.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(gx8, gdata, rk8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_neighbor_conv(gx8, G, rk8, sigma, tp, kt, nt, ac=None,
                        extra_lanes=0, interpret=False):
    """F[b,a,p,k~,c] = sum_n relu(1 - d2/sigma) * G — Pallas block-diag MXU.

    gx8 [B, 8, P*N~] (make_gx8); G [B, P*N~, NA*C + extra_lanes]
    neighbor-major gathered features (shadow-padded to N~; flat
    anchor-channel lanes — the layout a single row-gather from a
    [b, q, na*c (+ packed coords)] support table produces; trailing
    extra_lanes are ignored by the kernel and undefined in the cotangent);
    rk8 [NA, 8, TP*K~] (make_rk8); ac = anchors per grid step (VMEM knob,
    divides NA; default NA).
    Returns F [B, NA, P, K~, C] in G's dtype (rows k >= K are zero).
    """
    return _fused_fwd(gx8, G, rk8, sigma, tp, kt, nt, ac, extra_lanes,
                      interpret)[0]


def _fused_fwd(gx8, G, rk8, sigma, tp, kt, nt, ac, extra_lanes, interpret):
    b, na = G.shape[0], rk8.shape[0]
    p = gx8.shape[2] // nt
    c = (G.shape[-1] - extra_lanes) // na
    out_shape = jax.ShapeDtypeStruct((b, na, p, kt, c), G.dtype)
    f = _call(_fwd_kernel, gx8, G, rk8, out_shape, sigma, tp, kt, nt,
              ac or na, gdata_p_dim='flat', out_p_dim='tiled',
              interpret=interpret, gdata_c=c)
    return f, (gx8, rk8)


def _fused_bwd(sigma, tp, kt, nt, ac, extra_lanes, interpret, res, df):
    gx8, rk8 = res
    b, na, p, _, c = df.shape
    gdt = df.dtype
    dg_shape = jax.ShapeDtypeStruct((b, p * nt, na * c + extra_lanes), gdt)
    dg = _call(_bwd_kernel, gx8, df.astype(gdt), rk8, dg_shape, sigma, tp,
               kt, nt, ac or na, gdata_p_dim='tiled', out_p_dim='flat',
               interpret=interpret, gdata_c=c)
    return jnp.zeros_like(gx8), dg, jnp.zeros_like(rk8)


fused_neighbor_conv.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_gather_neighbor_conv(gx8, idx3, table, rk8, sigma, tp, kt, nt,
                               ac=None, interpret=False):
    """fused_neighbor_conv with the megagather fused into the kernel.

    gx8 [B, 16, P*N~] (make_gx8); idx3 [B, 1, P*N~] int32 support-row
    indices (shadow-padded to N~); table [B, Q~, NA*C] support features
    (shadow row zero, rows >= q zero-padded to Q~ = ceil8(q)); rk8
    [NA, 16, TP*K~]. Returns F [B, NA, P, K~, C] in table's dtype.

    The backward runs the mirrored BD^T kernel to dG rows, then folds them
    to dTable with the transposed one-hot einsum (an MXU GEMM, not a
    scatter-add).
    """
    return _fgnc_fwd(gx8, idx3, table, rk8, sigma, tp, kt, nt, ac,
                     interpret)[0]


def _fgnc_fwd(gx8, idx3, table, rk8, sigma, tp, kt, nt, ac, interpret):
    b, na = table.shape[0], rk8.shape[0]
    p = gx8.shape[2] // nt
    c = table.shape[-1] // na
    out_shape = jax.ShapeDtypeStruct((b, na, p, kt, c), table.dtype)
    f = _call_gather(gx8, idx3, table, rk8, out_shape, sigma, tp, kt, nt,
                     ac or na, interpret, c)
    # zero-size residual carries the (static) table row count + dtype
    tab_meta = jnp.zeros((0, table.shape[1]), table.dtype)
    return f, (gx8, idx3, rk8, tab_meta)


def _fgnc_bwd(sigma, tp, kt, nt, ac, interpret, res, df):
    gx8, idx3, rk8, tab_meta = res
    tab_dtype = tab_meta.dtype
    b, na, p, _, c = df.shape
    gdt = df.dtype
    dg_shape = jax.ShapeDtypeStruct((b, p * nt, na * c), gdt)
    dg = _call(_bwd_kernel, gx8, df.astype(gdt), rk8, dg_shape, sigma, tp,
               kt, nt, ac or na, gdata_p_dim='tiled', out_p_dim='flat',
               interpret=interpret, gdata_c=c)
    qp = tab_meta.shape[1]
    prec = (jax.lax.Precision.HIGHEST if tab_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s_onehot = jax.nn.one_hot(idx3[:, 0, :], qp, dtype=gdt)
    dtab = jnp.einsum('brq,brl->bql', s_onehot, dg,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(tab_dtype)
    return (jnp.zeros_like(gx8), np.zeros(idx3.shape, jax.dtypes.float0),
            dtab, jnp.zeros_like(rk8))


fused_gather_neighbor_conv.defvjp(_fgnc_fwd, _fgnc_bwd)


# ---------------------------------------------------------------------------
# W-fused variant: the learned (k, c) -> d contraction (the reference
# BasicSO3Conv matmul, so3conv/modules.py:48-55) runs INSIDE the kernel on
# VMEM-resident f slabs, so the [b, na, p, k~, c] F tensor never exists in
# HBM. On the flagship model F is 1.5-3 GB per layer; the XLA learned GEMM
# that consumed it ran HBM-bound at 23-46 TF/s (measured), and the kernel
# paid to write it. Here the BD rows are ordered k-major so each kernel
# slot's [TP, C] block is a contiguous sublane slab, collected across
# subtiles into an [K~, T, C] scratch and contracted as K~ [T, C] x [C, D]
# MXU GEMMs with f32 ref accumulation.
# ---------------------------------------------------------------------------


def make_rk8_kmajor(rk: jnp.ndarray, k2: jnp.ndarray, tp: int,
                    kt: int, sigma: float) -> jnp.ndarray:
    """make_rk8 with rows ordered (k, t') instead of (t', k): row r = k*TP+t'.

    The BD product's rows inherit this order, so f[k*TP:(k+1)*TP] is kernel
    slot k's [TP, C] block — sublane-sliceable for the in-kernel learned
    GEMM. Affine fold as in make_rk8."""
    ac, k, _ = rk.shape
    inv_s = 1.0 / float(sigma)
    base = jnp.concatenate([
        (2.0 * inv_s) * rk,
        jnp.full((ac, k, 1), -inv_s, rk.dtype),
        jnp.broadcast_to(1.0 - inv_s * k2.reshape(1, k, 1), (ac, k, 1)),
        jnp.zeros((ac, k, 3), rk.dtype),
    ], axis=-1)                                            # [AC, K, 8]
    if kt > k:
        pad = jnp.zeros((ac, kt - k, 8), rk.dtype).at[:, :, 4].set(-_BIG)
        base = jnp.concatenate([base, pad], axis=1)        # [AC, K~, 8]
    tiled = jnp.repeat(base, tp, axis=1)                   # rows (k, t')
    t_of_row = np.tile(np.arange(tp), kt)                  # [K~*TP]
    mrows = -_BIG * (np.arange(8)[None, :] != t_of_row[:, None])
    mrows = mrows * (np.arange(8)[None, :] < tp)
    mask_fold = jnp.broadcast_to(
        jnp.asarray(mrows, rk.dtype)[None], (ac, kt * tp, 8))
    full = jnp.concatenate([tiled, mask_fold], axis=-1)    # [AC, K~*TP, 16]
    return jnp.transpose(full, (0, 2, 1))                  # [AC, 16, TP*K~]


def _pick_n_sub_gather_w(p: int, tp: int, kt: int, nt: int, c: int, d: int,
                         ac: int, qp: int, g_itemsize: int,
                         bwd: bool = False) -> int:
    """Subtiles per block for the W-fused gather kernel. Must satisfy
    n_sub % grp == 0 (grp subtiles batch into one 8-sublane-aligned fs
    store) and n_sub | (p // tp). Returns 0 if unsatisfiable."""
    grp = max(1, 8 // tp)
    # The backward's extra slabs (dFs, dgs, dtab) roughly double the
    # working set; give it a larger budget so the point tiles (and the K of
    # the merged dtab GEMM) stay big — streaming state is still far below
    # the 100 MB pallas_call limit. Multiplier from a per-layer sweep
    # (scripts/bench_wbwd.py).
    if bwd:
        # per-layer sweep (scripts/bench_wbwd.py sweep): 8x everywhere
        # except the tp=4 big-table layers (B1L0 shape), where 4x wins
        budget = _VMEM_BUDGET * (4 if (tp == 4 and qp >= 512)
                                 else _BWD_BUDGET_MULT)
    else:
        # forward sweep (scripts/bench_wbwd.py fwd): bigger tiles win on
        # every flagship layer (7.53 -> 7.07 ms on B0L1 etc.)
        budget = _VMEM_BUDGET * 4
    fixed = (qp * ac * c + kt * c * d) * g_itemsize
    if bwd:
        fixed += qp * ac * c * 4                # dtab out block (f32)
    per_sub = (16 * tp * nt * 4                 # gx16 rows
               + tp * nt * 4                    # idx rows
               + tp * nt * qp * g_itemsize      # one-hot S
               + 2 * tp * nt * ac * c * g_itemsize   # gathered g (f32+gdt)
               + kt * ac * tp * max(c, 128) * g_itemsize  # fs slab
               + tp * ac * d * 4                # out block
               + tp * ac * d * 4)               # acc
    if bwd:
        per_sub += (kt * ac * tp * max(c, 128) * g_itemsize  # dFs slab
                    + tp * nt * ac * c * g_itemsize)         # dgs rows
    n_sub = max(grp, (budget - 2 * fixed) // (2 * per_sub))
    n_sub = min(n_sub, p // tp)
    while n_sub >= grp and ((p // tp) % n_sub != 0 or n_sub % grp != 0):
        n_sub -= 1
    return n_sub if n_sub >= grp else 0


# Override for perf sweeps: None = measured rule, True/False = force
_W_FUSE_OVERRIDE = None


def set_w_fuse_override(val):
    global _W_FUSE_OVERRIDE
    _W_FUSE_OVERRIDE = val


def gather_w_fusable(p2: int, qp: int, ac: int, c: int, d: int, kt: int,
                     nt: int, tp: int, itemsize: int) -> bool:
    """Gate for the W-fused gather kernel (on top of gather_fusable).

    Narrow-channel layers (c <= 32) W-fuse ONLY through the packed kernel
    (_fwd_gather_w_packed_kernel): the standard W-fused kernel's k-major
    row -> lane transpose (fs scratch + per-(subtile, pair) diagonal
    extraction) dominates at c=32 — measured 38.8 ms of the 3DMatch ib1l0
    layer's 64.7 ms (b48, round 4). When the packed shape gates fail there,
    the unfused path (F to HBM + XLA einsum) pays the F round trip instead,
    which is small at these widths; wide layers amortize the fs traffic
    and save the 1.5-3 GB F tensor (round-1 measurement)."""
    if _W_FUSE_OVERRIDE is not None:
        if not _W_FUSE_OVERRIDE:
            return False
    if (ac * d) % 128 != 0:
        return False
    pair_p = _pick_pair_packed(ac, c, d)
    packed_ok = (pair_p > 0 and _packed_wanted(c)
                 and _pick_n_sub_gather_w_packed(p2, tp, kt, nt, c, d,
                                                 pair_p, ac, qp,
                                                 itemsize) > 0)
    if _W_FUSE_OVERRIDE is None and c <= 32 and not packed_ok:
        return False
    fwd_ok = packed_ok or _pick_n_sub_gather_w(p2, tp, kt, nt, c, d, ac, qp,
                                               itemsize) > 0
    return (fwd_ok
            and _pick_n_sub_gather_w(p2, tp, kt, nt, c, d, ac, qp, itemsize,
                                     bwd=True) > 0)


def _fwd_gather_w_kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref, w2_ref,
                         out_ref, fs, acc, *, sigma, tp, kt, nt, n_sub, ac,
                         c, d, pair=1):
    """Gather + BD conv + learned GEMM, one grid step = (batch, point tile,
    anchor chunk). fs [K~, AC*T, C] collects the conv output k-major across
    the WHOLE anchor chunk (row a*T+t), so the learned contraction runs as
    just K~ GEMMs [AC*T, C] x [C, D] with a full MXU M dimension (AC*T
    ~320) — per-anchor GEMMs with M = T ran at 12 TF/s measured.

    pair=2: anchor-paired BD GEMMs (see _PAIR) — rk8k_ref is the paired
    [AC//2, 16, 2R] operand, each BD GEMM covers two anchors at N = 2C."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    idxv = idx_ref[0, 0]                                       # [T*N~] int32
    rows = idxv.shape[0]
    qp = tab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    g_all = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(gdt)                            # [T*N~, AC*C]
    s = tp * nt
    t = n_sub * tp
    r = tp * kt
    grp = max(1, 8 // tp)
    # (measured round 4, ib1l0 b48: batching MORE subtiles per fs store —
    # rows 8 -> 32, 4x fewer stores — made the layer 64.7 -> 72.7 ms; the
    # store count is not the bottleneck, the wider pend concat is. Keep the
    # minimal 8-sublane-aligned batching.)
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        pend = [[] for _ in range(pair)]
        for st in range(n_sub):
            wp = wp_all[:, st * s:(st + 1) * s]             # [pair*R, S]
            bd = jnp.maximum(wp, 0.0).astype(gdt)
            g_sub = g_all[st * s:(st + 1) * s,
                          g * pair * c:(g + 1) * pair * c]  # [S, pair*C]
            f2 = jax.lax.dot_general(
                bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)        # [pair*R, pair*C] k-major
            for i in range(pair):
                a = g * pair + i
                f = f2[i * r:(i + 1) * r, i * c:(i + 1) * c]
                pend[i].append(f.reshape(kt, tp, c))
                if len(pend[i]) == grp:
                    blk = (pend[i][0] if grp == 1
                           else jnp.concatenate(pend[i], axis=1))
                    off = a * t + (st + 1 - grp) * tp
                    fs[:, off:off + grp * tp, :] = blk
                    pend[i] = []
    acc[:] = jnp.zeros_like(acc)
    # group kernel-point slabs so the learned GEMM's K dim is long:
    # per-slab K = C leaves the MXU K-stream half-empty for narrow layers
    # (c=64 -> K=64), and the kt short-K passes are fill-dominated. A lane
    # concat of kg slabs is one cheap VMEM copy.
    kg = _pick_kg(kt, c)
    for k0 in range(0, kt, kg):
        lhs = (fs[k0] if kg == 1 else jnp.concatenate(
            [fs[k0 + i] for i in range(kg)], axis=1))          # [AC*T, kg*C]
        acc[:] += jax.lax.dot_general(
            lhs, w2_ref[k0 * c:(k0 + kg) * c, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # [AC*T, D]
    for a in range(ac):
        out_ref[0, :, a * d:(a + 1) * d] = (
            acc[a * t:(a + 1) * t].astype(out_ref.dtype))


def _call_gather_w(gx8, idx3, tab, rk8k, w2, sigma, tp, kt, nt, ac,
                   interpret, c, d):
    b = gx8.shape[0]
    na = rk8k.shape[0]
    assert na % ac == 0, (na, ac)
    qp = tab.shape[1]
    p = gx8.shape[2] // nt
    gdt = tab.dtype
    pair_p = _pick_pair_packed(ac, c, d)
    if (pair_p and _packed_wanted(c)
            and _pick_n_sub_gather_w_packed(p, tp, kt, nt, c, d, pair_p, ac,
                                            qp, jnp.dtype(gdt).itemsize) > 0):
        return _call_gather_w_packed(gx8, idx3, tab, rk8k, w2, sigma, tp,
                                     kt, nt, ac, interpret, c, d, pair_p)
    n_sub = _pick_n_sub_gather_w(p, tp, kt, nt, c, d, ac, qp,
                                 jnp.dtype(gdt).itemsize)
    assert n_sub > 0, (p, tp, kt, nt, c, d, ac, qp)
    t = n_sub * tp
    r = tp * kt
    pair = _pick_pair(ac, c)
    if pair > 1:
        rk8k = _pair_rk8k(rk8k, r, pair)
    # output in the table's (compute) dtype: accumulation is f32 in-kernel,
    # and a bf16 activation chain halves the HBM write
    out_shape = jax.ShapeDtypeStruct((b, p, na * d), gdt)
    # point tiles are the FASTEST grid dim so the support-table block stays
    # VMEM-resident across them (it only changes with the anchor chunk)
    return pl.pallas_call(
        functools.partial(_fwd_gather_w_kernel, sigma=float(sigma), tp=tp,
                          kt=kt, nt=nt, n_sub=n_sub, ac=ac, c=c, d=d,
                          pair=pair),
        grid=(b, na // ac, p // t),
        in_specs=[
            pl.BlockSpec((1, 16, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, qp, ac * c), lambda bb, ci, pt: (bb, 0, ci)),
            pl.BlockSpec((ac // pair, 16, pair * r),
                         lambda bb, ci, pt: (ci, 0, 0)),
            pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, ac * d),
                               lambda bb, ci, pt: (bb, pt, ci)),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((kt, ac * t, c), gdt),
                        pltpu.VMEM((ac * t, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * na * (tp * kt) * nt * c
                   + 2 * b * p * nt * qp * na * c
                   + 2 * b * p * na * kt * c * d),
            bytes_accessed=(tab.size * tab.dtype.itemsize
                            + b * p * na * d * 4
                            + (na // ac) * b * gx8.size // b
                            * gx8.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, tab, rk8k, w2)


def _bwd_gather_w_kernel(gx8_ref, idx_ref, tab_ref, rk8k_ref, w2_ref,
                         dout_ref, dtab_ref, dw2_ref, fs, dFs, dacc, dgs, *,
                         sigma, tp, kt, nt, n_sub, ac, c, d, pair=1):
    """Fully fused backward of _fwd_gather_w_kernel: ONE kernel computes
    dTable (via k-major BD^T and the transposed one-hot select) and dW2
    (via recomputed f slabs), accumulating both in VMEM across grid steps
    (their block indices are constant along the point-tile grid dim, so the
    blocks persist; dW2's is constant across the whole grid). The F-sized
    dF/F tensors the XLA-composed backward materialized in HBM (~8 HBM
    passes/layer, 53 ms of conv fusions + 15 ms of layout copies measured
    on the training step) never exist."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    pt = pl.program_id(2)
    first_all = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pt == 0))

    @pl.when(pt == 0)
    def _zero_dtab():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    @pl.when(first_all)
    def _zero_dw2():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    idxv = idx_ref[0, 0]
    rows = idxv.shape[0]
    qp = tab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    g_all = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(gdt)                            # [T*N~, AC*C]
    s = tp * nt
    t = n_sub * tp
    grp = max(1, 8 // tp)
    # dacc [AC*T, D]: dout rows regrouped anchor-major
    for a in range(ac):
        dacc[a * t:(a + 1) * t, :] = dout_ref[0, :, a * d:(a + 1) * d]
    # dF slabs [K~, AC*T, C]: dF_k = dout W_k^T, M = AC*T. Slabs grouped so
    # the GEMM N dim is >= 256 (single-slab N = C starves the MXU for
    # narrow layers); misaligned static lane reads of the grouped output
    # lower fine.
    kg = _pick_kg(kt, c)
    for k0 in range(0, kt, kg):
        blk = jax.lax.dot_general(
            dacc[:], w2_ref[k0 * c:(k0 + kg) * c, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(gdt)                        # [AC*T, kg*C]
        for i in range(kg):
            dFs[k0 + i] = blk[:, i * c:(i + 1) * c]
    r = tp * kt
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        pend = [[] for _ in range(pair)]
        for st in range(n_sub):
            wp = wp_all[:, st * s:(st + 1) * s]             # [pair*R, S]
            bd = jnp.maximum(wp, 0.0).astype(gdt)
            # recompute f (k-major) for dW2 — anchor-paired like the forward
            g_sub = g_all[st * s:(st + 1) * s,
                          g * pair * c:(g + 1) * pair * c]
            f2 = jax.lax.dot_general(
                bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)                 # [pair*R, pair*C]
            for i in range(pair):
                a = g * pair + i
                f = f2[i * r:(i + 1) * r, i * c:(i + 1) * c]
                pend[i].append(f.reshape(kt, tp, c))
                if len(pend[i]) == grp:
                    blk = (pend[i][0] if grp == 1
                           else jnp.concatenate(pend[i], axis=1))
                    off = a * t + (st + 1 - grp) * tp
                    fs[:, off:off + grp * tp, :] = blk
                    pend[i] = []
                # dg rows for this subtile: BD^T (k-major columns) @ dF slab
                bd_a = bd[i * r:(i + 1) * r, :]             # [R, S]
                dF_ast = dFs[:, a * t + st * tp:a * t + (st + 1) * tp, :]
                dg_sub = jax.lax.dot_general(
                    bd_a, dF_ast.reshape(kt * tp, c),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec).astype(gdt)                # [S, C]
                dgs[st * s:(st + 1) * s, a * c:(a + 1) * c] = dg_sub
    # transposed one-hot: scatter ALL dg rows back to support rows in ONE
    # [Q~, rows] x [rows, AC*C] GEMM + ONE accumulate per grid step. The
    # previous per-(anchor, subtile) formulation did n_sub*ac small
    # [Q~, C] GEMMs each with a VMEM read-modify-write of the dtab block
    # (measured: backward ran at 2.4-4.3x the forward instead of the ~2.1x
    # its MACs predict; this was the gap).
    dtab_ref[0] += jax.lax.dot_general(
        s_onehot, dgs[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                        # [Q~, AC*C]
    # dW2 += f^T dOut (contract the AC*T rows); slabs grouped like the
    # forward so M = kg*C fills MXU tiles instead of kt quarter-tiles
    for k0 in range(0, kt, kg):
        lhs = (fs[k0] if kg == 1 else jnp.concatenate(
            [fs[k0 + i] for i in range(kg)], axis=1))          # [AC*T, kg*C]
        dw2_ref[k0 * c:(k0 + kg) * c, :] += jax.lax.dot_general(
            lhs, dacc[:].astype(gdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                    # [kg*C, D] f32


# ---------------------------------------------------------------------------
# Split backward: the one-kernel backward (_bwd_gather_w_kernel) juggles four
# big VMEM scratches (fs, dFs, dacc, dgs) plus the select + five GEMM kinds
# in ONE inner loop; on the tp=4 strided layers it measured 2.4-3.3x the
# forward where MACs predict ~2.1x, and stage ablation
# (scripts/ablate_wbwd.py, B1L0 b12: full 16.1 ms, nodg 8.1, nof2 9.7)
# showed the two inner-loop halves each cost far above their GEMM floor —
# the classic too-many-live-values register-spill signature. The two halves
# are INDEPENDENT: dtab needs (dout, w2, bd) and dW2 needs (table, bd,
# dout); splitting them into two kernels costs one extra select + wp dot
# and halves each kernel's scratch set. Measured B1L0 b12: 16.1 -> 9.2 ms.
# ---------------------------------------------------------------------------


def _bwd_kernel_dtab(gx8_ref, idx_ref, rk8k_ref, w2_ref, dout_ref, dtab_ref,
                     dFs, dacc, dgs, *, tp, kt, nt, n_sub, ac, c, d,
                     pair=1):
    """dTable half: dF slabs from (dout @ W^T), dg rows via BD^T, transposed
    one-hot accumulate. No table select, no f recompute, no fs scratch.

    tp=4 alignment: the per-(a, st) dg GEMM needs dF rows at offsets
    a*t + st*tp — 4-row sublane starts that Mosaic services as misaligned
    narrow reads (measured as half the one-kernel backward's cost,
    scripts/ablate_wbwd.py). The VMEM read is batched over SUBTILE PAIRS
    ([K~, 8, C] at 8-aligned starts) and each subtile's [K~, TP, C] half is
    sliced in registers. ((a, st)-major dFs with k-paired writes would make
    the reads fully contiguous, but Mosaic rejects the dim-1 concat that
    write needs: "result/input offset mismatch on non-concat dimension".)"""
    gdt = dout_ref.dtype
    prec = _precision(gdt)
    pt = pl.program_id(2)

    @pl.when(pt == 0)
    def _zero_dtab():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    idxv = idx_ref[0, 0]
    rows = idxv.shape[0]
    qp = dtab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    s = tp * nt
    t = n_sub * tp
    for a in range(ac):
        dacc[a * t:(a + 1) * t, :] = dout_ref[0, :, a * d:(a + 1) * d]
    kg = _pick_kg(kt, c)
    for k0 in range(0, kt, kg):
        blk = jax.lax.dot_general(
            dacc[:], w2_ref[k0 * c:(k0 + kg) * c, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(gdt)                        # [AC*T, kg*C]
        for i in range(kg):
            dFs[k0 + i] = blk[:, i * c:(i + 1) * c]
    r = tp * kt
    # read dF in 8-row-aligned subtile groups, slice per subtile in registers
    stg = 1 if tp >= 8 else 8 // tp
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        for st0 in range(0, n_sub, stg):
            dfg = [None] * pair
            for i in range(pair):
                a = g * pair + i
                dfg[i] = dFs[:, a * t + st0 * tp:
                             a * t + (st0 + stg) * tp, :]   # [K~, 8, C]
            for sj in range(stg):
                st = st0 + sj
                wp = wp_all[:, st * s:(st + 1) * s]         # [pair*R, S]
                bd = jnp.maximum(wp, 0.0).astype(gdt)
                for i in range(pair):
                    a = g * pair + i
                    bd_a = bd[i * r:(i + 1) * r, :]         # [R, S]
                    dfi = (dfg[i] if stg == 1
                           else dfg[i][:, sj * tp:(sj + 1) * tp, :])
                    dg_sub = jax.lax.dot_general(
                        bd_a, dfi.reshape(kt * tp, c),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(gdt)            # [S, C]
                    dgs[st * s:(st + 1) * s, a * c:(a + 1) * c] = dg_sub
    dtab_ref[0] += jax.lax.dot_general(
        s_onehot, dgs[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                        # [Q~, AC*C]


def _bwd_kernel_dw2(gx8_ref, idx_ref, tab_ref, rk8k_ref, dout_ref, dw2_ref,
                    fs, dacc, *, tp, kt, nt, n_sub, ac, c, d, pair=1):
    """dW2 half: select + BD conv recompute f slabs, contract against dout.
    No dFs/dgs scratches, no dtab block."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    first_all = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

    @pl.when(first_all)
    def _zero_dw2():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    idxv = idx_ref[0, 0]
    rows = idxv.shape[0]
    qp = tab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    g_all = jax.lax.dot_general(
        s_onehot, tab_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(gdt)                            # [T*N~, AC*C]
    s = tp * nt
    t = n_sub * tp
    grp = max(1, 8 // tp)
    r = tp * kt
    for a in range(ac):
        dacc[a * t:(a + 1) * t, :] = dout_ref[0, :, a * d:(a + 1) * d]
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        pend = [[] for _ in range(pair)]
        for st in range(n_sub):
            wp = wp_all[:, st * s:(st + 1) * s]
            bd = jnp.maximum(wp, 0.0).astype(gdt)
            g_sub = g_all[st * s:(st + 1) * s,
                          g * pair * c:(g + 1) * pair * c]
            f2 = jax.lax.dot_general(
                bd, g_sub, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(gdt)                 # [pair*R, pair*C]
            for i in range(pair):
                a = g * pair + i
                f = f2[i * r:(i + 1) * r, i * c:(i + 1) * c]
                pend[i].append(f.reshape(kt, tp, c))
                if len(pend[i]) == grp:
                    blk = (pend[i][0] if grp == 1
                           else jnp.concatenate(pend[i], axis=1))
                    off = a * t + (st + 1 - grp) * tp
                    fs[:, off:off + grp * tp, :] = blk
                    pend[i] = []
    kg = _pick_kg(kt, c)
    for k0 in range(0, kt, kg):
        lhs = (fs[k0] if kg == 1 else jnp.concatenate(
            [fs[k0 + i] for i in range(kg)], axis=1))          # [AC*T, kg*C]
        dw2_ref[k0 * c:(k0 + kg) * c, :] += jax.lax.dot_general(
            lhs, dacc[:].astype(gdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


def _bwd_kernel_dw2_packed(gx8_ref, idx_ref, tab_ref, rk8k_ref, dout_ref,
                           dw2_ref, fs, dacc, *, tp, kt, nt, n_sub, ac, c,
                           d, pair):
    """Packed dW2 half: the lane-dense fs build in the TALL layout (anchor
    group in rows), then the whole dW2 contribution is ONE dot contracting
    all (g, t) rows against the anchor-group-stacked dout rows; the
    (i == i') diagonal [C, D] blocks of the [lpg, pair*D] result accumulate
    into dW2 (kt VPU slice-adds; cross-anchor blocks are discarded).
    Replaces the per-anchor half-lane fs stores of _bwd_kernel_dw2 at
    c < 128."""
    gdt = tab_ref.dtype
    prec = _precision(gdt)
    first_all = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

    @pl.when(first_all)
    def _zero_dw2():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    _, g_all = _select_g_all(idx_ref, tab_ref, gdt, prec)
    _build_packed_fs(gx8_ref, g_all, rk8k_ref, fs, tp=tp, kt=kt, nt=nt,
                     n_sub=n_sub, ac=ac, c=c, pair=pair, gdt=gdt, prec=prec,
                     tall=True)
    pc = pair * c
    t = n_sub * tp
    for g in range(ac // pair):
        dacc[g * t:(g + 1) * t, :] = (
            dout_ref[0, :, g * pair * d:(g + 1) * pair * d])
    res = jax.lax.dot_general(
        fs[...], dacc[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                  # [lpg, pair*D] f32
    for k in range(kt):
        acc = res[k * pc:k * pc + c, 0:d]
        for i in range(1, pair):
            acc = acc + res[k * pc + i * c:k * pc + (i + 1) * c,
                            i * d:(i + 1) * d]
        dw2_ref[k * c:(k + 1) * c, :] += acc


def _bwd_kernel_dtab_packed(gx8_ref, idx_ref, rk8k_ref, w2_ref, dout_ref,
                            dtab_ref, dFs, dacc, dgs, *, tp, kt, nt, n_sub,
                            ac, c, d, pair):
    """Packed dTable half: identical to _bwd_kernel_dtab except the pair
    anchors' per-subtile dg dots are lane-concatenated (FRESH dot outputs,
    zero-offset — unlike the Mosaic-illegal concat of offset slices, see
    _pick_gpk) into one [S, pair*C] value so every dgs store is lane-dense.
    """
    gdt = dout_ref.dtype
    prec = _precision(gdt)
    pt = pl.program_id(2)

    @pl.when(pt == 0)
    def _zero_dtab():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    idxv = idx_ref[0, 0]
    rows = idxv.shape[0]
    qp = dtab_ref.shape[1]
    iot = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
    s_onehot = (iot == idxv[:, None]).astype(gdt)
    s = tp * nt
    t = n_sub * tp
    for a in range(ac):
        dacc[a * t:(a + 1) * t, :] = dout_ref[0, :, a * d:(a + 1) * d]
    kg = _pick_kg(kt, c)
    for k0 in range(0, kt, kg):
        blk = jax.lax.dot_general(
            dacc[:], w2_ref[k0 * c:(k0 + kg) * c, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(gdt)                        # [AC*T, kg*C]
        for i in range(kg):
            dFs[k0 + i] = blk[:, i * c:(i + 1) * c]
    r = tp * kt
    stg = 1 if tp >= 8 else 8 // tp
    for g in range(ac // pair):
        wp_all = jax.lax.dot_general(
            rk8k_ref[g], gx8_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [pair*R, T*N~]
        for st0 in range(0, n_sub, stg):
            dfg = [None] * pair
            for i in range(pair):
                a = g * pair + i
                dfg[i] = dFs[:, a * t + st0 * tp:
                             a * t + (st0 + stg) * tp, :]   # [K~, 8, C]
            for sj in range(stg):
                st = st0 + sj
                wp = wp_all[:, st * s:(st + 1) * s]         # [pair*R, S]
                bd = jnp.maximum(wp, 0.0).astype(gdt)
                dg_parts = []
                for i in range(pair):
                    bd_a = bd[i * r:(i + 1) * r, :]         # [R, S]
                    dfi = (dfg[i] if stg == 1
                           else dfg[i][:, sj * tp:(sj + 1) * tp, :])
                    dg_parts.append(jax.lax.dot_general(
                        bd_a, dfi.reshape(kt * tp, c),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(gdt))           # [S, C]
                dg_pair = (dg_parts[0] if pair == 1 else
                           jnp.concatenate(dg_parts, axis=1))  # [S, pair*C]
                dgs[st * s:(st + 1) * s,
                    g * pair * c:(g + 1) * pair * c] = dg_pair
    dtab_ref[0] += jax.lax.dot_general(
        s_onehot, dgs[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                        # [Q~, AC*C]


def _pick_n_sub_bwd_split(p, tp, kt, nt, c, d, ac, qp, g_itemsize, which):
    """Tile pick for the split backward kernels: each carries roughly half
    the one-kernel backward's scratch set, so tiles stay bigger."""
    grp = max(1, 8 // tp)
    budget = _VMEM_BUDGET * _BWD_BUDGET_MULT
    if which == 'dtab':
        fixed = qp * ac * c * 4 + kt * c * d * g_itemsize
        per_sub = (16 * tp * nt * 4 + tp * nt * 4
                   + tp * nt * qp * g_itemsize            # one-hot S
                   + kt * ac * tp * max(c, 128) * g_itemsize  # dFs slab
                   + tp * ac * d * g_itemsize             # dacc rows
                   + tp * nt * ac * c * g_itemsize)       # dgs rows
    else:
        fixed = qp * ac * c * g_itemsize + kt * c * d * 4
        per_sub = (16 * tp * nt * 4 + tp * nt * 4
                   + tp * nt * qp * g_itemsize
                   + 2 * tp * nt * ac * c * g_itemsize    # gathered g
                   + kt * ac * tp * max(c, 128) * g_itemsize  # fs slab
                   + tp * ac * d * g_itemsize)            # dacc rows
    n_sub = max(grp, (budget - 2 * fixed) // (2 * per_sub))
    n_sub = min(n_sub, p // tp)
    while n_sub >= grp and ((p // tp) % n_sub != 0 or n_sub % grp != 0):
        n_sub -= 1
    return n_sub if n_sub >= grp else 0


def _call_gather_w_bwd_split(gx8, idx3, tab, rk8k, w2, dout, sigma, tp, kt,
                             nt, ac, interpret, c, d):
    """Two-kernel backward (see the split rationale above)."""
    b = gx8.shape[0]
    na = rk8k.shape[0]
    qp = tab.shape[1]
    p = gx8.shape[2] // nt
    gdt = tab.dtype
    isz = jnp.dtype(gdt).itemsize
    # packed (lane-dense) kernel halves when the shape gates hold: dgs /
    # fs stores at c < 128 are otherwise lane-padded c/128. Each half is
    # gated separately (chip A/B per shape class; _PACKED_BWD_* for sweeps).
    packed_av = (_pick_pair_packed(ac, c, d) > 1 and _packed_wanted(c))
    packed_dtab = (packed_av if _PACKED_BWD_DTAB is None
                   else packed_av and _PACKED_BWD_DTAB)
    packed_dw2 = (packed_av if _PACKED_BWD_DW2 is None
                  else packed_av and _PACKED_BWD_DW2)
    packed = packed_dtab or packed_dw2
    pair = _pick_pair_packed(ac, c, d) if packed else _pick_pair(ac, c)
    rk8k_p = _pair_rk8k(rk8k, tp * kt, pair) if pair > 1 else rk8k
    r = tp * kt

    n1 = _pick_n_sub_bwd_split(p, tp, kt, nt, c, d, ac, qp, isz, 'dtab')
    assert n1 > 0, (p, tp, kt, nt, c, d, ac, qp)
    t1 = n1 * tp
    dtab = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dtab_packed if packed_dtab else _bwd_kernel_dtab,
            tp=tp, kt=kt, nt=nt, n_sub=n1, ac=ac, c=c, d=d,
            pair=pair),
        grid=(b, na // ac, p // t1),
        in_specs=[
            pl.BlockSpec((1, 16, t1 * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t1 * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((ac // pair, 16, pair * r),
                         lambda bb, ci, pt: (ci, 0, 0)),
            pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
            pl.BlockSpec((1, t1, ac * d), lambda bb, ci, pt: (bb, pt, ci)),
        ],
        out_specs=pl.BlockSpec((1, qp, ac * c),
                               lambda bb, ci, pt: (bb, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, qp, na * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kt, ac * t1, c), gdt),
                        pltpu.VMEM((ac * t1, d), gdt),
                        pltpu.VMEM((t1 * nt, ac * c), gdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * na * r * nt * c
                   + 2 * b * p * nt * qp * na * c
                   + 2 * b * p * na * kt * c * d),
            bytes_accessed=(b * qp * na * c * 4 + b * p * na * d * isz),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, rk8k_p, w2, dout)

    n2 = _pick_n_sub_bwd_split(p, tp, kt, nt, c, d, ac, qp, isz, 'dw2')
    assert n2 > 0, (p, tp, kt, nt, c, d, ac, qp)
    t2 = n2 * tp
    dw2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dw2_packed if packed_dw2 else _bwd_kernel_dw2,
            tp=tp, kt=kt, nt=nt, n_sub=n2, ac=ac, c=c, d=d,
            pair=pair),
        grid=(b, na // ac, p // t2),
        in_specs=[
            pl.BlockSpec((1, 16, t2 * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t2 * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, qp, ac * c), lambda bb, ci, pt: (bb, 0, ci)),
            pl.BlockSpec((ac // pair, 16, pair * r),
                         lambda bb, ci, pt: (ci, 0, 0)),
            pl.BlockSpec((1, t2, ac * d), lambda bb, ci, pt: (bb, pt, ci)),
        ],
        out_specs=pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((kt * c, d), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM(((ac // pair) * t2, kt * pair * c), gdt),
             pltpu.VMEM(((ac // pair) * t2, pair * d), gdt)]
            if packed_dw2 else
            [pltpu.VMEM((kt, ac * t2, c), gdt),
             pltpu.VMEM((ac * t2, d), gdt)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * p * na * r * nt * c
                   + 2 * b * p * nt * qp * na * c
                   + 2 * b * p * na * kt * c * d),
            bytes_accessed=(tab.size * isz + b * p * na * d * isz),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, tab, rk8k_p, dout)
    return dtab, dw2


# split backward on the tp<8 (strided 32-neighbor) layers, where the
# one-kernel form measured 2.4-3.3x the forward; tp=8 layers stay on the
# one-kernel form (B0L1 ratio 1.81, and the split costs an extra select)
_BWD_SPLIT_TP_MAX = 4


def _call_gather_w_bwd(gx8, idx3, tab, rk8k, w2, dout, sigma, tp, kt, nt,
                       ac, interpret, c, d):
    b = gx8.shape[0]
    na = rk8k.shape[0]
    qp = tab.shape[1]
    p = gx8.shape[2] // nt
    gdt = tab.dtype
    n_sub = _pick_n_sub_gather_w(p, tp, kt, nt, c, d, ac, qp,
                                 jnp.dtype(gdt).itemsize, bwd=True)
    assert n_sub > 0, (p, tp, kt, nt, c, d, ac, qp)
    t = n_sub * tp
    r = tp * kt
    pair = _pick_pair(ac, c)
    if pair > 1:
        rk8k = _pair_rk8k(rk8k, r, pair)
    out_shapes = [jax.ShapeDtypeStruct((b, qp, na * c), jnp.float32),
                  jax.ShapeDtypeStruct((kt * c, d), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_bwd_gather_w_kernel, sigma=float(sigma), tp=tp,
                          kt=kt, nt=nt, n_sub=n_sub, ac=ac, c=c, d=d,
                          pair=pair),
        grid=(b, na // ac, p // t),
        in_specs=[
            pl.BlockSpec((1, 16, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, 1, t * nt), lambda bb, ci, pt: (bb, 0, pt)),
            pl.BlockSpec((1, qp, ac * c), lambda bb, ci, pt: (bb, 0, ci)),
            pl.BlockSpec((ac // pair, 16, pair * r),
                         lambda bb, ci, pt: (ci, 0, 0)),
            pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
            pl.BlockSpec((1, t, ac * d), lambda bb, ci, pt: (bb, pt, ci)),
        ],
        out_specs=[
            pl.BlockSpec((1, qp, ac * c), lambda bb, ci, pt: (bb, 0, ci)),
            pl.BlockSpec((kt * c, d), lambda bb, ci, pt: (0, 0)),
        ],
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((kt, ac * t, c), gdt),
                        pltpu.VMEM((kt, ac * t, c), gdt),
                        pltpu.VMEM((ac * t, d), gdt),
                        pltpu.VMEM((t * nt, ac * c), gdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(4 * b * p * na * (tp * kt) * nt * c
                   + 4 * b * p * nt * qp * na * c
                   + 4 * b * p * na * kt * c * d),
            bytes_accessed=(tab.size * tab.dtype.itemsize
                            + b * qp * na * c * 4 + b * p * na * d * 2),
            transcendentals=0),
        interpret=interpret,
    )(gx8, idx3, tab, rk8k, w2, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_gather_conv_w(gx8, idx3, table, rk8k, rk8t, w2, sigma, tp, kt,
                        nt, ac=None, interpret=False):
    """fused_gather_neighbor_conv with the learned GEMM folded in.

    w2 [K~*C, D] is the conv weight reshaped k-major (W[k, c, d] row k*C+c);
    rk8k/rk8t are the k-major (forward) and t-major (backward) rk operands.
    Returns out [B, P, NA*D] f32 = einsum('bapkc,kcd->bp(ad)', F, W) without
    materializing F.
    """
    return _fgcw_fwd(gx8, idx3, table, rk8k, rk8t, w2, sigma, tp, kt, nt,
                     ac, interpret)[0]


def _fgcw_fwd(gx8, idx3, table, rk8k, rk8t, w2, sigma, tp, kt, nt, ac,
              interpret):
    na = rk8k.shape[0]
    c = table.shape[-1] // na
    d = w2.shape[1]
    out = _call_gather_w(gx8, idx3, table, rk8k, w2, sigma, tp, kt, nt,
                         ac or na, interpret, c, d)
    return out, (gx8, idx3, table, rk8k, rk8t, w2)


_USE_FUSED_BWD = True


def _fgcw_bwd(sigma, tp, kt, nt, ac, interpret, res, dout):
    """Fully fused backward kernel (dTable + dW2 in one pass, see
    _bwd_gather_w_kernel); the XLA-composed fallback mirrors the forward
    with F-sized HBM intermediates."""
    gx8, idx3, table, rk8k, rk8t, w2 = res
    b, na = table.shape[0], rk8t.shape[0]
    p = gx8.shape[2] // nt
    c = table.shape[-1] // na
    d = w2.shape[1]
    gdt = table.dtype
    prec = _precision(gdt)
    # The 3DMatch inv backbone's W-fused TRAIN compiles overflow the
    # remote compile helper (subprocess SIGKILL / >9 min hang, reproduced
    # on the inv triplet step): its c<=32 (pair=4) and tp=2 (nn=64,
    # grp=stg=4) backward kernels unroll far deeper than any flagship
    # shape, and several of them land in one executable across the two
    # triplet legs. Those shapes take the XLA-composed backward below
    # instead. Only inv TRAINING pays; descriptor extraction (the
    # contract metric) is forward-only, and no flagship layer has
    # c<=32 or tp<4.
    if _USE_FUSED_BWD and c > 32 and tp > 2:
        bwd_call = (_call_gather_w_bwd_split if tp <= _BWD_SPLIT_TP_MAX
                    else _call_gather_w_bwd)
        dtab32, dw32 = bwd_call(
            gx8, idx3, table, rk8k, w2, dout.astype(gdt), sigma, tp, kt,
            nt, ac or na, interpret, c, d)
        return (jnp.zeros_like(gx8),
                np.zeros(idx3.shape, jax.dtypes.float0),
                dtab32.astype(gdt), jnp.zeros_like(rk8k),
                jnp.zeros_like(rk8t), dw32.astype(w2.dtype))
    do5 = dout.reshape(b, p, na, d).astype(gdt)
    W3 = w2.reshape(kt, c, d).astype(gdt)
    dF = jnp.einsum('bpad,kcd->bapkc', do5, W3).astype(gdt)
    dg_shape = jax.ShapeDtypeStruct((b, p * nt, na * c), gdt)
    dg = _call(_bwd_kernel, gx8, dF, rk8t, dg_shape, sigma, tp, kt, nt,
               ac or na, gdata_p_dim='tiled', out_p_dim='flat',
               interpret=interpret, gdata_c=c)
    qp = table.shape[1]
    s_onehot = jax.nn.one_hot(idx3[:, 0, :], qp, dtype=gdt)
    dtab = jnp.einsum('brq,brl->bql', s_onehot, dg,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(gdt)
    F = fused_gather_neighbor_conv(gx8, idx3, table, rk8t, sigma, tp, kt,
                                   nt, ac, interpret)
    dw2 = jnp.einsum('bapkc,bpad->kcd', F.astype(gdt), do5,
                     preferred_element_type=jnp.float32,
                     precision=prec).reshape(kt * c, d).astype(w2.dtype)
    return (jnp.zeros_like(gx8), np.zeros(idx3.shape, jax.dtypes.float0),
            dtab, jnp.zeros_like(rk8k), jnp.zeros_like(rk8t), dw2)


fused_gather_conv_w.defvjp(_fgcw_fwd, _fgcw_bwd)


def reference_F(grouped_xyz, G, rk, k2, sigma, kt):
    """Plain-XLA oracle of the kernel contract (testing): returns
    [B, AC, P, K~, C] from gx [B,P,N,3], G [B,AC,P,N,C], rk [AC,K,3]."""
    gx2 = jnp.sum(grouped_xyz ** 2, axis=-1)
    cross = jnp.einsum('bpnc,akc->bpnak', grouped_xyz, rk)
    d2 = gx2[..., None, None] + k2[None, None, None, None, :] - 2.0 * cross
    w = jax.nn.relu(1.0 - d2 / sigma)                     # [B,P,N,A,K]
    f = jnp.einsum('bpnak,bapnc->bapkc', w, G)
    k = rk.shape[1]
    if kt > k:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, kt - k), (0, 0)))
    return f
