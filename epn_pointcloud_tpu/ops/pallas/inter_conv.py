"""Pallas TPU kernel: fused SO(3) inter-convolution core.

Computes, tile-resident in VMEM (never materializing the [b,p,n,a,k] weight /
[b,p,a,k,c] feature intermediates in HBM):

    cross[t,n,k] = gx[t,n,:] . (R_a kappa_k)          (per grid anchor a)
    w[t,n,k]     = relu(1 - (|gx|^2 + |kappa|^2 - 2 cross) / sigma)
    F[t,a,k,c]   = sum_n w[t,n,k] * G[t,n,a,c]

which is the math of the reference inter conv
(vgtk/vgtk/so3conv/functional.py:180-218 anchor weights +
spconv/functional.py:372-390 grouping), restructured for TPU: the anchor
axis rides the Pallas grid, the neighbor reduction runs as unrolled VPU FMAs
over [k, c1] tiles, and the downstream (k*c1) x c2 learned contraction
(so3conv/modules.py:48-55) stays outside as a well-shaped XLA GEMM.

Gradients: parameters only receive gradients through G (gathered features) —
the weights w depend only on input coordinates, which carry no parameter
dependence — so the custom VJP recomputes w and evaluates dG with plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(p: int, n: int, k: int, c1: int, itemsize: int) -> int:
    """Point-tile size fitting ~6 MB of VMEM (double-buffered inputs)."""
    budget = 10 * 1024 * 1024
    # Mosaic stack-allocates every unrolled term's [T,K,C1] temporary (no
    # buffer reuse observed), so the dominant cost scales with N.
    per_point = (2 * n * c1 * itemsize    # G tile (double-buffered)
                 + (n + 4) * k * c1 * 4   # per-neighbor partials + accum
                 + n * k * 4              # w
                 + n * 4 * 4)             # gx
    t = max(1, min(128, budget // max(per_point, 1)))
    while p % t != 0:
        t -= 1
    return t


def _kernel(gxt_ref, g_ref, rk_ref, k2_ref, out_ref, *, sigma: float):
    gxt = gxt_ref[0]                                # [N, T, 3]
    N, T, _ = gxt.shape
    rk = rk_ref[:]                                  # [K, 3]
    K = rk.shape[0]
    g = g_ref[0, 0]                                 # [T, N, C1]
    C1 = g.shape[-1]
    k2 = k2_ref[:]                                  # [1, K]

    # No reshapes (Mosaic layout traps); per-neighbor [T,3]x[3,K] dot + FMA.
    def term(n):
        gxn = gxt[n]                                       # [T, 3]
        gx2n = jnp.sum(gxn * gxn, axis=-1, keepdims=True)  # [T, 1]
        cross = jax.lax.dot_general(
            gxn, rk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [T, K]
        d2 = gx2n + k2 - 2.0 * cross
        wn = jax.nn.relu(1.0 - d2 / sigma)                 # [T, K]
        gn = g[:, n, :].astype(jnp.float32)                # [T, C1]
        return wn[:, :, None] * gn[:, None, :]

    # Accumulate in small unrolled groups with pairwise partial sums so only
    # a couple of [T, K, C1] vector temporaries are ever live (a linear SSA
    # chain makes Mosaic stack-allocate every partial; a ref accumulation
    # per neighbor would double VMEM traffic).
    group = 4
    out_ref[0, :, 0] = sum(term(n) for n in range(0, min(group, N)))
    for start in range(group, N, group):
        part = sum(term(n) for n in range(start, min(start + group, N)))
        out_ref[0, :, 0] += part


def _pallas_F(gx, G, rk, k2, sigma, interpret=False):
    """gx [B,P,N,3] f32; G [B,AC,P,N,C1] (anchor-major gathered features);
    rk [AC*K,3] f32; k2 [1,K] f32 -> F [B,P,AC,K,C1] f32."""
    B, P, N, _ = gx.shape
    AC, C1 = G.shape[1], G.shape[4]
    K = k2.shape[1]
    T = _pick_tile(P, N, K, C1, G.dtype.itemsize)
    gxt = jnp.swapaxes(gx, 1, 2)                           # [B, N, P, 3]

    return pl.pallas_call(
        functools.partial(_kernel, sigma=float(sigma)),
        grid=(B, P // T, AC),
        in_specs=[
            pl.BlockSpec((1, N, T, 3), lambda b, p, a: (b, 0, p, 0)),
            pl.BlockSpec((1, 1, T, N, C1), lambda b, p, a: (b, a, p, 0, 0)),
            pl.BlockSpec((K, 3), lambda b, p, a: (a, 0)),
            pl.BlockSpec((1, K), lambda b, p, a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, 1, K, C1),
                               lambda b, p, a: (b, p, a, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, AC, K, C1), jnp.float32),
        interpret=interpret,
    )(gxt, G, rk, k2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_neighbor_conv(gx, G, rk, k2, sigma, interpret=False):
    """F[b,p,a,k,c] = sum_n relu(1 - d^2/sigma) * G — Pallas forward.

    G is anchor-major [B, AC, P, N, C1] (gather the support features from a
    [b, a, q, c]-transposed tensor to produce this layout directly)."""
    return _pallas_F(gx, G, rk, k2, sigma, interpret)


def compute_weights(gx, rk, k2, sigma):
    """w [B,P,N,AC,K] in plain XLA (backward pass / testing oracle)."""
    K = k2.shape[1]
    ACK = rk.shape[0]
    gx2 = jnp.sum(gx * gx, axis=-1)
    cross = jnp.einsum('bpnc,mc->bpnm', gx, rk)
    k2_full = jnp.broadcast_to(k2[0][None, :], (ACK // K, K)).reshape(ACK)
    d2 = gx2[..., None] + k2_full[None, None, None, :] - 2.0 * cross
    w = jax.nn.relu(1.0 - d2 / sigma)
    return w.reshape(gx.shape[0], gx.shape[1], gx.shape[2], ACK // K, K)


def _fwd(gx, G, rk, k2, sigma, interpret=False):
    return _pallas_F(gx, G, rk, k2, sigma, interpret), (gx, G, rk, k2)


def _bwd(sigma, interpret, res, dF):
    gx, G, rk, k2 = res
    w = compute_weights(gx, rk, k2, sigma)          # [B,P,N,AC,K]
    # dG[b,a,p,n,c] = sum_k w[b,p,n,a,k] dF[b,p,a,k,c]
    dG = (w[..., None] * dF[:, :, None]).sum(axis=4)     # [B,P,N,AC,C1]
    dG = jnp.transpose(dG, (0, 3, 1, 2, 4)).astype(G.dtype)
    return None, dG, None, None


fused_neighbor_conv.defvjp(_fwd, _bwd)
