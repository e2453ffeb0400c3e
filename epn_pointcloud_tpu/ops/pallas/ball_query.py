"""Pallas TPU kernel: ball query (radius search, first-n-in-index-order).

Reference semantics (vgtk/vgtk/cuda/grouping_cuda_kernel.cu:67-113): for each
query point, the FIRST `n_sample` support indices in point-index order with
squared distance < r^2. The XLA formulation (ops/sampling.py) expresses the
selection as a top_k, which lowers to a full TPU sort of [b, m, n] keys —
5.6 ms/step on the flagship model. Here the whole thing is one kernel:

  - d2 via VPU direct difference (matches the reference CUDA kernel's fp32
    behavior at the radius boundary; the |q|^2+|s|^2-2qs expansion loses
    precision there and flips borderline hits),
  - "first n_sample hits" as n_sample unrolled min-extract steps over
    key = hit ? index : n (each step: row-min, emit, mask) — VPU-only,
    everything VMEM-resident.

Returns (idx [b, m, ns] int32 with n marking empty slots, cnt [b, m] int32);
the caller applies the periodic repeat fill (shared with the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, s_ref, out_ref, cnt_ref, *, r2, ns, n):
    qx = q_ref[0]                                   # [Tq, 8] (xyz + pad)
    sx = s_ref[0]                                   # [n, 8]
    d2 = None
    for c in range(3):
        diff = qx[:, c:c + 1] - sx[:, c][None, :]   # [Tq, n]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    hit = d2 < r2                                   # [Tq, n]
    tq = qx.shape[0]
    iot = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    keys = jnp.where(hit, iot, jnp.int32(n))
    cnt_ref[0, 0] = jnp.sum(hit.astype(jnp.int32), axis=1)
    for s in range(ns):
        m0 = jnp.min(keys, axis=1)                  # [Tq] first remaining hit
        out_ref[0, :, s] = m0
        keys = jnp.where(keys == m0[:, None], jnp.int32(n), keys)


def supported(m: int, n: int, ns: int) -> bool:
    """Shape gate: support set must fit VMEM comfortably; selection unroll
    must stay reasonable; tiles must divide the query count."""
    tq = min(128, m)
    return (n <= 4096 and ns <= 64 and m % tq == 0
            and (tq % 8 == 0 or tq == m))


@functools.partial(jax.jit, static_argnames=('r2', 'ns', 'interpret'))
def ball_query_pallas(query: jnp.ndarray, support: jnp.ndarray, r2: float,
                      ns: int, interpret: bool = False):
    """query [b, m, 3], support [b, n, 3] -> (idx [b, m, ns] int32 with n
    for empty slots, cnt [b, m] int32)."""
    b, m, _ = query.shape
    n = support.shape[1]
    tq = min(128, m)
    q8 = jnp.pad(query, ((0, 0), (0, 0), (0, 5)))
    s8 = jnp.pad(support, ((0, 0), (0, 0), (0, 5)))
    out_shape = [jax.ShapeDtypeStruct((b, m, ns), jnp.int32),
                 jax.ShapeDtypeStruct((b, 1, m), jnp.int32)]
    return pl.pallas_call(
        functools.partial(_kernel, r2=float(r2), ns=ns, n=n),
        grid=(b, m // tq),
        in_specs=[
            pl.BlockSpec((1, tq, 8), lambda bb, qt: (bb, qt, 0)),
            pl.BlockSpec((1, n, 8), lambda bb, qt: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, ns), lambda bb, qt: (bb, qt, 0)),
            pl.BlockSpec((1, 1, tq), lambda bb, qt: (bb, 0, qt)),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=9 * b * m * n + 3 * b * m * n * ns,
            bytes_accessed=(q8.size + s8.size) * 4 + b * m * (ns + 1) * 4,
            transcendentals=0),
        interpret=interpret,
    )(q8, s8)
