"""Pallas TPU kernel: furthest point sampling.

FPS is inherently sequential over samples; under plain XLA each of the m-1
iterations is a while-loop step with dispatch overhead (~0.33 ms/iter
measured — 169 ms for one 1024->512 FPS). Here the whole loop runs inside one
kernel with ALL batch elements VMEM-resident (a 32x1024 cloud batch is only
~400 KB), so an iteration is one batched VPU min + row-argmax. Grid cells run
sequentially on TPU, so batching inside the kernel (rather than gridding over
batch) divides the iteration count by the batch size.

Semantics match the reference CUDA kernel (grouping_cuda_kernel.cu:351-466):
first sample is index 0; points with squared norm <= 1e-3 are never selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(xyz_ref, out_ref, *, n_sample: int, shadow_eps: float):
    # coordinate-planes layout [B, 3, N]: a [B, N, 3] value would pad the
    # 3-lane axis to 128 lanes (16 MB per copy at b32/n1024)
    B, _, N = xyz_ref.shape
    x = xyz_ref[:, 0, :]                                # [B, N]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    mag = x * x + y * y + z * z
    valid = mag > shadow_eps
    neg_inf = jnp.float32(-jnp.inf)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    M = out_ref.shape[1]
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)

    def body(j, state):
        temp, old, sel = state                          # old: [B, 1] int32
        pick = iota == old                              # [B, N]
        x1 = jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)
        y1 = jnp.sum(jnp.where(pick, y, 0.0), axis=1, keepdims=True)
        z1 = jnp.sum(jnp.where(pick, z, 0.0), axis=1, keepdims=True)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        temp = jnp.minimum(temp, d)
        cand = jnp.where(valid, temp, neg_inf)
        best = jnp.max(cand, axis=1, keepdims=True)     # [B, 1]
        # first index achieving the row max (matches jnp.argmax)
        new = jnp.min(jnp.where(cand == best, iota, jnp.int32(N)),
                      axis=1, keepdims=True)            # [B, 1]
        sel = jnp.where(out_iota == j, new, sel)
        return temp, new, sel

    _, _, sel = jax.lax.fori_loop(
        1, n_sample, body,
        (jnp.full((B, N), jnp.inf, jnp.float32),
         jnp.zeros((B, 1), jnp.int32),
         jnp.zeros((B, M), jnp.int32)))
    out_ref[:] = sel


def fps_pallas(xyz: jnp.ndarray, n_sample: int,
               shadow_eps: float = 1e-3, interpret: bool = False):
    """xyz [b, n, 3] f32 -> int32 idx [b, n_sample]."""
    B, N, _ = xyz.shape
    return pl.pallas_call(
        functools.partial(_kernel, n_sample=n_sample,
                          shadow_eps=float(shadow_eps)),
        out_shape=jax.ShapeDtypeStruct((B, n_sample), jnp.int32),
        interpret=interpret,
    )(jnp.swapaxes(xyz, 1, 2))
