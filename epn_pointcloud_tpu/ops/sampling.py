"""Core point-sampling / neighborhood ops, TPU-native (static shapes, jnp).

These replace the reference's three CUDA extensions
(vgtk/vgtk/cuda/{gathering,grouping}_cuda_kernel.cu) with XLA-friendly
formulations. All shapes are static; ragged neighborhoods are padded with the
reference's own conventions (repeat-fill in ball query, shadow point/feature
appended by callers).

Layout convention of the whole framework: points channels-last —
  xyz   [b, p, 3]
  feats [b, p, a, c]
(The reference is channels-first [b, 3, p] / [b, c, p, a]; channels-last maps
better onto TPU lanes.)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

SHADOW_COORD = 1e4   # ref: spconv/functional.py:83-87
FPS_SHADOW_EPS = 1e-3  # ref: grouping_cuda_kernel.cu:385-387


# ---------------------------------------------------------------------------
# Gather (ref: gathering_cuda_kernel.cu:42-98 fwd / bwd; JAX AD supplies the
# scatter-add backward automatically)
# ---------------------------------------------------------------------------

# One-hot MXU gather: XLA's TPU row gather tops out around 90-160 GB/s
# (far under HBM), while the MXU runs a one-hot selection einsum at near
# peak (~176 TF/s measured on the same shapes) — so whenever the support
# table is short enough (FLOPs scale with q, gather bytes don't), selecting
# rows with a one-hot GEMM is ~3x faster. It is exact: each output row is
# 1.0 * the single selected row, accumulated in fp32 (for fp32 tables the
# HIGHEST-precision 3-term bf16 split reconstructs the value bitwise).
# Bonus: the VJP is the transposed einsum — another MXU GEMM — instead of
# XLA's serialized scatter-add.
_ONEHOT_MAX_Q = 2048          # breakeven ~= peak_flops / gather_bw ~= 2000
_ONEHOT_MIN_ROWS = 256        # tiny gathers aren't worth the iota+GEMM


def gather_rows_onehot(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [b, q, L], idx [b, r] int -> [b, r, L] via one-hot einsum."""
    q = table.shape[1]
    prec = (jax.lax.Precision.HIGHEST if table.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jax.nn.one_hot(idx, q, dtype=table.dtype)
    out = jnp.einsum('brq,bql->brl', s, table,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(table.dtype)


_FORCE_ONEHOT = False   # tests: exercise the one-hot paths on CPU


def _onehot_profitable(q: int, rows: int, lanes: int) -> bool:
    if _FORCE_ONEHOT:
        return True
    # Wide rows amortize the iota+GEMM even at small row counts — and the
    # take_along_axis VJP is a serialized scatter fusion (measured 7.8 ms
    # for a 1536-row x 7680-lane skip-gather backward on the training step,
    # vs ~0.03 ms for the transposed one-hot GEMM).
    enough_rows = rows >= _ONEHOT_MIN_ROWS or rows * lanes >= 64 * 1024
    return (jax.default_backend() == 'tpu' and q <= _ONEHOT_MAX_Q
            and enough_rows and lanes >= 128)


def batched_index_select(x: jnp.ndarray, dim: int,
                         index: jnp.ndarray) -> jnp.ndarray:
    """Gather along `dim` with a per-batch index [b, m]
    (ref: spconv/functional.py:361-369). Equivalent to torch.gather after
    expanding the index over the non-`dim` axes; `dim` == 1 dispatches to
    the TPU-optimized gather_points path."""
    if dim == 1:
        return gather_points(x, index)
    shape = [1] * x.ndim
    shape[0], shape[dim] = index.shape[0], index.shape[1]
    idx = index.reshape(shape)
    idx = jnp.broadcast_to(idx, x.shape[:dim] + (index.shape[1],)
                           + x.shape[dim + 1:])
    return jnp.take_along_axis(x, idx, axis=dim)


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched index gather along the point axis (axis=1).

    feats [b, n, ...], idx [b, m1(, m2, ...)] -> [b, m1(, m2, ...), ...]
    (ref: vgtk/utils.py:25-27 batch_gather + pc/sample.py:46-50 group_nd,
    transposed to channels-last).

    On TPU, short-table wide-row gathers dispatch to the one-hot MXU
    formulation (see gather_rows_onehot); otherwise a plain XLA gather.
    """
    b = feats.shape[0]
    q = feats.shape[1]
    flat_idx = idx.reshape(b, -1)
    lanes = 1
    for d in feats.shape[2:]:
        lanes *= d
    if _onehot_profitable(q, flat_idx.shape[1], lanes):
        out = gather_rows_onehot(feats.reshape(b, q, lanes), flat_idx)
        return out.reshape(idx.shape + feats.shape[2:])
    # indices are in bounds by construction (ball query / FPS emit valid
    # support indices; the shadow index is the last padded row) — skipping
    # the out-of-bounds select halves the gather cost on TPU
    out = jnp.take_along_axis(
        feats, flat_idx.reshape((b, -1) + (1,) * (feats.ndim - 2)), axis=1,
        mode='promise_in_bounds')
    return out.reshape(idx.shape + feats.shape[2:])


# ---------------------------------------------------------------------------
# Furthest point sampling (ref: grouping_cuda_kernel.cu:351-466)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('n_sample',))
def furthest_point_sampling(xyz: jnp.ndarray, n_sample: int) -> jnp.ndarray:
    """Iterative FPS. xyz [b, n, 3] -> int32 idx [b, n_sample].

    Reference semantics: the first sample is always index 0; points with
    squared norm <= 1e-3 (shadow guard) are never selected.

    On TPU this runs as a Pallas kernel with the cloud VMEM-resident (the
    XLA while-loop pays ~0.3 ms dispatch per iteration; the kernel doesn't).
    """
    if jax.default_backend() == 'tpu':
        from .pallas.fps import fps_pallas
        fn = lambda x: fps_pallas(x, n_sample, FPS_SHADOW_EPS)
        if jax.device_count() > 1:
            # Pallas is opaque to GSPMD: shard_map over an installed
            # data-parallel mesh, XLA loop otherwise
            from ..parallel import mesh as pmesh
            sm = pmesh.data_mesh_for(xyz.shape[0])
            if sm is not None:
                return pmesh.data_shard_map(fn, sm, 1, 0)(xyz)
        else:
            return fn(xyz)
    b, n, _ = xyz.shape
    mag = jnp.sum(xyz ** 2, axis=-1)                    # [b, n]
    valid = mag > FPS_SHADOW_EPS                        # [b, n]

    def body(j, state):
        idxs, temp, old = state
        x1 = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # [b,1,3]
        d = jnp.sum((xyz - x1) ** 2, axis=-1)                      # [b,n]
        temp = jnp.minimum(temp, d)
        cand = jnp.where(valid, temp, -jnp.inf)
        new = jnp.argmax(cand, axis=1).astype(jnp.int32)           # [b]
        idxs = idxs.at[:, j].set(new)
        return idxs, temp, new

    idxs0 = jnp.zeros((b, n_sample), dtype=jnp.int32)
    temp0 = jnp.full((b, n), jnp.inf, dtype=xyz.dtype)
    old0 = jnp.zeros((b,), dtype=jnp.int32)
    idxs, _, _ = jax.lax.fori_loop(1, n_sample, body, (idxs0, temp0, old0))
    return idxs


def furthest_sample(xyz: jnp.ndarray, n_sample: int, lazy_sample: bool = True):
    """idx [b, n_sample], sampled xyz [b, n_sample, 3]
    (ref: pc/sample.py:63-77). `lazy_sample` or n == n_sample short-circuits
    to arange — the reference uses FPS only at block0/layer0."""
    b, n, _ = xyz.shape
    if lazy_sample or n == n_sample:
        idx = jnp.broadcast_to(jnp.arange(n_sample, dtype=jnp.int32)[None], (b, n_sample))
        return idx, xyz[:, :n_sample]
    idx = furthest_point_sampling(xyz, n_sample)
    return idx, gather_points(xyz, idx)


# ---------------------------------------------------------------------------
# Ball query (ref: grouping_cuda_kernel.cu:67-113)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('radius', 'n_sample', 'use_pallas'))
def ball_query(query: jnp.ndarray, support: jnp.ndarray, radius: float,
               n_sample: int, use_pallas: bool = None) -> jnp.ndarray:
    """For each query point, the FIRST `n_sample` support indices (in point
    index order) with squared distance < radius^2; short neighborhoods are
    repeat-filled periodically. query [b,m,3], support [b,n,3] ->
    int32 [b,m,n_sample].

    Matches the reference kernel's order semantics (first hits win, not
    nearest hits). Deviation under the 'native' convention: the reference
    leaves the final slot 0 when exactly n_sample-1 hits are found (an
    off-by-one in its repeat fill, grouping_cuda_kernel.cu:99-104); we fill
    it periodically instead. Under the 'reference' convention (compat mode)
    the quirk is replicated bit-exactly so imported reference weights see
    identical neighborhoods.
    """
    b, m, _ = query.shape
    n = support.shape[1]
    r2 = radius * radius
    k_eff = min(n_sample, n)  # n_sample may exceed the support size

    from .pallas import ball_query as plbq
    from ..parallel import mesh as pmesh
    shard_mesh = None
    if use_pallas is None:
        # Pallas is opaque to GSPMD: shard_map over 'data' when a global
        # data-parallel mesh is installed; single device runs it bare
        use_pl = jax.default_backend() == 'tpu'
        if use_pl and jax.device_count() > 1:
            shard_mesh = pmesh.data_mesh_for(b)
            use_pl = shard_mesh is not None
    else:
        use_pl = use_pallas
    if use_pl and plbq.supported(m, n, k_eff):
        fn = lambda q_, s_: plbq.ball_query_pallas(
            q_, s_, r2, k_eff, interpret=jax.default_backend() != 'tpu')
        if shard_mesh is not None:
            fn = pmesh.data_shard_map(fn, shard_mesh, 2, 0)
        idx_raw, cnt_raw = fn(query, support)
        out = jnp.where(idx_raw < n, idx_raw, 0)
        cnt = jnp.minimum(cnt_raw[:, 0], n_sample)
    else:
        # Direct-difference form matches the reference CUDA kernel's fp32
        # behavior at the radius boundary (the |q|^2+|s|^2-2qs expansion
        # loses precision there and flips borderline hits).
        d2 = jnp.sum((query[:, :, None, :] - support[:, None, :, :]) ** 2, -1)
        hit = d2 < r2

        # "First n_sample hits in index order" == the n_sample LARGEST
        # values of key = -index (hits) / -n (misses): a top_k, which lowers
        # to a TPU sort instead of the serialized scatter a positional write
        # needs. (The Pallas kernel above replaces the sort with unrolled
        # min-extract steps, VMEM-resident.)
        kidx = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(hit, -kidx[None, None, :], -jnp.int32(n))
        topk, _ = jax.lax.top_k(key, k_eff)                      # [b,m,k_eff]
        out = jnp.where(topk > -n, -topk, 0).astype(jnp.int32)
        cnt = jnp.minimum(hit.sum(axis=-1), n_sample)            # [b,m]
    if k_eff < n_sample:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, n_sample - k_eff)))

    # Periodic repeat fill: idx[s] = idx[s % cnt] for s >= cnt (cnt=0 -> 0).
    # One masked reduction instead of take_along_axis (single-element gathers
    # are dispatch-bound on TPU, ~15 ms/step across the model) or an unrolled
    # select-sum loop (3 tiny HLO ops per slot x n_sample slots x layer:
    # ~850 dispatches / ~3 ms per flagship step). The [*, k, k] compare-
    # select never materializes — XLA fuses it into the reduce loop. NOTE:
    # if that fusion ever breaks (compiler update, interpret mode) the
    # intermediate is quadratic in n_sample ([b,m,k,k]); n_sample <= 64
    # everywhere in the builder formulas, so worst case is a transient
    # b*m*4096 buffer — fall back to take_along_axis if k ever grows.
    s = jnp.arange(n_sample)[None, None, :]
    cnt_safe = jnp.maximum(cnt, 1)[..., None]
    src = jnp.where(s < cnt[..., None], s, s % cnt_safe)   # [b, m, n_sample]
    eq = src[..., :, None] == s[..., None, :]              # [b, m, k, k]
    filled = jnp.where(eq, out[..., None, :], 0).sum(-1)
    from . import icosahedron
    if icosahedron.get_convention() == 'reference':
        # replicate the reference kernel's zero-init quirk: the repeat fill
        # only runs when cnt < n_sample-1, so with exactly n_sample-1 hits
        # the last slot keeps its zero init (grouping_cuda_kernel.cu:99-104)
        quirk = (cnt[..., None] == n_sample - 1) & (s == n_sample - 1)
        filled = jnp.where(quirk, 0, filled)
    return filled


def _clear_ball_query_cache():
    """ball_query traces the anchor convention into its jit cache; flush on
    icosahedron.set_convention so compat mode takes effect immediately."""
    ball_query.clear_cache()


from . import icosahedron  # noqa: E402  (import cycle-safe: leaf module)

icosahedron.register_convention_listener(_clear_ball_query_cache)


# ---------------------------------------------------------------------------
# Shadow padding (ref: spconv/functional.py:81-95)
# ---------------------------------------------------------------------------

def add_shadow_point(xyz: jnp.ndarray) -> jnp.ndarray:
    """[b, n, 3] -> [b, n+1, 3] with a far-away shadow coordinate."""
    b = xyz.shape[0]
    shadow = jnp.full((b, 1, xyz.shape[2]), SHADOW_COORD, dtype=xyz.dtype)
    return jnp.concatenate([xyz, shadow], axis=1)


def add_shadow_feature(feats: jnp.ndarray) -> jnp.ndarray:
    """[b, n, a, c] -> [b, n+1, a, c] with zero shadow features."""
    b, _, a, c = feats.shape
    return jnp.concatenate(
        [feats, jnp.zeros((b, 1, a, c), dtype=feats.dtype)], axis=1)


# ---------------------------------------------------------------------------
# Combined grouping used by inter conv (ref: spconv/functional.py:412-421)
# ---------------------------------------------------------------------------

def inter_grouping_ball(xyz: jnp.ndarray, stride: int, radius: float,
                        n_neighbor: int, lazy_sample: bool = True,
                        gather_xyz: bool = True):
    """FPS(stride) -> ball query -> localized neighbor coordinates.

    xyz [b, p1, 3] ->
      grouped_xyz [b, p2, nn, 3] (relative to sample centers),
      ball_idx    [b, p2, nn],
      sample_idx  [b, p2],
      sample_xyz  [b, p2, 3]
    where p2 = ceil(p1 / stride).
    """
    if n_neighbor <= 0:
        raise ValueError(
            f'n_neighbor={n_neighbor}; the builder arithmetic (e.g. '
            f'inv_so3net_pn neighbor *= int(input_num/1024), ref '
            f'inv_so3net_pn.py:112-113) degenerates for small input_num — '
            f'use input_num >= 1024 for this model config')
    p1 = xyz.shape[1]
    n_sample = math.ceil(p1 / stride)
    sample_idx, sample_xyz = furthest_sample(xyz, n_sample, lazy_sample)
    ball_idx = ball_query(sample_xyz, xyz, radius, n_neighbor)
    if not gather_xyz:
        # caller folds the coordinate rows into its own (wider) gather
        return None, ball_idx, sample_idx, sample_xyz
    support = add_shadow_point(xyz)
    grouped_xyz = gather_points(support, ball_idx)      # [b, p2, nn, 3]
    grouped_xyz = grouped_xyz - sample_xyz[:, :, None, :]
    return grouped_xyz, ball_idx, sample_idx, sample_xyz
