"""Core equivariant layers (flax.linen), channels-last [b, p, a, c].

Rebuild of vgtk/vgtk/so3conv/modules.py. Parameter initializations replicate
the PyTorch defaults the reference relies on (xavier-normal gain sqrt(2) for
SO3 conv weights; Conv2d/Linear kaiming-uniform(a=sqrt(5)) + uniform bias).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ..ops import icosahedron, kernel_points, sampling, so3conv
from ..ops.so3conv import SphericalPointCloud

KERNEL_CONDENSE_RATIO = kernel_points.KERNEL_CONDENSE_RATIO  # 0.7


def _leaky_relu_torch(x, negative_slope: float = 0.01):
    """torch F.leaky_relu INCLUDING its subgradient at exactly 0: torch's
    backward masks with `x > 0` (slope at 0), while jax.nn.leaky_relu's
    `x >= 0` gives 1 there. The difference is visible wherever a whole field
    sits at exactly 0 — e.g. the block-0 skip branch at init (constant
    occupancy input through a zero-bias BatchNorm), where it made every
    gradient on that branch 100x the reference's
    (tests/test_reference_train_parity.py)."""
    return jnp.where(x > 0, x, negative_slope * x)


def get_activation(name: Optional[str]):
    if name is None or name == 'none':
        return None
    if name == 'leaky_relu':
        return _leaky_relu_torch
    return getattr(jax.nn, name)


@functools.lru_cache(maxsize=None)
def _anchors_const(kanchor: int) -> np.ndarray:
    return icosahedron.get_anchors(kanchor)


@functools.lru_cache(maxsize=None)
def _intra_idx_const() -> np.ndarray:
    return icosahedron.get_intra_idx()


@functools.lru_cache(maxsize=None)
def _intra_onehot_const() -> np.ndarray:
    """One-hot adjacency M[x, a, k] = [trace_idx[a, k] == x], float32."""
    ti = _intra_idx_const()
    na, nk = ti.shape
    M = np.zeros((na, na, nk), dtype=np.float32)
    for a in range(na):
        for k in range(nk):
            M[ti[a, k], a, k] = 1.0
    return M


@functools.lru_cache(maxsize=None)
def _kernels_const(radius: float, kernel_size: int) -> np.ndarray:
    return kernel_points.get_spherical_kernel_points(
        KERNEL_CONDENSE_RATIO * radius, kernel_size)


def _clear_convention_caches():
    """Anchor/kernel constants are convention-dependent; flush on switch."""
    _anchors_const.cache_clear()
    _intra_idx_const.cache_clear()
    _intra_onehot_const.cache_clear()
    _kernels_const.cache_clear()


icosahedron.register_convention_listener(_clear_convention_caches)


def so3conv_weight_init(dim_in: int, dim_out: int, n_kernel: int):
    """xavier_normal_(gain=calculate_gain('relu')) on a [c_out, c_in, k]
    tensor, torch fan semantics: fan_in = c_in*k, fan_out = c_out*k
    (ref: so3conv/modules.py:35-39)."""
    gain = float(np.sqrt(2.0))
    std = gain * float(np.sqrt(2.0 / (dim_in * n_kernel + dim_out * n_kernel)))

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform_(a=sqrt(5)) — the torch nn.Linear/ConvNd default.
    shape is flax convention [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = float(1.0 / np.sqrt(fan_in)) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _lane_group(c_in: int, c_out: int, lead) -> int:
    """Anchors to group per lane tile for a narrow-channel 1x1 conv: largest
    g with g*c_in and g*c_out multiples of 128 that divides the last leading
    dim (the anchor axis). 1 when channels already tile (or shapes don't)."""
    if c_in % 128 == 0 and c_out % 128 == 0:
        return 1
    if not lead:
        return 1
    a = lead[-1]
    for g in (4, 2):
        if (g * c_in) % 128 == 0 and (g * c_out) % 128 == 0 and a % g == 0:
            return g
    return 1


class Dense1x1(fnn.Module):
    """Channel-wise dense == torch Conv2d(c_in, c_out, 1) / Conv1d(.., 1),
    with matching default init."""
    features: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, packed_groups=None, return_params: bool = False):
        # packed_groups=na: x is packed [b, p, na*c]; apply the [c, d] weight
        # per anchor block. On TPU this runs the grouped Pallas kernel (packed
        # layout in/out — no reshapes/layout copies); elsewhere it falls back
        # to the flat-GEMM formulation below. Param shapes are identical.
        if packed_groups is not None and x.ndim == 3:
            na = packed_groups
            fan_in = x.shape[-1] // na
            k = self.param('kernel', torch_linear_kernel_init,
                           (fan_in, self.features))
            if self.use_bias:
                bias = self.param('bias', torch_linear_bias_init(fan_in),
                                  (self.features,))
            else:
                bias = jnp.zeros((self.features,), jnp.float32)
            if return_params:
                # caller runs the GEMM inside its own fused kernel (the
                # separable-block tail); params declared here so the tree
                # layout is identical either way
                return k, bias
            from ..ops.pallas import grouped_conv as plgc
            use_pl = (jax.default_backend() == 'tpu'
                      and plgc.supported(fan_in, self.features, na))
            shard_mesh = None
            na_l, tp_axes = na, False
            if use_pl and jax.device_count() > 1:
                from ..parallel import mesh as pmesh
                gm = pmesh.get_global_mesh()
                if (gm is not None and pmesh.axis_size(gm, 'anchor') == 1
                        and pmesh.axis_size(gm, 'data') > 1
                        and x.shape[0] % pmesh.axis_size(gm, 'data') == 0):
                    shard_mesh = gm
                else:
                    # anchor-axis TP: the per-anchor [c, d] GEMM is pointwise
                    # in anchors (one shared weight), so each device runs the
                    # kernel on its local anchor shard — no collectives
                    tpm = pmesh.tp_mesh_for(x.shape[0], na)
                    if tpm is not None and plgc.supported(
                            fan_in, self.features,
                            na // pmesh.axis_size(tpm, 'anchor')):
                        shard_mesh, tp_axes = tpm, True
                        na_l = na // pmesh.axis_size(tpm, 'anchor')
                    else:
                        use_pl = False
            if use_pl:
                fn = lambda xx, kk, bb: plgc.grouped_conv1x1(
                    xx, kk.astype(xx.dtype), bb, na_l)
                from ..parallel import mesh as pmesh
                if tp_axes:
                    from jax.sharding import PartitionSpec as P
                    fn = pmesh.named_shard_map(
                        fn, shard_mesh,
                        in_specs=[P('data', None, 'anchor'), P(), P()],
                        out_specs=P('data', None, 'anchor'))
                elif shard_mesh is not None:
                    fn = pmesh.data_shard_map(fn, shard_mesh, 1, 2)
                return fn(x, k, bias)
            b2, p2 = x.shape[:2]
            x4 = x.reshape(b2, p2, na, fan_in)
            kx = k.astype(x.dtype)
            g = _lane_group(fan_in, self.features, x4.shape[:-1])
            if g > 1:
                kb = jax.scipy.linalg.block_diag(*([kx] * g))
                y = jnp.einsum('mc,cd->md', x4.reshape(-1, g * fan_in), kb,
                               preferred_element_type=jnp.float32)
            else:
                y = jnp.einsum('mc,cd->md', x4.reshape(-1, fan_in), kx,
                               preferred_element_type=jnp.float32)
            y = y.astype(x.dtype).reshape(b2, p2, na * self.features)
            if self.use_bias:
                y = y + jnp.tile(bias, na).astype(x.dtype)
            return y
        fan_in = x.shape[-1]
        k = self.param('kernel', torch_linear_kernel_init, (fan_in, self.features))
        # contract as a flat 2-D GEMM: the >=3-D dot emitters pick p-minor
        # output layouts (EmitAllBatchInSublanes), which forced a 60 MB
        # layout copy on both sides of every surrounding norm/act fusion in
        # the packed {2,1,0} activation chain (1.9 GB of copies per flagship
        # step, profiled); a 2-D dot's row-major output bitcasts cleanly.
        # Narrow channels (c, d < 128) group g consecutive anchors per
        # 128-lane tile via a g-block-diagonal weight — [M, 64] operands
        # tile to half-empty lane tiles and copy anyway (240 MB on block0)
        lead = x.shape[:-1]
        g = _lane_group(fan_in, self.features, lead)
        kx = k.astype(x.dtype)
        if fan_in == 1:
            # rank-1 "GEMM" == broadcast multiply; the flat path would pay
            # two physical reshapes + a [M,1]x[1,d] pseudo-dot (block0 skip)
            y = x * kx[0]
        elif g > 1:
            x2 = x.reshape(-1, g * fan_in)
            kb = jax.scipy.linalg.block_diag(
                *([kx] * g)) if g > 1 else kx   # [g*c, g*d]
            y = jnp.einsum('mc,cd->md', x2, kb,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            x2 = x.reshape(-1, fan_in)
            y = jnp.einsum('mc,cd->md', x2, kx,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            b = self.param('bias', torch_linear_bias_init(fan_in), (self.features,))
            y = y + b.astype(x.dtype)
        return y


def _moments(x, axes, keepdims: bool = True):
    """(mean, biased var) in f32.

    f32 input: exact two-pass (torch parity). bf16: one-pass E[x^2]-E[x]^2
    with f32 accumulation — the converts fuse into the reductions, so the
    tensor is never materialized in f32 (a materialized f32 copy + layout
    copy cost ~1.4 ms/layer, profiled)."""
    if x.dtype == jnp.float32:
        return (x.mean(axis=axes, keepdims=keepdims),
                x.var(axis=axes, keepdims=keepdims))
    mean = jnp.mean(x, axis=axes, keepdims=keepdims, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                  keepdims=keepdims)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    return mean, var


def _packed_sums(x3):
    """Per-lane (sum, sumsq) f32 of packed [b, rows, L] activations.

    On TPU: the Pallas moments kernel (reads x in its natural layout; the
    XLA 4D reduce's layout preference forced a ~0.6 ms copy per norm).
    Elsewhere: plain jnp reductions (identical math)."""
    from ..ops.pallas import moments as plm
    if jax.default_backend() == 'tpu' and plm.supported(*x3.shape[1:]):
        from ..parallel import mesh as pmesh
        gm = pmesh.get_global_mesh() if jax.device_count() > 1 else None
        if gm is None:
            return plm.moments_sums(x3)
        # multi-device mesh installed: a raw pallas_call is opaque to GSPMD
        # (it would force an all-gather to run replicated). The reductions
        # are lane-local in the packed layout, so shard_map cleanly over
        # 'data' and — when the anchor axis shards the fiber — 'anchor' too.
        nd, ntp = pmesh.axis_size(gm, 'data'), pmesh.axis_size(gm, 'anchor')
        Lloc = x3.shape[2] // max(ntp, 1)
        if (x3.shape[0] % max(nd, 1) == 0
                and x3.shape[2] % max(ntp, 1) == 0
                and plm.supported(x3.shape[1], Lloc)):
            from jax.sharding import PartitionSpec as P
            spec = P('data', None, 'anchor' if ntp > 1 else None)
            fn = pmesh.named_shard_map(
                plm.moments_sums, gm, in_specs=[spec],
                out_specs=(P('data', 'anchor' if ntp > 1 else None),) * 2)
            return fn(x3)
    xf = x3.astype(jnp.float32)
    return xf.sum(axis=1), jnp.square(xf).sum(axis=1)


def _packed_instance_norm(x3, groups: int, eps: float, scale_shift=False):
    """InstanceNorm2d semantics on packed [b, p, groups*c] activations:
    per-(b, c) stats over (p, groups), one-pass E[x^2]-E[x]^2 in f32.

    scale_shift=True: instead of applying, return per-lane f32
    (scale, shift) [b, L] with  normed == x * scale + shift  — for deferring
    the apply into a downstream Pallas kernel's load path."""
    b, p, L = x3.shape
    c = L // groups
    s, sq = _packed_sums(x3)                        # [b, L] f32
    n = p * groups
    sc = s.reshape(b, groups, c).sum(axis=1)
    sqc = sq.reshape(b, groups, c).sum(axis=1)
    mean = sc / n
    var = jnp.maximum(sqc / n - jnp.square(mean), 0.0)
    rsig = jax.lax.rsqrt(var + eps)
    if scale_shift:
        scale_l = jnp.tile(rsig, (1, groups))
        shift_l = jnp.tile(-mean * rsig, (1, groups))
        return scale_l, shift_l                     # [b, L] f32 each
    mean_l = jnp.tile(mean, (1, groups))[:, None, :]
    rsig_l = jnp.tile(rsig, (1, groups))[:, None, :]
    y = (x3.astype(jnp.float32) - mean_l) * rsig_l
    return y.astype(x3.dtype)


class InstanceNorm(fnn.Module):
    """torch nn.InstanceNorm2d(c, affine=False) over [b, c, p, a]: normalize
    each (b, c) slice over the spatial axes. Ours: [b, p, a, c] -> reduce over
    (1, 2). eps matches torch default.

    Packed mode: 3D input [b, p, groups*c] with groups > 1 computes the same
    per-(b, c) statistics via the Pallas moments kernel (no 4D layout churn)."""
    epsilon: float = 1e-5
    groups: int = 1

    @fnn.compact
    def __call__(self, x, train: bool = True, scale_shift: bool = False):
        # train ignored (no running stats)
        if x.ndim == 3 and self.groups > 1:
            return _packed_instance_norm(x, self.groups, self.epsilon,
                                         scale_shift=scale_shift)
        assert not scale_shift, 'scale_shift only for packed 3D input'
        mean, var = _moments(x, axes=(1, 2))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


class InstanceNorm1d(fnn.Module):
    """InstanceNorm over [b, a, c] (single spatial axis)."""
    epsilon: float = 1e-5

    @fnn.compact
    def __call__(self, x, train: bool = True):  # train ignored (no stats)
        mean, var = _moments(x, axes=(1,))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


class BatchNorm(fnn.Module):
    """torch nn.BatchNorm2d/1d equivalent for channels-last input: normalize
    over all non-channel axes; affine; running stats with torch momentum 0.1.

    Implemented manually because torch updates running_var with the UNBIASED
    batch variance (n/(n-1)) while normalizing with the biased one — flax's
    BatchNorm uses biased for both, which breaks eval-mode parity."""
    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    groups: int = 1        # packed [b, p, groups*c] input support

    @fnn.compact
    def __call__(self, x, train: bool = True, scale_shift: bool = False):
        packed = x.ndim == 3 and self.groups > 1
        assert packed or not scale_shift, \
            'scale_shift only for packed 3D input'
        c = x.shape[-1] // self.groups if packed else x.shape[-1]
        scale = self.param('scale', fnn.initializers.ones, (c,))
        bias = self.param('bias', fnn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        n = x.size // c
        if train:
            if packed:
                s, sq = _packed_sums(x)              # [b, L] f32
                sc = s.reshape(-1, self.groups, c).sum(axis=(0, 1))
                sqc = sq.reshape(-1, self.groups, c).sum(axis=(0, 1))
                mean = sc / n
                var = jnp.maximum(sqc / n - jnp.square(mean), 0.0)
            else:
                # biased var used for normalization (torch semantics)
                axes = tuple(range(x.ndim - 1))
                mean, var = _moments(x, axes=axes, keepdims=False)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        rsig = jax.lax.rsqrt(var + self.epsilon)
        if packed:
            if scale_shift:
                # normed == x * scale_l + shift_l, per-lane f32 [1, L]
                scale_l = jnp.tile(rsig * scale, self.groups)[None, :]
                shift_l = jnp.tile(bias - mean * rsig * scale,
                                   self.groups)[None, :]
                return scale_l, shift_l
            mean_l = jnp.tile(mean, self.groups)[None, None, :]
            rs_l = jnp.tile(rsig * scale, self.groups)[None, None, :]
            sh_l = jnp.tile(bias, self.groups)[None, None, :]
            y = (x.astype(jnp.float32) - mean_l) * rs_l + sh_l
            return y.astype(x.dtype)
        y = (x.astype(jnp.float32) - mean) * rsig
        return (y * scale + bias).astype(x.dtype)


def make_norm(norm: Optional[str]):
    """Resolve a reference norm name to a module factory. None -> InstanceNorm
    (ref: base_so3conv.py:107)."""
    if norm is None or norm == 'InstanceNorm2d':
        return InstanceNorm
    if norm in ('BatchNorm2d', 'BatchNorm1d'):
        return BatchNorm
    raise ValueError(f'unsupported norm {norm}')


class BasicSO3Conv(fnn.Module):
    """The learned SO(3) conv weight: a single matmul over (kernel, channel)
    with no bias (ref: so3conv/modules.py:21-55).

    [b, p, a, k, c_in] -> [b, p, a, c_out]
    """
    dim_in: int
    dim_out: int
    kernel_size: int
    debug: bool = False

    @fnn.compact
    def __call__(self, x):
        if self.debug:
            W = jnp.ones((self.kernel_size, self.dim_in, self.dim_out), x.dtype)
        else:
            W = self.param('W',
                           so3conv_weight_init(self.dim_in, self.dim_out,
                                               self.kernel_size),
                           (self.kernel_size, self.dim_in, self.dim_out))
        return jnp.einsum('bpakc,kcd->bpad', x, W)


class IntraSO3Conv(fnn.Module):
    """Rotation-group conv: gather along the anchor axis with the 60x12 group
    adjacency, then the learned conv matmul (ref: so3conv/modules.py:177-200).
    Only valid for kanchor == 60.

    Computed as TWO dense GEMMs (anchor-axis gathers lower to while-loops of
    dynamic slices on TPU — ~300 ms/step measured across the model):
      stage 1 (the true MACs, per input anchor x):
        Y[b, p, x, k, c2] = sum_c1 f[b, p, x, c1] W[k, c1, c2]
      stage 2 (anchor mixing via the static one-hot group adjacency
      M[x, k, a] = [trace_idx[a, k] == x]):
        out[b, p, a, c2] = sum_{x, k} Y[b, p, x, k, c2] M[x, k, a]
    Stage 2 pays 60/12 one-hot density as extra MXU MACs but only ~60/c1 of
    stage 1 — ~1.2x the sparse-form MACs overall, vs 5x for the previous
    single-GEMM formulation that folded M into W (~55 -> ~15 ms/step)."""
    dim_in: int
    dim_out: int

    @fnn.compact
    def __call__(self, x: SphericalPointCloud,
                 prenorm=None) -> SphericalPointCloud:
        # prenorm: optional (ss [b, 8, na*c_in] f32, act_name) — the deferred
        # norm-apply + activation of the preceding inter conv, fused into the
        # Pallas kernel's load path (applied explicitly on non-Pallas paths)
        ti = _intra_idx_const()                       # [60, 12] numpy
        na, n_kernel = ti.shape
        W = self.param('W', so3conv_weight_init(self.dim_in, self.dim_out,
                                                int(n_kernel)),
                       (int(n_kernel), self.dim_in, self.dim_out))

        from ..ops import so3conv as so3f
        cdt = so3f.get_compute_dtype()
        packed = x.feats.ndim == 3          # [b, p, nx*c] packed activations
        use_pl = jax.default_backend() == 'tpu'
        shard_mesh = None
        if use_pl and jax.device_count() > 1:
            # Pallas is opaque to GSPMD: shard_map over 'data' when a global
            # mesh is installed, XLA two-stage GEMM otherwise
            from ..parallel import mesh as pmesh
            gm = pmesh.get_global_mesh()
            if (gm is not None and pmesh.axis_size(gm, 'anchor') == 1
                    and pmesh.axis_size(gm, 'data') > 1
                    and x.feats.shape[0] % pmesh.axis_size(gm, 'data') == 0):
                shard_mesh = gm
            else:
                use_pl = False
        if use_pl:
            # fused Pallas kernel: true MACs on the MXU, VMEM-resident
            # anchor mixing, no [b,p,x,k,d] HBM intermediate
            from ..ops.pallas.intra_conv import intra_conv, intra_conv_prenorm
            c1 = self.dim_in
            if packed:
                f3 = x.feats.astype(cdt)
                b, p = f3.shape[:2]
            else:
                b, p, nx, _ = x.feats.shape
                f3 = x.feats.astype(cdt).reshape(b, p, nx * c1)
            w2 = jnp.transpose(W.astype(cdt), (1, 0, 2)).reshape(
                c1, int(n_kernel) * self.dim_out)
            tit = tuple(map(tuple, ti.tolist()))
            # point tile = MXU M dim of the per-anchor GEMMs; as large as
            # the f32 accumulator allows (~4 MB VMEM)
            t = 64
            while t < 256 and 2 * t * na * self.dim_out * 4 <= 4 * 2 ** 20:
                t *= 2
            if prenorm is not None:
                ss, act_name = prenorm
                fn = lambda f, s, w: intra_conv_prenorm(f, s, w, tit,
                                                        act_name, 0.01, t)
                if shard_mesh is not None:
                    from ..parallel import mesh as pmesh
                    fn = pmesh.data_shard_map(fn, shard_mesh, 2, 1)
                out = fn(f3, ss, w2)
            else:
                fn = lambda f, w: intra_conv(f, w, tit, t)
                if shard_mesh is not None:
                    from ..parallel import mesh as pmesh
                    fn = pmesh.data_shard_map(fn, shard_mesh, 1, 1)
                out = fn(f3, w2)
            # stay in the compute dtype: the f32 upcast here cost a 0.6 ms
            # convert + 0.8 ms layout copy per layer (profiled); norms take
            # their stats in f32 regardless
            if not packed:
                out = out.reshape(b, p, na, self.dim_out)
        else:
            feats = x.feats
            if prenorm is not None:                  # packed 3D by contract
                ss, act_name = prenorm
                u = (feats.astype(jnp.float32) * ss[:, 0:1, :]
                     + ss[:, 1:2, :]).astype(cdt)
                act = get_activation(act_name)
                feats = act(u) if act is not None else u
            f4 = so3f.unpack_feats(feats, na) if packed else feats
            M = jnp.asarray(_intra_onehot_const(), dtype=cdt)   # [x, a, k]
            Y = jnp.einsum('bpxc,kcd->bpxkd', f4.astype(cdt),
                           W.astype(cdt))
            out = jnp.einsum('bpxkd,xak->bpad', Y.astype(cdt), M,
                             preferred_element_type=jnp.float32).astype(cdt)
            if packed:
                out = out.reshape(out.shape[0], out.shape[1], -1)
        from ..parallel.mesh import constrain_feats
        out = constrain_feats(out)
        anchors = jnp.asarray(_anchors_const(60))
        return SphericalPointCloud(x.xyz, out, anchors)


class InterSO3Conv(fnn.Module):
    """Spatial SO(3)-anchor conv: ball grouping + anchor-rotated kernel
    weights + learned conv matmul (ref: so3conv/modules.py:125-174).

    By default runs the fused anchor-chunked path (identical math, never
    materializes the [b,p,n,a,c]/[b,p,a,k,c] intermediates; no inter_w cache
    is produced). The unfused reference-structured path runs when a cached
    (inter_idx, inter_w) pair is supplied, when pooling is active, or when
    fused=False."""
    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    lazy_sample: bool = True
    pooling: Optional[str] = None
    kanchor: int = 60
    fused: bool = True
    anchor_chunk: int = 0     # <= 0: auto-pick per layer shape
    remat: bool = True
    ones_input: bool = False

    @fnn.compact
    def __call__(self, x: SphericalPointCloud, inter_idx=None, inter_w=None):
        anchors = jnp.asarray(_anchors_const(self.kanchor))
        kernels = jnp.asarray(_kernels_const(self.radius, self.kernel_size))
        n_kernel = int(kernels.shape[0])
        W = self.param('W', so3conv_weight_init(self.dim_in, self.dim_out,
                                                n_kernel),
                       (n_kernel, self.dim_in, self.dim_out))

        use_fused = (self.fused and self.pooling is None
                     and inter_w is None)
        packed_io = so3conv.packed_enabled() and self.kanchor > 1
        if use_fused:
            na = anchors.shape[0]
            chunk = self.anchor_chunk
            if chunk <= 0:
                chunk = so3conv.auto_anchor_chunk(na, self.dim_in,
                                                  self.n_neighbor)
            while na % chunk != 0:
                chunk -= 1
            inter_idx, xyz, feats, sample_idx = so3conv.inter_so3conv_fused(
                x.xyz, x.feats, self.stride, self.n_neighbor, anchors,
                kernels, self.radius, self.sigma, W,
                lazy_sample=self.lazy_sample, anchor_chunk=chunk,
                remat=self.remat, ones_input=self.ones_input,
                packed_io=packed_io)
            inter_w = None
        else:
            in_feats = so3conv.unpack_feats(x.feats, self.kanchor)
            inter_idx, inter_w, xyz, feats, sample_idx = \
                so3conv.inter_so3conv_grouping(
                    x.xyz, in_feats, self.stride, self.n_neighbor, anchors,
                    kernels, self.radius, self.sigma, inter_idx, inter_w,
                    self.lazy_sample, pooling=self.pooling)
            feats = jnp.einsum('bpakc,kcd->bpad', feats, W)
            if packed_io:
                feats = feats.reshape(feats.shape[0], feats.shape[1], -1)
        from ..parallel.mesh import constrain_feats
        feats = constrain_feats(feats)
        return inter_idx, inter_w, sample_idx, SphericalPointCloud(
            xyz, feats, anchors)


class PointnetSO3Conv(fnn.Module):
    """Equivariant PointNet head: concat per-anchor rotated coords, 1x1 conv,
    max-pool over points (ref: so3conv/modules.py:203-235).

    SphericalPointCloud(xyz [b,p,3], feats [b,p,a,c]) -> [b, a, c_out]
    """
    dim_in: int   # feature channels BEFORE the +3 coords
    dim_out: int
    kanchor: int = 60

    @fnn.compact
    def __call__(self, x: SphericalPointCloud):
        xyz, feats = x.xyz, x.feats
        na = feats.shape[2]
        if na == 1:
            xyz_c = xyz - xyz.mean(axis=1, keepdims=True)
            feats = jnp.concatenate([feats, xyz_c[:, :, None, :]], axis=-1)
        else:
            anchors = jnp.asarray(_anchors_const(self.kanchor))
            xyzr = so3conv.pointnet_so3_coords(xyz, anchors)  # [b,p,a,3]
            feats = jnp.concatenate([feats, xyzr], axis=-1)
        feats = Dense1x1(self.dim_out)(feats)       # embed (Conv2d 1x1)
        return feats.max(axis=1)                    # max over points -> [b,a,c]


class KernelPropagation(fnn.Module):
    """Fragment -> anchor-feature bootstrapping via density-weighted anchor
    occupancy + BasicSO3Conv (ref: so3conv/modules.py:57-119)."""
    dim_in: int
    dim_out: int
    n_center: int
    kernel_size: int
    radius: float
    sigma: float
    kanchor: int = 60

    @fnn.compact
    def __call__(self, frag, clouds):
        """frag [m, 3]; clouds [b, p, 3] -> SphericalPointCloud over centers."""
        anchors_np = _anchors_const(self.kanchor)
        kernels_np = _kernels_const(self.radius, self.kernel_size)
        # pre-rotated kernels [ks, na, 3] (ref: modules.py:68)
        rk = np.transpose(anchors_np @ kernels_np.T, (2, 0, 1))
        anchors = jnp.asarray(anchors_np)
        kernels = jnp.asarray(rk)

        if clouds.shape[1] == self.n_center:
            centers = clouds
        else:
            _, centers = sampling.furthest_sample(clouds, self.n_center, False)

        wts, cnt = so3conv.initial_anchor_query(
            frag, centers, kernels, self.radius, self.sigma)
        wts = wts / (cnt + 1.0)                       # [b, nc, a, ks]
        feats = BasicSO3Conv(self.dim_in, self.dim_out,
                             int(kernels_np.shape[0]))(wts[..., None])
        return SphericalPointCloud(centers, feats, anchors)
