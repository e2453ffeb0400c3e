"""SO(3)-anchor equivariant convolution functional core (jnp, static shapes).

Rebuild of vgtk/vgtk/so3conv/functional.py and the live parts of
vgtk/vgtk/spconv/functional.py as dense tensor algebra for XLA/TPU.

Layout: xyz [b, p, 3]; feats [b, p, a, c] (channels-last; the reference is
channels-first [b, c, p, a]).

The inter conv pipeline per layer (ref: so3conv/functional.py:118-218 +
spconv/functional.py:372-390):
  1. FPS(stride) -> ball query -> localized grouped_xyz       (sampling.py)
  2. anchor weights  w[b,p,n,a,k] = relu(1 - d^2 / sigma),
       d^2 = || grouped_xyz - R_a @ kappa_k ||^2
  3. gather neighbor features (with zero shadow feature at index p1)
  4. contraction  out[b,p,a,k,c] = sum_n w[b,p,n,a,k] * G[b,p,n,a,c]
followed by the learned BasicSO3Conv matmul over (k, c) in the nn layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import sampling


class SphericalPointCloud(NamedTuple):
    """Value container threaded through conv layers (ref: spconv/base.py:4-21).

    xyz [b, p, 3]; feats [b, p, a, c]; anchors [a, 3, 3] or None.
    """
    xyz: jnp.ndarray
    feats: jnp.ndarray
    anchors: Optional[jnp.ndarray]


def get_occupancy_features(pc: jnp.ndarray, n_anchor: int,
                           use_center: bool = False) -> jnp.ndarray:
    """[b, p, 3|6] -> occupancy-ones features [b, p, na, c]
    (ref: so3conv/functional.py:25-44). With normals (6-dim input), the
    per-anchor rotated normals are appended as 3 extra channels."""
    b, p, nd = pc.shape
    feats = jnp.ones((b, p, n_anchor, 1), dtype=pc.dtype)
    if nd == 6:
        from . import icosahedron
        ns = pc[:, :, 3:]
        if n_anchor > 1:
            anchors = jnp.asarray(icosahedron.get_anchors(n_anchor), pc.dtype)
            # ref einsum 'bni,aij->bjna' == per-anchor rotated normal channels
            fn = jnp.einsum('bpi,aij->bpaj', ns, anchors)
        else:
            fn = ns[:, :, None, :]
        feats = jnp.concatenate([feats, fn], axis=-1)
    if use_center:
        feats = feats.at[:, 0].set(0.0)
    return feats


def preprocess_input(x: jnp.ndarray, na: int,
                     add_center: bool = True) -> SphericalPointCloud:
    """[b, p, 3|6] -> SphericalPointCloud (ref: base_so3conv.py:16-23)."""
    has_normals = x.shape[2] == 6
    if add_center and not has_normals:
        center = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([center, x], axis=1)[:, :-1]
    xyz = x[:, :, :3]
    return SphericalPointCloud(xyz, get_occupancy_features(x, na, add_center), None)


# ---------------------------------------------------------------------------
# Inter (spatial) conv grouping
# ---------------------------------------------------------------------------

def inter_conv_anchor_weights(grouped_xyz: jnp.ndarray, anchors: jnp.ndarray,
                              kernels: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Kernel-point influence weights under each anchor rotation
    (ref: inter_so3conv_grouping_anchor, so3conv/functional.py:180-218).

    grouped_xyz [b, p, n, 3]; anchors [a, 3, 3]; kernels [k, 3]
      -> w [b, p, n, a, k] = relu(1 - ||gx - R_a kappa||^2 / sigma)

    Computed by expansion so the cross term is a single MXU matmul:
      ||gx - rk||^2 = |gx|^2 + |kappa|^2 - 2 gx . (R_a kappa).
    """
    rk = jnp.einsum('aij,kj->aki', anchors, kernels)          # [a, k, 3]
    gx2 = jnp.sum(grouped_xyz ** 2, axis=-1)                  # [b, p, n]
    k2 = jnp.sum(kernels ** 2, axis=-1)                       # [k]
    cross = jnp.einsum('bpnc,akc->bpnak', grouped_xyz, rk)    # [b, p, n, a, k]
    d2 = gx2[..., None, None] + k2[None, None, None, None, :] - 2.0 * cross
    return jax.nn.relu(1.0 - d2 / sigma)


def inter_feat_grouping(grouped_feats: jnp.ndarray,
                        inter_w: jnp.ndarray) -> jnp.ndarray:
    """Neighbor contraction (ref: inter_zpconv_grouping_naive,
    spconv/functional.py:372-390, einsum 'bcpna,bpakn->bckpa').

    grouped_feats [b, p, n, a, c]; inter_w [b, p, n, a, k]
      -> [b, p, a, k, c]
    """
    return jnp.einsum('bpnak,bpnac->bpakc', inter_w, grouped_feats)


def inter_so3conv_grouping(xyz: jnp.ndarray, feats: jnp.ndarray, stride: int,
                           n_neighbor: int, anchors: jnp.ndarray,
                           kernels: jnp.ndarray, radius: float, sigma: float,
                           inter_idx=None, inter_w=None, lazy_sample=True,
                           radius_expansion: float = 1.0, pooling=None):
    """Full inter-conv grouping (ref: so3conv/functional.py:118-178).

    Returns (inter_idx, inter_w, new_xyz, new_feats [b,p2,a,k,c], sample_idx).
    inter_idx/inter_w are reusable across consecutive stride-1 layers.
    """
    if pooling is not None and stride > 1 and feats.shape[-1] > 1:
        # Low-pass blurring before strided conv (ref: functional.py:133-147)
        if pooling == 'stride':
            pool_stride, stride_nn, stride = stride, int(n_neighbor * stride ** 0.5), 1
        elif pooling == 'no-stride':
            pool_stride, stride_nn = 1, n_neighbor
        else:
            raise NotImplementedError(f'pooling mode {pooling}')
        feats, xyz = inter_so3conv_blurring(
            xyz, feats, stride_nn, radius, pool_stride, inter_idx, lazy_sample)
        inter_idx = None

    if inter_idx is None:
        grouped_xyz, inter_idx, sample_idx, new_xyz = sampling.inter_grouping_ball(
            xyz, stride, radius * radius_expansion, n_neighbor, lazy_sample)
        inter_w = inter_conv_anchor_weights(grouped_xyz, anchors, kernels, sigma)
    else:
        sample_idx, new_xyz = None, xyz

    feats = sampling.add_shadow_feature(feats)
    grouped_feats = sampling.gather_points(feats, inter_idx)  # [b,p2,n,a,c]
    new_feats = inter_feat_grouping(grouped_feats, inter_w)
    return inter_idx, inter_w, new_xyz, new_feats, sample_idx


# Global compute-precision policy for the hot conv path. 'fp32' (default)
# keeps reference parity; 'bf16' casts the neighbor-feature stream and conv
# weights to bfloat16 with fp32 accumulation (the TPU-native production
# setting — the MXU natively consumes bf16).
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(name: str):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = {'fp32': jnp.float32, 'float32': jnp.float32,
                      'bf16': jnp.bfloat16, 'bfloat16': jnp.bfloat16}[name]


def get_compute_dtype():
    return _COMPUTE_DTYPE


# Rematerialization of the per-chunk conv computation (saves activation
# memory during training; identity for inference but can block XLA fusion,
# so benchmarks/serving turn it off).
_USE_REMAT = True


def set_remat(flag: bool):
    global _USE_REMAT
    _USE_REMAT = bool(flag)


# Pallas kernel toggle for the fused inter conv: the block-diagonal MXU
# kernel (ops/pallas/inter_conv.py) replaces the VPU-bound XLA
# broadcast-multiply-reduce for layers it supports (n_neighbor <= 128,
# c_in >= 32); measured 1.6-12x per layer on TPU v5e. Interpret mode keeps
# CPU tests exact.
_USE_PALLAS = True


def set_use_pallas(flag: bool):
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


# Packed activation layout: between conv layers, features travel as 3D
# [b, p, na*c] (the layout every Pallas kernel already consumes/produces)
# instead of 4D [b, p, na, c]. XLA assigns 4D reduce-influenced layouts to
# the [b,p,a,c] form, which forced a pathological layout copy at every norm
# and at every kernel boundary (~12 ms/step on the flagship model,
# profiled). Norm statistics in packed mode come from the Pallas moments
# kernel (ops/pallas/moments.py). Enabled for the bf16 production mode;
# the fp32 parity path keeps the reference-shaped 4D flow.
_USE_PACKED = True


def set_packed(flag: bool):
    global _USE_PACKED
    _USE_PACKED = bool(flag)


def packed_enabled() -> bool:
    return _USE_PACKED and _COMPUTE_DTYPE == jnp.bfloat16


def unpack_feats(feats: Optional[jnp.ndarray], na: int) -> Optional[jnp.ndarray]:
    """Packed [b, p, na*c] -> [b, p, na, c]; identity on 4D/None inputs."""
    if feats is not None and feats.ndim == 3 and na > 1:
        b, p, L = feats.shape
        return feats.reshape(b, p, na, L // na)
    return feats


_ANCHOR_CHUNK_OVERRIDE = None


def set_anchor_chunk_override(chunk):
    """Force a global anchor chunk (perf sweeps; None = auto rule). The
    value is clamped to the nearest divisor of each layer's na."""
    global _ANCHOR_CHUNK_OVERRIDE
    _ANCHOR_CHUNK_OVERRIDE = chunk


def auto_anchor_chunk(na: int, dim_in: int, n_neighbor: int) -> int:
    """Anchor-chunk auto-pick for the fused inter conv (measured on the
    flagship sweep): small chunks buy a bigger point tile for narrow layers;
    wide layers prefer large chunks (fewer table re-streams)."""
    if _ANCHOR_CHUNK_OVERRIDE is not None:
        if int(_ANCHOR_CHUNK_OVERRIDE) < 1:
            raise ValueError(
                f'anchor chunk override must be >= 1, got '
                f'{_ANCHOR_CHUNK_OVERRIDE}')
        chunk = min(int(_ANCHOR_CHUNK_OVERRIDE), na)
        while na % chunk != 0:
            chunk -= 1
        if (chunk * dim_in) % 128 != 0:
            # the fused-layer gate requires 128-lane-aligned chunk*dim_in;
            # an unaligned forced chunk silently benches the XLA fallback
            # labeled as this chunk — make sweeps see that loudly
            import sys
            print(f'[so3conv] WARNING: forced anchor chunk {chunk} '
                  f'(dim_in={dim_in}) fails the 128-lane alignment rule — '
                  f'the fused kernel gate will reject this layer and the '
                  f'XLA fallback runs instead', file=sys.stderr, flush=True)
        return chunk
    cands = [x for x in (10, 12, 15, 20, 30, na)
             if na % x == 0 and (x * dim_in) % 128 == 0]
    if not cands:
        chunk = na
    elif dim_in <= 64 and n_neighbor <= 16:
        chunk = cands[0]
    else:
        chunk = max(x for x in cands if x <= 30)
    while na % chunk != 0:
        chunk -= 1
    return chunk


def fused_layer_gate(p1: int, stride: int, n_neighbor: int, n_kernel: int,
                     c_in: int, na: int, chunk: int) -> bool:
    """Single-device Pallas dispatch gate for one fused inter-conv layer —
    the exact decision inter_so3conv_fused makes, factored out so tests can
    assert every production layer shape actually takes the kernel path
    (a silent fall-back to XLA costs 5-10x; see tests/test_pallas_gates.py)."""
    from .pallas import inter_conv as plic
    if not plic.supported(n_neighbor, c_in):
        return False
    p2 = -(-p1 // stride)
    nt = plic.plan(n_neighbor, n_kernel)[0]
    onehot = sampling._onehot_profitable(p1 + 1, p2 * nt, na * c_in + 8)
    return plic.layer_fusable(p2, n_neighbor, n_kernel, c_in, na, chunk,
                              onehot)


def inter_so3conv_fused(xyz: jnp.ndarray, feats: jnp.ndarray, stride: int,
                        n_neighbor: int, anchors: jnp.ndarray,
                        kernels: jnp.ndarray, radius: float, sigma: float,
                        W: jnp.ndarray, lazy_sample: bool = True,
                        radius_expansion: float = 1.0,
                        anchor_chunk: int = 20,
                        remat: bool = True,
                        use_pallas: Optional[bool] = None,
                        ones_input: bool = False,
                        packed_io: bool = False):
    """Fused inter conv: grouping + anchor weights + neighbor contraction +
    the learned BasicSO3Conv matmul, computed in anchor chunks so the
    [b, p, n, a, c] and [b, p, a, k, c] intermediates of the reference
    formulation (spconv/functional.py:372-390 + so3conv/modules.py:48-55)
    are never materialized. Numerically identical to the unfused path.

    W: [k, c_in, c_out] conv weight.
    Returns (inter_idx, new_xyz, out_feats [b, p2, a, c_out], sample_idx).
    The inter_w cache is not produced (recompute is cheaper than the HBM).

    packed_io: accept feats as packed [b, p, na*c] and return packed
    [b, p2, na*c_out] (see packed_enabled(); avoids all 4D layout copies).
    """
    k2 = jnp.sum(kernels ** 2, axis=-1)               # [k]
    na = anchors.shape[0]
    chunk = min(anchor_chunk, na)
    assert na % chunk == 0, (na, chunk)

    cdt = _COMPUTE_DTYPE
    packed_in = feats.ndim == 3
    c_in = feats.shape[-1] // na if packed_in else feats.shape[-1]
    from .pallas import inter_conv as plic
    interpret = jax.default_backend() != 'tpu'
    if use_pallas is None:
        # default: kernel on TPU only (interpret-mode Pallas is far too slow
        # to be the default CPU/test path; pass use_pallas=True to force it)
        use_pl = _USE_PALLAS and not interpret
    else:
        use_pl = use_pallas
    use_pl = use_pl and plic.supported(n_neighbor, c_in)
    fusable_global = False
    if use_pl:
        fusable_global = fused_layer_gate(
            xyz.shape[1], stride, n_neighbor, kernels.shape[0], c_in, na,
            chunk)

    # Multi-device: Pallas calls are opaque to GSPMD, so under a bare pjit
    # they would force replication. With an installed global ('data',
    # 'anchor') mesh we shard_map the Pallas layer explicitly: batch over
    # 'data', and — because the inter conv is pointwise in anchors (each
    # output anchor reads only its own fiber; the rk8 weight operand has a
    # leading anchor axis) — the rotation-group dimension over 'anchor'
    # with NO communication. Anything the gates reject falls back to the
    # XLA formulation, which GSPMD partitions fine.
    from ..parallel import mesh as pmesh
    shard_mesh = None
    na_l, chunk_l = na, chunk          # per-shard anchor extents (TP < na)
    tp_axes = False
    if use_pl and jax.device_count() > 1:
        gm = pmesh.get_global_mesh()
        if (gm is not None and pmesh.axis_size(gm, 'anchor') == 1
                and pmesh.axis_size(gm, 'data') > 1
                and feats.shape[0] % pmesh.axis_size(gm, 'data') == 0):
            shard_mesh = gm
            use_pl = fusable_global
        else:
            tpm = pmesh.tp_mesh_for(feats.shape[0], na)
            if tpm is not None:
                na_l = na // pmesh.axis_size(tpm, 'anchor')
                chunk_l = pmesh.largest_divisor_at_most(na_l, chunk)
                p1 = xyz.shape[1]
                p2_pre = -(-p1 // stride)
                nt_pre = plic.plan(n_neighbor, kernels.shape[0])[0]
                onehot_l = sampling._onehot_profitable(
                    p1 + 1, p2_pre * nt_pre, na_l * c_in + 8)
                if plic.layer_fusable(p2_pre, n_neighbor, kernels.shape[0],
                                      c_in, na_l, chunk_l, onehot_l):
                    shard_mesh, tp_axes = tpm, True
                else:
                    use_pl = False
            else:
                use_pl = False
    else:
        use_pl = use_pl and fusable_global

    # Occupancy-ones block-0 fast path: the neighbor contraction degenerates
    # to a pure anchor-weight sum (ref: base_so3conv.py:16-23 +
    # so3conv/functional.py:25-44), computed by a dedicated Pallas kernel
    # with NO per-neighbor coordinate gather (absolute-coordinate expansion;
    # see ops/pallas/ones_conv.py). bf16 mode only — fp32 stays on the
    # exact XLA formulation below.
    if ones_input and c_in == 1 and cdt == jnp.bfloat16:
        from .pallas import ones_conv as ploc
        if use_pallas is None:
            use_ones = _USE_PALLAS and not interpret
        else:
            use_ones = use_pallas
        p1 = xyz.shape[1]
        kt_o = ploc.pick_kt(na, kernels.shape[0])
        nt_o = ploc.pick_nt(n_neighbor)
        ones_mesh = None
        if use_ones and jax.device_count() > 1:
            gm = pmesh.get_global_mesh()
            if (gm is not None and pmesh.axis_size(gm, 'anchor') == 1
                    and pmesh.axis_size(gm, 'data') > 1
                    and feats.shape[0] % pmesh.axis_size(gm, 'data') == 0):
                ones_mesh = gm
            else:
                use_ones = False
        if use_ones and ploc.supported(-(-p1 // stride), p1 + 1, nt_o,
                                       na, kt_o):
            _, inter_idx, sample_idx, new_xyz = sampling.inter_grouping_ball(
                xyz, stride, radius * radius_expansion, n_neighbor,
                lazy_sample, gather_xyz=False)
            nn_real = inter_idx.shape[2]
            idx_pad = inter_idx if nt_o == nn_real else jnp.pad(
                inter_idx, ((0, 0), (0, 0), (0, nt_o - nn_real)),
                constant_values=p1)                    # pad -> shadow row
            rk_all = jnp.einsum('aij,kj->aki', anchors, kernels)
            lanes = na * kt_o
            rk16 = ploc.make_rk16_ones(rk_all, k2, kt_o, lanes)
            k8o = ploc.make_k8_ones(rk_all, kt_o, lanes)
            d_out = W.shape[-1]
            W2 = jnp.pad(W.reshape(W.shape[0], d_out),
                         ((0, kt_o - W.shape[0]), (0, 0)))

            def ones_layer(xyz_s, idx_s, new_xyz_s, rk16, k8o, W2):
                bb, pp = idx_s.shape[:2]
                tab16 = ploc.make_tab16(sampling.add_shadow_point(xyz_s))
                xp8 = ploc.make_xp8(new_xyz_s)
                F = ploc.ones_weight_sum(
                    idx_s.reshape(bb, 1, pp * nt_o), tab16, xp8, rk16,
                    k8o, float(sigma), nt_o, cdt, interpret)
                # flat 2-D GEMM: the 4-D dot emitter picks a p-minor output
                # layout that forces copies around downstream fusions.
                # Group g anchors per output lane tile (block-diag weight)
                # so the [M, g*d] result tiles 128 lanes exactly
                g = next((gg for gg in (2, 4)
                          if (gg * d_out) % 128 == 0 and na % gg == 0), 1)
                W2c = W2.astype(cdt)
                if g > 1:
                    W2c = jax.scipy.linalg.block_diag(*([W2c] * g))
                out = jnp.einsum(
                    'mk,kd->md', F.reshape(bb * pp * na // g, g * kt_o),
                    W2c, preferred_element_type=jnp.float32)
                # cast in the GEMM epilogue: a f32 [b, p, na*d] here is
                # 252 MB on the flagship and costs a layout copy + a
                # convert fusion (~1.5 ms/step, profiled)
                return out.astype(cdt).reshape(bb, pp, na * d_out)

            if ones_mesh is not None:
                ones_layer = pmesh.data_shard_map(
                    ones_layer, ones_mesh, n_data_args=3, n_repl_args=3)
            out = ones_layer(xyz, idx_pad, new_xyz, rk16, k8o, W2)
            if not packed_io:
                out = out.reshape(out.shape[0], out.shape[1], na, d_out)
            return inter_idx, new_xyz, out, sample_idx

    if use_pl:
        # Single-pass Pallas path (no XLA-level anchor chunking): ONE
        # row-gather per layer with (na*c + 8)-wide rows — TPU gathers are
        # dispatch/byte-bound, so everything rides one wide gather: the
        # support features AND the (packed) support coordinates. The kernel's
        # third grid dimension walks the anchor chunks by lane-offset
        # index_map (zero chunk copies); the trailing coordinate lanes feed
        # the distance-fold operand.
        _, inter_idx, sample_idx, new_xyz = sampling.inter_grouping_ball(
            xyz, stride, radius * radius_expansion, n_neighbor, lazy_sample,
            gather_xyz=False)
        b, p2, nn = inter_idx.shape
        nt, tp, kt, _ = plic.plan(nn, kernels.shape[0])
        q = xyz.shape[1] + 1                              # + shadow row
        shadow_row = q - 1
        idx_pad = inter_idx if nt == nn else jnp.pad(
            inter_idx, ((0, 0), (0, 0), (0, nt - nn)),
            constant_values=shadow_row)
        W_pad = jnp.pad(W, ((0, kt - W.shape[0]), (0, 0), (0, 0)))
        rk_all = jnp.einsum('aij,kj->aki', anchors, kernels)    # [na,k,3]
        rk8 = plic.make_rk8(rk_all, k2, tp, kt, float(sigma))
        rk8k = plic.make_rk8_kmajor(rk_all, k2, tp, kt, float(sigma))

        support_pad = sampling.add_shadow_point(xyz)            # [b, q, 3]
        use_onehot = sampling._onehot_profitable(q, p2 * nt, na_l * c_in + 8)
        if use_onehot:
            # One-hot MXU megagather. The packed-coordinate trick below is
            # NOT used here: raw f32 bit-halves are not valid bf16 values
            # (denormal/NaN patterns flush on the MXU), so coordinates ride
            # a separate exact f32 one-hot selection instead — with no
            # per-row dispatch cost there is no reason to fold them.
            xyz_cols = jnp.pad(support_pad, ((0, 0), (0, 0), (0, 5)))
            n_xyz_lanes = 3
        elif cdt == jnp.float32:
            xyz_cols = jnp.pad(support_pad, ((0, 0), (0, 0), (0, 5)))
            n_xyz_lanes = 3
        else:
            # f32 -> additive hi+lo bf16 split (NOT a bitcast: raw f32
            # bit-halves form NaN bit patterns that get canonicalized in
            # transit, corrupting low mantissa bits). hi+lo reconstructs
            # the coordinate to ~2^-17 relative.
            hi = support_pad.astype(cdt)
            lo = (support_pad - hi.astype(jnp.float32)).astype(cdt)
            packed = jnp.concatenate([hi, lo], axis=-1)         # [b, q, 6]
            xyz_cols = jnp.pad(packed, ((0, 0), (0, 0), (0, 2)))
            n_xyz_lanes = 6

        def pl_layer(feats, xyz_cols, idx_pad, new_xyz, rk8, rk8k, W_pad):
            # shapes derived from the args: under shard_map these are the
            # PER-SHARD extents (batch divided over the 'data' axis)
            bb, p1s = feats.shape[:2]
            qq = p1s + 1                                  # + shadow row
            pp = idx_pad.shape[1]
            flat_idx = idx_pad.reshape(bb, pp * nt)
            # per-anchor channel stride. (Padding c=64 to 128 for aligned
            # lane slices was measured SLOWER: the 2x one-hot-GEMM/table
            # cost far outweighs the misaligned-slice penalty.)
            cs = c_in
            if use_onehot and plic.gather_fusable(
                    qq, chunk_l, cs, jnp.dtype(cdt).itemsize):
                # megagather fused into the kernel: the gathered [rows,
                # na*c] tensor never exists in HBM; the kernel streams the
                # support table per anchor chunk and one-hot-selects rows
                # in VMEM (exact). No shadow row: shadow indices (== p1s)
                # are simply out of the one-hot iota range [0, qp), which
                # selects an exact zero row for free — with 8-aligned p1s
                # (every flagship layer) the activations ARE the table,
                # zero copies (each row pad cost ~0.4 ms/layer, profiled).
                qp = -(-p1s // 8) * 8
                if packed_in:
                    tab = (feats.astype(cdt) if qp == p1s else
                           jnp.pad(feats.astype(cdt),
                                   ((0, 0), (0, qp - p1s), (0, 0))))
                else:
                    tabf = feats.astype(cdt)
                    if qp > p1s or cs > c_in:
                        tabf = jnp.pad(tabf,
                                       ((0, 0), (0, qp - p1s), (0, 0),
                                        (0, cs - c_in)))
                    tab = tabf.reshape(bb, qp, na_l * cs)
                raw = jax.lax.stop_gradient(
                    sampling.gather_rows_onehot(xyz_cols, flat_idx)[..., :3])
                grouped = (raw.reshape(bb, pp, nt, 3)
                           - new_xyz[:, :, None, :])
                gx8 = plic.make_gx8(grouped, nt)
                d_out = W_pad.shape[-1]
                if plic.gather_w_fusable(pp, tab.shape[1], chunk_l, cs,
                                         d_out, kt, nt, tp,
                                         jnp.dtype(cdt).itemsize):
                    # learned GEMM also fused: the [b, na, p, k~, c] F
                    # tensor (1.5-3 GB/layer on the flagship; its XLA
                    # consumer ran HBM-bound at 23-46 TF/s) never exists
                    w2 = W_pad.astype(cdt).reshape(kt * cs, d_out)
                    out = plic.fused_gather_conv_w(
                        gx8, flat_idx[:, None, :], tab, rk8k, rk8, w2,
                        float(sigma), tp, kt, nt, chunk_l, interpret)
                    return out                       # [b, p, na*d] packed
                F = plic.fused_gather_neighbor_conv(
                    gx8, flat_idx[:, None, :], tab, rk8, float(sigma),
                    tp, kt, nt, chunk_l, interpret)
                Wp = (W_pad if cs == c_in else
                      jnp.pad(W_pad, ((0, 0), (0, cs - c_in), (0, 0))))
                out = jnp.einsum('bapkc,kcd->bpad', F.astype(cdt),
                                 Wp.astype(cdt),
                                 preferred_element_type=jnp.float32)
                # stay in the compute dtype: one stray f32 materialization
                # promotes the whole downstream chain (round-1 measurement,
                # ~1.4 ms/layer in convert+layout copies)
                return out.astype(cdt).reshape(bb, pp, -1)
            if packed_in:
                Gfeat = jnp.pad(feats.astype(cdt), ((0, 0), (0, 1), (0, 0)))
            else:
                feats_pad = sampling.add_shadow_feature(feats)
                Gfeat = feats_pad.astype(cdt).reshape(bb, qq,
                                                      na_l * c_in)
            if use_onehot:
                Ga = sampling.gather_rows_onehot(Gfeat, flat_idx)
                raw = jax.lax.stop_gradient(
                    sampling.gather_rows_onehot(xyz_cols, flat_idx)[..., :3])
                extra_lanes = 0
            else:
                Gflat = jnp.concatenate([Gfeat, xyz_cols], axis=-1)
                Ga = jnp.take_along_axis(
                    Gflat, flat_idx[:, :, None], axis=1,
                    mode='promise_in_bounds')
                raw = jax.lax.stop_gradient(
                    Ga[:, :, na_l * c_in:na_l * c_in + n_xyz_lanes])
                if cdt != jnp.float32:
                    raw = (raw[..., :3].astype(jnp.float32)
                           + raw[..., 3:6].astype(jnp.float32))
                extra_lanes = 8
            grouped = (raw.reshape(bb, pp, nt, 3)
                       - new_xyz[:, :, None, :])
            gx8 = plic.make_gx8(grouped, nt)
            F = plic.fused_neighbor_conv(gx8, Ga, rk8, float(sigma),
                                         tp, kt, nt, chunk_l, extra_lanes,
                                         interpret)
            # [b, na, p, k~, c] x [k~, c, d] — pad rows of F are exactly 0
            out = jnp.einsum('bapkc,kcd->bpad', F.astype(cdt),
                             W_pad.astype(cdt),
                             preferred_element_type=jnp.float32)
            return out.reshape(bb, pp, -1)

        if remat and _USE_REMAT:
            pl_layer = jax.checkpoint(pl_layer)
        if shard_mesh is not None and tp_axes:
            # dp x tp: batch over 'data'; the anchor fiber over 'anchor'.
            # feats pack anchors contiguously ([b, p, na*c] anchor-major, or
            # explicit axis 2), the rk8/rk8k weight operands carry a leading
            # anchor axis, and every other operand is anchor-independent —
            # the kernel runs on its local anchor shard, zero collectives.
            from jax.sharding import PartitionSpec as P
            feat_spec = (P('data', None, 'anchor') if packed_in
                         else P('data', None, 'anchor', None))
            pl_layer = pmesh.named_shard_map(
                pl_layer, shard_mesh,
                in_specs=[feat_spec, P('data'), P('data'), P('data'),
                          P('anchor'), P('anchor'), P()],
                out_specs=P('data', None, 'anchor'))
        elif shard_mesh is not None:
            pl_layer = pmesh.data_shard_map(pl_layer, shard_mesh,
                                            n_data_args=4, n_repl_args=3)
        out = pl_layer(feats, xyz_cols, idx_pad, new_xyz, rk8, rk8k,
                       W_pad)                            # [b, p2, na*d]
        if not packed_io:
            out = out.reshape(out.shape[0], out.shape[1], na, -1)
        return inter_idx, new_xyz, out, sample_idx

    if packed_in:
        feats = feats.reshape(feats.shape[0], feats.shape[1], na, c_in)
    grouped_xyz, inter_idx, sample_idx, new_xyz = sampling.inter_grouping_ball(
        xyz, stride, radius * radius_expansion, n_neighbor, lazy_sample)
    feats_pad = sampling.add_shadow_feature(feats)    # [b, p1+1, a, c]
    gx2 = jnp.sum(grouped_xyz ** 2, axis=-1)          # [b, p2, n]

    def chunk_fn(anchors_c, feats_c):
        # anchors_c [ac,3,3]; feats_c [b, p1+1, ac, c]
        rk = jnp.einsum('aij,kj->aki', anchors_c, kernels)          # [ac,k,3]
        cross = jnp.einsum('bpnc,akc->bpnak', grouped_xyz, rk)
        d2 = (gx2[..., None, None] + k2[None, None, None, None, :]
              - 2.0 * cross)
        w = jax.nn.relu(1.0 - d2 / sigma).astype(cdt)           # [b,p,n,ac,k]
        if ones_input and c_in == 1:
            # occupancy input: every gathered feature is exactly 1 (ball
            # query never emits the shadow index), so the neighbor
            # contraction is just the weight sum — no gather at all
            F = w.sum(axis=2)[..., None]                        # [b,p,ac,k,1]
            return jnp.einsum('bpakc,kcd->bpad', F.astype(cdt),
                              W.astype(cdt),
                              preferred_element_type=jnp.float32)
        G = sampling.gather_points(feats_c.astype(cdt), inter_idx)  # [b,p,n,ac,c]
        # broadcast-multiply-reduce: lowers to VPU fusions instead of
        # the pathological tiny batched GEMMs an einsum produces here.
        # Accumulate in the compute dtype: in bf16 mode a separate f32
        # F buffer doubles HBM traffic and blows memory (neighbor counts
        # are 16-64, so bf16 accumulation error stays ~1e-2 relative).
        F = (w[..., :, None] * G[..., None, :]).sum(axis=2)     # [b,p,ac,k,c]
        return jnp.einsum('bpakc,kcd->bpad', F.astype(cdt), W.astype(cdt),
                          preferred_element_type=jnp.float32)       # [b,p,ac,c2]

    if remat and _USE_REMAT:
        chunk_fn = jax.checkpoint(chunk_fn)

    # Unrolled loop over anchor chunks. XLA pipelines the chunks; with the
    # bf16 compute dtype the overlapping [b,p,n,ac,*] intermediates fit HBM.
    # (A lax.scan variant serializes and adds per-chunk feature copies —
    # measured slower: 34 vs 43+ clouds/s on the flagship bench.)
    outs = []
    for s in range(0, na, chunk):
        outs.append(chunk_fn(
            jax.lax.slice_in_dim(anchors, s, s + chunk, axis=0),
            jax.lax.slice_in_dim(feats_pad, s, s + chunk, axis=2)))
    out = jnp.concatenate(outs, axis=2)
    if packed_io:
        out = out.reshape(out.shape[0], out.shape[1], -1)
    return inter_idx, new_xyz, out, sample_idx


def inter_so3conv_blurring(xyz, feats, n_neighbor, radius, stride,
                           inter_idx=None, lazy_sample=True,
                           radius_expansion: float = 1.0):
    """Mean-neighborhood low-pass (ref: so3conv/functional.py:108-116,
    spconv/functional.py:393-407)."""
    if inter_idx is None:
        _, inter_idx, sample_idx, sample_xyz = sampling.inter_grouping_ball(
            xyz, stride, radius * radius_expansion, n_neighbor, lazy_sample)
    if stride == 1:
        return inter_blurring(inter_idx, feats), xyz
    return inter_pooling(inter_idx, sample_idx, feats), sample_xyz


def inter_blurring(inter_idx, feats, alpha: float = 0.5):
    """alpha*f + (1-alpha)*neighborhood mean (ref: inter_blurring_naive)."""
    grouped = sampling.gather_points(sampling.add_shadow_feature(feats), inter_idx)
    return alpha * feats + (1 - alpha) * grouped.mean(axis=2)


def inter_pooling(inter_idx, sample_idx, feats, alpha: float = 0.5):
    """Strided blur (ref: inter_pooling_naive, spconv/functional.py:393-399)."""
    new_feats = sampling.gather_points(feats, sample_idx)
    grouped = sampling.gather_points(sampling.add_shadow_feature(feats), inter_idx)
    return alpha * new_feats + (1 - alpha) * grouped.mean(axis=2)


# ---------------------------------------------------------------------------
# Intra (rotation-group) conv grouping
# ---------------------------------------------------------------------------

def intra_so3conv_grouping(intra_idx: jnp.ndarray,
                           feats: jnp.ndarray) -> jnp.ndarray:
    """Gather along the anchor axis with the 60x12 group adjacency
    (ref: so3conv/functional.py:221-268).

    intra_idx [a_out, k]; feats [b, p, a_in, c] -> [b, p, a_out, k, c]
    """
    return feats[:, :, intra_idx, :]


# ---------------------------------------------------------------------------
# Equivariant PointNet pooling (ref: so3conv/modules.py:203-235 forward math)
# ---------------------------------------------------------------------------

def pointnet_so3_coords(xyz: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor inversely-rotated, centered coordinates
    (ref einsum 'aji,bjn->bina'): [b,p,3] x [a,3,3] -> [b,p,a,3]."""
    xyz = xyz - xyz.mean(axis=1, keepdims=True)
    return jnp.einsum('aji,bpj->bpai', anchors, xyz)


# ---------------------------------------------------------------------------
# Legacy ZPConv capability surface (API-parity; not on the live model path)
# ---------------------------------------------------------------------------

def anchor_knn(a_src: jnp.ndarray, a_tgt: jnp.ndarray, k: int = 3,
               metric: str = 'spherical'):
    """kNN between anchor direction sets (ref: spconv/functional.py:145-163)."""
    from .rotation import acos_safe
    dots = jnp.sum(a_src[None] * a_tgt[:, None], axis=2)  # [a_tgt, a_src]
    if metric == 'spherical':
        dists = dots - 1.0
        val, idx = jax.lax.top_k(dists, k)
    elif metric == 'angular':
        dists = acos_safe(dots)
        val, idx = jax.lax.top_k(-dists, k)
        val = -val
    else:
        dists = jnp.sum((a_src[None] - a_tgt[:, None]) ** 2, axis=2)
        val, idx = jax.lax.top_k(-dists, k)
        val = -val
    return val, idx


def intra_kernel_weights(anchor_in, anchor_out, kernels, ann, aperture,
                         sigma: float = 1e-1, use_suppression: bool = False):
    """Angular-bin intra-conv weights (ref: get_intra_kernel_weights,
    spconv/functional.py:167-206). kernels: [ks] angular bins.
    Returns (idx [a_out, ann] int32, influence [a_out, ks, ann])."""
    import numpy as np
    anchor_out = anchor_in if anchor_out is None else anchor_out
    angles, idx = anchor_knn(anchor_in, anchor_out, k=ann, metric='angular')
    ang = angles[:, None, :]                       # [a_out, 1, ann]
    ker = kernels[None, :, None]                   # [1, ks, 1]
    influence = jnp.abs(ang - ker) / np.pi
    influence = jax.nn.relu(1.0 - influence / (3 * (sigma / 2.0) ** 0.5))
    if use_suppression:
        sup = (angles <= 0.5 * aperture).astype(influence.dtype)[:, None, :]
        influence = influence * sup
    return idx.astype(jnp.int32), influence


def intra_zpconv_grouping_naive(intra_idx, intra_w, feats):
    """Legacy weighted intra grouping (ref: spconv/functional.py:251-271).

    intra_idx [a_out, nn]; intra_w [a_out, ks, nn]; feats [b, p, a_in, c]
      -> [b, p, a_out, ks, c]
    """
    grouped = feats[:, :, intra_idx, :]            # [b, p, a_out, nn, c]
    return jnp.einsum('akn,bpanc->bpakc', intra_w, grouped)


def inter_zpconv_anchor_weights(grouped_xyz, anchors_dir, ring_kernels,
                                sigma: float):
    """Ring-kernel inter weights in (r, theta) coords (ref:
    inter_zpconv_grouping_anchor, spconv/functional.py:424-485).

    grouped_xyz [b, p, n, 3] (local); anchors_dir [a, 3] unit directions;
    ring_kernels [ks, 2] (r, theta) -> w [b, p, a, ks, n].
    """
    from .rotation import acos_safe
    norm = jnp.sqrt(jnp.sum(grouped_xyz ** 2, axis=-1)) + 1e-6   # [b,p,n]
    cos_theta = jnp.einsum('bpnc,ac->bpan', grouped_xyz, anchors_dir) / norm[:, :, None]
    theta = acos_safe(cos_theta)[:, :, :, None, :]               # [b,p,a,1,n]
    norm2 = norm[:, :, None, None, :]                            # [b,p,1,1,n]
    knorm = ring_kernels[:, 0][None, None, None, :, None]
    ktheta = ring_kernels[:, 1][None, None, None, :, None]
    ratio = 3.0
    dist1 = jnp.abs(norm2 - knorm) + jnp.abs(norm2 * (theta - ktheta)) / ratio
    return jax.nn.relu(1.0 - dist1 / jnp.sqrt(sigma))


def inter_zpconv_grouping_naive(inter_idx, inter_w, feats):
    """Legacy inter grouping with [b,p,a,ks,n] weights
    (ref: spconv/functional.py:372-390 with the zpconv weight layout).

    inter_idx [b, p, n]; inter_w [b, p, a, ks, n]; feats [b, q, a, c]
    (already shadow-padded) -> [b, p, a, ks, c]
    """
    grouped = sampling.gather_points(feats, inter_idx)  # [b, p, n, a, c]
    return jnp.einsum('bpakn,bpnac->bpakc', inter_w, grouped)


def initial_anchor_query(frag: jnp.ndarray, centers: jnp.ndarray,
                         kernels: jnp.ndarray, radius: float, sigma: float):
    """Density-weighted anchor occupancy of a raw fragment vs per-anchor
    rotated kernel points (ref: initial_anchor_query,
    grouping_cuda_kernel.cu:116-167).

    frag [m, 3] raw points; centers [b, nc, 3]; kernels [ks, a, 3]
      -> (weights [b, nc, a, ks], counts [b, nc, a, ks])
    Weight = sum over fragment points within `radius` of the center of
    relu(1 - d(point, center + R kappa)^2 / sigma); count = #points in radius.
    """
    # d(point, center): [b, nc, m]
    d_pc = jnp.linalg.norm(centers[:, :, None, :] - frag[None, None, :, :], axis=-1)
    in_ball = (d_pc <= radius)                                   # [b, nc, m]
    # kernel absolute positions per (center, k, a): centers + kernels
    # d(point, center + kappa_{k,a})^2: [b, nc, m, ks, a]
    rel = frag[None, None, :, None, None, :] - centers[:, :, None, None, None, :] \
        - kernels[None, None, None, :, :, :]
    d2 = jnp.sum(rel ** 2, axis=-1)
    w = jax.nn.relu(1.0 - d2 / sigma) * in_ball[..., None, None]
    weights = jnp.transpose(w.sum(axis=2), (0, 1, 3, 2))         # [b, nc, a, ks]
    counts = (in_ball.sum(axis=2).astype(frag.dtype))[..., None, None]
    counts = jnp.broadcast_to(counts, weights.shape)
    return weights, counts


def compute_anchor_weights(anchor_in, anchor_out, k: int = 3,
                           sigma: float = 1e-1, interpolation: str = 'inv'):
    """kNN anchor interpolation weights (ref: spconv/functional.py:519-550)."""
    if interpolation == 'spherical':
        dists = jnp.einsum('ic,jc->ji', anchor_in, anchor_out) - 1.0
        val, idx = jax.lax.top_k(dists, k)
        w = jax.nn.softmax(val / sigma, axis=1)
    elif interpolation == 'euclidean':
        dists = jnp.sum((anchor_in[None] - anchor_out[:, None]) ** 2, -1)
        val, idx = jax.lax.top_k(-dists, k)
        w = jax.nn.softmax(val / sigma, axis=1)
    elif interpolation == 'inv':
        dists = jnp.sum((anchor_in[None] - anchor_out[:, None]) ** 2, -1)
        val, idx = jax.lax.top_k(-dists, k)
        inv_val = 1.0 / (sigma * (-val) + 1e-6)
        w = inv_val / inv_val.sum(axis=1, keepdims=True)
    else:
        raise ValueError(interpolation)
    return idx, w


def anchor_prop(x: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Propagate signals to new anchor directions with kNN interpolation
    (ref: spconv/functional.py:554-564). x [b, p, a1, c] -> [b, p, a2, c]."""
    return jnp.einsum('bpakc,ak->bpac', x[:, :, idx, :], w)
