"""Import-and-run harness for the PyTorch reference at /root/reference.

The reference repo cannot import as-is in this environment: trimesh,
plyfile, open3d, and parse are not installed, and its three
``vgtk.cuda.*`` extensions need a CUDA toolchain. This module installs
faithful stand-ins so that the reference's *Python* model path runs on CPU
torch, making it usable as a golden oracle for full-model parity tests:

  * trimesh   — minimal Trimesh exposing faces / face_normals /
                face_adjacency / fix_normals with the exact semantics the
                reference consumes (rotation.py:240-244, :117-127). The
                shipped sphere12.ply winding is consistent-outward, so
                fix_normals is a no-op; face_adjacency rows are produced in
                lexicographic sorted-edge order (trimesh group_rows order).
  * plyfile   — PlyData.read backed by our numpy PLY reader.
  * vgtk.cuda.gathering / .grouping — CPU torch implementations of the
                reference CUDA kernels with exact semantics: gather fwd/bwd
                (gathering_cuda_kernel.cu:42-98), ball_query first-hits with
                the cnt==nsample-1 fill quirk (grouping_cuda_kernel.cu:
                67-113), FPS with idx-0 start + shadow guard
                (grouping_cuda_kernel.cu:351-466).
  * vgtk.cuda.zpconv — dead on every live model path; raises if touched.
  * open3d / parse — import-time placeholders (dataset modules import them
                at module scope; the model-parity tests never call them).

Nothing in here is imported by the production package.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF_ROOT = '/root/reference'


# ---------------------------------------------------------------------------
# trimesh stub
# ---------------------------------------------------------------------------

class _TrimeshStub:
    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        self.vertices = verts
        self.faces = faces

    def fix_normals(self):
        # Winding of the shipped icosahedron is already consistent+outward
        # (asserted in face_normals); real trimesh leaves it untouched then.
        pass

    @property
    def face_normals(self):
        v = np.asarray(self.vertices, dtype=np.float64)
        f = np.asarray(self.faces)
        nrm = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3.0
        assert ((nrm * cent).sum(1) > 0).all(), \
            'mesh winding not outward; trimesh stub premise violated'
        return nrm

    @property
    def face_adjacency(self):
        pairs = {}
        for fi, f in enumerate(np.asarray(self.faces)):
            for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                pairs.setdefault((min(a, b), max(a, b)), []).append(fi)
        rows = [pairs[e] for e in sorted(pairs) if len(pairs[e]) == 2]
        return np.asarray(rows, dtype=np.int64)


def _trimesh_load(path):
    from epn_pointcloud_tpu.ops import ply
    verts, faces = ply.load_ply_mesh(path)
    return _TrimeshStub(verts.astype(np.float64), faces)


# ---------------------------------------------------------------------------
# plyfile stub
# ---------------------------------------------------------------------------

class _PlyElementStub:
    def __init__(self, cols):
        self._cols = cols

    def __getitem__(self, key):
        return self._cols[key]


class _PlyDataStub:
    def __init__(self, path):
        from epn_pointcloud_tpu.ops import ply
        pts = ply.load_ply(path)
        self._elements = {'vertex': _PlyElementStub(
            {'x': pts[:, 0], 'y': pts[:, 1], 'z': pts[:, 2]})}

    @staticmethod
    def read(path):
        return _PlyDataStub(path)

    def __getitem__(self, key):
        return self._elements[key]


# ---------------------------------------------------------------------------
# vgtk.cuda.* stubs (CPU torch, exact CUDA-kernel semantics)
# ---------------------------------------------------------------------------

def _gather_points_forward(points: torch.Tensor, idx: torch.Tensor):
    """[b, c, n] x int [b, m] -> [b, c, m] (gathering_cuda_kernel.cu:42-64)."""
    b, c, _ = points.shape
    m = idx.shape[1]
    ix = idx.long().unsqueeze(1).expand(b, c, m)
    return torch.gather(points, 2, ix).contiguous()


def _gather_points_backward(grad: torch.Tensor, idx: torch.Tensor, n: int):
    """[b, c, m] x [b, m] x n -> [b, c, n] scatter-add
    (gathering_cuda_kernel.cu:66-98)."""
    b, c, m = grad.shape
    out = grad.new_zeros(b, c, n)
    ix = idx.long().unsqueeze(1).expand(b, c, m)
    out.scatter_add_(2, ix, grad)
    return out


def _ball_query(new_xyz: torch.Tensor, xyz: torch.Tensor, radius: float,
                nsample: int):
    """[b,3,m] x [b,3,n] -> int32 [b,m,nsample]: first hits in index order;
    repeat fill idx[s] = idx[s % cnt] applied only when cnt < nsample-1 (the
    reference kernel leaves slot nsample-1 at its zero init when exactly
    nsample-1 hits are found) (grouping_cuda_kernel.cu:67-113, zero init
    grouping_cuda.cpp:80-82)."""
    b, _, m = new_xyz.shape
    n = xyz.shape[2]
    q = new_xyz.permute(0, 2, 1).float()        # [b, m, 3]
    s = xyz.permute(0, 2, 1).float()            # [b, n, 3]
    out = torch.zeros(b, m, nsample, dtype=torch.int32)
    r2 = float(radius) ** 2
    for bi in range(b):
        # fp32 direct-difference form == the kernel's boundary behavior
        d2 = ((q[bi][:, None, :] - s[bi][None, :, :]) ** 2).sum(-1)  # [m, n]
        hit = d2 < r2
        for j in range(m):
            ks = torch.nonzero(hit[j], as_tuple=False).flatten()[:nsample]
            cnt = int(ks.numel())
            out[bi, j, :cnt] = ks.int()
            if 0 < cnt < nsample - 1:
                for k in range(nsample - cnt):
                    out[bi, j, cnt + k] = out[bi, j, k]
    return out


def _furthest_point_sampling(source_xyz: torch.Tensor, m: int):
    """[b, 3, n] -> int32 [b, m]: first sample is index 0, per-point running
    min distance, points with |x|^2 <= 1e-3 never selected
    (grouping_cuda_kernel.cu:351-466, temp init 1e10 grouping_cuda.cpp:168)."""
    b, _, n = source_xyz.shape
    pts = source_xyz.permute(0, 2, 1).float()   # [b, n, 3]
    out = torch.zeros(b, m, dtype=torch.int32)
    for bi in range(b):
        p = pts[bi]
        shadow = (p ** 2).sum(1) <= 1e-3
        temp = torch.full((n,), 1e10)
        old = 0
        for j in range(1, m):
            d = ((p - p[old]) ** 2).sum(1)
            upd = torch.minimum(temp, d)
            temp = torch.where(shadow, temp, upd)
            masked = torch.where(shadow, torch.full_like(temp, -1.0), temp)
            old = int(torch.argmax(masked))
            out[bi, j] = old
    return out


def _dead(name):
    def fn(*a, **k):
        raise NotImplementedError(
            f'vgtk.cuda.zpconv.{name} is dead code in the reference '
            '(superseded by the naive einsum paths) and is not stubbed')
    return fn


def install_stubs():
    """Register all stand-ins in sys.modules and put the reference on
    sys.path. Idempotent."""
    if 'trimesh' not in sys.modules or not hasattr(
            sys.modules['trimesh'], '_epn_stub'):
        tm = types.ModuleType('trimesh')
        tm.load = _trimesh_load
        tm.Trimesh = _TrimeshStub
        tm._epn_stub = True
        sys.modules['trimesh'] = tm

    pf = types.ModuleType('plyfile')
    pf.PlyData = _PlyDataStub
    pf.PlyElement = object
    sys.modules.setdefault('plyfile', pf)

    o3d = types.ModuleType('open3d')
    o3d.geometry = types.SimpleNamespace()
    o3d.io = types.SimpleNamespace()
    o3d.utility = types.SimpleNamespace()

    # functional read_point_cloud: the reference SceneEvalLoader calls it
    # even on the npz-cache hit path (match_3dmatch.py:466-470) — back it
    # with this repo's parity-tested PLY reader
    def _read_point_cloud(path):
        from epn_pointcloud_tpu.ops.ply import load_ply
        pts = np.asarray(load_ply(path), np.float64)[:, :3]
        return types.SimpleNamespace(points=pts, normals=[])
    o3d.io.read_point_cloud = _read_point_cloud
    sys.modules.setdefault('open3d', o3d)

    pa = types.ModuleType('parse')
    pa.parse = lambda *a, **k: None
    sys.modules.setdefault('parse', pa)

    gathering = types.ModuleType('vgtk.cuda.gathering')
    gathering.gather_points_forward = _gather_points_forward
    gathering.gather_points_backward = _gather_points_backward

    grouping = types.ModuleType('vgtk.cuda.grouping')
    grouping.ball_query = _ball_query
    grouping.furthest_point_sampling = _furthest_point_sampling
    grouping.anchor_query = _dead('anchor_query')
    grouping.initial_anchor_query = _dead('initial_anchor_query')

    zpconv = types.ModuleType('vgtk.cuda.zpconv')
    for name in ('inter_zpconv_forward', 'inter_zpconv_backward',
                 'intra_zpconv_forward', 'intra_zpconv_backward'):
        setattr(zpconv, name, _dead(name))

    cuda_pkg = types.ModuleType('vgtk.cuda')
    cuda_pkg.gathering = gathering
    cuda_pkg.grouping = grouping
    cuda_pkg.zpconv = zpconv
    sys.modules['vgtk.cuda'] = cuda_pkg
    sys.modules['vgtk.cuda.gathering'] = gathering
    sys.modules['vgtk.cuda.grouping'] = grouping
    sys.modules['vgtk.cuda.zpconv'] = zpconv

    for p in (f'{REF_ROOT}/vgtk', REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)

    # the reference hardcodes .cuda() in a few loss-path helpers
    # (vgtk/functional/rotation.py:384,447 compute_rotation_matrix_from_
    # quaternion/_ortho6d); make .cuda() a CPU no-op so those paths run
    # through the oracle
    if not getattr(torch.Tensor.cuda, '_epn_stub', False):
        def _cuda_noop(self, *a, **k):
            return self
        _cuda_noop._epn_stub = True
        torch.Tensor.cuda = _cuda_noop
        torch.nn.Module.cuda = _cuda_noop


def import_reference():
    """Install stubs and import the reference packages; returns
    (vgtk, SPConvNets)."""
    install_stubs()
    import vgtk           # noqa: PLC0415
    import SPConvNets     # noqa: PLC0415
    return vgtk, SPConvNets


def build_ref_opt(argv=None, **overrides):
    """Build the reference's option namespace (SPConvNets/options.py) with
    a minimal argv, then apply attribute overrides like
    ``('model.kanchor', 60)``."""
    install_stubs()
    old_argv = sys.argv
    try:
        # the main HierarchyArgmentParser needs a subcommand token; each
        # subparser then re-parses the full argv with parse_known_args
        sys.argv = ['ref', 'experiment', '-d', '/tmp/nonexistent'] + list(argv or [])
        import importlib
        opts_mod = importlib.import_module('SPConvNets.options')
        opt = opts_mod.opt
    finally:
        sys.argv = old_argv
    # a string, not torch.device: the reference base trainer json-dumps the
    # whole opt namespace (vgtk/app/trainer.py:40-42) and torch.device is
    # not serializable; every .to(opt.device) site accepts the string form
    opt.device = 'cpu'
    for key, val in overrides.items():
        obj = opt
        parts = key.split('.')
        for part in parts[:-1]:
            obj = getattr(obj, part)
        setattr(obj, parts[-1], val)
    return opt
