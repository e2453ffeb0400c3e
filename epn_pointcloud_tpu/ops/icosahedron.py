"""Icosahedral SO(3) discretization — the 60-element chiral icosahedral group.

TPU-native rebuild of the reference's anchor machinery
(ref: vgtk/vgtk/functional/rotation.py:117-344, vgtk/vgtk/so3conv/functional.py:271-299).

The reference loads an icosahedron mesh from `sphere12.ply` via trimesh and
builds 60 rotations as per-face Euler constructions (20 faces x 3 in-plane
gammas) with a z-band phase fix so the set closes under composition, then
normalizes so one anchor (index 29 there) is the identity. We construct the
same group directly by generator closure (guaranteed exact), organize it into
the same (face, gamma) fiber indexing, and derive the 60x12 intra-convolution
adjacency (`trace_idx`) from mesh face adjacency exactly like the reference:

  trace_idx[a, k] = index of anchor  R_a @ Q_k

where {Q_k} is a fixed 12-element stencil of relative rotations taken from the
face-adjacency neighborhood of the identity anchor (9 adjacent-face gammas
followed by the 3 same-face gammas, matching rotation.py:129-139 ordering).
Right multiplication by a fixed stencil commutes with the left action of the
group on the anchor axis, which is what makes intra conv equivariant.

Everything here is import-time numpy; results are cached at module level.
"""

from __future__ import annotations

import functools

import numpy as np

GAMMA_SIZE = 3  # in-plane rotations per face (ref: so3conv/functional.py:274)


# ---------------------------------------------------------------------------
# Anchor convention switch
#
# 'native'    — the generator-closure group below (identity at index 0).
# 'reference' — the reference's exact ordering/orientation (identity at 29),
#               derived in ops/ref_convention.py from the vendored
#               sphere12.ply. Same group abstractly, different orientation +
#               ordering; required to import reference-trained weights and
#               to prove full-model numeric parity (see
#               utils/torch_import.py and tests/test_reference_parity.py).
# ---------------------------------------------------------------------------

_CONVENTION = 'native'
_CONVENTION_LISTENERS: list = []


def register_convention_listener(fn) -> None:
    """Register a zero-arg callback invoked on set_convention (downstream
    modules clear their anchor-derived caches here)."""
    _CONVENTION_LISTENERS.append(fn)


def set_convention(name: str) -> None:
    """Switch the global anchor convention ('native' | 'reference')."""
    global _CONVENTION
    if name not in ('native', 'reference'):
        raise ValueError(f"convention must be 'native' or 'reference', got {name}")
    if name == _CONVENTION:
        return
    _CONVENTION = name
    for fn in _CONVENTION_LISTENERS:
        fn()


def get_convention() -> str:
    return _CONVENTION


# ---------------------------------------------------------------------------
# Icosahedron mesh (programmatic replacement for sphere12.ply + trimesh)
# ---------------------------------------------------------------------------

def icosahedron_mesh():
    """Regular icosahedron: 12 unit vertices, 20 faces (outward-oriented).

    Returns (vertices [12,3], faces [20,3] int).
    """
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts.append((0.0, a, b))
            verts.append((a, b, 0.0))
            verts.append((b, 0.0, a))
    verts = np.array(verts, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)

    # Faces: every triple of mutually nearest vertices (edge length = min dist)
    d = np.linalg.norm(verts[:, None] - verts[None], axis=-1)
    edge = d[d > 1e-9].min()
    adj = (np.abs(d - edge) < 1e-6)
    faces = []
    n = len(verts)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces = np.array(sorted(faces), dtype=np.int64)
    assert faces.shape == (20, 3)

    # Orient each face outward (normal pointing away from origin).
    oriented = []
    for f in faces:
        v0, v1, v2 = verts[f]
        nrm = np.cross(v1 - v0, v2 - v0)
        if np.dot(nrm, v0 + v1 + v2) < 0:
            f = f[[0, 2, 1]]
        oriented.append(f)
    return verts, np.array(oriented, dtype=np.int64)


def face_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    return nrm / np.linalg.norm(nrm, axis=1, keepdims=True)


def face_adjacency(faces: np.ndarray) -> np.ndarray:
    """For each face, the 3 faces sharing an edge with it. [20, 3] int."""
    nf = len(faces)
    edge_map: dict[tuple[int, int], list[int]] = {}
    for fi, f in enumerate(faces):
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edge_map.setdefault(key, []).append(fi)
    adj = [[] for _ in range(nf)]
    for fs in edge_map.values():
        assert len(fs) == 2
        adj[fs[0]].append(fs[1])
        adj[fs[1]].append(fs[0])
    out = np.array([sorted(a) for a in adj], dtype=np.int64)
    assert out.shape == (nf, 3)
    return out


# ---------------------------------------------------------------------------
# The 60-element rotation group, (face, gamma)-indexed
# ---------------------------------------------------------------------------

def _axis_rotation(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _generator_closure(gens: list[np.ndarray]) -> np.ndarray:
    """BFS closure of a finite rotation set. Returns deduped [n,3,3]."""
    def key(R):
        return tuple(np.round(R, 9).reshape(-1))

    elems = {key(np.eye(3)): np.eye(3)}
    frontier = [np.eye(3)]
    while frontier:
        nxt = []
        for R in frontier:
            for g in gens:
                P = g @ R
                k = key(P)
                if k not in elems:
                    elems[k] = P
                    nxt.append(P)
        frontier = nxt
        assert len(elems) <= 60
    return np.stack(list(elems.values()))


@functools.lru_cache(maxsize=1)
def _build_group():
    verts, faces = icosahedron_mesh()
    normals = face_normals(verts, faces)
    adj = face_adjacency(faces)

    # Chiral icosahedral group I (~A5): closure of a 3-fold rotation about a
    # face axis and a 5-fold rotation about an incident vertex axis.
    f0 = 0
    g3 = _axis_rotation(normals[f0], 2 * np.pi / 3)
    g5 = _axis_rotation(verts[faces[f0][0]], 2 * np.pi / 5)
    Rs = _generator_closure([g3, g5])
    assert Rs.shape[0] == 60, f"expected 60 elements, got {Rs.shape[0]}"

    # --- (face, gamma) fiber indexing --------------------------------------
    # fiber(R) = face containing R @ n_f0. Within each fiber the three
    # elements differ by an in-plane (about n_f0, on the right) rotation of
    # 0/120/240 deg; order by that angle relative to the fiber element
    # closest to identity.
    n0 = normals[f0]
    img = np.einsum('aij,j->ai', Rs, n0)          # [60, 3]
    fiber = np.argmax(img @ normals.T, axis=1)     # [60]
    assert np.allclose(np.sort(np.bincount(fiber, minlength=20)), 3), "bad fibers"

    order = []
    for f in range(20):
        members = np.where(fiber == f)[0]
        traces = np.einsum('aii->a', Rs[members])
        rep = members[int(np.argmax(traces))]
        # D = R_rep^{-1} R  fixes n_f0 -> rotation about n_f0 by gamma
        gammas = []
        for m in members:
            D = Rs[rep].T @ Rs[m]
            # angle about axis n0 (signed)
            c = (np.trace(D) - 1) / 2
            s = (np.array([D[2, 1] - D[1, 2], D[0, 2] - D[2, 0], D[1, 0] - D[0, 1]]) / 2) @ n0
            gammas.append(np.arctan2(s, np.clip(c, -1, 1)) % (2 * np.pi))
        order.extend(members[np.argsort(np.round(gammas, 6))])
    Rs = Rs[np.array(order)]

    id_idx = int(np.argmax(np.einsum('aii->a', Rs)))
    assert np.allclose(Rs[id_idx], np.eye(3), atol=1e-9)
    assert id_idx == f0 * GAMMA_SIZE  # identity = gamma 0 of face f0

    # --- intra-conv stencil & adjacency -------------------------------------
    # Neighborhood of the identity anchor: 9 gammas of the 3 adjacent faces,
    # then the 3 gammas of its own face (ordering per rotation.py:129-139).
    nbr_anchor_idx = []
    for fa in adj[f0]:
        for g in range(GAMMA_SIZE):
            nbr_anchor_idx.append(fa * GAMMA_SIZE + g)
    for g in range(GAMMA_SIZE):
        nbr_anchor_idx.append(f0 * GAMMA_SIZE + g)
    nbr_anchor_idx = np.array(nbr_anchor_idx, dtype=np.int64)  # [12]

    # Stencil of relative rotations w.r.t. the identity anchor. Since
    # Rs[id_idx] = I, Q_k is the neighbor rotation itself.
    Q = Rs[nbr_anchor_idx]  # [12, 3, 3]

    # trace_idx[a, k] = index of anchor Rs[a] @ Q[k]  (exact by closure)
    prod = np.einsum('aij,kjl->akil', Rs, Q).reshape(-1, 9)
    d = np.abs(prod[:, None, :] - Rs.reshape(-1, 9)[None]).sum(-1)
    assert d.min(axis=1).max() < 1e-6
    trace_idx = np.argmin(d, axis=1).reshape(60, len(nbr_anchor_idx))

    return {
        'verts': verts.astype(np.float32),
        'faces': faces,
        'normals': normals.astype(np.float32),
        'face_adj': adj,
        'anchors': Rs.astype(np.float32),
        'identity_idx': id_idx,
        'trace_idx': trace_idx.astype(np.int32),
    }


def _active():
    if _CONVENTION == 'reference':
        from . import ref_convention
        return ref_convention.build()
    return _build_group()


def get_anchors_full() -> np.ndarray:
    """All 60 anchor rotation matrices, float32 [60, 3, 3]."""
    return _active()['anchors']


def get_identity_index() -> int:
    """Index of the identity anchor (29 under the 'reference' convention;
    0 under 'native'). Exact identity either way."""
    return _active()['identity_idx']


def get_intra_idx() -> np.ndarray:
    """[60, 12] int32 intra-conv anchor adjacency (ref: get_intra_idx)."""
    return _active()['trace_idx']


def get_canonical_relative():
    """API-parity shim: the reference computes canonical relative rotations
    only in commented-out code and ships None
    (ref: so3conv/functional.py:298-299; rotation.py:281 canonical_R = None)."""
    return None


def select_anchors(anchors: np.ndarray, k: int) -> np.ndarray:
    """Anchor subsets for kanchor in {1, 20, 40, 60}
    (ref: so3conv/functional.py:281-289)."""
    if k == 1:
        return anchors[get_identity_index()][None]
    if k == 20:
        return anchors[::3]
    if k == 40:
        return anchors.reshape(20, 3, 3, 3)[:, :2].reshape(-1, 3, 3)
    if k == 60:
        return anchors
    raise ValueError(f'kanchor must be one of {{1,20,40,60}}, got {k}')


def get_anchors(k: int = 60) -> np.ndarray:
    return select_anchors(get_anchors_full(), k)


def anchor_subset_relabel_map(k: int) -> np.ndarray:
    """[60] int32: nearest subset-anchor index (by rotation distance) for
    each full-group anchor label.

    The datasets emit rotation labels over the full 60-element group
    (datasets/modelnet40.py R_label); at kanchor<60 the attention logits only
    span the subset, and the reference's CE over out-of-range labels is
    undefined (its CUDA F.cross_entropy would assert; ref loss.py:48-57).
    We relabel into the subset by nearest rotation: argmax of
    tr(R_full @ R_sub^T) == argmin of the rotation distance."""
    full = get_anchors_full().astype(np.float64)
    sub = select_anchors(full, k)
    tr = np.einsum('aij,bij->ab', full, sub)
    return np.argmax(tr, axis=1).astype(np.int32)


# Vertex-direction anchor sets for the legacy ZPConv path; the reference loads
# sphere{12,42,92,162}.ply and keeps unit-norm points (spconv/functional.py:20-39).
# We generate them by subdividing the icosahedron.

def sphere_points(n: int) -> np.ndarray:
    """Unit directions: 12 (icosa verts), 42/162 (subdivided), or Fibonacci."""
    verts, faces = icosahedron_mesh()
    if n == 12:
        return verts.astype(np.float32)
    if n in (42, 162):
        v, f = verts, faces
        target = {42: 1, 162: 2}[n]
        for _ in range(target):
            v, f = _subdivide(v, f)
        return v.astype(np.float32)
    # Fibonacci fallback (e.g. 92 in the reference assets is a different
    # tessellation; any uniform covering has equivalent capability)
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    pts = np.stack([np.sin(phi) * np.cos(theta),
                    np.sin(phi) * np.sin(theta),
                    np.cos(phi)], axis=1)
    return pts.astype(np.float32)


def _subdivide(verts: np.ndarray, faces: np.ndarray):
    """1-to-4 sphere subdivision (edge midpoints pushed to unit norm)."""
    verts = list(map(tuple, verts))
    cache: dict[tuple[int, int], int] = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in cache:
            m = (np.array(verts[a]) + np.array(verts[b])) / 2.0
            m /= np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(tuple(m))
        return cache[key]

    new_faces = []
    for (a, b, c) in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
    return np.array(verts), np.array(new_faces, dtype=np.int64)
