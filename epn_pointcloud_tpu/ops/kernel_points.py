"""Spherical kernel-point sets for SO(3) point convolutions.

Reference ships three static assets kpsphere{24,30,66}.ply selected by
`kernel_size` in {1,2,3} (ref: vgtk/vgtk/so3conv/functional.py:86-96) and
rescales them so the max point norm equals the requested radius, with a
condensation factor 0.7 applied by the conv modules
(ref: vgtk/vgtk/so3conv/modules.py:16,62,132).

We generate equivalent sets programmatically and deterministically:
  * 66 points: the reference's own procedural generator — concentric
    spherical grids (1 + 16 + 49 points at radii 0, r/2, r)
    (ref: so3conv/functional.py:66-84).
  * 24 points: 1 center + 23 repulsion-optimized unit-sphere points.
  * 30 points: 1 center + 2 inner-shell (0.53r) + 27 unit-shell points,
    matching the radial histogram of the shipped asset.

Also provides the conic generator and angular/ring kernels used by the legacy
ZPConv path (ref: so3conv/functional.py:48-64, spconv/functional.py:42-66).
"""

from __future__ import annotations

import functools

import numpy as np

KERNEL_CONDENSE_RATIO = 0.7  # ref: so3conv/modules.py:16
KERNEL_SIZE_TO_NPOINTS = {1: 24, 2: 30, 3: 66}  # ref: so3conv/functional.py:88


def spherical_kernel_points_grid(radius: float, kernel_size: int,
                                 multiplier: int = 3) -> np.ndarray:
    """Concentric lat/long grids (ref: get_spherical_kernel_points_np)."""
    rrange = np.linspace(0, radius, kernel_size, dtype=np.float32)
    kps = []
    for ridx, r_i in enumerate(rrange):
        asize = ridx * multiplier + 1
        bsize = ridx * multiplier + 1
        alpharange = np.linspace(0, 2 * np.pi, asize, endpoint=False, dtype=np.float32)
        betarange = np.linspace(0, np.pi, bsize, endpoint=True, dtype=np.float32)
        xs = r_i * np.cos(alpharange[:, None]) * np.sin(betarange[None])
        ys = r_i * np.sin(alpharange[:, None]) * np.sin(betarange[None])
        zs = r_i * np.cos(betarange)[None].repeat(asize, axis=0)
        kps.append(np.stack([xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)], axis=1))
    return np.concatenate(kps, axis=0)


def conic_kernel_points(radius: float, aperture: float, kernel_size: int,
                        multiplier: int = 1) -> np.ndarray:
    """Conic parameterization (ref: get_kernel_points_np, functional.py:48-64)."""
    rrange = np.linspace(0, radius, kernel_size, dtype=np.float32)
    kps = []
    for ridx, ri in enumerate(rrange):
        alpharange = angular_kernel_points(aperture, ridx * multiplier + 1)
        for aidx, alpha in enumerate(alpharange):
            r_r = ri * np.tan(alpha)
            thetarange = np.linspace(0, 2 * np.pi, aidx * 2 + 1, endpoint=False,
                                     dtype=np.float32)
            xs = r_r * np.cos(thetarange)
            ys = r_r * np.sin(thetarange)
            zs = np.repeat(ri, aidx * 2 + 1)
            kps.append(np.stack([xs, ys, zs], axis=1))
    return np.concatenate(kps, axis=0)


def angular_kernel_points(aperture: float, kernel_size: int) -> np.ndarray:
    """Interior angular bins (ref: get_angular_kernel_points_np)."""
    end = 0.5 * aperture
    return np.linspace(0, end, kernel_size + 2, dtype=np.float32)[1:-1]


def ring_kernels(radius: float, aperture: float, kernel_size,
                 multiplier: int = 1) -> np.ndarray:
    """(r, theta) ring kernels for legacy ZPConv (ref: get_kernel_rings_np)."""
    if isinstance(kernel_size, int):
        rrange = np.linspace(0, radius, kernel_size + 2, dtype=np.float32)[1:-1]
        kps = []
        for ri in range(kernel_size):
            wrange = angular_kernel_points(aperture, multiplier * ri + 1)
            for wi in wrange:
                kps.append([rrange[ri], wi])
        return np.array(kps, dtype=np.float32)
    rrange = np.linspace(radius / kernel_size[0], radius, kernel_size[0],
                         dtype=np.float32)
    wrange = angular_kernel_points(aperture, kernel_size[1])
    rr = np.tile(rrange[:, None, None], [1, wrange.shape[0], 1])
    ww = np.tile(wrange[None, :, None], [rrange.shape[0], 1, 1])
    return np.concatenate([rr, ww], axis=2).reshape(-1, 2).astype(np.float32)


def intra_angular_kernels(aperture: float, kernel_size: int) -> np.ndarray:
    """Angular bins for intra ZPConv (ref: spconv/functional.py:133-136)."""
    return np.linspace(0, 0.5 * aperture, kernel_size, dtype=np.float32)


def _repulsion_shell(n: int, seed: int) -> np.ndarray:
    """n deterministic well-separated unit vectors (Thomson-style descent)."""
    rng = np.random.RandomState(seed)
    p = rng.randn(n, 3)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    for _ in range(2000):
        diff = p[:, None] - p[None]                    # [n,n,3]
        d2 = (diff ** 2).sum(-1) + np.eye(n)
        force = (diff / (d2 ** 1.5)[..., None]).sum(1)  # Coulomb repulsion
        p = p + 0.001 * force
        p /= np.linalg.norm(p, axis=1, keepdims=True)
    # canonical order: by (z, y, x) rounded, for determinism across platforms
    key = np.round(p, 6)
    order = np.lexsort((key[:, 0], key[:, 1], key[:, 2]))
    return p[order]


@functools.lru_cache(maxsize=None)
def _unit_kernel_family(n_points: int, convention: str = 'native') -> np.ndarray:
    """Kernel points at unit outer radius, [n_points, 3] float32.

    convention 'reference' returns the exact kpsphere{24,30,66}.ply
    coordinates (vendored; ref: so3conv/functional.py:86-96) so imported
    reference weights see the kernel layout they were trained with."""
    if convention == 'reference':
        from . import ref_convention
        return ref_convention.ref_kernel_points(n_points)
    if n_points == 66:
        return spherical_kernel_points_grid(1.0, 3, 3).astype(np.float32)
    if n_points == 24:
        shell = _repulsion_shell(23, seed=24)
        return np.concatenate([np.zeros((1, 3)), shell], 0).astype(np.float32)
    if n_points == 30:
        inner = _repulsion_shell(2, seed=302) * 0.53
        outer = _repulsion_shell(27, seed=301)
        return np.concatenate([np.zeros((1, 3)), inner, outer], 0).astype(np.float32)
    raise ValueError(f'unsupported kernel point count {n_points}')


def get_spherical_kernel_points(radius: float, kernel_size: int) -> np.ndarray:
    """Kernel points scaled so max norm == radius
    (ref: get_sphereical_kernel_points_from_ply, functional.py:86-96).

    Follows the global anchor convention: under 'reference' the exact ply
    coordinates are used, scaled with the reference's operation order
    (pc * radius / r) for bit parity."""
    assert 0 < kernel_size <= 3
    from . import icosahedron
    conv = icosahedron.get_convention()
    pts = _unit_kernel_family(KERNEL_SIZE_TO_NPOINTS[kernel_size], conv)
    r = np.sqrt((pts ** 2).sum(1).max())
    if conv == 'reference':
        return (pts * radius / r).astype(np.float32)
    return (pts * (radius / r)).astype(np.float32)
