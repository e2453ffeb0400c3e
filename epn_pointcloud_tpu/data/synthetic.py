"""Synthetic dataset generation for tests, CI, and benchmarks.

Writes a tiny ModelNet40-compatible .mat tree (same on-disk contract as the
real data: <root>/<cat>/<split>/*.mat with 'pc', 'label', 'name') and
provides on-the-fly random cloud batches. Real-data parity runs use the
actual ModelNet40/3DMatch downloads through the same loaders.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.io as sio


def make_shape(rng: np.random.RandomState, n_points: int,
               kind: int) -> np.ndarray:
    """Distinguishable parametric shapes (sphere/cube/torus/...)."""
    t = rng.rand(n_points)
    u = rng.rand(n_points) * 2 * np.pi
    v = rng.rand(n_points) * np.pi
    if kind % 5 == 0:        # sphere surface
        pc = np.stack([np.sin(v) * np.cos(u), np.sin(v) * np.sin(u),
                       np.cos(v)], 1)
    elif kind % 5 == 1:      # cube surface
        pc = rng.rand(n_points, 3) * 2 - 1
        ax = rng.randint(0, 3, n_points)
        sgn = rng.randint(0, 2, n_points) * 2 - 1
        pc[np.arange(n_points), ax] = sgn
    elif kind % 5 == 2:      # torus
        r0, r1 = 1.0, 0.35
        pc = np.stack([(r0 + r1 * np.cos(v * 2)) * np.cos(u),
                       (r0 + r1 * np.cos(v * 2)) * np.sin(u),
                       r1 * np.sin(v * 2)], 1)
    elif kind % 5 == 3:      # cylinder
        pc = np.stack([np.cos(u), np.sin(u), 2 * t - 1], 1)
    else:                    # two clusters
        pc = 0.3 * rng.randn(n_points, 3)
        pc[n_points // 2:, 0] += 1.5
    if kind >= 5:
        # categories beyond the 5 base families get deterministic per-kind
        # shape parameters (anisotropic scaling + a second displaced
        # component), so any n_cats stays mutually distinguishable — and,
        # under the rotated test protocol, only via rotation-invariant
        # features (the anisotropy axes are randomized per sample by testR)
        prng = np.random.RandomState(1000 + kind)
        scale = 0.4 + 1.2 * prng.rand(3)
        pc = pc * scale[None, :]
        n2 = n_points // 3
        sub = make_shape(np.random.RandomState(rng.randint(1 << 31)),
                         n2, (kind // 5 + kind) % 5)
        off = prng.randn(3) * 1.2
        pc[:n2] = 0.5 * sub + off[None, :]
    pc = pc + 0.02 * rng.randn(n_points, 3)
    return pc.astype(np.float32)


def make_hard_shape(rng: np.random.RandomState, n_points: int,
                    kind: int) -> np.ndarray:
    """Statistically hard class generator for the kanchor accuracy sweep.

    Unlike make_shape (one fixed geometry per class — trivially memorizable,
    saturates at 100% testR accuracy), each class here is a *distribution*:
    deterministic per-class parameters (two base families, mixture ratio,
    anisotropic scales, component offset) plus substantial per-SAMPLE jitter
    of those parameters, so neighbouring classes overlap and accuracy is
    bounded by rotation-invariant feature quality rather than memorization.
    All class signal is rotation-invariant (anisotropy spectra, component
    proportions/distances); the testR protocol rotates samples uniformly.
    """
    prng = np.random.RandomState(7000 + kind)
    f1 = int(prng.randint(0, 5))
    f2 = int((f1 + 1 + prng.randint(0, 4)) % 5)
    mix = 0.25 + 0.3 * prng.rand()          # fraction of points in part 2
    scale1 = 0.55 + 0.9 * prng.rand(3)      # anisotropy of part 1
    scale2 = 0.55 + 0.9 * prng.rand(3)
    size2 = 0.35 + 0.4 * prng.rand()        # relative size of part 2
    dist = 0.8 + 1.0 * prng.rand()          # offset distance of part 2

    # per-sample parameter jitter (the source of intra-class variation)
    j = lambda x, s: x * np.exp(s * rng.randn(*np.shape(x)))
    mix_s = float(np.clip(mix + 0.06 * rng.randn(), 0.1, 0.7))
    scale1_s, scale2_s = j(scale1, 0.12), j(scale2, 0.12)
    size2_s, dist_s = j(size2, 0.12), j(dist, 0.10)

    n2 = int(n_points * mix_s)
    n1 = n_points - n2
    p1 = make_shape(rng, n1, f1)[:, :] * scale1_s[None, :]
    p2 = make_shape(rng, n2, f2)[:, :] * scale2_s[None, :] * size2_s
    # offset direction is random per sample (rotation-invariant distance)
    d = rng.randn(3)
    d /= np.linalg.norm(d)
    p2 = p2 + (dist_s * d)[None, :]
    pc = np.concatenate([p1, p2], 0)
    pc = pc + 0.03 * rng.randn(n_points, 3)
    return pc.astype(np.float32)


def make_asym_shape(rng: np.random.RandomState, n_points: int) -> np.ndarray:
    """Rotationally ASYMMETRIC shape (no nontrivial self-rotation): three
    unequal, non-collinear clusters plus an off-axis bar — so relative-
    rotation regression (ModelNet40Alignment) is well-posed. The default
    parametric shapes (sphere/cylinder/torus) have continuous rotational
    symmetry, which makes alignment targets ill-posed on them."""
    centers = np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [0.0, 1.0, 0.3]])
    scales = np.array([0.15, 0.3, 0.08])
    n_bar = n_points // 4
    n_cl = n_points - n_bar
    which = rng.randint(0, 3, n_cl)
    pc_cl = centers[which] + scales[which, None] * rng.randn(n_cl, 3)
    t = rng.rand(n_bar)
    bar = (np.array([0.2, -0.8, 0.9])[None] * t[:, None]
           + np.array([0.5, 0.2, -0.4])[None]
           + 0.03 * rng.randn(n_bar, 3))
    pc = np.concatenate([pc_cl, bar], 0)
    return pc.astype(np.float32)


def make_modelnet_tree(root: str, n_cats: int = 4, n_train: int = 8,
                       n_test: int = 4, n_points: int = 2048,
                       seed: int = 0, splits=('train', 'test', 'testR'),
                       airplane_asym: bool = False, hard: bool = False):
    """Create a synthetic ModelNet-like .mat tree. Category 0 is named
    'airplane' so the alignment loader finds it. hard=True uses the
    statistically-hard per-class distributions (make_hard_shape) instead of
    the fixed-geometry classes."""
    rng = np.random.RandomState(seed)
    names = ['airplane'] + [f'cat{i:02d}' for i in range(1, n_cats)]
    for ci, cat in enumerate(names):
        for split in splits:
            n = n_train if split == 'train' else n_test
            d = os.path.join(root, cat, split)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                pc = (make_asym_shape(rng, n_points)
                      if (ci == 0 and airplane_asym)
                      else make_hard_shape(rng, n_points, ci) if hard
                      else make_shape(rng, n_points, ci))
                data = {'pc': pc, 'label': np.array([[ci]]),
                        'name': f'{cat}_{split}_{i:04d}'}
                sio.savemat(os.path.join(d, f'{cat}_{i:04d}.mat'), data)
    return root


def make_3dmatch_tree(root: str, scene: str = 'synth-scene', n_frags: int = 3,
                      n_points: int = 4000, n_kpts: int = 32, seed: int = 0,
                      extent=(3.0, 3.0, 2.0), kpt_margin: float = 0.0):
    """Synthetic 3DMatch-style data with the reference's on-disk contracts:

    eval:  <root>/<scene>/cloud_bin_N.ply, 01_Keypoints/cloud_bin_NKeypoints.txt,
           gt.log
    train: <root>/fused_fragments/<scene>/seq-01/cloud_bin_N.ply (+pose) and
           <root>/kpts/<scene>/seq-01/cloud_bin_A-cloud_bin_B.npy

    Fragments are overlapping views of one 'room' cloud under rigid motions,
    so mutual-NN matching has real structure.
    """
    from ..ops.ply import save_ply
    from ..ops.rotation import rand_rotation_matrix
    rng = np.random.RandomState(seed)

    # `extent` controls point density: eval-parity fixtures need every
    # keypoint's search-radius ball to hold >= input_num REAL points —
    # duplicate-padded degenerate patches make InstanceNorm (1/sqrt(var+eps)
    # over near-constant neighborhoods) amplify fp32 noise to ~1e-1
    # cross-framework descriptor error
    room = rng.rand(n_points * 2, 3) * np.asarray(extent, np.float64)
    scene_dir = os.path.join(root, scene)
    kp_dir = os.path.join(scene_dir, '01_Keypoints')
    os.makedirs(kp_dir, exist_ok=True)

    frag_dir = os.path.join(root, 'fused_fragments', scene, 'seq-01')
    kpt_dir = os.path.join(root, 'kpts', scene, 'seq-01')
    os.makedirs(frag_dir, exist_ok=True)
    os.makedirs(kpt_dir, exist_ok=True)

    # every fragment sees a common core (for cross-fragment keypoint
    # correspondences) plus its own random extras
    core = rng.choice(len(room), n_points // 2, replace=False)
    # kpt_margin keeps keypoints away from the room walls so each
    # keypoint's search-radius ball is fully interior (a wall/corner
    # keypoint's clipped ball holds a fraction of the density the caller
    # budgeted for — see the `extent` comment above)
    kpt_pool = core
    if kpt_margin > 0:
        lo = np.asarray([kpt_margin] * 3)
        hi = np.asarray(extent, np.float64) - kpt_margin
        interior = np.all((room[core] > lo) & (room[core] < hi), axis=1)
        assert interior.sum() >= n_kpts, (
            f'only {interior.sum()} interior core points for {n_kpts} '
            f'keypoints — grow extent or shrink kpt_margin')
        kpt_pool = core[interior]
    kpt_world = rng.choice(kpt_pool, n_kpts, replace=False)

    frags, poses = [], []
    for i in range(n_frags):
        extras = rng.choice(np.setdiff1d(np.arange(len(room)), core),
                            n_points - len(core), replace=False)
        sel = np.concatenate([core, extras])
        rng.shuffle(sel)
        frag_world = room[sel] + 0.001 * rng.randn(n_points, 3)
        R = rand_rotation_matrix(rng=rng)
        t = rng.randn(3) * 0.1
        # camera frame: x_cam = R (x_world - t); pose maps cam -> world
        frag_cam = (frag_world - t) @ R.T
        pose = np.eye(4)
        pose[:3, :3] = R.T
        pose[:3, 3] = t
        frags.append((frag_cam.astype(np.float32), sel))
        poses.append(pose)

        save_ply(os.path.join(scene_dir, f'cloud_bin_{i}.ply'), frag_cam)
        save_ply(os.path.join(frag_dir, f'cloud_bin_{i}.ply'), frag_cam)
        np.save(os.path.join(frag_dir, f'cloud_bin_{i}.pose.npy'), pose)
        # keypoints = the same world points in every fragment
        kpts = np.array([int(np.where(sel == w)[0][0]) for w in kpt_world])
        np.savetxt(os.path.join(kp_dir, f'cloud_bin_{i}Keypoints.txt'),
                   kpts, fmt='%d')

    # gt.log + training keypoint pairs for consecutive fragments
    lines = []
    for i in range(n_frags - 1):
        j = i + 1
        # transform mapping frag_j cam coords into frag_i cam coords
        Ti = poses[i]
        Tj = poses[j]
        T = np.linalg.inv(Ti) @ Tj
        lines.append(f'{i}\t{j}\t{n_frags}')
        for r in range(4):
            lines.append('\t'.join(f'{v:.8f}' for v in T[r]))

        # correspondence pairs: same room point seen in both fragments
        sel_i, sel_j = frags[i][1], frags[j][1]
        common, ii, jj = np.intersect1d(sel_i, sel_j, return_indices=True)
        take = rng.choice(len(common), min(200, len(common)), replace=False)
        pairs = np.stack([ii[take], jj[take]], axis=1).astype(np.int64)
        np.save(os.path.join(kpt_dir, f'cloud_bin_{i}-cloud_bin_{j}.npy'),
                pairs)
    with open(os.path.join(scene_dir, 'gt.log'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return scene_dir


def random_clouds(rng: np.random.RandomState, batch: int, n_points: int):
    """Uniform random clouds in the unit ball (benchmark input)."""
    pc = rng.randn(batch, n_points, 3)
    pc /= np.linalg.norm(pc, axis=-1, keepdims=True)
    pc *= rng.rand(batch, n_points, 1) ** (1 / 3)
    return pc.astype(np.float32)
