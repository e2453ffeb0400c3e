"""TSDF fusion of RGB-D frames into fragments (rebuild of
SPConvNets/datasets/preprocess/run_fusion.py, which uses open3d's
ScalableTSDFVolume). Here: a numpy hashed-block TSDF integrator — voxel
blocks are allocated lazily along depth rays, each frame's depth image is
projected into the allocated voxels, and the fused surface is extracted as
zero-crossing voxel centers with gradient normals.

Disk contract matches the reference: per fragment
  cloud_bin_<k>.ply  +  cloud_bin_<k>_pose.txt  (base-to-world pose)
with frames_per_frag (default 50) frames per fragment.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np

from ...ops.ply import save_ply
from .tool import Config, depth_to_points, read_intrinsic

BLOCK = 8  # voxels per block side


class TSDFVolume:
    """Hashed-block truncated signed distance volume."""

    def __init__(self, voxel_length: float, sdf_trunc: float = 0.04):
        self.vl = float(voxel_length)
        self.trunc = float(sdf_trunc)
        self.blocks: dict[tuple, np.ndarray] = {}   # key -> [B,B,B] tsdf
        self.weights: dict[tuple, np.ndarray] = {}

        # precomputed voxel offsets within a block
        r = np.arange(BLOCK)
        self._offs = np.stack(np.meshgrid(r, r, r, indexing='ij'),
                              axis=-1).reshape(-1, 3)

    def _touched_blocks(self, points_world: np.ndarray) -> set:
        """Blocks intersecting the truncation shell around surface points."""
        keys = set()
        t = self.trunc
        for d in ((0, 0, 0), (t, 0, 0), (-t, 0, 0), (0, t, 0), (0, -t, 0),
                  (0, 0, t), (0, 0, -t)):
            b = np.floor((points_world + d) / (self.vl * BLOCK)).astype(np.int64)
            keys.update(map(tuple, np.unique(b, axis=0)))
        return keys

    def integrate(self, depth: np.ndarray, K: np.ndarray,
                  cam_to_base: np.ndarray, depth_scale: float = 1000.0,
                  depth_trunc: float = 6.0):
        """Fuse one depth frame given the camera->base transform [4,4]."""
        pts_cam, _ = depth_to_points(depth, K, depth_scale, depth_trunc)
        if len(pts_cam) == 0:
            return
        R, t = cam_to_base[:3, :3], cam_to_base[:3, 3]
        pts_base = pts_cam @ R.T + t

        base_to_cam = np.linalg.inv(cam_to_base)
        Rb, tb = base_to_cam[:3, :3], base_to_cam[:3, 3]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        h, w = depth.shape
        zimg = depth.astype(np.float64) / depth_scale

        for key in self._touched_blocks(pts_base):
            origin = np.asarray(key, np.float64) * (self.vl * BLOCK)
            centers = origin + (self._offs + 0.5) * self.vl      # [B^3,3] base
            pc = centers @ Rb.T + tb                             # camera frame
            z = pc[:, 2]
            u = np.round(pc[:, 0] / z * fx + cx - 0.5).astype(np.int64)
            v = np.round(pc[:, 1] / z * fy + cy - 0.5).astype(np.int64)
            ok = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
            if not ok.any():
                continue
            d = np.zeros(len(pc))
            d[ok] = zimg[v[ok], u[ok]]
            ok &= (d > 0) & (d < depth_trunc)
            sdf = d - z
            ok &= sdf > -self.trunc
            if not ok.any():
                continue
            tsdf_new = np.minimum(1.0, sdf / self.trunc)

            if key not in self.blocks:
                self.blocks[key] = np.zeros(BLOCK ** 3, np.float32)
                self.weights[key] = np.zeros(BLOCK ** 3, np.float32)
            tsdf, wt = self.blocks[key], self.weights[key]
            wnew = ok.astype(np.float32)
            tot = wt + wnew
            upd = tot > 0
            tsdf[upd] = ((tsdf * wt + tsdf_new * wnew)[upd] / tot[upd]) \
                .astype(np.float32)
            wt += wnew

    def extract_point_cloud(self, min_weight: float = 1.0):
        """Zero-crossing voxel centers + gradient normals.

        Returns (points [n,3], normals [n,3]) in the base frame."""
        pts, nrms = [], []
        for key, tsdf in self.blocks.items():
            wt = self.weights[key]
            vol = tsdf.reshape(BLOCK, BLOCK, BLOCK)
            wv = wt.reshape(BLOCK, BLOCK, BLOCK)
            # surface voxels: |tsdf| below one voxel of distance
            mask = (np.abs(vol) < self.vl / self.trunc) & (wv >= min_weight)
            if not mask.any():
                continue
            idx = np.argwhere(mask)
            origin = np.asarray(key, np.float64) * (self.vl * BLOCK)
            centers = origin + (idx + 0.5) * self.vl
            # gradient normals via central differences (clamped to block)
            g = np.zeros((len(idx), 3))
            for a in range(3):
                lo = idx.copy()
                hi = idx.copy()
                lo[:, a] = np.maximum(lo[:, a] - 1, 0)
                hi[:, a] = np.minimum(hi[:, a] + 1, BLOCK - 1)
                g[:, a] = (vol[hi[:, 0], hi[:, 1], hi[:, 2]]
                           - vol[lo[:, 0], lo[:, 1], lo[:, 2]])
            n = np.linalg.norm(g, axis=1, keepdims=True)
            g = np.where(n > 1e-12, g / np.maximum(n, 1e-12), 0.0)
            pts.append(centers)
            nrms.append(g)
        if not pts:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        return (np.concatenate(pts).astype(np.float32),
                np.concatenate(nrms).astype(np.float32))


def fuse_frames(frame_paths, K, cfg: Config):
    """Fuse a list of (depth_path, pose_path) into one fragment
    (ref: run_fusion.py:FusionFromRGBD — color is not needed for geometry).
    Returns (points, normals, pose_base2world)."""
    import imageio.v2 as imageio

    pose_base2world = np.loadtxt(frame_paths[0][1], dtype=np.float64)
    pose_world2base = np.linalg.inv(pose_base2world)
    vol = TSDFVolume(voxel_length=cfg.tsdf_cubic_size / 512.0, sdf_trunc=0.04)
    for dp, pp in frame_paths:
        pose_cam2world = np.loadtxt(pp, dtype=np.float64)
        pose_cam2base = pose_world2base @ pose_cam2world
        depth = np.asarray(imageio.imread(dp))
        vol.integrate(depth, K, pose_cam2base, cfg.depth_scale,
                      cfg.depth_trunc)
    pts, nrms = vol.extract_point_cloud()
    return pts, nrms, pose_base2world


def run_rgbd_fusion(output_root: str, root_path: str, cfg: Config = None):
    """Walk <root>/<scene>/seq-*/frame-*.{depth.png,pose.txt}, fuse every
    frames_per_frag frames, write cloud_bin_<k>.ply + pose
    (ref: run_fusion.py:16-104)."""
    cfg = cfg or Config()

    def frame_id(path):
        m = re.search(r'frame-(\d+)\.', os.path.basename(path))
        return int(m.group(1))

    for scene_dir in sorted(glob.glob(os.path.join(root_path, '*'))):
        if not os.path.isdir(scene_dir):
            continue
        scene = os.path.basename(scene_dir)
        out_dir = os.path.join(output_root, scene)
        os.makedirs(out_dir, exist_ok=True)
        K = read_intrinsic(os.path.join(scene_dir, 'camera-intrinsics.txt'))
        frag_counter = 0
        for seq_dir in sorted(glob.glob(os.path.join(scene_dir, 'seq*'))):
            dpaths = sorted(glob.glob(os.path.join(seq_dir, '*.depth.png')),
                            key=frame_id)
            ppaths = sorted(glob.glob(os.path.join(seq_dir, '*.pose.txt')),
                            key=frame_id)
            assert len(dpaths) == len(ppaths)
            frames = list(zip(dpaths, ppaths))
            n = cfg.frames_per_frag
            for head in range(0, len(frames) - n + 1, n):
                pts, nrms, pose = fuse_frames(frames[head:head + n], K, cfg)
                np.savetxt(os.path.join(
                    out_dir, f'cloud_bin_{frag_counter}_pose.txt'), pose)
                save_ply(os.path.join(out_dir,
                                      f'cloud_bin_{frag_counter}.ply'), pts)
                frag_counter += 1
