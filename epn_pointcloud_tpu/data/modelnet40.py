"""ModelNet40 loaders (rebuild of SPConvNets/datasets/modelnet40.py).

Same on-disk contract as the reference: <root>/<category>/<split>/*.mat files
with keys 'pc' [n,3], 'label', 'name' (and optionally a stored 'R' for the
rotated test split). Batches are plain numpy dicts; a lightweight iterator
replaces torch DataLoader (single-process, seeded).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
import scipy.io as sio

from ..ops import icosahedron
from ..ops.rotation import label_relative_rotation_np, rotation_distance_np
from . import pc as pctk


def _mode_seed(seed: int, mode: str) -> int:
    """Stable per-mode RNG seed. The reference keeps one torch/numpy seed for
    the whole process (options.py:17 + trainer.py:25-29); we derive a
    deterministic per-split stream WITHOUT Python's salted ``hash()`` so two
    runs with the same seed see identical data."""
    return int(seed) + sum(ord(c) for c in mode) % 1000


class Dataset:
    """Minimal map-style dataset + seeded shuffling iterator."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError


class DataLoader:
    """Synchronous batcher: shuffle (seeded), drop short final batches in
    train mode like the reference step() does (trainer_modelnet.py:67-68).

    Multi-host SPMD: every process draws the SAME seeded global order, but
    each loads only its `parallel.process_slice` of every global batch
    (1/process_count of the work per host); the trainers assemble the
    global array with `parallel.global_batch_from_local` (via shard_batch).
    Short final batches are dropped under multi-host regardless of
    drop_last — a replicated put of host-local data would be incorrect.
    Replaces the reference's single-process nn.DataParallel input path
    (ref: vgtk/app/trainer.py:153-160)."""

    def __init__(self, dataset: Dataset, batch_size: int, shuffle: bool,
                 seed: int = 2913, drop_last: Optional[bool] = None,
                 process_shard: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.process_shard = process_shard
        self.rng = np.random.RandomState(seed)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self._process_count() > 1:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _process_count(self) -> int:
        if not self.process_shard:
            return 1
        from ..parallel import distributed
        return distributed.process_env()[0]

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        self.epoch += 1
        pc = self._process_count()
        for s in range(0, len(order), self.batch_size):
            idx = order[s:s + self.batch_size]
            if len(idx) < self.batch_size and (self.drop_last or pc > 1):
                return
            if pc > 1:
                from ..parallel import distributed
                idx = idx[distributed.process_slice(len(idx))]
            items = [self.dataset[i] for i in idx]
            yield {k: _stack([it[k] for it in items]) for k in items[0]}


def _stack(vals):
    if isinstance(vals[0], np.ndarray):
        return np.stack(vals)
    if isinstance(vals[0], (int, np.integer, float, np.floating)):
        return np.asarray(vals)
    return vals  # strings (filenames)


class Dataloader_ModelNet40(Dataset):
    """(ref: modelnet40.py:14-80)"""

    def __init__(self, opt, mode=None):
        self.opt = opt
        self.mode = opt.mode if mode is None else mode
        self.flag = opt.model.flag
        self.anchors = icosahedron.get_anchors()
        self.rng = np.random.RandomState(_mode_seed(opt.seed, self.mode))

        if self.flag == 'rotation':
            cats = ['airplane']
        else:
            cats = sorted(os.listdir(opt.dataset_path))

        self.all_data = []
        for cat in cats:
            pattern = os.path.join(opt.dataset_path, cat, self.mode, '*.mat')
            self.all_data.extend(sorted(glob.glob(pattern)))

    def __len__(self):
        return len(self.all_data)

    def __getitem__(self, index):
        data = sio.loadmat(self.all_data[index])
        if self.mode == 'train':
            _, pc = pctk.uniform_resample_np(data['pc'],
                                             self.opt.model.input_num,
                                             rng=self.rng)
        else:
            pc = data['pc']
        pc = pctk.normalize_np(pc.T).T

        # Unrotated samples carry the identity anchor's label. The reference
        # hardcodes 29 (SPConvNets/datasets/modelnet40.py:61) because ITS
        # anchor ordering puts the identity at index 29; ours puts it at 0
        # (ops/icosahedron.py), so the literal must go through the API.
        R = np.eye(3)
        R_label = icosahedron.get_identity_index()
        if not self.opt.no_augmentation:
            if 'R' in data.keys() and self.mode != 'train':
                pc, R = pctk.rotate_point_cloud(pc, data['R'], rng=self.rng)
            else:
                pc, R = pctk.rotate_point_cloud(pc, rng=self.rng)
            _, R_label, R0 = rotation_distance_np(R, self.anchors)
            if self.flag == 'rotation':
                R = R0

        return {'pc': pc.astype(np.float32),
                'label': np.int64(np.asarray(data['label']).flatten()[0]),
                'fn': str(data['name'][0]),
                'R': np.asarray(R, dtype=np.float32),
                'R_label': np.int64(R_label)}


class Dataloader_ModelNet40Alignment(Dataset):
    """Rotation-alignment pairs, airplane category only
    (ref: modelnet40.py:83-160)."""

    def __init__(self, opt, mode=None):
        self.opt = opt
        self.mode = opt.mode if mode is None else mode
        self.anchors = icosahedron.get_anchors(opt.model.kanchor)
        self.rng = np.random.RandomState(_mode_seed(opt.seed, self.mode))

        cats = ['airplane']
        self.all_data = []
        for cat in cats:
            pattern = os.path.join(opt.dataset_path, cat, self.mode, '*.mat')
            self.all_data.extend(sorted(glob.glob(pattern)))

    def __len__(self):
        return len(self.all_data)

    def __getitem__(self, index):
        data = sio.loadmat(self.all_data[index])
        _, pc = pctk.uniform_resample_np(data['pc'], self.opt.model.input_num,
                                         rng=self.rng)
        pc = pctk.normalize_np(pc.T).T

        pc_src, R_src = pctk.rotate_point_cloud(pc, rng=self.rng)
        pc_tgt = pc
        T = R_src
        R, R_label = label_relative_rotation_np(self.anchors, T)
        pc_tensor = np.stack([pc_src, pc_tgt])

        return {'pc': pc_tensor.astype(np.float32),
                'fn': str(data['name'][0]),
                'T': T.astype(np.float32),
                'R': R.astype(np.float32),
                'R_label': R_label.astype(np.int64)}
