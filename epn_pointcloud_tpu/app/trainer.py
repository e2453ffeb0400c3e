"""Trainer base: the full experiment lifecycle (rebuild of
vgtk/vgtk/app/trainer.py:17-224).

Order matters for reproducibility (ref: trainer.py:18-81): seed -> run dirs ->
opt dump -> logger -> datasets -> model -> optimizer -> metric -> resume ->
device mesh. Checkpoints store params + batch_stats (reference stores model
state_dict only, trainer.py:207-224); as an improvement, `save_full_state`
additionally stores optimizer state + step for exact resume.
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Optional

import jax
import numpy as np
from flax import serialization

from . import config as config_lib
from .logger import Logger, Summary, Timer
from ..parallel import make_mesh, make_lr_schedule


class Trainer:
    def __init__(self, opt):
        opt_dict = config_lib.dump_args(opt)
        self.check_opt(opt)

        # multi-host wiring must precede ANY backend-initializing JAX call
        # (jax.random.PRNGKey below initializes the backend)
        from ..parallel import init_distributed
        self.process_id = init_distributed()

        # set random seed (ref: trainer.py:25-29; JAX is deterministic by
        # construction — host-side numpy/python rngs are what need pinning)
        random.seed(self.opt.seed)
        np.random.seed(self.opt.seed)
        self.rng = jax.random.PRNGKey(self.opt.seed)
        self.data_rng = np.random.RandomState(self.opt.seed)

        # run dir: trained_models/models/<exp>/model_<ts>/ (ref: :33-36)
        experiment_id = (self.opt.experiment_id if self.opt.mode == 'train'
                         else f'{self.opt.experiment_id}_{self.opt.mode}')
        # colon-free timestamp: colons in dir names break Windows checkouts
        model_id = f'model_{time.strftime("%Y%m%d_%H%M%S")}'
        self.root_dir = os.path.join(self.opt.model_dir, experiment_id, model_id)
        os.makedirs(self.root_dir, exist_ok=True)

        with open(os.path.join(self.root_dir, 'opt.txt'), 'w') as fout:
            # default=str: opt namespaces that crossed the reference-parity
            # harness can carry non-JSON leaves (e.g. torch.device)
            json.dump(opt_dict, fout, indent=2, default=str)

        self.logger = Logger(log_file=os.path.join(self.root_dir, 'log.txt'))
        self.logger.log('Setup', 'Logger created! Hello World!')
        self.logger.log('Setup', f'Random seed has been set to {self.opt.seed}')
        self.logger.log('Setup', f'Experiment id: {experiment_id}')
        self.logger.log('Setup', f'Model id: {model_id}')

        self.ckpt_dir = os.path.join(self.root_dir, 'ckpt')
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.logger.log('Setup', 'Checkpoint dir created!')

        self._setup_datasets()
        self._setup_model()
        self._setup_optim()
        self._setup_metric()

        self.start_epoch = 0
        self.start_iter = 0
        self.iter_counter = 0

        # mesh + train-state creation precedes resume (the checkpoint loads
        # into the created state; ref resumes into the built model too,
        # trainer.py:70-71)
        self._setup_mesh()
        self._resume_from_ckpt(getattr(opt, 'resume_path', None))

        self.summary = Summary()
        self.timer = Timer()
        self.summary.register(['Time'])
        self._train_mode = True
        self.logger.log('Setup', 'Setup finished!')

    # ------------------------------------------------------------------ api

    def train(self):
        self.opt.mode = 'train'
        self._train_mode = True
        if self.opt.num_epochs is not None:
            self.train_epoch()
        else:
            self.train_iter()

    def test(self):
        self.opt.mode = 'test'
        self._train_mode = False

    def train_iter(self):
        """The hot loop (ref: trainer.py:95-112). step() may consume more
        than one optimizer step per call (multi-step dispatch); log/save
        cadence fires on crossing each freq multiple."""
        i, next_log = 0, 0
        while i < self.opt.num_iterations:
            self.timer.set_point('train_iter')
            consumed = self.step() or 1
            self.summary.update(
                {'Time': self.timer.reset_point('train_iter') / consumed})

            if i >= next_log:
                if hasattr(self, 'epoch_counter'):
                    step = f'Epoch {self.epoch_counter}, Iter {i}'
                else:
                    step = f'Iter {i}'
                self._print_running_stats(step)
                next_log += self.opt.log_freq
            i += consumed
            if (i // self.opt.save_freq) > ((i - consumed)
                                            // self.opt.save_freq):
                self._save_network(f'Iter{i}')
                self.test()

    def train_epoch(self):
        for i in range(self.opt.num_epochs):
            self.epoch_step()
            if i % self.opt.log_freq == 0:
                self._print_running_stats(f'Epoch {i}')
            if i > 0 and i % self.opt.save_freq == 0:
                self._save_network(f'Epoch{i}')

    # ----------------------------------------------------------- overrides

    def check_opt(self, opt, print_opt=True):
        self.opt = opt

    def _print_running_stats(self, step):
        self.logger.log('Training', f'{step}: {self.summary.get()}')

    def step(self):
        raise NotImplementedError('Not implemented')

    def epoch_step(self):
        raise NotImplementedError('Not implemented')

    def _setup_datasets(self):
        raise NotImplementedError('Not implemented')

    def _setup_model(self):
        raise NotImplementedError('Not implemented')

    def _setup_metric(self):
        raise NotImplementedError('Not implemented')

    def _setup_optim(self):
        self.logger.log('Setup', 'Setup optimizer!')
        self.lr_schedule = make_lr_schedule(**vars(self.opt.train_lr))
        self.logger.log('Setup', 'Optimizer all-set!')

    def _setup_mesh(self):
        """Mesh over all visible devices: data-parallel by default (the
        TPU-native stand-in for the reference's DataParallel,
        trainer.py:153-160), with an optional anchor-axis TP dimension
        (--mesh-anchor). Multi-host: one SPMD program per process over the
        same global mesh (parallel/distributed.py)."""
        self.mesh = make_mesh(n_anchor=getattr(self.opt, 'mesh_anchor', 1)
                              or 1)
        from ..parallel import set_global_mesh
        set_global_mesh(self.mesh)  # activates shard_map'd Pallas paths
        from ..ops import so3conv
        so3conv.set_compute_dtype(getattr(self.opt, 'compute_dtype', 'fp32'))
        n = int(np.prod([s for s in self.mesh.devices.shape]))
        self.logger.log('Setup', f'Using a {self.mesh.devices.shape} device '
                                 f'mesh ({n} devices)!')

    # -------------------------------------------------------- checkpointing

    def _ckpt_payload(self):
        """Model-only state, like the reference's state_dict save."""
        return {'params': self.state.params,
                'batch_stats': self.state.batch_stats}

    def _save_network(self, step, label=None, path=None):
        label = self.opt.experiment_id if label is None else label
        if path is None:
            save_path = os.path.join(self.ckpt_dir, f'{label}_net_{step}.ckpt')
        else:
            save_path = f'{path}.ckpt'
        with open(save_path, 'wb') as f:
            f.write(serialization.to_bytes(self._ckpt_payload()))
        self.logger.log('Training', f'Checkpoint saved to: {save_path}!')

    def save_full_state(self, path: str):
        """Improvement over the reference: full train state for exact resume."""
        payload = {'state': self.state, 'iter': self.iter_counter}
        with open(path, 'wb') as f:
            f.write(serialization.to_bytes(payload))

    def _resume_from_ckpt(self, resume_path: Optional[str]):
        if resume_path is None:
            self.logger.log('Setup', 'Seems like we train from scratch!')
            return
        self.logger.log('Setup', f'Resume from checkpoint: {resume_path}')
        with open(resume_path, 'rb') as f:
            payload = serialization.from_bytes(self._ckpt_payload(), f.read())
        self.state = self.state.replace(params=payload['params'],
                                        batch_stats=payload['batch_stats'])
        self.logger.log('Setup', 'Resume finished! Great!')

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub
