"""ModelNet rotation-alignment trainer (rebuild of
SPConvNets/trainer_modelnetRotation.py)."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses, models
from ..ops import icosahedron
from ..parallel import create_train_state, replicate, shard_batch
from .trainer import Trainer


class TrainerModelNetRotation(Trainer):
    def __init__(self, opt):
        super().__init__(opt)
        self.summary.register(['Loss', 'Reg_Loss', 'Mean_Err', 'R_Acc'])
        self.epoch_counter = 0
        self.iter_counter = 0
        self.test_accs = []
        self._build_steps()

    def _setup_datasets(self):
        from ..data.modelnet40 import DataLoader, Dataloader_ModelNet40Alignment
        self.opt.model.flag = 'rotation'
        opt = self.opt
        if opt.mode == 'train':
            dataset = Dataloader_ModelNet40Alignment(opt)
            self.dataset = DataLoader(dataset, opt.batch_size, shuffle=True,
                                      seed=opt.seed)
            self.dataset_iter = iter(self.dataset)
        dataset_test = Dataloader_ModelNet40Alignment(opt, 'testR')
        self.dataset_test = DataLoader(dataset_test, opt.batch_size,
                                       shuffle=True, seed=opt.seed,
                                       drop_last=True)

    def _setup_model(self):
        if self.opt.resume_path is not None:
            splits = os.path.basename(self.opt.resume_path).split('_net_')
            self.exp_name = splits[0] + os.path.splitext(splits[1])[0]
        else:
            self.exp_name = None
        param_outfile = (os.path.join(self.root_dir, 'params.json')
                         if self.opt.mode == 'train' else None)
        self.model = models.build_model_from(self.opt, param_outfile)

    def _setup_metric(self):
        self.anchors = icosahedron.get_anchors(self.opt.model.kanchor)
        rp = self.opt.model.representation
        if rp == 'quat':
            self.nr = 4
        elif rp == 'ortho6d':
            self.nr = 6
        else:
            raise KeyError(f'Unrecognized representation of rotation: {rp}')

    def _setup_mesh(self):
        super()._setup_mesh()
        x0 = jnp.zeros((self.opt.batch_size, 2, self.opt.model.input_num, 3),
                       jnp.float32)
        variables = jax.jit(
            lambda r, x: self.model.init(r, x, train=False))(
            self.next_rng(), x0)
        self.state = create_train_state(self.model, variables, self.lr_schedule)
        # replicate the WHOLE state (step/opt_state included): a partially
        # committed state changes the jit signature after the first step
        # (outputs come back fully committed), silently recompiling the
        # entire train step on dispatch 2 (~100 s on this backend)
        self.state = replicate(self.state, self.mesh)

    def _build_steps(self):
        anchors = jnp.asarray(self.anchors)
        nr = self.nr

        def forward(state, params, pc, train, rng):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            if train:
                return state.apply_fn(variables, pc, train=True,
                                      mutable=['batch_stats'],
                                      rngs={'dropout': rng})
            return state.apply_fn(variables, pc, train=False,
                                  rngs={'dropout': rng}), {}

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, pc, rlabel, T, R, rng):
            def loss_fn(params):
                (wts, y), mut = forward(state, params, pc, True, rng)
                loss, aux = losses.multi_task_detection_loss(
                    anchors, wts, rlabel, y, R, T, nr=nr)
                return loss, (aux, mut)
            grads, (aux, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if mut:
                state = state.replace(batch_stats=mut['batch_stats'])
            # derived log scalars computed IN-JIT (per-step eager device
            # arithmetic leaks arguments memory on this backend)
            aux['log'] = {'Loss': aux['cls_loss'] + aux['l2_loss'],
                          'Reg_Loss': aux['l2_loss'],
                          'Mean_Err': jnp.mean(aux['angular_error']),
                          'R_Acc': 100.0 * aux['r_acc']}
            return state, aux

        @jax.jit
        def eval_step(state, pc, rlabel, T, R, rng):
            (wts, y), _ = forward(state, state.params, pc, False, rng)
            loss, aux = losses.multi_task_detection_loss(
                anchors, wts, rlabel, y, R, T, nr=nr)
            aux['loss'] = loss
            return aux

        self._train_step = train_step
        self._eval_step = eval_step

    def _next_batch(self):
        try:
            return next(self.dataset_iter)
        except StopIteration:
            self.epoch_counter += 1
            self.logger.log('DataLoader', f'At Epoch {self.epoch_counter}!')
            self.dataset_iter = iter(self.dataset)
            return next(self.dataset_iter)

    def step(self):
        data = self._next_batch()
        self._optimize(data)
        self.iter_counter += 1

    def _optimize(self, data):
        nb = data['pc'].shape[0]
        batch = shard_batch({
            'pc': data['pc'],
            'R_label': data['R_label'].reshape(nb, -1),
            'T': data['T'].astype(np.float32),
            'R': data['R'].astype(np.float32)}, self.mesh)
        self.state, aux = self._train_step(
            self.state, batch['pc'], batch['R_label'], batch['T'], batch['R'],
            self.next_rng())
        # device scalars (computed in-jit), read lazily at log time
        self.summary.update_async(aux['log'])

    def test(self):
        self.eval()

    def eval(self):
        """Median angular error in degrees + classifier acc
        (ref: trainer_modelnetRotation.py:136-176)."""
        self.logger.log('Testing', 'Evaluating test set!')
        all_error, dev_acc = [], []
        for data in self.dataset_test:
            nb = data['pc'].shape[0]
            aux = self._eval_step(
                self.state, jnp.asarray(data['pc']),
                jnp.asarray(data['R_label'].reshape(nb, -1)),
                jnp.asarray(data['T'].astype(np.float32)),
                jnp.asarray(data['R'].astype(np.float32)), self.next_rng())
            # everything stays on device; ONE batched readback after the
            # loop (each device->host read costs a full tunnel round trip)
            dev_acc.append(aux['r_acc'])
            all_error.append(aux['angular_error'].reshape(-1))
        if not dev_acc:
            self.logger.log('Testing', 'Test set is empty!')
            return float('nan')
        all_acc = np.asarray(jnp.stack(dev_acc), dtype=np.float32)
        all_error = [np.asarray(e) for e in
                     np.split(np.asarray(jnp.concatenate(all_error, 0)),
                              np.cumsum([e.shape[0] for e in all_error])[:-1])]
        for acc, err in zip(all_acc, all_error):
            self.logger.log('Testing', 'Accuracy: %.1f, error: %.2f!' % (
                100 * acc, float(np.mean(err))))

        all_error = np.concatenate(all_error, 0)
        self.logger.log('Testing', 'Average classifier acc is %.2f!!!!'
                        % (100 * all_acc.mean()))
        median_deg = float(np.median(all_error) * 180 / np.pi)
        self.logger.log('Testing', 'Median angular error is %.2f degree!!!!'
                        % median_deg)
        if self.exp_name is not None:
            save_dir = os.path.join('data', 'alignment_errors')
            os.makedirs(save_dir, exist_ok=True)
            np.savetxt(os.path.join(save_dir, f'{self.exp_name}_error.txt'),
                       all_error)
        return median_deg
