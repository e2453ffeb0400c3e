"""3DMatch descriptor trainer + evaluation pipeline (rebuild of
SPConvNets/trainer_3dmatch.py)."""

from __future__ import annotations

import csv
import os
import os.path as osp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses, models
from ..parallel import create_train_state, replicate, shard_batch
from .trainer import Trainer


class Trainer3DMatch(Trainer):
    def __init__(self, opt):
        super().__init__(opt)
        if self.opt.train_loss.equi_alpha > 0:
            self.summary.register(['Loss', 'InvLoss', 'Pos', 'Neg', 'Acc',
                                   'EquiLoss', 'EquiPos', 'EquiNeg', 'EquiAcc'])
        else:
            self.summary.register(['Loss', 'Pos', 'Neg', 'Acc'])
        self.epoch_counter = 0
        self.iter_counter = 0
        self._build_steps()

    def _setup_datasets(self):
        from ..data.match_3dmatch import FragmentLoader, PointCloudPairSampler
        from ..data.modelnet40 import DataLoader
        opt = self.opt
        if opt.mode == 'train':
            dataset = FragmentLoader(opt, opt.model.search_radius,
                                     kptname=opt.dataset,
                                     use_normals=opt.model.normals,
                                     npt=opt.npt)
            self.sampler = PointCloudPairSampler(len(dataset), seed=opt.seed)
            self.dataset_train = DataLoader(dataset, opt.batch_size,
                                            shuffle=True, seed=opt.seed)
            self.dataset_iter = iter(self.dataset_train)
        else:
            self.dataset_train = None

    def _setup_eval_datasets(self, scene):
        from ..data.match_3dmatch import SceneEvalLoader
        self.dataset_eval = SceneEvalLoader(self.opt, scene)

    def _setup_model(self):
        param_outfile = osp.join(self.root_dir, 'params.json')
        self.model = models.build_model_from(self.opt, param_outfile)

    def _setup_metric(self):
        self.anchors = np.asarray(self.model.get_anchor())
        self.equi_alpha = self.opt.train_loss.equi_alpha

    def _setup_mesh(self):
        super()._setup_mesh()
        n = self.opt.batch_size * self.opt.npt
        x0 = jnp.zeros((n, self.opt.model.input_num, 3), jnp.float32)
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
        opt = self.opt
        loss_mode = opt.train_loss.loss_type
        margin = opt.train_loss.margin
        alpha = self.equi_alpha
        anchors = jnp.asarray(self.anchors)

        def forward(state, params, x, train, rng):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            if train:
                return state.apply_fn(variables, x, train=True,
                                      mutable=['batch_stats'],
                                      rngs={'dropout': rng})
            return state.apply_fn(variables, x, train=False,
                                  rngs={'dropout': rng}), {}

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, src, tgt, T, rng):
            r1, r2 = jax.random.split(rng)

            def loss_fn(params):
                (y_src, yw_src), mut1 = forward(state, params, src, True, r1)
                variables = {'params': params, 'batch_stats': mut1['batch_stats']}
                (y_tgt, yw_tgt), mut2 = state.apply_fn(
                    variables, tgt, train=True, mutable=['batch_stats'],
                    rngs={'dropout': r2})
                if alpha > 0:
                    loss, aux = losses.triplet_equivariance_loss(
                        y_src, y_tgt, yw_src, yw_tgt, T, anchors,
                        loss_mode, margin, alpha)
                else:
                    loss, aux = losses.triplet_batch_loss(
                        y_src, y_tgt, loss_mode, margin)
                    aux = dict(aux)
                aux.pop('all_dist', None)
                return loss, (aux, mut2)

            grads, (aux, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if mut:
                state = state.replace(batch_stats=mut['batch_stats'])
            # derived log scalars computed IN-JIT (per-step eager device
            # arithmetic leaks arguments memory on this backend)
            if alpha > 0:
                aux['log'] = {
                    'Loss': aux['inv_loss'] + alpha * aux['equi_loss'],
                    'InvLoss': aux['inv_loss'],
                    'Pos': aux['inv']['fpos'],
                    'Neg': aux['inv']['cneg'],
                    'Acc': 100.0 * aux['inv']['accuracy'],
                    'EquiLoss': aux['equi_loss'],
                    'EquiPos': aux['equi']['fpos'],
                    'EquiNeg': aux['equi']['cneg'],
                    'EquiAcc': 100.0 * aux['equi']['accuracy']}
            else:
                aux['log'] = {'Loss': aux['fpos'] - aux['cneg'],
                              'Pos': aux['fpos'],
                              'Neg': aux['cneg'],
                              'Acc': 100.0 * aux['accuracy']}
            return state, aux

        @jax.jit
        def descriptor_step(state, x, rng):
            (y, _), _ = forward(state, state.params, x, False, rng)
            return y

        self._train_step = train_step
        self._descriptor_step = descriptor_step

    def _prepare_input(self, data):
        """[b, npt, n, c] -> [b*npt, n, c] (ref: trainer_3dmatch.py:81-88)."""
        nchan = data['src'].shape[-1]
        src = data['src'].reshape(-1, self.opt.model.input_num, nchan)
        tgt = data['tgt'].reshape(-1, self.opt.model.input_num, nchan)
        return src, tgt

    def step(self):
        try:
            data = next(self.dataset_iter)
        except StopIteration:
            self.epoch_counter += 1
            self.logger.log('DataLoader', f'At Epoch {self.epoch_counter}!')
            self.dataset_iter = iter(self.dataset_train)
            data = next(self.dataset_iter)
        self._optimize(data)

    def _optimize(self, data):
        src, tgt = self._prepare_input(data)
        batch = shard_batch({'src': src, 'tgt': tgt,
                             'T': data['T'].astype(np.float32)}, self.mesh)
        self.state, aux = self._train_step(self.state, batch['src'],
                                           batch['tgt'], batch['T'],
                                           self.next_rng())
        # device scalars (computed in-jit), read lazily at log time
        self.summary.update_async(aux['log'])
        self.iter_counter += 1

    def test(self):
        pass

    def eval(self, select):
        """3DMatch evaluation: per-scene descriptor extraction + feature-match
        recall (ref: trainer_3dmatch.py:144-232)."""
        from ..eval import evaluation_3dmatch as eval3dmatch

        all_results = {}
        for scene in select:
            assert osp.isdir(osp.join(self.opt.dataset_path, scene))
            self.logger.log('Eval', f'Working on scene {scene}...')
            target_folder = osp.join('data/evaluate/3DMatch/',
                                     self.opt.experiment_id, scene,
                                     f'{self.opt.model.output_num}_dim')
            self._setup_eval_datasets(scene)
            self._generate(target_folder)
            results = eval3dmatch.evaluate_scene(
                self.opt.dataset_path, target_folder, scene,
                num_thread=min(8, os.cpu_count() or 1))
            all_results[scene] = results
        self._write_csv(all_results)
        self.logger.log('Eval', 'Done!')
        return all_results

    def _generate(self, target_folder):
        """Batched descriptor extraction with NaN guard
        (ref: trainer_3dmatch.py:165-202)."""
        bs = self.opt.batch_size * self.opt.npt
        os.makedirs(target_folder, exist_ok=True)
        for idx in range(len(self.dataset_eval)):
            data = self.dataset_eval[idx]
            sid = data['sid']
            clouds = np.asarray(data['clouds'])
            npt = clouds.shape[0]
            feature_buffer = []
            for bi in range(0, npt, bs):
                chunk = clouds[bi: bi + bs]
                pad = bs - chunk.shape[0]
                if pad > 0:  # keep a single compiled shape
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, 0)], 0)
                feat = np.asarray(self._descriptor_step(
                    self.state, jnp.asarray(chunk), self.next_rng()))
                if pad > 0:
                    feat = feat[:-pad]
                if np.isnan(feat).any():
                    feat = np.nan_to_num(feat)
                feature_buffer.append(feat)
            feature_out = np.vstack(feature_buffer)
            out_path = osp.join(target_folder, f'feature{sid}.npy')
            self.logger.log('Eval', f'Saving features to {out_path}')
            np.save(out_path, feature_out)

    def _write_csv(self, results):
        """recall.csv (ref: trainer_3dmatch.py:205-232)."""
        from ..eval import evaluation_3dmatch as eval3dmatch
        csvpath_root = osp.join('trained_models/evaluate/3DMatch/',
                                self.opt.experiment_id)
        os.makedirs(csvpath_root, exist_ok=True)
        csvpath = osp.join(csvpath_root, 'recall.csv')
        with open(csvpath, 'w', newline='') as csvfile:
            fieldnames = ['Scene'] + ['tau_%.2f' % tau
                                      for tau in eval3dmatch.TAU_RANGE]
            writer = csv.DictWriter(csvfile, fieldnames=fieldnames)
            writer.writeheader()
            for scene, recalls in results.items():
                row = {'Scene': scene}
                for tau, ratio in recalls:
                    row['tau_%.2f' % tau] = '%.2f' % ratio
                writer.writerow(row)

        all_recall = []
        for scene, recalls in results.items():
            tau, ratio = recalls[0]
            self.logger.log('Eval', '%s recall is %.2f at tau %.2f'
                            % (scene, ratio, tau))
            all_recall.append(ratio)
        self.logger.log('Eval', 'Average recall is %.2f !'
                        % float(np.mean(all_recall)))
