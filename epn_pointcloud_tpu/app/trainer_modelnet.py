"""ModelNet40 classification trainer (rebuild of
SPConvNets/trainer_modelnet.py). One jit-compiled SPMD train step; batch
sharded over the data mesh, parameters replicated."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses, models
from ..parallel import create_train_state, shard_batch, replicate
from .trainer import Trainer


class TrainerModelNet(Trainer):
    def __init__(self, opt):
        self.attention_model = (opt.model.flag.startswith('attention')
                                and opt.debug_mode != 'knownatt')
        super().__init__(opt)

        if self.attention_model:
            self.summary.register(['Loss', 'Acc', 'R_Loss', 'R_Acc'])
        else:
            self.summary.register(['Loss', 'Acc'])
        self.epoch_counter = 0
        self.iter_counter = 0
        self.test_accs = []
        self._build_steps()

    # ------------------------------------------------------------- lifecycle

    def _setup_datasets(self):
        from ..data.modelnet40 import DataLoader, Dataloader_ModelNet40
        opt = self.opt
        if opt.mode == 'train':
            dataset = Dataloader_ModelNet40(opt)
            self.dataset = DataLoader(dataset, opt.batch_size, shuffle=True,
                                      seed=opt.seed)
            self.dataset_iter = iter(self.dataset)
        dataset_test = Dataloader_ModelNet40(opt, 'testR')
        self.dataset_test = DataLoader(dataset_test, opt.batch_size,
                                       shuffle=False, seed=opt.seed,
                                       drop_last=False)

    def _setup_model(self):
        param_outfile = (os.path.join(self.root_dir, 'params.json')
                         if self.opt.mode == 'train' else None)
        self.model = models.build_model_from(self.opt, param_outfile)

    def _setup_metric(self):
        self.anchors = np.asarray(self.model.get_anchor())

    def _setup_mesh(self):
        super()._setup_mesh()
        # initialize variables and the train state
        x0 = jnp.zeros((self.opt.batch_size, self.opt.model.input_num, 3),
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

    # ----------------------------------------------------------------- steps

    def _build_steps(self):
        opt = self.opt
        attention = self.attention_model
        loss_type = opt.train_loss.attention_loss_type
        margin = opt.train_loss.attention_margin
        knownatt = opt.debug_mode == 'knownatt'

        def forward(state, params, pc, rlabel, train, rng):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            rl = rlabel if knownatt else None
            if train:
                out, mut = state.apply_fn(variables, pc, rl, train=True,
                                          mutable=['batch_stats'],
                                          rngs={'dropout': rng})
                return out, mut
            out = state.apply_fn(variables, pc, rl, train=False,
                                 rngs={'dropout': rng})
            return out, {}

        def compute_loss(pred, feat, label, rlabel, it):
            if attention:
                loss, aux = losses.attention_cross_entropy(
                    pred, label, feat, rlabel, loss_type, margin,
                    iter_counter=it,
                    pretrain_step=2000)
                return loss, aux
            loss, acc = losses.cross_entropy(pred, label)
            return loss, {'cls_loss': loss, 'acc': acc}

        def train_body(state, pc, label, rlabel, it, rng):
            def loss_fn(params):
                (pred, feat), mut = forward(state, params, pc, rlabel, True, rng)
                loss, aux = compute_loss(pred, feat, label, rlabel, it)
                return loss, (aux, mut)
            grads, (aux, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if mut:
                state = state.replace(batch_stats=mut['batch_stats'])
            # derived log scalars computed IN-JIT (per-step eager device
            # arithmetic leaks arguments memory on this backend)
            if 'racc' in aux:
                aux['log'] = {'Loss': aux['cls_loss'],
                              'Acc': 100.0 * aux['acc'],
                              'R_Loss': aux['r_loss'],
                              'R_Acc': 100.0 * aux['racc']}
            else:
                aux['log'] = {'Loss': aux['cls_loss'],
                              'Acc': 100.0 * aux['acc']}
            return state, aux

        train_step = partial(jax.jit, donate_argnums=(0,))(train_body)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step_n(state, pcs, labels, rlabels, it0, rngs):
            """lax.scan the train step over stacked batches: one device
            dispatch per `steps_per_dispatch` optimizer steps (per-dispatch
            host cost through the tunnel backend otherwise serializes
            against device compute). Emits per-step log scalars."""
            def body(st, xs):
                pc, label, rlabel, off, rng = xs
                st, aux = train_body(st, pc, label, rlabel, it0 + off, rng)
                return st, aux['log']
            offs = jnp.arange(pcs.shape[0])
            state, logs = jax.lax.scan(
                body, state, (pcs, labels, rlabels, offs, rngs))
            return state, logs

        @jax.jit
        def eval_step(state, pc, label, rlabel, rng):
            (pred, feat), _ = forward(state, state.params, pc, rlabel, False, rng)
            loss, aux = compute_loss(pred, feat, label, rlabel, 0)
            aux['pred'] = pred
            aux['feat'] = feat
            return aux

        self._train_step = train_step
        self._train_step_n = train_step_n
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
        n = int(getattr(self.opt, 'steps_per_dispatch', 1) or 1)
        if n > 1:
            datas = [self._next_batch() for _ in range(n)]
            self._optimize_n(datas)
            self.iter_counter += n
            return n
        data = self._next_batch()
        self._optimize(data)
        self.iter_counter += 1
        return 1

    def _optimize(self, data):
        batch = shard_batch({'pc': data['pc'],
                             'label': data['label'].reshape(-1),
                             'R_label': data['R_label'].reshape(-1)},
                            self.mesh)
        self.state, aux = self._train_step(
            self.state, batch['pc'], batch['label'], batch['R_label'],
            self.iter_counter, self.next_rng())

        # device scalars (computed in-jit), read lazily at log time — a
        # float() here would block the host on the step result and
        # serialize batch prep against device compute
        self.summary.update_async(aux['log'])

    def _optimize_n(self, datas):
        """Multi-step dispatch: stack n batches on [n, b, ...] and scan the
        train step in one jitted call (see --steps-per-dispatch)."""
        n = len(datas)
        batch = shard_batch(
            {'pc': np.stack([d['pc'] for d in datas]),
             'label': np.stack([d['label'].reshape(-1) for d in datas]),
             'R_label': np.stack([d['R_label'].reshape(-1)
                                  for d in datas])},
            self.mesh, batch_axis=1)
        rngs = jax.random.split(self.next_rng(), n)
        self.state, logs = self._train_step_n(
            self.state, batch['pc'], batch['label'], batch['R_label'],
            self.iter_counter, rngs)
        # [n]-vector device stats: the Summary applies them as n sequential
        # EMA updates at flush time (one batched transfer)
        self.summary.update_async(logs)

    def test(self):
        self.eval()

    def eval(self):
        """Average accuracy over the rotated test set
        (ref: trainer_modelnet.py:138-210)."""
        self.logger.log('Testing', 'Evaluating test set!')
        acc_key = ('racc' if (self.attention_model and
                              self.opt.train_loss.attention_loss_type
                              == 'no_cls') else 'acc')
        dev_accs, dev_losses = [], []
        all_labels, all_feats = [], []
        for data in self.dataset_test:
            pc = jnp.asarray(data['pc'])
            label = jnp.asarray(data['label'].reshape(-1))
            rlabel = jnp.asarray(data['R_label'].reshape(-1))
            aux = self._eval_step(self.state, pc, label, rlabel,
                                  self.next_rng())
            # keep scalars on device: per-scalar readbacks cost a full
            # round trip each on the tunnel backend; one batched transfer
            # after the loop replaces 2 per batch
            dev_accs.append(aux[acc_key])
            dev_losses.append(aux['cls_loss'])
            all_labels.append(data['label'].reshape(-1))   # host data as-is
            all_feats.append(aux['feat'])                  # stays on device
        if not dev_accs:
            self.logger.log('Testing', 'Test set is empty!')
            return float('nan')
        accs = np.asarray(jnp.stack(dev_accs), dtype=np.float32)
        losses_np = np.asarray(jnp.stack(dev_losses), dtype=np.float32)
        # all_labels/all_feats feed the reference's (commented) retrieval-mAP
        # hook (trainer_modelnet.py:206-207); feats stay on device until a
        # consumer actually needs them
        for acc, lv in zip(accs, losses_np):
            self.logger.log('Testing', 'Accuracy: %.1f, Loss: %.2f!' % (
                100 * acc, lv))

        self.logger.log('Testing', 'Average accuracy is %.2f!!!!' % (100 * accs.mean()))
        self.test_accs.append(100 * accs.mean())
        self.logger.log('Testing', 'Best accuracy so far is %.2f!!!!' % (
            np.max(self.test_accs)))
        return float(accs.mean())
