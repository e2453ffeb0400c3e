"""Train state, optimizer, and LR schedule.

Optimizer = Adam(lr) exactly as the reference (ref: vgtk/app/trainer.py:165;
torch defaults b1=0.9 b2=0.999 eps=1e-8). LR schedule = staircase exponential
decay lr = init * rate^(step // decay_step) (ref: vgtk/utils.py:33-68) or
constant.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import core
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState + BatchNorm running statistics."""
    batch_stats: core.FrozenDict[str, Any] = struct.field(default_factory=dict)


def make_lr_schedule(init_lr: float, lr_type: str = 'exp_decay',
                     decay_rate: float = 0.5, decay_step: int = 10000,
                     **_unused):
    if lr_type == 'constant':
        return optax.constant_schedule(init_lr)
    if lr_type == 'exp_decay':
        return optax.exponential_decay(
            init_value=init_lr, transition_steps=decay_step,
            decay_rate=decay_rate, staircase=True)
    raise ValueError(f'unknown lr_type {lr_type}')


def create_train_state(model, variables, lr_schedule, tx=None) -> TrainState:
    # pass a shared `tx` when the state pytree must be structurally equal
    # across calls (optax transforms hold closures compared by identity in
    # treedef equality — two adam() instances are different static leaves)
    if tx is None:
        tx = optax.adam(lr_schedule, b1=0.9, b2=0.999, eps=1e-8)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        tx=tx)
    # flax defaults step=0 (python int -> weak-typed i32 under jit); after one
    # apply_gradients it becomes a strong i32 array, which CHANGES the jit
    # signature and recompiles the whole train step on call 2 (~100 s of
    # compile-cache load per training job on this backend). Pin it strong.
    return state.replace(step=jnp.asarray(0, jnp.int32))
