"""Device mesh + sharding utilities.

The reference's only multi-device path is single-process nn.DataParallel
(ref: vgtk/app/trainer.py:153-160). The TPU-native equivalent is one SPMD
program: a 1-D (or 2-D) jax.sharding.Mesh, batch sharded over the 'data'
axis, parameters replicated, XLA inserting the gradient/batch-stat
collectives over ICI automatically under jit. The optional 'anchor' axis
shards the 60-anchor group dimension of the big [b, p, a, k, c] grouping
intermediates (model parallelism natural to this architecture — anchors are
independent in inter conv).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_anchor: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh by default; pass n_anchor > 1 for a 2-D
    ('data', 'anchor') mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_anchor
    devs = np.asarray(devices[:n_data * n_anchor]).reshape(n_data, n_anchor)
    return Mesh(devs, ('data', 'anchor'))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P('data', *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
