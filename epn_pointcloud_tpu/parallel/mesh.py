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
    if n_anchor < 1 or len(devices) % n_anchor != 0:
        raise ValueError(
            f'n_anchor={n_anchor} must be >= 1 and divide the device count '
            f'({len(devices)}) — a remainder would silently idle devices')
    if n_data is None:
        n_data = len(devices) // n_anchor
    if n_data * n_anchor > len(devices):
        raise ValueError(f'{n_data} x {n_anchor} mesh needs '
                         f'{n_data * n_anchor} devices, have {len(devices)}')
    devs = np.asarray(devices[:n_data * n_anchor]).reshape(n_data, n_anchor)
    return Mesh(devs, ('data', 'anchor'))


def batch_sharding(mesh: Mesh, ndim: int,
                   batch_axis: int = 0) -> NamedSharding:
    """Shard `batch_axis` over 'data'; everything else replicated."""
    spec = [None] * ndim
    spec[batch_axis] = 'data'
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Leaves whose batch axis does not divide the 'data' axis size (short
    final eval batches) are replicated instead — XLA still computes the
    right answer, just without the batch split for that step.

    `batch_axis=1` serves the multi-step dispatch path (leaves stacked
    [n_steps, batch, ...]; the scan axis stays replicated).

    Multi-process: leaves are this host's `1/process_count` slice of the
    global batch (the DataLoaders shard by `process_slice`); they are
    assembled into globally batch-sharded arrays via
    `jax.make_array_from_process_local_data`. Replicated puts of
    host-local data are invalid there, so non-divisible leaves raise.
    """
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get('data', 1)
    pc = jax.process_count()

    def put(x):
        if (x.ndim <= batch_axis
                or (x.shape[batch_axis] * pc) % max(n_data, 1) != 0):
            if pc > 1:
                raise ValueError(
                    f'multi-host shard_batch needs batch-divisible leaves; '
                    f'got local shape {getattr(x, "shape", ())} for data '
                    f'axis {n_data} over {pc} processes')
            return jax.device_put(x, NamedSharding(mesh, P()))
        if pc > 1:
            from .distributed import global_batch_from_local
            return global_batch_from_local(x, mesh, batch_axis=batch_axis)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# --------------------------------------------------------------------------
# Anchor-axis model parallelism. The natural "tensor parallel" axis of this
# architecture is the rotation-anchor dimension: anchors are independent in
# the inter conv (the [b,p,n,a,k] weights and [b,p,a,k,c] features factor
# per anchor), so sharding feats [b, p, a, c] over an 'anchor' mesh axis
# splits the heaviest intermediates; XLA inserts the collectives at the
# anchor-mixing points (intra conv, anchor pooling) automatically.
# --------------------------------------------------------------------------

_GLOBAL_MESH: Mesh | None = None


def set_global_mesh(mesh: Mesh | None):
    """Install the mesh consulted by `constrain_feats` (None disables)."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh | None:
    return _GLOBAL_MESH


def axis_size(mesh: Mesh, name: str) -> int:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return int(sizes.get(name, 1))


def data_mesh_for(batch: int) -> Mesh | None:
    """The installed global mesh when a Pallas path can shard_map over it:
    purely data-parallel (anchor axis 1), >1 device on 'data', and the batch
    divides. None otherwise (callers fall back to XLA formulations, which
    GSPMD partitions fine). Single-device returns None (no wrapping needed).
    """
    if jax.device_count() <= 1:
        return None
    gm = _GLOBAL_MESH
    if (gm is not None and axis_size(gm, 'anchor') == 1
            and axis_size(gm, 'data') > 1
            and batch % axis_size(gm, 'data') == 0):
        return gm
    return None


def tp_mesh_for(batch: int, na: int) -> Mesh | None:
    """The installed global mesh when a Pallas path can shard_map over BOTH
    axes with the anchor axis sharding the rotation-group dimension: anchor
    axis > 1 and divides na, and the batch divides the data axis. None
    otherwise. The anchor dimension is the natural tensor-parallel axis of
    this architecture — the inter conv (and the 1x1 skip convs / norms) are
    pointwise in anchors, so their Pallas kernels run on a local anchor
    shard with NO communication; the collectives (intra-conv anchor mixing,
    head pooling) ride the XLA formulations, which GSPMD partitions."""
    if jax.device_count() <= 1:
        return None
    gm = _GLOBAL_MESH
    if gm is None:
        return None
    ntp = axis_size(gm, 'anchor')
    nd = axis_size(gm, 'data')
    if ntp <= 1 or na % ntp != 0 or batch % nd != 0:
        return None
    return gm


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions (jax.shard_map/check_vma vs the old
    jax.experimental.shard_map/check_rep), replication checking off (the
    wrapped fns close over replicated values)."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def named_shard_map(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map with explicit PartitionSpecs (the general dp x tp form of
    data_shard_map)."""
    return _shard_map(fn, mesh, tuple(in_specs), out_specs)


def largest_divisor_at_most(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1)."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def data_shard_map(fn, mesh: Mesh, n_data_args: int, n_repl_args: int):
    """shard_map `fn` over the 'data' axis: the first n_data_args are
    batch-sharded, the remaining n_repl_args replicated; one batch-sharded
    output. Pallas calls are opaque to GSPMD (a bare pjit would have to
    replicate them); shard_map hands each device its batch shard
    explicitly."""
    in_specs = tuple([P('data')] * n_data_args + [P()] * n_repl_args)
    return _shard_map(fn, mesh, in_specs, P('data'))


def constrain_feats(feats):
    """Apply the canonical sharding to anchor-indexed features
    [b, p, a, c]: batch over 'data', anchors over 'anchor' (when a 2-D
    global mesh is installed and the anchor axis divides)."""
    mesh = _GLOBAL_MESH
    if mesh is None or 'anchor' not in mesh.axis_names:
        return feats
    n_anchor = dict(zip(mesh.axis_names, mesh.devices.shape))['anchor']
    if n_anchor <= 1 or feats.ndim < 4 or feats.shape[2] % n_anchor != 0:
        return feats
    spec = P('data', None, 'anchor', *([None] * (feats.ndim - 3)))
    return jax.lax.with_sharding_constraint(
        feats, NamedSharding(mesh, spec))
