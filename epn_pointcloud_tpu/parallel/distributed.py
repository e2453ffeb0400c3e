"""Multi-host (multi-process) SPMD setup.

The reference's only multi-device story is single-process nn.DataParallel
(ref: vgtk/app/trainer.py:153-160); it has no NCCL/MPI/torch.distributed
path at all (SURVEY §2.5). The TPU-native scale-out is one SPMD program per
host: `jax.distributed.initialize` wires the hosts into one runtime (ICI
within a slice, DCN across slices), every process runs the same jitted
step over a global mesh, and XLA places the gradient/batch-stat collectives.
The host input pipeline is sharded per process: each host loads only its
`1/num_processes` slice of the global batch and assembles a global array
with `jax.make_array_from_process_local_data`.

Single-process use is a no-op passthrough, so the trainers call these
helpers unconditionally.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_CLUSTER_ENV_KEYS = (
    # NOT 'TPU_WORKER_HOSTNAMES': some single-host TPU plugins set it too
    'JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
    'MEGASCALE_COORDINATOR_ADDRESS',
    'SLURM_JOB_NUM_NODES', 'OMPI_COMM_WORLD_SIZE',
)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-process JAX runtime; returns this process's id.

    Explicit arguments always call `jax.distributed.initialize` with them.
    With no arguments: auto-initialize when a cluster environment is
    detected (coordinator/pod env vars), otherwise no-op (single process,
    id 0). Must run BEFORE any backend-initializing JAX call — the trainers
    call it first thing in __init__.
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_index()
    import os
    if any(k in os.environ for k in _CLUSTER_ENV_KEYS):
        try:
            jax.distributed.initialize()   # args inferred from environment
        except RuntimeError:
            pass                           # already initialized
        except ValueError as e:
            # env looked cluster-like but lacks a coordinator: single host
            import warnings
            warnings.warn(f'init_distributed: auto-init skipped ({e})')
            return 0
        return jax.process_index()
    return 0


def process_env() -> tuple:
    """(process_count, process_index) — the single indirection point the
    DataLoaders and tests use (monkeypatchable; avoids backend init at
    import time)."""
    return jax.process_count(), jax.process_index()


def process_slice(n: int) -> slice:
    """This process's contiguous shard of a length-n global batch dimension
    (each host's DataLoader draws only these indices)."""
    pc, pi = process_env()
    assert n % pc == 0, (n, pc)
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_local(local, mesh: Mesh, batch_axis: int = 0):
    """Assemble a globally batch-sharded array from per-process local data.

    `local` is this host's `[..., global_batch / process_count, ...]` numpy
    slice (batch at `batch_axis`); the result behaves like a global array
    with the batch axis sharded over the mesh's 'data' axis.
    Single-process: equivalent to shard_batch's device_put.
    """
    local = np.asarray(local)
    global_shape = list(local.shape)
    global_shape[batch_axis] *= jax.process_count()
    spec = [None] * local.ndim
    spec[batch_axis] = 'data'
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local,
                                                  tuple(global_shape))
