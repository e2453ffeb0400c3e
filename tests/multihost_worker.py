"""Worker for tests/test_multihost.py: one JAX process of a 2-process CPU
cluster. Validates multi-host input sharding end-to-end:

  * DataLoader draws the same seeded global order on every process but
    loads only its `process_slice` of each batch (1/P work per host);
  * shard_batch assembles the per-process slices into a globally
    batch-sharded array (`jax.make_array_from_process_local_data`);
  * a jitted global reduction over the mesh equals the single-process
    value computed from the full loader.

Run: python multihost_worker.py <port> <process_id> <result_path>
(a real file, not stdin — multiprocessing/spawn and jax.distributed both
misbehave under heredoc parents; see CLAUDE.md).
"""

import json
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')

port, pid, result_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epn_pointcloud_tpu.data.modelnet40 import DataLoader, Dataset  # noqa: E402
from epn_pointcloud_tpu.parallel import mesh as pmesh  # noqa: E402
from epn_pointcloud_tpu.parallel import distributed  # noqa: E402


class Toy(Dataset):
    def __len__(self):
        return 32

    def __getitem__(self, i):
        return {'pc': np.full((4, 3), float(i), np.float32),
                'label': np.int64(i)}


def main():
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4          # 2 per process

    dl = DataLoader(Toy(), batch_size=8, shuffle=True, seed=7)
    assert len(dl) == 4
    local_batches = list(iter(dl))
    assert len(local_batches) == 4
    for b in local_batches:
        assert b['pc'].shape == (4, 4, 3), b['pc'].shape   # 8/2 local rows

    # reference: the full (unsharded) stream a single process would see
    ref = DataLoader(Toy(), batch_size=8, shuffle=True, seed=7,
                     process_shard=False)
    full_batches = list(iter(ref))
    sl = distributed.process_slice(8)
    for lb, fb in zip(local_batches, full_batches):
        np.testing.assert_array_equal(lb['label'], fb['label'][sl])
        np.testing.assert_array_equal(lb['pc'], fb['pc'][sl])

    mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ('data', 'anchor'))
    g = pmesh.shard_batch(local_batches[0], mesh)
    assert g['pc'].shape == (8, 4, 3), g['pc'].shape       # global batch

    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(g['pc'])
    expected = float(full_batches[0]['pc'].sum())
    got = float(total)
    assert abs(got - expected) < 1e-5, (got, expected)

    with open(result_path, 'w') as f:
        json.dump({'ok': True, 'sum': got, 'expected': expected}, f)


if __name__ == '__main__':
    main()
