"""Multi-host input-sharding tests.

In-process: DataLoader/process_slice behavior under a monkeypatched
2-process environment. Subprocess: a REAL 2-process jax.distributed CPU
cluster (tests/multihost_worker.py) driving DataLoader -> shard_batch ->
jitted global reduction, asserting each process loads exactly 1/P of the
batch and the global value equals single-process.

Replaces the reference's nn.DataParallel input path
(ref: vgtk/app/trainer.py:153-160); SURVEY §2.5 multi-host DCN.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from epn_pointcloud_tpu.data.modelnet40 import DataLoader, Dataset
from epn_pointcloud_tpu.parallel import distributed

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


class _Toy(Dataset):
    def __len__(self):
        return 20

    def __getitem__(self, i):
        return {'x': np.full((2,), float(i), np.float32),
                'label': np.int64(i)}


def test_loader_process_sharding_unit(monkeypatch):
    """Each fake process sees the same global order but only its slice."""
    streams = {}
    for pid in (0, 1):
        monkeypatch.setattr(distributed, 'process_env', lambda p=pid: (2, p))
        dl = DataLoader(_Toy(), batch_size=4, shuffle=True, seed=3)
        assert len(dl) == 5
        streams[pid] = list(iter(dl))

    monkeypatch.setattr(distributed, 'process_env', lambda: (1, 0))
    full = list(iter(DataLoader(_Toy(), batch_size=4, shuffle=True, seed=3)))
    assert len(streams[0]) == len(full)
    for b0, b1, fb in zip(streams[0], streams[1], full):
        assert b0['x'].shape[0] == 2 and b1['x'].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([b0['label'], b1['label']]), fb['label'])


def test_loader_short_batches_dropped_multihost(monkeypatch):
    """Short final batches are dropped under multi-host even without
    drop_last (a replicated put of host-local data would be wrong)."""
    monkeypatch.setattr(distributed, 'process_env', lambda: (2, 0))
    dl = DataLoader(_Toy(), batch_size=8, shuffle=False, drop_last=False)
    assert len(dl) == 2                      # 20 // 8, tail dropped
    assert len(list(iter(dl))) == 2

    monkeypatch.setattr(distributed, 'process_env', lambda: (1, 0))
    dl1 = DataLoader(_Toy(), batch_size=8, shuffle=False, drop_last=False)
    assert len(list(iter(dl1))) == 3         # single process keeps the tail


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_end_to_end(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({'JAX_PLATFORMS': 'cpu', 'JAX_PLATFORM_NAME': 'cpu',
                'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
                'PYTHONPATH': os.path.dirname(TESTS_DIR)})
    worker = os.path.join(TESTS_DIR, 'multihost_worker.py')
    procs, results = [], []
    for pid in (0, 1):
        res = tmp_path / f'result{pid}.json'
        results.append(res)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(res)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode(errors='replace'))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for res in results:
        data = json.loads(res.read_text())
        assert data['ok'], data
        assert abs(data['sum'] - data['expected']) < 1e-5
