"""Logger / Summary / Timer (rebuild of vgtk/vgtk/app/{logger,summary,timer}.py)."""

from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np


class Logger:
    """python-logging to stdout + optional file, '#ts# [Scope] msg' format
    (ref: logger.py:11-38)."""

    _counter = 0

    def __init__(self, log_file=None, log_level=logging.DEBUG):
        Logger._counter += 1
        self.logger = logging.getLogger(f'epn_tpu_{Logger._counter}')
        self.logger.setLevel(log_level)
        self.logger.handlers.clear()
        fmt = logging.Formatter('#%(asctime)s# %(message)s', '%y-%m-%d %H:%M:%S')
        # EPN_LOG_STREAM=stderr keeps stdout clean for machine-readable
        # output (bench.py's JSON metric contract); default matches the
        # reference's stdout logging (ref: logger.py:11-38)
        stream = (sys.stderr if os.environ.get('EPN_LOG_STREAM') == 'stderr'
                  else sys.stdout)
        console = logging.StreamHandler(stream)
        console.setFormatter(fmt)
        self.logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
        self.logger.propagate = False

    def log(self, scope, msg):
        self.logger.info(f'[{scope}] {msg}')

    def warning(self, scope, msg):
        self.logger.warning(f'[{scope}] {msg}')

    def debug(self, scope, msg):
        self.logger.debug(f'[{scope}] {msg}')

    def error(self, scope, msg):
        self.logger.error(f'[{scope}] {msg}')


class Summary:
    """EMA scalar channels, momentum 0.9 (ref: summary.py:3-28).

    update_async() accepts on-device scalars (jax arrays) and defers the
    host read: JAX dispatch is asynchronous, so a float() per step would
    block the host on the device result and serialize batch preparation
    against device compute (one host core). Pending values are converted
    in submission order at the next read (get/get_item/update) — by log
    time they are long since ready, so the flush costs nothing and the EMA
    is bit-identical to eager updates."""

    def __init__(self, momentum: float = 0.9):
        self.items = []
        self.running_stats = {}
        self.counters = {}
        self.momentum = momentum
        self._pending = []

    def register(self, keys):
        for k in keys:
            self.items.append(k)
            self.running_stats[k] = 0.0
            self.counters[k] = 0

    def update_async(self, stats):
        """Queue a per-step stats dict of host or device scalars."""
        self._pending.append(stats)
        if len(self._pending) > 512:
            # bound the held device buffers; entries this old are long
            # since computed, so the flush does not stall the pipeline
            self._flush()

    def _flush(self):
        pending, self._pending = self._pending, []
        if not pending:
            return
        # ONE batched device->host transfer for all pending device scalars:
        # on a remote-tunnel backend each readback costs a full round trip
        # (~25 ms) even when the value is ready, so per-scalar float() here
        # would cost flush_len * n_channels round trips
        device_vals = []
        slots = []              # (stats_idx, key, n_elems) per device value
        for i, stats in enumerate(pending):
            for k, v in stats.items():
                if hasattr(v, 'device') or hasattr(v, 'sharding'):
                    n = int(np.prod(v.shape)) if getattr(v, 'shape', ()) else 1
                    slots.append((i, k, n))
                    device_vals.append(v)
        if device_vals:
            import jax.numpy as jnp
            host = np.asarray(jnp.concatenate(
                [jnp.asarray(v, jnp.float32).reshape(-1)
                 for v in device_vals]))
            off = 0
            for (i, k, n), _ in zip(slots, device_vals):
                pending[i][k] = (float(host[off]) if n == 1
                                 else host[off:off + n])
                off += n
        for stats in pending:
            self._apply(stats)

    def _apply(self, stats):
        # vector values (the multi-step dispatch path queues [n_steps]
        # arrays per channel) apply as that many sequential EMA updates
        for k, v in stats.items():
            vals = (np.ravel(v).astype(np.float64)
                    if isinstance(v, np.ndarray) else (float(v),))
            for x in vals:
                x = float(x)
                if self.counters[k] == 0:
                    self.running_stats[k] = x
                else:
                    self.running_stats[k] = (
                        self.momentum * self.running_stats[k]
                        + (1 - self.momentum) * x)
                self.counters[k] += 1

    def update(self, stats):
        # no flush: each channel's EMA depends only on its own value order,
        # so eager channels (e.g. the per-iter 'Time') can interleave with
        # pending async ones without forcing a device sync here
        self._apply(stats)

    def get_item(self, k):
        self._flush()
        return self.running_stats[k]

    def get(self):
        self._flush()
        return '\t'.join(f'{k}: {self.get_item(k):.4f}' for k in self.items)


class Timer:
    """Named wall-clock checkpoints (ref: timer.py:3-17)."""

    def __init__(self):
        self._time = time.time()
        self._checkpoints = {}

    def set_point(self, pid='default'):
        self._checkpoints[pid] = time.time()

    def get_point(self, pid='default'):
        return time.time() - self._checkpoints[pid]

    def reset_point(self, pid='default'):
        dt = time.time() - self._checkpoints[pid]
        self._checkpoints[pid] = time.time()
        return dt
