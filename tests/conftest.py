import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
# exercised without TPU hardware (the driver separately dry-runs multichip).
# NOTE: /root/.axon_site/sitecustomize.py imports jax at interpreter startup,
# so env vars set here are too late for backend *registration* — but backend
# *initialization* is lazy, so jax.config.update below still wins. The env
# vars are kept for subprocesses spawned by tests.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', 'false')

# Numeric-parity tests need exact fp32 contractions (the TPU default runs
# fp32 matmuls as bf16 passes).
import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
assert jax.default_backend() == 'cpu', jax.default_backend()
assert jax.device_count() == 8, jax.device_count()


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest tests/` runs the fast default tier (<25 min);
    the multi-minute torch-oracle / entry-point parity tests are marked
    `heavy` and skipped unless EPN_HEAVY=1 (full suite) or `-m heavy`
    (heavy tier only) is given. Run the FULL suite before any snapshot:
    `EPN_HEAVY=1 python -m pytest tests/ -q`."""
    if os.environ.get('EPN_HEAVY') == '1':
        return
    if 'heavy' in (config.getoption('-m') or ''):
        return
    skip = pytest.mark.skip(
        reason='heavy tier: set EPN_HEAVY=1 or pass -m heavy')
    for item in items:
        if 'heavy' in item.keywords:
            item.add_marker(skip)
