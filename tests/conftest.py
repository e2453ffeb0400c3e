import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
# exercised without TPU hardware (the driver separately dry-runs multichip).
# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS; only
# JAX_PLATFORM_NAME reliably forces the CPU backend.
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

jax.config.update('jax_default_matmul_precision', 'highest')
