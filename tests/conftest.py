"""Test configuration: CPU backend, 8 virtual devices, float64 oracles.

Tests run on the CPU backend with x64 enabled so results can be compared
bit-for-bit against reference prysm (NumPy, float64).  Multi-chip sharding
tests use the 8 virtual CPU devices.  The reference library at
/root/reference is importable as `prysm` for oracle comparisons (read-only).
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'  # env presets axon (TPU); tests need CPU/f64
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# sitecustomize (axon TPU tunnel) imports jax before this file runs, so the
# env var alone is read too late -- force the platform through the config.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

REFERENCE_PATH = '/root/reference'
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
