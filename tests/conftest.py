"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that
numerical golden tests against scipy/numpy are meaningful.  Benchmarks
and production runs use the real TPU backend instead (see bench.py).

These environment variables must be set before jax is imported
anywhere, which pytest guarantees by importing conftest first.
"""
import os

# Force, not setdefault: the surrounding environment may pin a TPU
# platform (e.g. JAX_PLATFORMS=axon) and float32 defaults.  The env
# vars cover the case where jax is not yet imported; the config
# updates below cover the case where a site hook already imported jax
# (but no backend can have been initialized yet at conftest time).
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_ENABLE_X64'] = 'true'
os.environ.setdefault('OMP_NUM_THREADS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
assert jax.devices()[0].platform == 'cpu'
assert len(jax.devices()) == 8, 'expected a virtual 8-device CPU mesh'
