"""Test configuration: run everything on a simulated 8-device CPU mesh.

Real-hardware benchmarks run via bench.py on the TPU; the test suite
validates numerics and sharding semantics on virtual CPU devices
(the same XLA programs, minus the ICI).
"""

import os

os.environ.setdefault(
    'XLA_FLAGS',
    '--xla_force_host_platform_device_count=8')
if '--xla_force_host_platform_device_count' not in \
        os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] += \
        ' --xla_force_host_platform_device_count=8'
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

# The environment may pre-register an accelerator platform; force CPU for
# the unit-test suite regardless.
jax.config.update('jax_platforms', 'cpu')

import nd_tpu  # noqa: E402,F401  (enables x64)
