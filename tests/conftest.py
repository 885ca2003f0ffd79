"""Test configuration: run everything on a simulated 8-device CPU mesh.

Real-hardware benchmarks run via bench.py on the TPU; the test suite
validates numerics and sharding semantics on virtual CPU devices
(the same XLA programs, minus the ICI).
"""

import os

import re as _re

# force EXACTLY 8 virtual devices: a pre-existing device-count flag
# with another value would silently break every mesh-sharding test
_flags = os.environ.get('XLA_FLAGS', '')
_flags = _re.sub(r'--xla_force_host_platform_device_count=\d+', '',
                 _flags).strip()
os.environ['XLA_FLAGS'] = (
    _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

# The environment may pre-register an accelerator platform; force CPU for
# the unit-test suite regardless.
jax.config.update('jax_platforms', 'cpu')

import nd_tpu  # noqa: E402,F401  (enables x64)
