"""Probe rowfused_convolve geometries on the chip: boxcar 3-tap and
gaussian 13-tap, shipped kernels as baselines; full error text for the
first failing config."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from bench import _time_loop, _make_cube  # noqa: E402
from nd_tpu.ops.conv import (convolve, separable_convolve,
                             gaussian_kernel1d)  # noqa: E402
from nd_tpu.ops.conv_pallas import rowfused_convolve  # noqa: E402

cube = _make_cube(1024, 1024, 12)
x = jnp.asarray(cube)
mpix = 1024 * 1024 * 12 / 1e6
print('backend:', jax.default_backend(), flush=True)

t, _ = _time_loop(lambda a: a + jnp.float32(1.0), x)
print('stream_add        %7.2f ms %8.1f mpix/s' % (t*1e3, mpix/t),
      flush=True)

k3 = jnp.ones((3, 3), jnp.float32) / 9
t, _ = _time_loop(lambda a: convolve(a, k3, axes=(0, 1)), x)
print('boxcar_shipped    %7.2f ms %8.1f mpix/s' % (t*1e3, mpix/t),
      flush=True)
box_ref = np.asarray(convolve(x, k3, axes=(0, 1)))

taps3 = [(0, np.ones(3)/3.0), (1, np.ones(3)/3.0)]
g = np.asarray(gaussian_kernel1d(1.5), np.float64)
gj = jnp.asarray(g, jnp.float32)
tapsg = [(0, g[::-1]), (1, g[::-1])]

t, _ = _time_loop(lambda a: separable_convolve(a, [gj, gj],
                                               axes=(0, 1)), x)
print('gauss_shipped     %7.2f ms %8.1f mpix/s' % (t*1e3, mpix/t),
      flush=True)
g_ref = np.asarray(separable_convolve(x, [gj, gj], axes=(0, 1)))

first_err = True
for name, taps, ref, ty, tc in [
        ('box_rf_64x2', taps3, box_ref, 64, 2),
        ('box_rf_64x3', taps3, box_ref, 64, 3),
        ('box_rf_64x4', taps3, box_ref, 64, 4),
        ('box_rf_32x6', taps3, box_ref, 32, 6),
        ('gauss_rf_8x1', tapsg, g_ref, 8, 1),
        ('gauss_rf_16x1', tapsg, g_ref, 16, 1),
        ('gauss_rf_32x1', tapsg, g_ref, 32, 1),
        ('gauss_rf_16x2', tapsg, g_ref, 16, 2),
        ('gauss_rf_32x2', tapsg, g_ref, 32, 2),
]:
    try:
        got = np.asarray(rowfused_convolve(x, taps, ty=ty, tc=tc))
        err = np.abs(got - ref).max()
        t, _ = _time_loop(lambda a, taps=taps, ty=ty, tc=tc:
                          rowfused_convolve(a, taps, ty=ty, tc=tc), x)
        print('%-18s %7.2f ms %8.1f mpix/s  err %.1e'
              % (name, t*1e3, mpix/t, err), flush=True)
    except Exception as e:
        s = str(e).replace('\n', ' | ')
        if first_err:
            print(name, 'ERR(full):', s[:2000], flush=True)
            first_err = False
        else:
            i = s.find('Mosaic')
            print(name, 'ERR:', (s[i:i+300] if i >= 0 else s[:300]),
                  flush=True)
