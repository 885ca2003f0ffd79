"""Race NLMeans r=2/f=2 tile geometries under the pair-aware VMEM
model by forcing _TY/_TX caps and (where needed) the budget."""
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
import nd_tpu.ops.nlmeans_pallas as NP  # noqa: E402

cube = _make_cube(1024, 1024, 12)
x = jnp.asarray(cube)
mpix = 1024 * 1024 * 12 / 1e6
print('backend:', jax.default_backend(), flush=True)

sigma, h = 2.0, 3.0
ref = None

for name, budget, ty_cap, tx_cap in [
        ('r2f2_default', NP._VMEM_NL_BUDGET, NP._TY, NP._TX),
        ('r2f2_8x512', 12 << 20, 8, 512),
        ('r2f2_32x128', 12 << 20, 32, 128),
        ('r2f2_24x128', 12 << 20, 24, 128),
        ('r2f2_16x384', 13 << 20, 16, 384),
]:
    NP._VMEM_NL_BUDGET, NP._TY, NP._TX = budget, ty_cap, tx_cap
    try:
        out = np.asarray(NP.nlmeans_spatial_pallas(
            x, (2, 2), (2, 2), sigma, h, -1.0))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.abs(out - ref).max())
        t, _ = _time_loop(lambda a: NP.nlmeans_spatial_pallas(
            a, (2, 2), (2, 2), sigma, h, -1.0), x)
        print('%-16s %7.2f ms  %8.1f mpix/s  err %.1e'
              % (name, t * 1e3, mpix / t, err), flush=True)
    except Exception as e:
        s = str(e)
        i = s.find('Mosaic')
        print(name, 'ERR:', (s[i:i + 300] if i >= 0 else
                             s[:300]).replace('\n', ' | '), flush=True)
