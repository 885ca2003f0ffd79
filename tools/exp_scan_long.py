"""Measure the long-series omnibus exact path on-chip at the BENCH
shapes (also prewarms the persistent compile cache for the driver's
bench run)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from bench import _make_cube, _sync
import nd_tpu
from nd_tpu.ops.change import (change_detection, change_detection_exact,
                               _change_detection_exact_core,
                               _patch_capacity)
print('backend:', jax.default_backend(), flush=True)

for KL, lny, lnx in ((56, 256, 512), (200, 128, 512)):
    cube = jnp.asarray(_make_cube(lny, lnx, KL, seed=2))
    mpix = lny * lnx * KL / 1e6
    t0 = time.time()
    out = change_detection_exact(cube, 0.99, n=9)
    _sync(out)
    print('k=%d first call (compile+run): %.1fs' % (KL, time.time()-t0),
          flush=True)
    t0 = time.time()
    out = change_detection_exact(cube, 0.99, n=9)
    _sync(out)
    dt = time.time()-t0
    ref = change_detection(cube, alpha=0.99, n=9, stat_dtype='mixed')
    mism = float(np.asarray(jnp.mean((out != ref).astype(jnp.float32))))
    _, nsus = _change_detection_exact_core(cube, 0.99, 9, 3e-4,
                                           _patch_capacity(lny, lnx))
    print('k=%d: %.3fs = %.1f Mpix/s  mismatch=%.2e suspects=%d'
          % (KL, dt, mpix/dt, mism, int(nsus)), flush=True)
