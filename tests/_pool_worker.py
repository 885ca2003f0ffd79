"""Module-level (hence picklable) workers for the process-pool tests.

Spawned ProcessPoolExecutor workers unpickle functions by qualified
name, so the chunk functions must live in an importable module rather
than a test body.
"""

import numpy as np


def smooth_chunk(ds):
    """Pure-numpy 3-point running mean along y (buffer=1 halo)."""
    out = ds.copy(deep=True)
    for name in ds.data_vars:
        v = np.asarray(ds[name].values, np.float64)
        padded = np.pad(v, [(1, 1)] + [(0, 0)] * (v.ndim - 1),
                        mode='edge')
        sm = (padded[:-2] + padded[1:-1] + padded[2:]) / 3.0
        out[name] = (ds[name].dims, sm.astype(v.dtype))
    return out


def affine_chunk(ds, scale, offset=0.0):
    """Elementwise affine map — exercises args/kwargs pickling."""
    return ds * scale + offset


def burn_cpu_chunk(ds, spins=40):
    """GIL-free numpy compute burner for the multi-core speedup test."""
    acc = None
    for name in ds.data_vars:
        v = np.asarray(ds[name].values, np.float64)
        for _ in range(spins):
            v = np.sqrt(np.abs(v) + 1.0)
        acc = v if acc is None else acc + v
    out = ds.copy(deep=True)
    first = list(ds.data_vars)[0]
    out[first] = (ds[first].dims, acc)
    return out
