"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import json
import os

import numpy as np
import pytest

from nd_tpu.core.dataarray import Dataset


def test_zarr_infinity_fill_on_int_dtype_degrades_to_no_fill(tmp_path):
    # a lenient writer's 'Infinity' fill on an integer dtype must not
    # crash open_zarr (OverflowError from float(inf) -> int)
    from nd_tpu.io.zarr import open_zarr, to_zarr
    ds = Dataset({'a': (('x',), np.arange(6, dtype=np.int32))},
                 coords={'x': np.arange(6)})
    store = str(tmp_path / 'store.zarr')
    to_zarr(ds, store)
    zpath = os.path.join(store, 'a', '.zarray')
    with open(zpath) as fh:
        meta = json.load(fh)
    meta['fill_value'] = 'Infinity'
    with open(zpath, 'w') as fh:
        json.dump(meta, fh)
    out = open_zarr(store)
    assert out['a'].values.tolist() == list(range(6))


def test_change_detection_exact_x64_off_routes_to_mixed(monkeypatch):
    # 'exact' must not silently rescan in f32: with x64 disabled it
    # must delegate to the XLA 'mixed' path instead of the device
    # rescan whose f64 math would degrade
    import jax

    from nd_tpu.ops import change as change_mod

    rng = np.random.RandomState(0)
    vals = np.abs(rng.normal(1, 0.2, size=(8, 128, 6, 4))) \
        .astype(np.float32)
    vals[..., 1] *= 0.1
    vals[..., 2] *= 0.1

    calls = {}
    real = change_mod.change_detection

    def spy(values, alpha, n=1, **kw):
        calls['stat_dtype'] = kw.get('stat_dtype')
        return real(values, alpha, n=n, **kw)

    monkeypatch.setattr(change_mod, 'change_detection', spy)
    x64 = jax.config.jax_enable_x64
    try:
        jax.config.update('jax_enable_x64', False)
        out = change_mod.change_detection_exact(
            vals, alpha=0.99, n=9, interpret=True)
    finally:
        jax.config.update('jax_enable_x64', x64)
    assert calls.get('stat_dtype') == 'mixed'
    assert np.asarray(out).shape == (8, 128, 6)


def test_tifffile_closes_file_handle(tmp_path):
    from nd_tpu.io.geotiff import TiffFile, write_geotiff
    path = str(tmp_path / 't.tif')
    write_geotiff(path, np.arange(12, dtype=np.float32).reshape(3, 4))
    t = TiffFile(path)
    arr = t.read()
    t.close()
    t.close()                       # idempotent
    assert t._fh is None and t._data is None
    assert arr.shape == (1, 3, 4)
    with TiffFile(path) as t2:
        arr2 = t2.read()
    assert t2._fh is None
    np.testing.assert_array_equal(arr, arr2)


def test_noarg_transpose_reverses_each_variables_own_dims():
    ds = Dataset({'a': (('y', 'x'), np.zeros((2, 3))),
                  'b': (('x', 'y'), np.arange(6.).reshape(3, 2))})
    out = ds.transpose()
    assert out['a'].dims == ('x', 'y')
    # xarray reverses b's OWN order ('x','y') -> ('y','x'); the old
    # global-order filter left it unchanged
    assert out['b'].dims == ('y', 'x')
    np.testing.assert_array_equal(out['b'].values,
                                  np.arange(6.).reshape(3, 2).T)
