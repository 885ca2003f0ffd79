"""Regression tests for the round-2 self-review findings."""

import os
import warnings

import numpy as np
import pytest

import jax.numpy as jnp


def test_lazy_fill_masked_int_dtype_is_stable(tmp_path):
    """A declared fill sentinel must give EVERY slab (and the declared
    dtype) float64 — not int for fill-free slabs and float for others."""
    import h5py

    from nd_tpu.io import open_netcdf
    from nd_tpu.io.lazy import LazyNetCDFArray

    path = str(tmp_path / 'f.nc')
    raw = np.arange(24, dtype=np.int16).reshape(4, 6)
    raw[3, 2] = -99                      # fill only in the last row
    with h5py.File(path, 'w') as f:
        d = f.create_dataset('v', data=raw)
        d.attrs['_FillValue'] = np.int16(-99)
    lazy = open_netcdf(path, rename_latlon=False, chunks={})
    arr = lazy['v'].data
    assert isinstance(arr, LazyNetCDFArray)
    assert arr.dtype == np.float64
    head = np.asarray(arr[0:2])          # no fills in this slab
    assert head.dtype == np.float64
    np.testing.assert_array_equal(head, raw[0:2].astype(np.float64))
    tail = np.asarray(arr[3:4])
    assert tail.dtype == np.float64
    assert np.isnan(tail[0, 2])


def test_map_over_tiles_accepts_none_workers(tmp_path):
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.io import to_netcdf
    from nd_tpu.tiling import map_over_tiles

    for i in range(3):
        ds = Dataset({'a': (('x',), np.full(4, float(i)))},
                     coords={'x': np.arange(4) + 4 * i})
        to_netcdf(ds, str(tmp_path / ('t%d.nc' % i)))
    outs = map_over_tiles(str(tmp_path / 't*.nc'), lambda d: d,
                          merge=False, compute=True, max_workers=None)
    assert len(outs) == 3


def test_translate_batch_saturates_large_shifts_exactly():
    from nd_tpu.ops.fft import _translate_batch_device

    rng = np.random.RandomState(0)
    img = rng.rand(1, 12, 16)
    for dx in (12.0, 40.0, -25.0):
        out = np.asarray(_translate_batch_device(
            jnp.asarray(img), jnp.asarray([[dx, 0.0]])))
        cols = np.clip(np.arange(16) + int(dx), 0, 15)
        np.testing.assert_allclose(out[0], img[0][:, cols],
                                   atol=1e-12)
    # host twin agrees on the same saturation
    from nd_tpu.ops.fft import _shift_axis_cubic_host
    out_h = _shift_axis_cubic_host(img, np.array([40.0]), 2)
    np.testing.assert_allclose(
        out_h[0], img[0][:, np.full(16, 15)], atol=1e-12)


def test_placement_discards_first_device_sample_per_key():
    from nd_tpu.ops.conv import _HostDevicePlacement

    p = _HostDevicePlacement()
    mb = 4 << 20
    p.record('device', mb, 10.0, key=('conv', (1, 64, 64)))   # compile
    assert p.rates['device'] is None
    p.record('device', mb, 0.01, key=('conv', (1, 64, 64)))   # steady
    first = p.rates['device']
    assert first is not None
    # a NEW executable's compile-bearing sample is also discarded
    p.record('device', mb, 30.0, key=('sep', (1, 64, 64)))
    assert p.rates['device'] == first
    p.record('device', mb, 0.01, key=('sep', (1, 64, 64)))
    assert p.rates['device'] >= first * 0.5


def test_hybrid_failures_feed_the_circuit_breaker(monkeypatch):
    import jax

    from nd_tpu.ops import change as change_mod
    from nd_tpu.ops import pallas_guard
    from nd_tpu.ops.pallas_guard import (pallas_disabled,
                                         reset_pallas_strikes)

    reset_pallas_strikes()
    try:
        rng = np.random.RandomState(1)
        vals = np.abs(rng.normal(1, 0.2, (4, 8, 5, 4))) \
            .astype(np.float32)
        expected = np.asarray(change_mod.change_detection(
            vals, alpha=0.99, n=9, stat_dtype='mixed'))

        def raising_impl(*a, **kw):
            raise jax.errors.JaxRuntimeError(
                'INTERNAL: TPU backend error')

        monkeypatch.setattr(change_mod, '_change_detection_hybrid',
                            raising_impl)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            for _ in range(pallas_guard._MAX_STRIKES):
                out = change_mod.change_detection_hybrid(
                    vals, alpha=0.99, n=9)
                np.testing.assert_array_equal(out, expected)
        # repeated hybrid launch failures now trip the session-wide
        # breaker (they previously never counted)
        assert pallas_disabled()
    finally:
        reset_pallas_strikes()


def test_placement_never_routes_serving_to_unmeasured_device():
    """The serving path must not block on an unmeasured device: on a
    loaded remote tunnel one dispatch can stall for minutes (the
    round-2 out-of-core regression). Devices are measured by a
    background probe instead."""
    import time

    from nd_tpu.ops.conv import _HostDevicePlacement

    p = _HostDevicePlacement()
    mb = 4 << 20
    # nothing measured: big calls go host, never device
    for _ in range(5):
        assert p.choose(mb) == 'host'
    p.record('host', mb, 0.1)
    assert p.choose(mb) == 'host'
    # a measured, faster device wins
    p.record('device', mb, 10.0, key='k')     # compile-bearing, dropped
    p.record('device', mb, 0.01, key='k')
    assert p.choose(mb) == 'device'
    # background probe runs the thunk off-thread and completes
    ran = []
    p2 = _HostDevicePlacement()
    p2.record('host', mb, 0.1)
    p2.n = 1
    p2.maybe_probe_device(lambda: ran.append(1), mb)
    for _ in range(100):
        if not p2._probing:
            break
        time.sleep(0.01)
    assert ran == [1, 1]          # two passes (first bears compile)


def test_scipy_convolve_transposed_axes_parity():
    """Kernel dims must land on their axes even when `axes` is not
    ascending (transposed layouts) — a plain reshape scattered them."""
    import scipy.ndimage as ndi

    from nd_tpu.ops.conv import _scipy_convolve

    rng = np.random.RandomState(0)
    arr = rng.rand(5, 7, 6).astype(np.float64)
    k = rng.rand(3, 5)
    out = _scipy_convolve(arr, k, axes=(2, 1), mode='reflect', cval=0)
    # oracle: kernel dim 0 on axis 2, dim 1 on axis 1
    w = np.transpose(k, (1, 0)).reshape(1, 5, 3)
    expect = ndi.convolve(arr, w, mode='reflect')
    np.testing.assert_allclose(out, expect, rtol=1e-12)
