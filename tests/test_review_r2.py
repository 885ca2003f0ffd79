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


def test_host_conv_integer_dtype_matches_oracle():
    """Integer arrays must produce the _scipy_convolve-oracle result
    (kernel cast to the array dtype, i.e. truncated) on every route —
    the float64 separable fast path would silently differ."""
    import scipy.ndimage as ndi

    from nd_tpu.ops.conv import convolve

    rng = np.random.RandomState(0)
    arr = (rng.rand(40, 40) * 400).astype(np.uint16)
    k = np.ones((3, 3)) / 9.0
    out = convolve(arr, k, axes=(0, 1))
    expect = ndi.convolve(arr, k.astype(np.uint16), mode='reflect')
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_probe_not_spawned_for_small_calls():
    from nd_tpu.ops.conv import _HostDevicePlacement

    p = _HostDevicePlacement()
    p.record('host', 4 << 20, 0.1)
    p.n = 1
    ran = []
    p.maybe_probe_device(lambda: ran.append(1), 32 << 10)  # 32 KB
    assert not p._probing and ran == []


def test_overview_respects_declared_nodata():
    import os
    import tempfile

    from nd_tpu.io.geotiff import TiffFile, write_geotiff

    data = np.full((1, 4, 4), -9999.0, np.float32)
    data[0, 0, 0] = 100.0
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'nd.tif')
        write_geotiff(path, data, nodata=-9999, overviews=[2])
        with TiffFile(path) as t:
            ov = t.read_overview(0)
    assert ov[0, 0, 0] == 100.0      # sole valid sample survives
    assert ov[0, 1, 1] == -9999.0    # all-nodata block stays nodata


def test_ortho_inverse_limb_roundtrip():
    """Points the ellipsoidal forward produces (incl. rho slightly
    beyond the spherical unit disk) invert accurately or mask NaN —
    never silently wrong."""
    from nd_tpu.crs.proj import (ELLIPSOIDS, project_forward,
                                 project_inverse)

    wgs = ELLIPSOIDS['WGS84']
    p = {'proj': 'ortho', 'lat_0': 52.0, 'lon_0': 5.0,
         'x_0': 0.0, 'y_0': 0.0}
    rng = np.random.RandomState(1)
    lons = rng.uniform(-180, 180, 4000)
    lats = rng.uniform(-90, 90, 4000)
    X, Y = project_forward('ortho', lons, lats, wgs, p)
    vis = np.isfinite(X)
    lo, la = project_inverse('ortho', X[vis], Y[vis], wgs, p)
    ok = np.isfinite(lo)
    assert ok.mean() > 0.99          # only degenerate limb pixels drop
    dlo = np.abs((lo[ok] - lons[vis][ok] + 180) % 360 - 180)
    dla = np.abs(la[ok] - lats[vis][ok])
    err_m = np.hypot(dlo * 111320 * np.cos(np.radians(
        lats[vis][ok])), dla * 111320)
    assert np.percentile(err_m, 99) < 0.01    # sub-cm for the bulk
    assert err_m.max() < 500.0                # bounded at the limb


def test_map_over_tiles_dataarray_merge_shape(tmp_path):
    """merge=True on an fn returning a DataArray must come back as a
    Dataset (the NetCDF round-trip shape), not a DataArray."""
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.tiling import map_over_tiles, tile

    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 2})
    tile(ds, str(tmp_path), chunks={'y': 8})
    merged = map_over_tiles(str(tmp_path / '*.nc'),
                            lambda d: d['C11'], merge=True,
                            compute=True)
    assert isinstance(merged, Dataset)
    assert 'C11' in merged.data_vars


def test_to_file_nat_becomes_null(tmp_path):
    import json

    import pandas as pd

    from nd_tpu.vector import to_file
    from nd_tpu.vector.geometry import Point

    df = pd.DataFrame({'d': [pd.NaT]})
    df['geometry'] = [Point(1.0, 2.0)]
    path = str(tmp_path / 'nat.geojson')
    to_file(df, path)
    gj = json.load(open(path))
    assert gj['features'][0]['properties']['d'] is None


def test_open_rasterio_rejects_chunks_plus_overview(tmp_path):
    import pytest as _pytest

    from nd_tpu.io import open_rasterio
    from nd_tpu.io.geotiff import write_geotiff

    path = str(tmp_path / 'r.tif')
    write_geotiff(path, np.zeros((1, 32, 32), np.float32),
                  overviews=[2])
    with _pytest.raises(ValueError):
        open_rasterio(path, chunks={}, overview_level=0)


def test_coregister_integer_and_mixed_dtypes():
    """All-integer datasets must coregister to real values (they came
    back all zeros: the cubic taps truncated to the int dtype), and
    every variable keeps its OWN dtype after the stacked warp."""
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.warp import _coregister

    rng = np.random.RandomState(0)
    base = (rng.rand(16, 16) * 200).astype(np.float64)
    cube_f = np.stack([base, np.roll(base, (1, 2), (0, 1))])
    ds = Dataset({
        'C11': (('time', 'y', 'x'), cube_f),
        'counts': (('time', 'y', 'x'),
                   (cube_f * 3).astype(np.int32)),
        'f32v': (('time', 'y', 'x'), cube_f.astype(np.float32)),
    }, coords={'time': np.arange(2), 'y': np.arange(16.0),
               'x': np.arange(16.0)})
    out = _coregister(ds, reference=0, upsampling=20)
    c = np.asarray(out['counts'].values)
    assert c.dtype == np.int32
    assert np.abs(c).sum() > 0            # was all zeros
    assert np.asarray(out['f32v'].values).dtype == np.float32
    assert np.asarray(out['C11'].values).dtype == np.float64
    # interior of the realigned slice matches the master
    interior = np.s_[4:-4, 4:-4]
    a = np.asarray(out['C11'].values)[1][interior]
    b = cube_f[0][interior]
    assert np.nanmax(np.abs(a - b)) < 1.0


def test_coregister_order_parameter_honored():
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.warp import _coregister

    rng = np.random.RandomState(1)
    base = rng.rand(16, 16)
    cube = np.stack([base, np.roll(base, 1, 0)])
    ds = Dataset({'C11': (('time', 'y', 'x'), cube)},
                 coords={'time': np.arange(2), 'y': np.arange(16.0),
                         'x': np.arange(16.0)})
    out3 = _coregister(ds, reference=0, upsampling=10, order=3)
    out1 = _coregister(ds, reference=0, upsampling=10, order=1)
    a3 = np.asarray(out3['C11'].values)
    a1 = np.asarray(out1['C11'].values)
    assert np.isfinite(a1).all()
    # different spline orders produce measurably different resamples
    assert np.abs(a3 - a1).max() > 1e-6


def test_map_coordinates_integer_bilinear():
    from nd_tpu.ops.interp import map_coordinates

    raster = np.arange(25, dtype=np.int32).reshape(5, 5)
    out = np.asarray(map_coordinates(raster, np.array([1.5]),
                                     np.array([2.5])))
    # true bilinear midpoint, not 0/1-truncated weights
    assert abs(float(out[0]) - (7 + 8 + 12 + 13) / 4.0) < 1e-5
    # default NaN cval representable in the promoted output
    out2 = np.asarray(map_coordinates(raster, np.array([99.0]),
                                      np.array([0.0])))
    assert np.isnan(out2[0])


def test_translate_batch_integer_and_routing(monkeypatch):
    """Public translate/translate_batch must resample integer images
    (taps truncated to the int dtype before — all zeros), and host
    routing honors the ND_TPU_HOST_FILTER pin via choose()."""
    from nd_tpu.ops.fft import translate, translate_batch

    img = (np.arange(64, dtype=np.int32).reshape(8, 8) * 3)
    out = np.asarray(translate_batch(img[None].astype(np.int32),
                                     np.array([[0.5, 0.5]])))
    assert out.dtype == np.int32
    assert np.abs(out).sum() > 0
    out1 = np.asarray(translate(img, (0.5, 0.5)))
    assert out1.dtype == np.int32 and np.abs(out1).sum() > 0
    # host pin: no device dispatch at all
    monkeypatch.setenv('ND_TPU_HOST_FILTER', 'always')
    out2 = np.asarray(translate_batch(
        img[None].astype(np.float64), np.array([[0.25, 0.0]])))
    assert np.isfinite(out2).all()


def test_cubic_shift_wild_values_saturate():
    """Shifts far beyond the image (e.g. a failed-registration
    sentinel) saturate to the edge instead of overflowing to NaN."""
    from nd_tpu.ops.fft import translate, translate_batch

    img = np.random.RandomState(0).rand(1, 8, 8).astype(np.float32)
    out = np.asarray(translate_batch(img, np.array([[1e30, 0.0]])))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], np.broadcast_to(
        img[0][:, -1:], (8, 8)), rtol=1e-5)
    # the static path must not allocate a gigabyte pad either
    out2 = np.asarray(translate(img[0], (1e8, 0.0)))
    assert np.isfinite(out2).all()


def test_lazy_indexing_numpy_error_parity(tmp_path):
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.io import open_netcdf, to_netcdf

    ds = Dataset({'a': (('y', 'x'),
                        np.arange(12.0).reshape(3, 4))},
                 coords={'y': np.arange(3.0), 'x': np.arange(4.0)})
    p = str(tmp_path / 'l.nc')
    to_netcdf(ds, p)
    lazy = open_netcdf(p, chunks={})['a'].variable.data
    with pytest.raises(IndexError):
        lazy[0, 0, 0]                       # too many indices
    with pytest.raises(IndexError):
        lazy[1.5]                           # float index
    # bool scalar behaves like numpy (mask adding an axis)
    ref = np.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(lazy[True]), ref[True])


def test_eager_lazy_dtype_agreement_declared_fill(tmp_path):
    """A DECLARED fill fixes the decoded dtype whether or not fills
    occur — eager and lazy opens must agree (xarray semantics)."""
    import h5py

    p = str(tmp_path / 'df.nc')
    with h5py.File(p, 'w') as f:
        d = f.create_dataset('v', data=np.array([1, 2, 3], np.int16))
        d.attrs['_FillValue'] = np.int16(-9999)   # declared, unused
        d.make_scale('v')

    from nd_tpu.io import open_netcdf
    eager = open_netcdf(p)
    lazy = open_netcdf(p, chunks={})
    ev = np.asarray((eager['v'] if 'v' in eager.data_vars
                     else eager.coords['v']).values)
    lv = np.asarray((lazy['v'] if 'v' in lazy.data_vars
                     else lazy.coords['v']).values)
    assert ev.dtype == lv.dtype
    assert ev.dtype.kind == 'f'
    np.testing.assert_array_equal(ev, lv)


def test_aux_coords_promoted_eagerly_under_chunks(tmp_path):
    """CF 'coordinates' variables become EAGER coords even on a lazy
    open — coords index everything and need arithmetic."""
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.io import open_netcdf, to_netcdf

    lat = np.linspace(40, 41, 12).reshape(3, 4)
    lon = np.linspace(5, 6, 12).reshape(3, 4)
    ds = Dataset({'v': (('y', 'x'), np.ones((3, 4), np.float32))},
                 coords={'y': np.arange(3.0), 'x': np.arange(4.0)})
    ds.coords['lat'] = (('y', 'x'), lat)
    ds.coords['lon'] = (('y', 'x'), lon)
    p = str(tmp_path / 'aux.nc')
    to_netcdf(ds, p)
    back = open_netcdf(p, chunks={}, rename_latlon=False)
    cl = back.coords['lat'].variable.data if 'lat' in back._coords \
        else back['lat'].variable.data
    assert isinstance(np.asarray(cl), np.ndarray)
    assert isinstance(cl, np.ndarray)        # eager, not a lazy view
    # arithmetic works
    _ = np.asarray(cl) + 0.5


# ---------------------------------------------------------------------------
# CRS review fixes (round 2, third review pass)
# ---------------------------------------------------------------------------

def test_wkt2_polar_stereographic_variant_b_south():
    """EPSG:3031-style WKT2 (standard parallel -71, no lat_0) must
    project with the SOUTH-polar aspect."""
    from nd_tpu.crs import CRS
    from nd_tpu.crs.proj import project_forward

    wkt = ('PROJCRS["WGS 84 / Antarctic Polar Stereographic",'
           'BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
           'ELLIPSOID["WGS 84",6378137,298.257223563]]],'
           'CONVERSION["Antarctic Polar Stereographic",'
           'METHOD["Polar Stereographic (variant B)"],'
           'PARAMETER["Latitude of standard parallel",-71],'
           'PARAMETER["Longitude of origin",0],'
           'PARAMETER["False easting",0],'
           'PARAMETER["False northing",0]],'
           'CS[Cartesian,2],LENGTHUNIT["metre",1]]')
    crs = CRS.from_string(wkt)
    assert crs.params.get('lat_0') == -90.0
    x, y = project_forward('stere', np.array([0.0]),
                           np.array([-75.0]), crs.ellipsoid,
                           crs.params)
    # agrees with the registered EPSG:3031 definition
    ref = CRS.from_epsg(3031)
    xr_, yr = project_forward('stere', np.array([0.0]),
                              np.array([-75.0]), ref.ellipsoid,
                              ref.params)
    assert abs(y[0] - yr[0]) < 1e-6 and abs(x[0] - xr_[0]) < 1e-6


def test_wkt_linear_units_feet():
    """A US-survey-foot PROJCS must not be treated as meters."""
    from nd_tpu.crs import CRS, transform_coords

    ft = 1200.0 / 3937.0
    wkt = ('PROJCS["ftcrs",GEOGCS["WGS 84",DATUM["WGS84",'
           'SPHEROID["WGS 84",6378137,298.257223563],'
           'TOWGS84[0,0,0,0,0,0,0]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["latitude_of_origin",0],'
           'PARAMETER["central_meridian",-120],'
           'PARAMETER["scale_factor",0.9996],'
           'PARAMETER["false_easting",1640416.666666667],'
           'PARAMETER["false_northing",0],'
           'UNIT["US survey foot",%.15f]]' % ft)
    crs = CRS.from_string(wkt)
    assert abs(crs.params['to_meter'] - ft) < 1e-12
    assert abs(crs.params['x_0'] - 500000.0) < 0.01   # meters
    xf, yf = transform_coords('epsg:4326', crs, np.array([-120.0]),
                              np.array([45.0]))
    xm, ym = transform_coords(
        'epsg:4326',
        '+proj=tmerc +lat_0=0 +lon_0=-120 +k=0.9996 +x_0=500000 '
        '+y_0=0 +ellps=WGS84 +datum=WGS84',
        np.array([-120.0]), np.array([45.0]))
    # foot coordinates = meter coordinates / to_meter
    assert abs(xf[0] - xm[0] / ft) < 0.01
    assert abs(yf[0] - ym[0] / ft) < 0.01
    # round-trips both directions and through WKT
    back = CRS.from_string(crs.to_wkt())
    assert back == crs


def test_legacy_sphere_webmercator_nadgrids_null():
    """The classic '+proj=merc +a=6378137 +b=6378137 +nadgrids=@null'
    string must match EPSG:3857 (no spurious sphere->WGS84 datum
    conversion — it was ~30 km off)."""
    from nd_tpu.crs import transform_coords

    legacy = ('+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 '
              '+x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +no_defs')
    x1, y1 = transform_coords('epsg:4326', legacy, np.array([10.0]),
                              np.array([45.0]))
    x2, y2 = transform_coords('epsg:4326', 'epsg:3857',
                              np.array([10.0]), np.array([45.0]))
    assert abs(y1[0] - y2[0]) < 1.0
    assert abs(x1[0] - x2[0]) < 1.0


def test_geos_equality_includes_height_and_sweep():
    from nd_tpu.crs import CRS

    a = CRS({'proj': 'geos', 'lon_0': -75, 'h': 35786023,
             'sweep': 'x', 'ellps': 'WGS84'})
    b = CRS({'proj': 'geos', 'lon_0': -75, 'h': 42164000,
             'sweep': 'y', 'ellps': 'WGS84'})
    assert a != b


def test_unknown_datum_raises_not_silent_zero():
    from nd_tpu.crs import CRS, transform_coords

    crs = CRS.from_proj4('+proj=longlat +datum=carthage')
    assert crs != CRS.from_epsg(4326)      # not silently WGS84
    with pytest.raises(NotImplementedError):
        transform_coords(crs, 'epsg:4326', np.array([10.0]),
                         np.array([36.0]))
    # same unknown datum on both sides needs no shift: fine
    x, y = transform_coords(
        crs, '+proj=merc +datum=carthage +ellps=WGS84',
        np.array([10.0]), np.array([36.0]))
    assert np.isfinite(x).all()


def test_eqc_standard_parallel():
    from nd_tpu.crs.proj import (ELLIPSOIDS, project_forward,
                                 project_inverse)

    wgs = ELLIPSOIDS['WGS84']
    p = {'proj': 'eqc', 'lat_ts': 30.0, 'lat_0': 10.0, 'lon_0': 0.0,
         'x_0': 0.0, 'y_0': 0.0}
    x, y = project_forward('eqc', np.array([10.0]), np.array([45.0]),
                           wgs, p)
    import math
    assert abs(x[0] - wgs.a * math.radians(10.0)
               * math.cos(math.radians(30.0))) < 1e-6
    assert abs(y[0] - wgs.a * math.radians(35.0)) < 1e-6
    lo, la = project_inverse('eqc', x, y, wgs, p)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 45.0) < 1e-9


def test_init_override_voids_epsg_code():
    from nd_tpu.crs import CRS

    tweaked = CRS({'init': 'epsg:32633', 'lon_0': 12})
    assert tweaked.to_epsg() is None
    assert 'AUTHORITY["EPSG","32633"]' not in tweaked.to_wkt()
    same = CRS({'init': 'epsg:32633'})
    assert same.to_epsg() == 32633


def test_spheroid_near_sphere_radius_no_crash():
    from nd_tpu.crs import CRS

    wkt = ('GEOGCS["odd",DATUM["u",SPHEROID["z",6370997,298.0],'
           'TOWGS84[0,0,0,0,0,0,0]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]]')
    crs = CRS.from_string(wkt)   # used to ZeroDivisionError
    assert abs(crs.ellipsoid.a - 6370997) < 1.0


# ---------------------------------------------------------------------------
# rasterize / zarr / tracing review fixes (round 2, fourth review pass)
# ---------------------------------------------------------------------------

def test_rasterize_generator_and_nan_fill():
    from nd_tpu.ops.rasterize import rasterize_values
    from nd_tpu.vector.geometry import Polygon

    sq = Polygon([(1.0, 1.0), (4.0, 1.0), (4.0, 4.0), (1.0, 4.0),
                  (1.0, 1.0)])
    xs = np.arange(6) + 0.5
    ys = np.arange(6) + 0.5
    gen = ((g, v) for g, v in [(sq, 5)])
    out = np.asarray(rasterize_values(gen, xs, ys))
    assert (out == 5).sum() == 9             # generators burn too
    out2 = np.asarray(rasterize_values([(sq, 5)], xs, ys,
                                       fill=np.nan))
    assert out2.dtype.kind == 'f'            # fill folded into dtype
    assert np.isnan(out2).sum() == 36 - 9


def test_polygon_mask_blocked_matches_unblocked():
    """Edge/row blocking must not change results (and must bound the
    broadcast temporaries for big polygons)."""
    import math

    from nd_tpu.ops.rasterize import polygon_mask
    from nd_tpu.vector.geometry import Polygon

    ang = np.linspace(0, 2 * np.pi, 1501)
    poly = Polygon(list(zip(100 + 80 * np.cos(ang),
                            100 + 80 * np.sin(ang))))
    xs = np.arange(200) + 0.5
    ys = np.arange(200) + 0.5
    m = np.asarray(polygon_mask(poly, xs, ys))
    assert abs(int(m.sum()) - math.pi * 80 * 80) < 120


def test_zarr_failed_rewrite_preserves_store(tmp_path):
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.io import open_zarr, to_zarr

    ds = Dataset({'v': (('y', 'x'), np.arange(12.0).reshape(3, 4))},
                 coords={'y': np.arange(3.0), 'x': np.arange(4.0)})
    p = str(tmp_path / 's.zarr')
    to_zarr(ds, p)
    # xarray's full-dim idiom must not be a destructive crash
    to_zarr(ds, p, chunks={'y': -1, 'x': 2})
    back = open_zarr(p)
    np.testing.assert_array_equal(back['v'].values,
                                  np.arange(12.0).reshape(3, 4))


def test_zarr_phantom_dims_do_not_collide(tmp_path):
    import json as _json
    import zlib as _zlib

    p = tmp_path / 'plain.zarr'
    p.mkdir()
    (p / '.zgroup').write_text(_json.dumps({'zarr_format': 2}))
    for name, shape in (('a', (3, 4)), ('b', (5, 6))):
        d = p / name
        d.mkdir()
        (d / '.zarray').write_text(_json.dumps({
            'zarr_format': 2, 'shape': list(shape),
            'chunks': list(shape), 'dtype': '<f8',
            'compressor': {'id': 'zlib', 'level': 1},
            'fill_value': 'NaN', 'order': 'C', 'filters': None}))
        raw = np.zeros(shape).tobytes()
        (d / '0.0').write_bytes(_zlib.compress(raw, 1))
    from nd_tpu.io import open_zarr
    ds = open_zarr(str(p))
    da, db = ds['a'].dims, ds['b'].dims
    assert set(da).isdisjoint(db)      # no shared phantom names
    assert dict(ds.sizes)[da[0]] == 3 and dict(ds.sizes)[db[0]] == 5


def test_zarr_user_coordinates_attr_survives(tmp_path):
    from nd_tpu.core.dataarray import Dataset
    from nd_tpu.io import open_zarr, to_zarr

    ds = Dataset({'v': (('y',), np.arange(3.0))},
                 coords={'y': np.arange(3.0)})
    ds._variables['v'].attrs['coordinates'] = 'not actual arrays'
    p = str(tmp_path / 'c.zarr')
    to_zarr(ds, p)
    back = open_zarr(p)
    assert back['v'].attrs.get('coordinates') == 'not actual arrays'


def test_trace_bare_decorator():
    from nd_tpu.tracing import trace

    @trace
    def work(x):
        return x * 2

    assert work(21) == 42

    @trace('named')
    def work2(x):
        return x + 1

    assert work2(1) == 2


# ---------------------------------------------------------------------------
# parallel / models review fixes (round 2, fifth review pass)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def mesh8():
    from nd_tpu.parallel import get_mesh
    return get_mesh()


def test_apply_sharded_big_halo_small_axis(mesh8):
    """A filter whose halo exceeds an axis must work sharded exactly
    like serial (the fitted 1-shard axis previously still went
    through halo_pad and crashed)."""
    from nd_tpu.filters import GaussianFilter
    from nd_tpu.parallel.engine import apply_sharded
    from nd_tpu.testing import (assert_equal_data,
                                generate_test_dataset)

    ds = generate_test_dataset(dims={'y': 10, 'x': 64, 'time': 2})
    algo = GaussianFilter(sigma=3.0)      # halo 12 > y size 10
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh8)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_make_sharded_step_non_divisible_grid(mesh8):
    """make_sharded_step(shape=...) fits the mesh to divisor counts so
    a 17x19 grid compiles instead of being rejected."""
    import jax

    from nd_tpu.models import SARChangePipeline

    pipe = SARChangePipeline(ml=3, n=1, alpha=0.99)
    rng = np.random.RandomState(0)
    cube = np.abs(rng.rand(17, 19, 6, 4)).astype(np.float32) + 0.1
    labels = rng.randint(0, 2, size=(17, 19))
    params = pipe.init_params(seed=0)
    step, ds_shard, lb_shard = pipe.make_sharded_step(
        mesh8, shape=cube.shape[:2])
    cube_d = jax.device_put(cube, ds_shard)
    lab_d = jax.device_put(labels, lb_shard)
    new_params, loss = step(params, cube_d, lab_d)
    # matches the single-device step
    ref_params, ref_loss = pipe.train_step(params, cube, labels)
    assert abs(float(loss) - float(ref_loss)) < 1e-4


def test_checkpointer_wait_semantics(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    from nd_tpu.models.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / 'ck'))
    state = {'w': np.arange(4.0)}
    ck.save(0, state)                  # async kick-off
    back = ck.restore(like=state)      # restore waits internally
    np.testing.assert_array_equal(back['w'], state['w'])
    ck.close()
