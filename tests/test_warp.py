"""Warp tests: CRS parsing, metadata extraction, reprojection
equivalences, resampling, alignment, coregistration."""

import os

import numpy as np
import pytest

import nd_tpu.warp as warp
from nd_tpu.crs import CRS, Affine
from nd_tpu.testing import (assert_equal_crs, assert_equal_data,
                            generate_test_dataset,
                            generate_test_dataarray)
from nd_tpu.warp import (Alignment, Coregistration, Reprojection,
                         Resample, get_bounds, get_crs, get_extent,
                         get_resolution, get_transform,
                         get_common_bounds, get_common_extent,
                         get_common_resolution, reproject, resample)

epsg4326 = CRS.from_epsg(4326)
epsg3395 = CRS.from_epsg(3395)
sinusoidal = CRS.from_string('+proj=sinu +lon_0=0 +x_0=0 +y_0=0 '
                             '+ellps=WGS84 +units=m')


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 20, 'x': 20, 'time': 5})


# ---------------------------------------------------------------------------
# CRS parsing and metadata extraction
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('crs_input', [
    'epsg:4326', '+init=epsg:4326', {'init': 'epsg:4326'}, 4326,
    epsg4326, epsg4326.wkt,
    '+proj=longlat +ellps=WGS84 +datum=WGS84',
])
def test_parse_crs(crs_input):
    assert_equal_crs(warp._parse_crs(crs_input), epsg4326)


def test_parse_crs_invalid():
    with pytest.raises(warp.CRSError):
        warp._parse_crs('not-a-crs')


def test_get_crs_from_attrs(ds):
    assert_equal_crs(get_crs(ds), epsg4326)


def test_get_crs_formats(ds):
    assert isinstance(get_crs(ds, format='proj'), str)
    assert isinstance(get_crs(ds, format='dict'), dict)
    assert get_crs(ds, format='wkt').startswith('GEOGCS')


def test_get_crs_from_coordinate_system_string(ds):
    wkt = epsg4326.wkt
    del ds.attrs['crs']
    ds.attrs['coordinate_system_string'] = wkt
    assert_equal_crs(get_crs(ds), epsg4326)


def test_get_crs_from_snap_style_variable(ds):
    """SNAP stores the CRS as attributes of a 'crs' data variable."""
    del ds.attrs['crs']
    ds['crs'] = ((), np.array(0, dtype=np.int32))
    ds['crs'].attrs  # variable attrs live on the Variable
    ds._variables['crs'].attrs['wkt'] = epsg4326.wkt
    assert_equal_crs(get_crs(ds), epsg4326)


def test_get_transform(ds):
    t = get_transform(ds)
    x = ds['x'].values
    y = ds['y'].values
    assert np.isclose(t.a, (x[-1] - x[0]) / (len(x) - 1))
    assert np.isclose(t.e, (y[-1] - y[0]) / (len(y) - 1))
    assert np.isclose(t.c, x[0])
    assert np.isclose(t.f, y[0])


def test_get_transform_from_metadata(ds):
    t = get_transform(ds)
    ds2 = ds.copy()
    del ds2._coords['x']
    del ds2._coords['y']
    t2 = warp._get_transform_from_metadata(ds2)
    assert t.almost_equals(t2, precision=1e-6)


def test_get_bounds_and_resolution(ds):
    b = get_bounds(ds)
    assert b.left == -10.0 and b.right == 0.0
    assert b.bottom == 50.0 and b.top == 60.0
    res = get_resolution(ds)
    assert np.allclose(res, (10 / 19, 10 / 19))


def test_get_extent(ds):
    e = get_extent(ds)
    assert np.allclose(tuple(e), (-10, 50, 0, 60))


def test_get_geometry(ds):
    geom = warp.get_geometry(ds)
    assert np.allclose(geom.bounds, (-10, 50, 0, 60))
    geom_m = warp.get_geometry(ds, crs=epsg3395)
    assert geom_m.bounds[0] < -1e6  # projected meters


def test_common_bounds_extent_resolution():
    ds1 = generate_test_dataset(extent=(-10, 50, 0, 60))
    ds2 = generate_test_dataset(extent=(-8, 52, 4, 62))
    cb = get_common_bounds([ds1, ds2])
    assert tuple(cb) == (-10, 50, 4, 62)
    ce = get_common_extent([ds1, ds2])
    assert np.allclose(tuple(ce), (-10, 50, 4, 62))
    res = get_common_resolution([ds1, ds2])
    assert np.allclose(res, np.minimum(get_resolution(ds1),
                                       get_resolution(ds2)))
    res_max = get_common_resolution([ds1, ds2], mode='max')
    assert np.allclose(res_max, np.maximum(get_resolution(ds1),
                                           get_resolution(ds2)))


# ---------------------------------------------------------------------------
# Reprojection
# ---------------------------------------------------------------------------

def test_reprojection_identity(ds):
    """Reprojecting onto the same grid must reproduce the data."""
    proj = Reprojection(crs=get_crs(ds), transform=get_transform(ds),
                        width=ds.sizes['x'], height=ds.sizes['y'])
    out = proj.apply(ds)
    for v in ds.data_vars:
        np.testing.assert_allclose(out[v].values, ds[v].values,
                                   rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(out['x'].values, ds['x'].values)
    np.testing.assert_allclose(out['y'].values, ds['y'].values)


def test_reprojection_parameterizations_agree(ds):
    """transform+wh, extent+res, extent+wh, target-ds give equal grids."""
    dst_crs = epsg3395
    b = get_bounds(ds)
    dst_bounds = warp.transform_bounds(get_crs(ds), dst_crs, *b)
    width, height = 24, 18
    resx = (dst_bounds.right - dst_bounds.left) / (width - 1)
    resy = (dst_bounds.top - dst_bounds.bottom) / (height - 1)
    transform = Affine(resx, 0, dst_bounds.left, 0, -resy,
                       dst_bounds.top)

    p1 = Reprojection(crs=dst_crs, transform=transform, width=width,
                      height=height).apply(ds)
    p2 = Reprojection(crs=dst_crs, extent=dst_bounds,
                      res=(resx, resy)).apply(ds)
    p3 = Reprojection(crs=dst_crs, extent=dst_bounds, width=width,
                      height=height).apply(ds)
    p4 = Reprojection(target=p1).apply(ds)

    for other in (p2, p3, p4):
        assert other.sizes == p1.sizes
        np.testing.assert_allclose(other['x'].values, p1['x'].values)
        np.testing.assert_allclose(other['y'].values, p1['y'].values)
        for v in ds.data_vars:
            np.testing.assert_allclose(other[v].values, p1[v].values,
                                       rtol=1e-6, equal_nan=True)


def test_reprojection_roundtrip(ds):
    """4326 -> 3395 -> 4326 approximately recovers the data."""
    fwd = Reprojection(crs=epsg3395).apply(ds)
    back = Reprojection(target=ds).apply(fwd)
    for v in ds.data_vars:
        a = ds[v].values
        b = back[v].values
        mask = np.isfinite(b)
        assert mask.mean() > 0.8
        # interior interpolation error is bounded
        assert np.nanmean(np.abs(a - np.where(mask, b, np.nan))) < 0.5


def test_reprojection_attrs(ds):
    out = Reprojection(crs=epsg3395).apply(ds)
    assert_equal_crs(get_crs(out), epsg3395)
    assert out.attrs['lines'] == out.sizes['y']
    assert out.attrs['samples'] == out.sizes['x']
    assert 'lat' in out.coords and 'lon' in out.coords
    assert out.coords['lat'].dims == ('y', 'x')


def test_reprojection_preserves_time(ds):
    out = Reprojection(crs=epsg3395).apply(ds)
    np.testing.assert_array_equal(out['time'].values,
                                  ds['time'].values)


def test_reprojection_dataarray():
    da = generate_test_dataarray(dims={'y': 15, 'x': 15, 'time': 3})
    out = Reprojection(crs=epsg3395).apply(da)
    assert out.dims == da.dims


def test_reprojection_integer_nearest(ds):
    ds2 = ds.copy()
    ds2['labels'] = (('y', 'x'),
                     np.arange(400, dtype=np.int64).reshape(20, 20))
    proj = Reprojection(crs=get_crs(ds2),
                        transform=get_transform(ds2),
                        width=20, height=20)
    out = proj.apply(ds2)
    np.testing.assert_array_equal(
        np.asarray(out['labels'].values, dtype=np.int64),
        ds2['labels'].values)


def test_reprojection_parallel(ds):
    proj = Reprojection(crs=epsg3395)
    serial = proj.apply(ds)
    par = proj.apply(ds, njobs=2)
    assert_equal_data(serial, par, rtol=1e-10)


def test_reprojection_sinusoidal_roundtrip(ds):
    fwd = Reprojection(crs=sinusoidal).apply(ds)
    assert_equal_crs(get_crs(fwd), sinusoidal)
    back = Reprojection(target=ds).apply(fwd)
    v = 'C11'
    mask = np.isfinite(back[v].values)
    assert mask.mean() > 0.7


def test_reprojection_invalid_args(ds):
    with pytest.raises(ValueError):
        Reprojection(crs=epsg4326, transform=get_transform(ds))
    with pytest.raises(ValueError):
        Reprojection(crs=epsg4326, extent=(0, 0, 1, 1))


# ---------------------------------------------------------------------------
# Resample
# ---------------------------------------------------------------------------

def test_resample_width(ds):
    out = Resample(width=40).apply(ds)
    assert out.sizes['x'] == 40
    assert out.sizes['y'] == 40  # aspect preserved
    assert_equal_crs(get_crs(out), get_crs(ds))


def test_resample_res(ds):
    res = get_resolution(ds)
    out = Resample(res=(res[0] * 2, res[1] * 2)).apply(ds)
    assert abs(out.sizes['x'] - 11) <= 1
    np.testing.assert_allclose(get_resolution(out),
                               (res[0] * 2, res[1] * 2), rtol=0.2)


# ---------------------------------------------------------------------------
# Alignment
# ---------------------------------------------------------------------------

def test_alignment(tmp_path, ds):
    ds2 = generate_test_dataset(dims={'y': 20, 'x': 20, 'time': 5},
                                extent=(-9, 51, 1, 61), random_seed=7)
    Alignment().apply([ds, ds2], str(tmp_path))
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 2
    from nd_tpu.io import open_netcdf
    opened = [open_netcdf(os.path.join(tmp_path, f)) for f in files]
    for o in opened:
        np.testing.assert_allclose(o['x'].values,
                                   opened[0]['x'].values)
        np.testing.assert_allclose(o['y'].values,
                                   opened[0]['y'].values)
    cb = get_common_bounds([ds, ds2])
    assert np.isclose(opened[0]['x'].values.min(), cb.left)


# ---------------------------------------------------------------------------
# Coregistration
# ---------------------------------------------------------------------------

def test_coregistration():
    """Deliberately shifted time series -> residual shift <= 0.2 px."""
    from nd_tpu.ops.fft import phase_cross_correlation
    rng = np.random.RandomState(5)
    ny, nx, k = 60, 60, 3
    base = rng.rand(ny + 20, nx + 20)
    from scipy.ndimage import gaussian_filter as gf
    base = gf(base, 3.0)

    true_shifts = [(0, 0), (3, -2), (-4, 5)]
    frames = np.stack([base[10 + dy:10 + dy + ny, 10 + dx:10 + dx + nx]
                       for dy, dx in true_shifts])
    ds = generate_test_dataset(dims={'y': ny, 'x': nx, 'time': k})
    for v in ds.data_vars:
        ds[v] = (('time', 'y', 'x'), frames.copy())

    out = Coregistration(reference=0, upsampling=10).apply(ds)
    ref = out['C11'].isel(time=0).values
    for t in range(1, k):
        shift = np.asarray(phase_cross_correlation(
            out['C11'].isel(time=t).values[10:-10, 10:-10],
            ref[10:-10, 10:-10], upsample_factor=20))
        assert np.all(np.abs(shift) <= 0.2), (t, shift)


def test_reprojection_resampling_kwarg(ds):
    """resampling='nearest' overrides the dtype dispatch."""
    proj = Reprojection(crs=get_crs(ds), transform=get_transform(ds),
                        width=ds.sizes['x'], height=ds.sizes['y'],
                        resampling='nearest')
    out = proj.apply(ds)
    for v in ds.data_vars:
        np.testing.assert_allclose(out[v].values, ds[v].values,
                                   rtol=1e-6)


def test_resample_scalar_res(ds):
    res = get_resolution(ds)
    out = Resample(res=res[0] * 2).apply(ds)
    assert abs(out.sizes['x'] - ds.sizes['x'] // 2) <= 2


def test_get_crs_formats_roundtrip(ds):
    wkt = get_crs(ds, format='wkt')
    d = get_crs(ds, format='dict')
    from nd_tpu.testing import assert_equal_crs
    assert_equal_crs(warp._parse_crs(wkt), get_crs(ds))
    assert_equal_crs(warp._parse_crs(d), get_crs(ds))


def test_translate_cubic_matches_scipy_shift():
    """Cubic translation vs scipy.ndimage.shift (spline order 1/3
    bracket: Catmull-Rom sits between; assert close to order-3)."""
    from scipy.ndimage import shift as nd_shift
    from nd_tpu.ops.fft import translate
    rng = np.random.RandomState(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.rand(40, 40), 2.0)
    for dx, dy in [(0.3, -1.7), (2.0, 0.5), (-0.25, 0.0)]:
        got = np.asarray(translate(img, (dx, dy), method='cubic'))
        # scipy shift(s): out[i] = in[i - s]; ours: out[i] = in[i + s]
        ref = nd_shift(img, (-dy, -dx), order=3, mode='nearest')
        interior = (slice(4, -4), slice(4, -4))
        err = np.abs(got[interior] - ref[interior]).max()
        assert err < 5e-3, (dx, dy, err)


def test_translate_cubic_integer_shift_exact():
    from nd_tpu.ops.fft import translate
    rng = np.random.RandomState(1)
    img = rng.rand(20, 20)
    got = np.asarray(translate(img, (3.0, -2.0), method='cubic'))
    # interior must match an exact integer roll
    np.testing.assert_allclose(got[5:15, 5:15],
                               img[3:13, 8:18], atol=1e-12)


# ---------------------------------------------------------------------------
# Separable matmul resampling fast path (ops.interp.matmul_resample)
# ---------------------------------------------------------------------------

def _f32_ds(ny=31, nx=45, with_nan=True):
    ds = generate_test_dataset(dims={'y': ny, 'x': nx, 'time': 3})
    for v in list(ds.data_vars):
        vals = ds[v].values.astype(np.float32)
        if with_nan:
            vals[ny // 3, nx // 4] = np.nan
        ds[v] = (ds[v].dims, vals)
    return ds


@pytest.mark.parametrize('dst', ['epsg:3395', None])
def test_matmul_resample_matches_gather(dst):
    """f32 (matmul plan) vs f64 (gather) reprojections must agree —
    including NaN propagation into every touched output pixel."""
    ds32 = _f32_ds()
    ds64 = ds32.copy()
    for v in list(ds64.data_vars):
        ds64[v] = (ds64[v].dims, ds64[v].values.astype(np.float64))
    kw = {'crs': dst} if dst else {'crs': 'epsg:4326',
                                   'extent': (-9.9, 50.1, -0.2, 59.8),
                                   'width': 40, 'height': 37}
    r32 = Reprojection(**kw).apply(ds32)
    r64 = Reprojection(**kw).apply(ds64)
    a = np.asarray(r32['C11'].values, np.float64)
    b = np.asarray(r64['C11'].values, np.float64)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b),
                               rtol=0, atol=1e-5)
    # the f32 run actually took the matmul plan: rebuilding the plan
    # for this exact geometry must succeed (a None here would mean the
    # fast path silently fell back to the gather)
    from nd_tpu.warp import _cached_plan, get_crs, get_transform
    plan = _cached_plan(
        tuple(np.asarray(r32.attrs['transform']))[:6],
        (r32.sizes['y'], r32.sizes['x']),
        tuple(get_transform(ds32))[:6],
        get_crs(ds32).to_proj4(), get_crs(r32).to_proj4(),
        (ds32.sizes['y'], ds32.sizes['x']), 'bilinear', '<f4')
    assert plan is not None


def test_matmul_resample_op_parity():
    """Direct op-level check: matmul_resample == map_coordinates on a
    separable coordinate set, for bilinear and nearest."""
    from nd_tpu.ops.interp import (axis_weights, map_coordinates,
                                   matmul_resample)
    rng = np.random.RandomState(0)
    H, W = 23, 37
    vals = rng.normal(size=(2, H, W)).astype(np.float32)
    vals[0, 5, 7] = np.nan
    vals[1, 11, 20] = np.inf      # non-finite contract: -> NaN output
    rows1 = np.linspace(-1.2, H + 0.3, 29)    # includes out-of-range
    cols1 = np.linspace(-0.4, W - 0.7, 33)
    R, C = np.meshgrid(rows1, cols1, indexing='ij')
    for method, expected in [('bilinear', 4.0), ('nearest', 1.0)]:
        ref = np.asarray(map_coordinates(vals, R, C, method=method,
                                         cval=np.nan))
        wy, wym, vy = axis_weights(rows1, H, method)
        wx, wxm, vx = axis_weights(cols1, W, method)
        got = np.asarray(matmul_resample(
            vals, wy, wym, wx, wxm, vy, vx, np.float32(np.nan),
            expected))
        assert np.array_equal(np.isnan(got), np.isnan(ref)), method
        np.testing.assert_allclose(np.nan_to_num(got),
                                   np.nan_to_num(ref),
                                   rtol=0, atol=1e-5, err_msg=method)


def test_separable_coords_rejects_curvilinear():
    from nd_tpu.ops.interp import separable_coords
    ii, jj = np.meshgrid(np.arange(10.0), np.arange(12.0),
                         indexing='ij')
    assert separable_coords(ii, jj) is not None
    assert separable_coords(ii + 0.01 * jj, jj) is None


def test_phase_cross_correlation_low_frequency_bias():
    """Phase normalization (skimage's default) recovers the true shift
    even when a smooth brightness gradient dominates the spectrum."""
    from nd_tpu.ops.fft import phase_cross_correlation
    rng = np.random.RandomState(0)
    base = rng.rand(64, 64)
    grad = np.linspace(0, 40, 64)[:, None] * np.ones((1, 64))
    img = base + grad
    shifted = np.roll(np.roll(img, 3, axis=0), -5, axis=1)
    sh = np.asarray(phase_cross_correlation(shifted, img,
                                            upsample_factor=10))
    np.testing.assert_allclose(sh, [3.0, -5.0], atol=0.1)


def test_reprojection_to_rd_new_and_robinson():
    """Round-3 CRS breadth through the warp engine: a cube over the
    Netherlands reprojects onto the Dutch RD grid (EPSG:28992, oblique
    stereographic + Bessel datum) and back, recovering the field; the
    ESRI:54030 Robinson world grid parses and warps."""
    ds = generate_test_dataset(dims={'y': 30, 'x': 30, 'time': 2},
                               extent=(4.0, 51.5, 6.5, 53.0))
    fwd = Reprojection(crs='epsg:28992').apply(ds)
    assert fwd.attrs['crs']  # carries the CRS metadata
    # the RD grid puts the cube's center in the expected coordinate
    # range (Netherlands: x in [0, 300km], y in [300, 650km])
    x = np.asarray(fwd['x'].values)
    y = np.asarray(fwd['y'].values)
    assert 0 < x.mean() < 300000
    assert 300000 < y.mean() < 650000
    back = Reprojection(target=ds).apply(fwd)
    for v in ds.data_vars:
        a = ds[v].values
        b = back[v].values
        mask = np.isfinite(b)
        assert mask.mean() > 0.7
        assert np.nanmean(np.abs(a - np.where(mask, b, np.nan))) < 0.5

    world = generate_test_dataset(dims={'y': 20, 'x': 40, 'time': 1},
                                  extent=(-60, -45, 60, 45))
    rob = Reprojection(crs='ESRI:54030').apply(world)
    assert np.isfinite(np.asarray(rob['C11'].values)).mean() > 0.5
