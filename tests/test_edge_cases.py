"""Edge cases: SNAP-style metadata, CF decoding, selection semantics,
descending coordinates, docstring ordering."""

import numpy as np
import pytest

import nd_tpu.warp as warp
from nd_tpu import utils
from nd_tpu.core import DataArray, Dataset
from nd_tpu.crs import CRS, Affine
from nd_tpu.testing import assert_equal_crs, generate_test_dataset


def create_snap_ds():
    """A dataset georeferenced the SNAP way: no x/y coords, a 'crs'
    variable carrying wkt + i2m attributes (reference:
    test_warp.py:70-81)."""
    ds = Dataset()
    ds['band'] = (('y', 'x'), np.random.rand(10, 12))
    ds['crs'] = ((), np.array(0, dtype=np.int32))
    transform = Affine(0.1, 0, -5.0, 0, -0.2, 52.0)
    i2m = ','.join(str(v) for v in
                   [transform.a, transform.d, transform.b,
                    transform.e, transform.c, transform.f])
    ds._variables['crs'].attrs['wkt'] = CRS.from_epsg(4326).wkt
    ds._variables['crs'].attrs['i2m'] = i2m
    return ds, transform


def test_snap_style_crs_and_transform():
    ds, transform = create_snap_ds()
    assert_equal_crs(warp.get_crs(ds), CRS.from_epsg(4326))
    t = warp.get_transform(ds)
    assert t.almost_equals(transform, precision=1e-9)
    b = warp.get_bounds(ds)
    assert b.left == pytest.approx(-5.0)
    res = warp.get_resolution(ds)
    assert res == pytest.approx((0.1, 0.2))


def test_snap_i2m_attr_as_array():
    ds, transform = create_snap_ds()
    ds._variables['crs'].attrs['i2m'] = np.asarray(
        [ds._variables['crs'].attrs['i2m']])
    t = warp.get_transform(ds)
    assert t.almost_equals(transform, precision=1e-9)


def test_netcdf_scale_offset_decoding(tmp_path):
    import h5py
    p = str(tmp_path / 'packed.nc')
    with h5py.File(p, 'w') as f:
        d = f.create_dataset('y', data=np.arange(4.0))
        d.make_scale('y')
        v = f.create_dataset('v', data=np.array([0, 1, 2, 3],
                                                dtype=np.int16))
        v.attrs['scale_factor'] = 0.5
        v.attrs['add_offset'] = 10.0
        v.dims[0].attach_scale(d)
    from nd_tpu.io import open_netcdf
    ds = open_netcdf(p)
    np.testing.assert_allclose(ds['v'].values, [10, 10.5, 11, 11.5])


def test_sel_nearest_and_descending():
    y = np.linspace(60, 50, 11)  # descending
    da = DataArray(np.arange(11.0), dims=('y',), coords={'y': y})
    assert da.sel(y=55.2, method='nearest').item() == 5.0
    sub = da.sel(y=slice(58, 53))
    assert len(sub.values) == 6
    np.testing.assert_array_equal(sub['y'].values,
                                  y[(y <= 58) & (y >= 53)])


def test_sel_datetime_strings():
    ds = generate_test_dataset(dims={'y': 4, 'x': 4, 'time': 10})
    one = ds.sel(time='2017-01-05')
    assert 'time' not in one.sizes
    rng = ds.sel(time=slice('2017-01-03', '2017-01-06'))
    assert rng.sizes['time'] == 4


def test_dataarray_where_and_fillna():
    da = DataArray(np.array([1.0, np.nan, 3.0]), dims=('x',))
    np.testing.assert_array_equal(da.fillna(0).values, [1, 0, 3])
    out = da.where(da > 1)
    assert np.isnan(out.values[0]) and out.values[2] == 3.0


def test_dataset_arithmetic_broadcast():
    ds = generate_test_dataset(dims={'y': 4, 'x': 5, 'time': 3})
    mean_t = ds.mean('time')
    anom = ds - mean_t
    assert anom['C11'].sizes == {'y': 4, 'x': 5, 'time': 3}
    check = (ds['C11'].values
             - ds['C11'].values.mean(-1, keepdims=True))
    got = anom['C11'].transpose('y', 'x', 'time').values
    np.testing.assert_allclose(got, check, atol=1e-12)


def test_docstring_param_sorted_by_signature():
    import inspect
    doc = """
    Do things.

    Parameters
    ----------
    b : int
        Second.
    a : int
        First.
    """
    parsed = utils.parse_docstring(doc)

    def fn(a, b):
        pass

    out = utils.assemble_docstring(parsed,
                                   sig=inspect.signature(fn))
    assert out.index('a : int') < out.index('b : int')


def test_reproject_snap_dataset():
    """Reprojection of a SNAP-georeferenced dataset (no x/y coords)
    needs the metadata fallbacks end-to-end."""
    ds, transform = create_snap_ds()
    # synthesize explicit coords from the i2m transform, as the
    # reference's reprojection path requires x/y coordinate arrays
    cols = np.arange(12)
    rows = np.arange(10)
    x, _ = transform * (cols, np.zeros_like(cols))
    _, yv = transform * (np.zeros_like(rows), rows)
    ds = ds.assign_coords(x=('x', np.asarray(x)),
                          y=('y', np.asarray(yv)))
    out = warp.Reprojection(crs='epsg:3395').apply(ds)
    assert out.sizes['y'] > 0 and out.sizes['x'] > 0


def test_filter_on_integer_data():
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 2})
    ds['ints'] = (('y', 'x', 'time'),
                  np.arange(128, dtype=np.int32).reshape(8, 8, 2))
    from nd_tpu.filters import BoxcarFilter
    out = BoxcarFilter(w=3).apply(ds)
    assert 'ints' in out.data_vars
