"""Structural/elementwise xarray API conveniences added in round 2:
isin, T/conj/argsort, drop_sel/drop_isel, combine_first (the union-
aligned mosaicking idiom), broadcast_like, set_coords/reset_coords,
get_index, load/as_numpy, differentiate/integrate (numpy.gradient /
trapezoid semantics), to_dict/from_dict."""

import numpy as np
import pytest

import jax.numpy as jnp

from nd_tpu.core import DataArray, Dataset


def test_isin_and_T_and_conj():
    da = DataArray(np.array([[1, 2], [3, 4]]), dims=('y', 'x'))
    m = da.isin([2, 3])
    np.testing.assert_array_equal(m.values,
                                  [[False, True], [True, False]])
    assert da.T.dims == ('x', 'y')
    c = DataArray(np.array([1 + 2j]), dims=('x',))
    assert c.conj().values[0] == 1 - 2j
    dev = DataArray(jnp.asarray([1.0, 5.0]), dims=('x',)).isin([5.0])
    np.testing.assert_array_equal(np.asarray(dev.values), [False, True])


def test_argsort():
    da = DataArray(np.array([3.0, 1.0, 2.0]), dims=('x',))
    np.testing.assert_array_equal(da.argsort().values, [1, 2, 0])


def test_drop_isel_and_drop_sel():
    da = DataArray(np.arange(5.0), dims=('x',),
                   coords={'x': [10, 20, 30, 40, 50]})
    out = da.drop_isel(x=[1, -1])
    np.testing.assert_array_equal(out.values, [0, 2, 3])
    np.testing.assert_array_equal(out['x'].values, [10, 30, 40])
    out2 = da.drop_sel(x=[20, 50])
    np.testing.assert_array_equal(out2.values, out.values)
    with pytest.raises(KeyError):
        da.drop_sel(x=[99])
    with pytest.raises(IndexError):
        da.drop_isel(x=[7])


def test_combine_first_union_mosaicking():
    # two tiles sharing an overlap column: the classic mosaic fill
    a = DataArray(np.array([[1.0, 2.0], [3.0, np.nan]]),
                  dims=('y', 'x'), coords={'y': [0, 1], 'x': [0, 1]})
    b = DataArray(np.array([[20.0, 30.0], [40.0, 50.0]]),
                  dims=('y', 'x'), coords={'y': [0, 1], 'x': [1, 2]})
    out = a.combine_first(b)
    np.testing.assert_array_equal(out['x'].values, [0, 1, 2])
    np.testing.assert_array_equal(
        out.values, [[1, 2, 30], [3, 40, 50]])


def test_combine_first_descending_axes():
    a = DataArray(np.array([[1.0], [2.0]]), dims=('y', 'x'),
                  coords={'y': [30.0, 20.0], 'x': [0]})
    b = DataArray(np.array([[5.0], [6.0]]), dims=('y', 'x'),
                  coords={'y': [20.0, 10.0], 'x': [0]})
    out = a.combine_first(b)
    np.testing.assert_array_equal(out['y'].values, [30.0, 20.0, 10.0])
    np.testing.assert_array_equal(out.values, [[1], [2], [6]])


def test_combine_first_dataset_pass_through_vars():
    a = Dataset({'u': (('x',), np.array([1.0, np.nan]))},
                coords={'x': [0, 1]})
    b = Dataset({'u': (('x',), np.array([9.0, 9.0])),
                 'v': (('x',), np.array([7.0, 7.0]))},
                coords={'x': [0, 1]})
    out = a.combine_first(b)
    np.testing.assert_array_equal(out['u'].values, [1.0, 9.0])
    np.testing.assert_array_equal(out['v'].values, [7.0, 7.0])


def test_broadcast_like():
    a = DataArray(np.array([1.0, 2.0]), dims=('x',))
    other = DataArray(np.zeros((3, 2)), dims=('y', 'x'))
    out = a.broadcast_like(other)
    # xarray appends missing dims after the object's own dims
    assert out.dims == ('x', 'y') and out.shape == (2, 3)
    np.testing.assert_array_equal(out.values,
                                  np.broadcast_to([[1.0], [2.0]],
                                                  (2, 3)))


def test_set_reset_coords_roundtrip():
    ds = Dataset({'a': (('x',), np.arange(3.0)),
                  'aux': (('x',), np.array([7.0, 8.0, 9.0]))},
                 coords={'x': [0, 1, 2]})
    ds2 = ds.set_coords('aux')
    assert 'aux' in ds2.coords and 'aux' not in ds2.data_vars
    ds3 = ds2.reset_coords('aux')
    assert 'aux' in ds3.data_vars and 'aux' not in ds3.coords
    ds4 = ds2.reset_coords('aux', drop=True)
    assert 'aux' not in ds4.coords and 'aux' not in ds4.data_vars
    with pytest.raises(ValueError):
        ds2.reset_coords('x')


def test_dataarray_reset_coords():
    da = DataArray(np.arange(2.0), dims=('x',), name='v',
                   coords={'x': [0, 1], 'lab': (('x',), ['a', 'b'])})
    dropped = da.reset_coords(drop=True)
    assert 'lab' not in dropped.coords
    ds = da.reset_coords()
    assert 'lab' in ds.data_vars and 'v' in ds.data_vars


def test_get_index_and_load_as_numpy():
    import pandas as pd
    da = DataArray(jnp.asarray([1.0, 2.0]), dims=('t',),
                   coords={'t': [5, 6]})
    idx = da.get_index('t')
    assert isinstance(idx, pd.Index) and list(idx) == [5, 6]
    host = da.as_numpy()
    assert isinstance(host.data, np.ndarray)
    da.load()
    assert isinstance(da.data, np.ndarray)


def test_differentiate_matches_np_gradient():
    x = np.array([0.0, 1.0, 3.0, 3.5, 7.0])
    rng = np.random.RandomState(0)
    v = rng.rand(3, 5)
    da = DataArray(v, dims=('y', 'x'), coords={'x': x})
    out = da.differentiate('x')
    expect = np.gradient(v, x, axis=1)
    np.testing.assert_allclose(out.values, expect, atol=1e-12)


def test_differentiate_datetime_coord():
    t = np.array(['2020-01-01', '2020-01-02', '2020-01-04'],
                 dtype='datetime64[ns]')
    da = DataArray(np.array([0.0, 86400.0, 3 * 86400.0]),
                   dims=('time',), coords={'time': t})
    out = da.differentiate('time')     # seconds per nanosecond
    np.testing.assert_allclose(out.values, 86400.0 / 86400e9)


def test_integrate_matches_trapezoid():
    x = np.array([0.0, 1.0, 2.5, 4.0])
    v = np.array([[1.0, 3.0, 2.0, 8.0], [0.0, 1.0, 1.0, 1.0]])
    da = DataArray(v, dims=('y', 'x'), coords={'x': x, 'y': [0, 1]})
    out = da.integrate('x')
    expect = np.trapezoid(v, x, axis=1) if hasattr(np, 'trapezoid') \
        else np.trapz(v, x, axis=1)
    np.testing.assert_allclose(out.values, expect)
    assert out.dims == ('y',)
    ds = Dataset({'a': da, 'b': (('z',), np.array([4.0]))})
    dso = ds.integrate('x')
    np.testing.assert_allclose(dso['a'].values, expect)
    np.testing.assert_array_equal(dso['b'].values, [4.0])


def test_device_payload_calculus():
    x = np.array([0.0, 0.5, 2.0])
    v = jnp.asarray(np.array([1.0, 2.0, 0.5]))
    da = DataArray(v, dims=('x',), coords={'x': x})
    d = da.differentiate('x')
    np.testing.assert_allclose(np.asarray(d.values),
                               np.gradient(np.asarray(v), x), atol=1e-6)
    i = float(da.integrate('x').values)
    assert np.isclose(i, np.trapz(np.asarray(v), x))


def test_to_dict_from_dict_roundtrip():
    da = DataArray(np.array([[1.0, 2.0]]), dims=('y', 'x'),
                   coords={'x': [10, 20], 'y': [5]}, name='v',
                   attrs={'units': 'K'})
    back = DataArray.from_dict(da.to_dict())
    assert back.identical(da)
    ds = Dataset({'v': da}, attrs={'title': 't'})
    back_ds = Dataset.from_dict(ds.to_dict())
    assert back_ds.equals(ds) and back_ds.attrs == ds.attrs
    assert ds.to_dataarray().dims == ('variable', 'y', 'x')
