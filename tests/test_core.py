"""Focused tests of the core data model (Variable/DataArray/Dataset)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nd_tpu.core import (DataArray, Dataset, broadcast, concat,
                         full_like, merge, ones_like, zeros_like)
from nd_tpu.core.variable import Variable


def test_variable_basics():
    v = Variable(('y', 'x'), np.arange(12.0).reshape(3, 4),
                 {'units': 'm'})
    assert v.sizes == {'y': 3, 'x': 4}
    assert v.transpose('x', 'y').shape == (4, 3)
    assert v.isel({'y': 1}).dims == ('x',)
    assert v.isel({'x': slice(0, 2)}).shape == (3, 2)
    with pytest.raises(ValueError):
        Variable(('y',), np.zeros((2, 2)))


def test_variable_broadcast_binary():
    a = Variable(('y',), np.arange(3.0))
    b = Variable(('x',), np.arange(4.0))
    c = a._binary_op(b, lambda p, q: p + q)
    assert c.dims == ('y', 'x')
    assert c.shape == (3, 4)
    np.testing.assert_allclose(c.data[2, 3], 5.0)


def test_dataarray_construction_and_coords():
    da = DataArray(np.zeros((3, 4)), dims=('y', 'x'),
                   coords={'y': [10, 20, 30], 'x': np.arange(4)},
                   attrs={'k': 1}, name='v')
    assert da.name == 'v'
    assert list(da.coords) == ['y', 'x']
    da['extra'] = ('y', [1, 2, 3])
    assert da['extra'].dims == ('y',)
    with pytest.raises(ValueError):
        da['bad'] = ('y', [1, 2])  # wrong length


def test_dataarray_arithmetic_name_and_coords():
    da = DataArray(np.ones((2, 2)), dims=('y', 'x'),
                   coords={'y': [0, 1], 'x': [0, 1]}, name='a')
    other = DataArray(np.full((2, 2), 2.0), dims=('y', 'x'),
                      coords={'y': [0, 1], 'x': [0, 1]}, name='b')
    s = da + other
    assert s.name is None  # names differ
    np.testing.assert_allclose(s.values, 3.0)
    same = da * da
    assert same.name == 'a'
    r = 1 - da
    np.testing.assert_allclose(r.values, 0.0)


def test_dataarray_reductions_drop_coords():
    da = DataArray(np.random.rand(3, 4), dims=('y', 'x'),
                   coords={'y': [1, 2, 3], 'x': [0, 1, 2, 3]})
    m = da.mean('y')
    assert m.dims == ('x',)
    assert 'y' not in m.coords
    assert 'x' in m.coords
    total = da.sum()
    assert total.ndim == 0


def test_where_with_dataarray_condition():
    da = DataArray(np.arange(6.0).reshape(2, 3), dims=('y', 'x'))
    cond = DataArray(np.array([True, False]), dims=('y',))
    out = da.where(cond)
    assert np.isfinite(out.values[0]).all()
    assert np.isnan(out.values[1]).all()


def test_broadcast_function():
    a = DataArray(np.arange(3.0), dims=('y',))
    b = DataArray(np.arange(4.0), dims=('x',))
    a2, b2 = broadcast(a, b)
    assert a2.shape == b2.shape == (3, 4)


def test_full_like_family():
    da = DataArray(np.ones((2, 2)), dims=('y', 'x'))
    assert (zeros_like(da).values == 0).all()
    assert (ones_like(da).values == 1).all()
    assert (full_like(da, 7, dtype=np.int32).values == 7).all()
    assert full_like(da, 7, dtype=np.int32).dtype == np.int32


def test_dataset_getitem_list_and_delete():
    ds = Dataset({'a': (('y',), np.arange(3.0)),
                  'b': (('y',), np.arange(3.0) * 2)},
                 coords={'y': [0, 1, 2]})
    sub = ds[['a']]
    assert list(sub.data_vars) == ['a']
    del ds['b']
    assert 'b' not in ds
    with pytest.raises(KeyError):
        ds['missing']


def test_dataset_setitem_validation():
    ds = Dataset(coords={'y': np.arange(3)})
    with pytest.raises(ValueError):
        ds['v'] = (('y',), np.zeros(5))
    with pytest.raises(TypeError):
        ds['v'] = [1, 2, 3]  # bare lists are ambiguous


def test_dataset_merge_and_module_merge():
    d1 = Dataset({'a': (('y',), np.arange(3.0))},
                 coords={'y': [0, 1, 2]})
    d2 = Dataset({'b': (('y',), np.arange(3.0))},
                 coords={'y': [0, 1, 2]})
    m = d1.merge(d2)
    assert set(m.data_vars) == {'a', 'b'}
    m2 = merge([d1, d2])
    assert set(m2.data_vars) == {'a', 'b'}


def test_concat_dataarray_existing_dim():
    da = DataArray(np.arange(6.0).reshape(2, 3), dims=('y', 'x'),
                   coords={'y': [0, 1], 'x': [0, 1, 2]})
    out = concat([da.isel(y=slice(0, 1)), da.isel(y=slice(1, 2))], 'y')
    np.testing.assert_allclose(out.values, da.values)
    np.testing.assert_array_equal(out['y'].values, [0, 1])


def test_rename_dims_and_vars():
    ds = Dataset({'a': (('y', 'x'), np.zeros((2, 2)))},
                 coords={'y': [0, 1], 'x': [0, 1]})
    out = ds.rename({'y': 'row', 'a': 'alpha'})
    assert 'row' in out.sizes
    assert 'alpha' in out.data_vars
    da = ds['a'].rename('beta')
    assert da.name == 'beta'


def test_device_payload_stays_on_device():
    da = DataArray(jnp.ones((4, 4)), dims=('y', 'x'))
    out = (da * 2).transpose('x', 'y').isel(x=slice(0, 2))
    import jax
    assert isinstance(out.data, jax.Array)
    assert out.shape == (2, 4)


def test_expand_dims_and_squeeze():
    da = DataArray(np.arange(3.0), dims=('x',))
    e = da.expand_dims('band')
    assert e.dims == ('band', 'x')
    s = e.squeeze('band')
    assert s.dims == ('x',)


def test_scalar_coord_kept():
    ds = Dataset({'a': (('y', 'x'), np.zeros((2, 2)))},
                 coords={'y': [0, 1], 'x': [0, 1],
                         'time': np.datetime64('2020-01-01')})
    one = ds.isel(y=0)
    assert 'time' in one.coords


def test_scalar_conversion_dunders():
    # xarray parity: float()/int()/bool()/complex() work on size-1 arrays
    da = DataArray(np.arange(4.0), dims=('x',))
    m = da.mean()
    assert float(m) == 1.5
    assert int(da.sum()) == 6
    assert bool((da > -1).all())
    assert complex(m) == 1.5 + 0j
    assert float(m.variable) == 1.5
    with pytest.raises(TypeError):
        float(da)  # size > 1 must refuse, like xarray


def test_reducers_all_any_prod():
    da = DataArray(np.array([[1.0, 2.0], [3.0, 4.0]]), dims=('y', 'x'))
    assert float(da.prod()) == 24.0
    assert bool((da > 0).all())
    assert not bool((da > 3.5).all())
    assert bool((da > 3.5).any())
    a = (da > 1.5).all(dim='y')
    assert a.dims == ('x',)
    assert a.values.tolist() == [False, True]
    ds = Dataset({'a': (('y', 'x'), np.ones((2, 2)))})
    assert bool((ds > 0).all()['a'])
