"""Bounded fuzzing: random shapes/dim orders/dtypes through the filter
and I/O stacks, asserting contracts rather than values."""

import numpy as np
import pytest

from nd_tpu.core import Dataset
from nd_tpu.filters import (BoxcarFilter, ConvolutionFilter,
                            GaussianFilter, NLMeansFilter)
from nd_tpu.io import open_netcdf, to_netcdf
from nd_tpu.testing import assert_equal_data


def _random_ds(rng, dtype):
    dims = {}
    names = ['y', 'x', 'time']
    rng.shuffle(names)
    for d in names:
        dims[d] = int(rng.randint(4, 14))
    coords = {}
    for d, s in dims.items():
        if d == 'time':
            coords[d] = np.arange(np.datetime64('2020-01-01'),
                                  np.datetime64('2020-01-01')
                                  + np.timedelta64(s, 'D'))
        else:
            coords[d] = np.sort(rng.uniform(-50, 50, s))
    ds = Dataset(coords=coords, attrs={'crs': 'epsg:4326'})
    nvars = rng.randint(1, 4)
    shape = tuple(dims.values())
    names_d = tuple(dims.keys())
    for i in range(nvars):
        ds['v%d' % i] = (names_d,
                         rng.normal(size=shape).astype(dtype))
    return ds


@pytest.mark.parametrize('seed', range(6))
def test_filter_fuzz(seed):
    rng = np.random.RandomState(seed)
    dtype = rng.choice([np.float32, np.float64])
    ds = _random_ds(rng, dtype)
    filter_dims = tuple(rng.choice(['y', 'x', 'time'],
                                   size=rng.randint(1, 3),
                                   replace=False))
    algo = rng.choice([
        lambda: BoxcarFilter(dims=filter_dims, w=3),
        lambda: GaussianFilter(dims=filter_dims, sigma=1.0),
        lambda: ConvolutionFilter(
            dims=filter_dims,
            kernel=rng.rand(*([3] * len(filter_dims)))),
    ])()
    out = algo.apply(ds)
    assert out.sizes == ds.sizes
    for v in ds.data_vars:
        assert out[v].dims == ds[v].dims
        assert np.isfinite(out[v].values).all()
    # parallel == serial
    par = algo.apply(ds, njobs=2)
    assert_equal_data(out, par, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize('seed', range(4))
def test_nlmeans_fuzz(seed):
    rng = np.random.RandomState(100 + seed)
    ds = _random_ds(rng, np.float32)
    algo = NLMeansFilter(dims=('y', 'x'), r=int(rng.randint(1, 3)),
                         f=1, sigma=1.0, h=1.0)
    out = algo.apply(ds)
    assert out.sizes == ds.sizes
    for v in ds.data_vars:
        assert np.isfinite(out[v].values).all()


@pytest.mark.parametrize('seed', range(4))
def test_netcdf_fuzz_roundtrip(tmp_path, seed):
    rng = np.random.RandomState(200 + seed)
    dtype = rng.choice([np.float32, np.float64, np.int32])
    ds = _random_ds(rng, np.float64).astype(dtype)
    p = str(tmp_path / ('fuzz%d.nc' % seed))
    to_netcdf(ds, p)
    back = open_netcdf(p)
    for v in ds.data_vars:
        np.testing.assert_allclose(
            np.asarray(back[v].values, dtype=np.float64),
            np.asarray(ds[v].values, dtype=np.float64), rtol=1e-12)
        assert back[v].dims == ds[v].dims
    np.testing.assert_array_equal(back['time'].values,
                                  ds['time'].values)
