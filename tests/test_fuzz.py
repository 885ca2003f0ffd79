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


# ---------------------------------------------------------------------
# round-2 core surface: gap filling / interp / coarsen under random
# shapes, NaN patterns and coordinate spacings (pandas/numpy oracles)
# ---------------------------------------------------------------------

@pytest.mark.parametrize('seed', range(8))
def test_gapfill_fuzz(seed):
    import pandas as pd
    from nd_tpu.core import DataArray
    rng = np.random.RandomState(100 + seed)
    ny, nx, k = rng.randint(2, 9), rng.randint(2, 9), rng.randint(3, 12)
    data = rng.rand(ny, nx, k)
    data[rng.rand(ny, nx, k) < rng.uniform(0.1, 0.6)] = np.nan
    coord = np.sort(rng.uniform(0, 100, k)) if rng.rand() < 0.5 \
        else np.arange(k, dtype=float)
    da = DataArray(data, dims=('y', 'x', 'time'),
                   coords={'time': coord})
    limit = rng.choice([None, 1, 2])
    out_f = da.ffill('time', limit=limit)
    out_b = da.bfill('time', limit=limit)
    out_i = da.interpolate_na('time')
    for i in range(ny):
        df = pd.DataFrame(data[i].T)
        np.testing.assert_array_equal(
            out_f.values[i], df.ffill(limit=limit).values.T)
        np.testing.assert_array_equal(
            out_b.values[i], df.bfill(limit=limit).values.T)
        for j in range(nx):
            expect = pd.Series(data[i, j], index=coord).interpolate(
                method='index', limit_area='inside').values
            np.testing.assert_allclose(out_i.values[i, j], expect,
                                       atol=1e-12)


@pytest.mark.parametrize('seed', range(8))
def test_interp_fuzz_vs_np_interp(seed):
    from nd_tpu.core import DataArray
    rng = np.random.RandomState(200 + seed)
    n = rng.randint(2, 15)
    coord = np.sort(rng.uniform(-10, 10, n))
    coord += np.arange(n) * 1e-6          # strictly increasing
    descending = rng.rand() < 0.5
    c = coord[::-1].copy() if descending else coord
    ny = rng.randint(1, 5)
    v = rng.rand(ny, n)
    da = DataArray(v, dims=('y', 'x'), coords={'x': c})
    m = rng.randint(1, 9)
    t = rng.uniform(c.min() - 1, c.max() + 1, m)
    out = da.interp(x=t)
    for i in range(ny):
        expect = np.interp(t, coord, v[i][::-1] if descending
                           else v[i], left=np.nan, right=np.nan)
        np.testing.assert_allclose(out.values[i], expect, atol=1e-12)


@pytest.mark.parametrize('seed', range(6))
def test_coarsen_fuzz_vs_reshape(seed):
    from nd_tpu.core import DataArray
    rng = np.random.RandomState(300 + seed)
    wy, wx = rng.randint(1, 5), rng.randint(1, 5)
    my, mx = rng.randint(1, 6), rng.randint(1, 6)
    v = rng.rand(wy * my, wx * mx)
    v[rng.rand(*v.shape) < 0.2] = np.nan
    da = DataArray(v, dims=('y', 'x'))
    red = rng.choice(['mean', 'sum', 'max', 'min'])
    out = getattr(da.coarsen(y=wy, x=wx), red)()
    blocked = v.reshape(my, wy, mx, wx).transpose(0, 2, 1, 3) \
        .reshape(my, mx, wy * wx)
    with np.errstate(all='ignore'):
        expect = getattr(np, 'nan' + red)(blocked, axis=-1)
    np.testing.assert_allclose(out.values, expect, equal_nan=True)
