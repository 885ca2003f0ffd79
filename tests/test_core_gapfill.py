"""Gap filling, interpolation, coarsening and weighted reductions on
the core data model — the xarray API surface EO time-series work leans
on (cloud-gap ffill/interpolate_na, grid coarsening, area-weighted
means, regridding via interp).

Oracles: pandas (present in this image) for the 1-d fill/interpolate
semantics, literal numpy for block reductions and lerps. xarray itself
is not installed, so its documented contracts are pinned by hand where
pandas differs (no extrapolation, NaN out-of-range, int promotion).
"""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from nd_tpu.core import DataArray, Dataset


def _series_cube(seed=0, shape=(5, 4, 9)):
    rng = np.random.RandomState(seed)
    data = rng.rand(*shape)
    data[rng.rand(*shape) < 0.35] = np.nan
    return data


# ---------------------------------------------------------------------------
# ffill / bfill
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('limit', [None, 1, 2])
@pytest.mark.parametrize('forward', [True, False])
def test_fill_matches_pandas(limit, forward):
    data = _series_cube()
    da = DataArray(data, dims=('y', 'x', 'time'))
    name = 'ffill' if forward else 'bfill'
    out = getattr(da, name)('time', limit=limit)
    expect = np.empty_like(data)
    for i in range(data.shape[0]):
        df = pd.DataFrame(data[i].T)
        expect[i] = getattr(df, name)(limit=limit).values.T
    np.testing.assert_array_equal(out.values, expect)


def test_fill_device_payload_matches_numpy():
    data = _series_cube(3)
    host = DataArray(data, dims=('y', 'x', 'time')).ffill('time', limit=2)
    dev = DataArray(jnp.asarray(data), dims=('y', 'x', 'time')) \
        .ffill('time', limit=2)
    np.testing.assert_allclose(np.asarray(dev.values), host.values)


def test_fill_datetime_nat():
    t = np.array(['2020-01-01', 'NaT', 'NaT', '2020-01-04'],
                 dtype='datetime64[ns]')
    da = DataArray(t, dims=('time',))
    out = da.ffill('time')
    assert out.values[1] == t[0] and out.values[2] == t[0]
    back = da.bfill('time', limit=1)
    assert np.isnat(back.values[1]) and back.values[2] == t[3]


def test_fill_int_passthrough():
    da = DataArray(np.array([1, 2, 3]), dims=('x',))
    out = da.ffill('x')
    assert out.dtype == da.dtype
    np.testing.assert_array_equal(out.values, da.values)


def test_fill_leading_trailing_nans_preserved():
    da = DataArray(np.array([np.nan, 1.0, np.nan, np.nan]), dims=('x',))
    f = da.ffill('x')
    np.testing.assert_array_equal(f.values, [np.nan, 1, 1, 1])
    b = da.bfill('x')
    np.testing.assert_array_equal(b.values, [1, 1, np.nan, np.nan])


def test_dataset_fill_only_touches_dim_vars():
    ds = Dataset({'a': (('time',), np.array([np.nan, 2.0])),
                  'b': (('x',), np.array([np.nan, 5.0]))})
    out = ds.bfill('time')
    np.testing.assert_array_equal(out['a'].values, [2.0, 2.0])
    assert np.isnan(out['b'].values[0])


# ---------------------------------------------------------------------------
# interpolate_na
# ---------------------------------------------------------------------------

def test_interpolate_na_linear_matches_pandas_index_method():
    coord = np.array([0.0, 1.0, 3.0, 3.5, 7.0, 9.0, 10.0])
    vals = np.array([np.nan, 1.0, np.nan, np.nan, 5.0, np.nan, np.nan])
    da = DataArray(vals, dims=('x',), coords={'x': coord})
    out = da.interpolate_na('x')
    expect = pd.Series(vals, index=coord).interpolate(
        method='index', limit_area='inside').values
    np.testing.assert_allclose(out.values, expect)


def test_interpolate_na_positional_when_no_coordinate():
    vals = np.array([1.0, np.nan, np.nan, 7.0])
    da = DataArray(vals, dims=('t',),
                   coords={'t': np.array([0.0, 1.0, 100.0, 101.0])})
    pos = da.interpolate_na('t', use_coordinate=False)
    np.testing.assert_allclose(pos.values, [1, 3, 5, 7])
    crd = da.interpolate_na('t')
    expect = pd.Series(vals, index=da['t'].values).interpolate(
        method='index', limit_area='inside').values
    np.testing.assert_allclose(crd.values, expect)


def test_interpolate_na_limit_and_max_gap():
    vals = np.array([1.0, np.nan, np.nan, np.nan, 5.0,
                     np.nan, 7.0])
    da = DataArray(vals, dims=('x',))
    lim = da.interpolate_na('x', limit=1)
    # only the first NaN of the long gap fills
    np.testing.assert_allclose(
        lim.values, [1, 2, np.nan, np.nan, 5, 6, 7])
    gap = da.interpolate_na('x', max_gap=2)
    np.testing.assert_allclose(
        gap.values, [1, np.nan, np.nan, np.nan, 5, 6, 7])


def test_interpolate_na_nearest_and_datetime_coord():
    t = np.array(['2021-01-01', '2021-01-02', '2021-01-05'],
                 dtype='datetime64[ns]')
    vals = np.array([2.0, np.nan, 10.0])
    da = DataArray(vals, dims=('time',), coords={'time': t})
    out = da.interpolate_na('time')
    np.testing.assert_allclose(out.values, [2.0, 4.0, 10.0])
    near = da.interpolate_na('time', method='nearest')
    np.testing.assert_allclose(near.values, [2.0, 2.0, 10.0])
    wide = da.interpolate_na('time', max_gap=np.timedelta64(2, 'D'))
    assert np.isnan(wide.values[1])


def test_interpolate_na_3d_matches_per_series_pandas():
    data = _series_cube(7)
    coord = np.sort(np.random.RandomState(1).rand(data.shape[2])) * 10
    da = DataArray(data, dims=('y', 'x', 'time'), coords={'time': coord})
    out = da.interpolate_na('time')
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            expect = pd.Series(data[i, j], index=coord).interpolate(
                method='index', limit_area='inside').values
            np.testing.assert_allclose(out.values[i, j], expect)


def test_interpolate_na_datetime_data():
    t = np.array(['2020-01-01', 'NaT', '2020-01-03'],
                 dtype='datetime64[ns]')
    da = DataArray(t, dims=('x',))
    out = da.interpolate_na('x')
    assert out.values[1] == np.datetime64('2020-01-02', 'ns')


# ---------------------------------------------------------------------------
# interp / interp_like
# ---------------------------------------------------------------------------

def test_interp_matches_np_interp():
    c = np.array([0.0, 1.0, 2.5, 4.0])
    v = np.array([1.0, 3.0, 2.0, 8.0])
    da = DataArray(v, dims=('x',), coords={'x': c})
    t = np.array([0.0, 0.5, 2.5, 3.9, 4.0])
    out = da.interp(x=t)
    np.testing.assert_allclose(out.values, np.interp(t, c, v))
    np.testing.assert_allclose(out['x'].values, t)


def test_interp_out_of_range_nan_and_scalar():
    da = DataArray(np.array([1.0, 2.0]), dims=('x',),
                   coords={'x': [0.0, 1.0]})
    out = da.interp(x=[-0.5, 0.5, 1.5])
    assert np.isnan(out.values[0]) and np.isnan(out.values[2])
    assert out.values[1] == 1.5
    s = da.interp(x=0.25)
    assert s.ndim == 0 and float(s.values) == 1.25
    assert 'x' in s.coords


def test_interp_descending_coordinate():
    c = np.array([4.0, 3.0, 1.0, 0.0])     # the usual y axis
    v = np.array([8.0, 6.0, 2.0, 0.0])     # = 2*c
    da = DataArray(v, dims=('y',), coords={'y': c})
    out = da.interp(y=[0.5, 2.0, 3.5])
    np.testing.assert_allclose(out.values, [1.0, 4.0, 7.0])


def test_interp_nearest_and_int_promotion():
    da = DataArray(np.array([10, 20, 30]), dims=('x',),
                   coords={'x': [0.0, 1.0, 2.0]})
    near = da.interp(x=[0.4, 0.6], method='nearest')
    np.testing.assert_array_equal(near.values, [10, 20])
    assert near.dtype == da.dtype
    lin = da.interp(x=[0.5])
    assert lin.dtype.kind == 'f'
    np.testing.assert_allclose(lin.values, [15.0])


def test_interp_2d_and_sequential_dims():
    y = np.array([0.0, 1.0, 2.0])
    x = np.array([0.0, 10.0])
    v = y[:, None] + x[None, :]
    da = DataArray(v, dims=('y', 'x'), coords={'y': y, 'x': x})
    out = da.interp(y=[0.5, 1.5], x=[5.0])
    np.testing.assert_allclose(out.values, [[5.5], [6.5]])


def test_interp_datetime_coordinate():
    t = np.array(['2020-01-01', '2020-01-03'], dtype='datetime64[ns]')
    da = DataArray(np.array([0.0, 4.0]), dims=('time',),
                   coords={'time': t})
    out = da.interp(time=np.array(['2020-01-02'],
                                  dtype='datetime64[ns]'))
    np.testing.assert_allclose(out.values, [2.0])


def test_interp_device_payload():
    da = DataArray(jnp.asarray(np.arange(5.0)), dims=('x',),
                   coords={'x': np.arange(5.0)})
    out = da.interp(x=[1.5, 3.25])
    np.testing.assert_allclose(np.asarray(out.values), [1.5, 3.25])


def test_interp_secondary_coordinate_interpolated():
    c = np.array([0.0, 2.0])
    lat = np.array([50.0, 52.0])
    da = DataArray(np.array([1.0, 5.0]), dims=('y',),
                   coords={'y': c, 'lat': (('y',), lat)})
    out = da.interp(y=[1.0])
    np.testing.assert_allclose(out['lat'].values, [51.0])


def test_interp_like_and_dataset_interp():
    src = Dataset({'a': (('x',), np.array([0.0, 2.0, 4.0])),
                   'b': (('z',), np.array([7.0]))},
                  coords={'x': np.array([0.0, 1.0, 2.0])})
    tgt = Dataset({'c': (('x',), np.zeros(2))},
                  coords={'x': np.array([0.5, 1.5])})
    out = src.interp_like(tgt)
    np.testing.assert_allclose(out['a'].values, [1.0, 3.0])
    np.testing.assert_array_equal(out['b'].values, [7.0])
    np.testing.assert_allclose(out['x'].values, [0.5, 1.5])


def test_interp_requires_coordinate():
    da = DataArray(np.zeros(3), dims=('x',))
    with pytest.raises(ValueError):
        da.interp(x=[0.5])


# ---------------------------------------------------------------------------
# coarsen
# ---------------------------------------------------------------------------

def test_coarsen_exact_mean_matches_reshape():
    rng = np.random.RandomState(0)
    v = rng.rand(4, 6)
    da = DataArray(v, dims=('y', 'x'),
                   coords={'y': np.arange(4.0), 'x': np.arange(6.0)})
    out = da.coarsen(y=2, x=3).mean()
    np.testing.assert_allclose(
        out.values, v.reshape(2, 2, 2, 3).mean(axis=(1, 3)))
    np.testing.assert_allclose(out['y'].values, [0.5, 2.5])
    np.testing.assert_allclose(out['x'].values, [1.0, 4.0])


def test_coarsen_boundary_modes():
    v = np.arange(7.0)
    da = DataArray(v, dims=('x',))
    with pytest.raises(ValueError):
        da.coarsen(x=2).mean()
    trim = da.coarsen(x=2, boundary='trim').sum()
    np.testing.assert_allclose(trim.values, [1, 5, 9])
    trim_r = da.coarsen(x=2, boundary='trim', side='right').sum()
    np.testing.assert_allclose(trim_r.values, [3, 7, 11])
    pad = da.coarsen(x=2, boundary='pad').mean()
    np.testing.assert_allclose(pad.values, [0.5, 2.5, 4.5, 6.0])


def test_coarsen_nan_aware_and_count():
    v = np.array([[1.0, np.nan], [3.0, 4.0]])
    da = DataArray(v, dims=('y', 'x'))
    m = da.coarsen(y=2, x=2).mean()
    np.testing.assert_allclose(m.values, [[8.0 / 3]])
    c = da.coarsen(y=2, x=2).count()
    np.testing.assert_array_equal(c.values, [[3]])


def test_coarsen_device_payload_and_dataset():
    rng = np.random.RandomState(1)
    v = rng.rand(4, 4).astype(np.float32)
    ds = Dataset({'a': (('y', 'x'), jnp.asarray(v)),
                  'k': (('t',), np.arange(3.0))},
                 coords={'y': np.arange(4.0)})
    out = ds.coarsen(y=2, x=2).max()
    np.testing.assert_allclose(
        np.asarray(out['a'].values),
        v.reshape(2, 2, 2, 2).max(axis=(1, 3)))
    np.testing.assert_array_equal(out['k'].values, np.arange(3.0))
    np.testing.assert_allclose(out['y'].values, [0.5, 2.5])


def test_coarsen_datetime_coord_mean():
    t = np.array(['2020-01-01', '2020-01-03'], dtype='datetime64[ns]')
    da = DataArray(np.array([1.0, 3.0]), dims=('time',),
                   coords={'time': t})
    out = da.coarsen(time=2).mean()
    assert out['time'].values[0] == np.datetime64('2020-01-02', 'ns')


def test_coarsen_first_last_coord_func():
    da = DataArray(np.arange(4.0), dims=('x',),
                   coords={'x': np.arange(4.0)})
    f = da.coarsen(x=2, coord_func='first').sum()
    np.testing.assert_allclose(f['x'].values, [0.0, 2.0])
    l = da.coarsen(x=2, coord_func='last').sum()
    np.testing.assert_allclose(l['x'].values, [1.0, 3.0])


# ---------------------------------------------------------------------------
# weighted
# ---------------------------------------------------------------------------

def test_weighted_mean_sum_literal():
    v = np.array([[1.0, 2.0], [3.0, np.nan]])
    w = np.array([1.0, 3.0])
    da = DataArray(v, dims=('y', 'x'), coords={'y': [0, 1]})
    wda = DataArray(w, dims=('y',))
    m = da.weighted(wda).mean('y')
    np.testing.assert_allclose(m.values, [(1 + 3 * 3) / 4.0, 2.0])
    s = da.weighted(wda).sum('y')
    np.testing.assert_allclose(s.values, [10.0, 2.0])
    sw = da.weighted(wda).sum_of_weights('y')
    np.testing.assert_allclose(sw.values, [4.0, 1.0])


def test_weighted_all_dims_and_var_std():
    rng = np.random.RandomState(2)
    v = rng.rand(3, 4)
    w = rng.rand(3, 4) + 0.1
    da = DataArray(v, dims=('y', 'x'))
    wda = DataArray(w, dims=('y', 'x'))
    m = float(da.weighted(wda).mean().values)
    assert np.isclose(m, (v * w).sum() / w.sum())
    var = float(da.weighted(wda).var().values)
    assert np.isclose(var, (w * (v - m) ** 2).sum() / w.sum())
    std = float(da.weighted(wda).std().values)
    assert np.isclose(std, np.sqrt(var))


def test_weighted_rejects_nan_weights():
    da = DataArray(np.zeros(2), dims=('x',))
    with pytest.raises(ValueError):
        da.weighted(DataArray(np.array([1.0, np.nan]), dims=('x',)))


def test_weighted_zero_weight_sum_is_nan():
    da = DataArray(np.array([np.nan, np.nan]), dims=('x',))
    w = DataArray(np.array([1.0, 1.0]), dims=('x',))
    out = float(da.weighted(w).mean('x').values)
    assert np.isnan(out)


def test_weighted_dataset():
    ds = Dataset({'a': (('x',), np.array([2.0, 4.0])),
                  'b': (('y',), np.array([1.0, 1.0, 1.0]))})
    w = DataArray(np.array([3.0, 1.0]), dims=('x',))
    out = ds.weighted(w).mean('x')
    np.testing.assert_allclose(out['a'].values, 2.5)
    # b has no x dim: broadcast weights average leaves it unchanged
    np.testing.assert_allclose(out['b'].values, np.ones(3))


# ---------------------------------------------------------------------------
# virtual datetime fields: groupby('time.month') and the .dt accessor
# ---------------------------------------------------------------------------

def test_groupby_virtual_month():
    t = np.array(['2020-01-01', '2020-01-15', '2020-02-01',
                  '2020-02-10', '2020-03-01', '2020-03-20'],
                 dtype='datetime64[ns]')
    ds = Dataset({'a': (('time',), np.arange(6.0))},
                 coords={'time': t})
    out = ds.groupby('time.month').mean()
    np.testing.assert_allclose(out['a'].values, [0.5, 2.5, 4.5])
    # xarray names the result dim after the field
    assert 'month' in out.sizes
    np.testing.assert_array_equal(out['month'].values, [1, 2, 3])
    np.testing.assert_allclose(
        out['a'].sel(month=2).values if hasattr(out['a'], 'sel')
        else out['a'].values[1], 2.5)


def test_groupby_virtual_season_and_year():
    t = np.array(['2019-12-20', '2020-01-05', '2020-06-10',
                  '2020-07-01', '2021-04-03'], dtype='datetime64[ns]')
    ds = Dataset({'a': (('time',), np.array([1.0, 3.0, 10.0, 20.0,
                                             7.0]))},
                 coords={'time': t})
    seas = ds.groupby('time.season').mean()
    got = dict(zip(seas['season'].values.tolist(),
                   seas['a'].values.tolist()))
    assert got == {'DJF': 2.0, 'JJA': 15.0, 'MAM': 7.0}
    yr = ds.groupby('time.year').sum()
    np.testing.assert_array_equal(yr['year'].values,
                                  [2019, 2020, 2021])


def test_dt_accessor_fields_match_pandas():
    import pandas as pd
    t = np.array(['2020-02-29T13:45:10', '2021-12-31T00:00:00'],
                 dtype='datetime64[ns]')
    da = DataArray(t, dims=('time',), coords={'time': t})
    idx = pd.DatetimeIndex(t)
    np.testing.assert_array_equal(da.dt.year.values, idx.year)
    np.testing.assert_array_equal(da.dt.month.values, idx.month)
    np.testing.assert_array_equal(da.dt.day.values, idx.day)
    np.testing.assert_array_equal(da.dt.hour.values, idx.hour)
    np.testing.assert_array_equal(da.dt.dayofyear.values,
                                  idx.dayofyear)
    np.testing.assert_array_equal(da.dt.days_in_month.values,
                                  [29, 31])
    np.testing.assert_array_equal(da.dt.season.values, ['DJF', 'DJF'])
    with pytest.raises(AttributeError):
        da.dt.nonsense
    with pytest.raises(TypeError):
        DataArray(np.arange(3.0), dims=('x',)).dt.month


# ---------------------------------------------------------------------------
# vectorized (advanced) interp: transect / trajectory extraction
# ---------------------------------------------------------------------------

def test_interp_pointwise_transect():
    y = np.arange(5.0)
    x = np.arange(6.0)
    v = y[:, None] * 10 + x[None, :]
    da = DataArray(v, dims=('y', 'x'), coords={'y': y, 'x': x})
    track_y = DataArray(np.array([0.5, 2.0, 3.25]), dims=('points',),
                        coords={'points': [0, 1, 2]})
    track_x = DataArray(np.array([1.0, 4.5, 2.75]), dims=('points',))
    out = da.interp(y=track_y, x=track_x)
    assert out.dims == ('points',)
    np.testing.assert_allclose(
        out.values, [0.5 * 10 + 1.0, 2.0 * 10 + 4.5, 3.25 * 10 + 2.75])
    np.testing.assert_array_equal(out['points'].values, [0, 1, 2])
    np.testing.assert_allclose(out['y'].values, [0.5, 2.0, 3.25])


def test_interp_pointwise_keeps_batched_dims_and_oob():
    rng = np.random.RandomState(0)
    v = rng.rand(3, 4, 5)          # (time, y, x)
    da = DataArray(v, dims=('time', 'y', 'x'),
                   coords={'y': np.arange(4.0), 'x': np.arange(5.0),
                           'time': np.arange(3)})
    ty = DataArray(np.array([1.5, 9.0]), dims=('pt',))
    tx = DataArray(np.array([2.5, 1.0]), dims=('pt',))
    out = da.interp(y=ty, x=tx)
    assert out.dims == ('time', 'pt')
    expect0 = (v[:, 1, 2] + v[:, 1, 3] + v[:, 2, 2] + v[:, 2, 3]) / 4
    np.testing.assert_allclose(out.values[:, 0], expect0)
    assert np.isnan(out.values[:, 1]).all()     # y=9 out of range


def test_interp_pointwise_nearest_and_descending():
    y = np.array([3.0, 2.0, 1.0, 0.0])          # descending axis
    v = y * 2
    da = DataArray(v, dims=('y',), coords={'y': y})
    ty = DataArray(np.array([0.4, 2.6]), dims=('p',))
    out = da.interp(y=ty, method='nearest')
    np.testing.assert_allclose(out.values, [0.0, 6.0])
    lin = da.interp(y=ty)
    np.testing.assert_allclose(lin.values, [0.8, 5.2])


def test_interp_mixed_orthogonal_then_pointwise():
    y = np.arange(4.0)
    x = np.arange(4.0)
    t = np.arange(3.0)
    v = (t[:, None, None] + y[None, :, None] * 10
         + x[None, None, :] * 100)
    da = DataArray(v, dims=('time', 'y', 'x'),
                   coords={'time': t, 'y': y, 'x': x})
    ty = DataArray(np.array([1.5]), dims=('p',))
    tx = DataArray(np.array([2.0]), dims=('p',))
    out = da.interp(time=0.5, y=ty, x=tx)
    assert out.dims == ('p',)
    np.testing.assert_allclose(out.values, [0.5 + 15 + 200])


def test_interp_pointwise_device_payload():
    import jax.numpy as jnp
    v = jnp.asarray(np.arange(12.0, dtype=np.float32).reshape(3, 4))
    da = DataArray(v, dims=('y', 'x'),
                   coords={'y': np.arange(3.0), 'x': np.arange(4.0)})
    ty = DataArray(np.array([0.5, 1.5]), dims=('p',))
    tx = DataArray(np.array([1.5, 2.5]), dims=('p',))
    out = da.interp(y=ty, x=tx)
    np.testing.assert_allclose(np.asarray(out.values), [3.5, 8.5])
    assert out.dtype == np.float32
