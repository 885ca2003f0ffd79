"""Grouped/windowed ops vs the pandas oracle.

pandas implements the exact semantics xarray delegates to (rolling
min_periods/center, groupby reductions, resample bin edges and
labels), so it pins our implementations against the real convention
across randomized inputs.
"""

import numpy as np
import pandas as pd
import pytest

from nd_tpu.core import DataArray


def _series(n, nan_frac=0.2, seed=0):
    rng = np.random.RandomState(seed)
    vals = rng.randn(n)
    vals[rng.rand(n) < nan_frac] = np.nan
    return vals


@pytest.mark.parametrize('window', [1, 2, 3, 5])
@pytest.mark.parametrize('center', [False, True])
@pytest.mark.parametrize('min_periods', [None, 1, 2])
def test_rolling_mean_vs_pandas(window, center, min_periods):
    if min_periods is not None and min_periods > window:
        pytest.skip('invalid combination')
    vals = _series(23)
    da = DataArray(vals, dims=('t',))
    ours = da.rolling(t=window, center=center,
                      min_periods=min_periods).mean().values
    ref = pd.Series(vals).rolling(window, center=center,
                                  min_periods=min_periods).mean().values
    np.testing.assert_allclose(ours, ref, equal_nan=True, rtol=1e-12)


@pytest.mark.parametrize('name', ['sum', 'min', 'max'])
def test_rolling_reducers_vs_pandas(name):
    vals = _series(31, seed=1)
    da = DataArray(vals, dims=('t',))
    ours = np.asarray(getattr(da.rolling(t=4, min_periods=2),
                              name)().values, dtype=float)
    ref = getattr(pd.Series(vals).rolling(4, min_periods=2),
                  name)().values
    np.testing.assert_allclose(ours, ref, equal_nan=True, rtol=1e-12)


def test_rolling_count_xarray_semantics():
    # xarray masks counts below max(min_periods, 1) — pandas instead
    # masks on window occupancy; we follow xarray (the parity target)
    vals = np.array([1.0, np.nan, 2.0, 3.0])
    # valid counts per window (w=3): [1, 1, 2, 2] -> all below 3
    out = DataArray(vals, dims=('t',)).rolling(
        t=3, min_periods=3).count().values
    assert np.isnan(out).all()
    out2 = DataArray(vals, dims=('t',)).rolling(
        t=2, min_periods=1).count().values
    assert out2.tolist() == [1.0, 1.0, 1.0, 2.0]


def test_groupby_mean_vs_pandas():
    rng = np.random.RandomState(2)
    vals = rng.randn(40)
    labels = rng.choice(list('abcd'), 40)
    da = DataArray(vals, dims=('t',), coords={'lab': ('t', labels)})
    ours = da.groupby('lab').mean()
    ref = pd.Series(vals).groupby(labels).mean()
    assert ours._coords['lab'].values.tolist() == list(ref.index)
    np.testing.assert_allclose(ours.values, ref.values, rtol=1e-12)


@pytest.mark.parametrize('freq', ['1M', 'MS', '2W', '10D', 'QS'])
def test_resample_mean_vs_pandas(freq):
    rng = np.random.RandomState(3)
    times = (np.datetime64('2020-01-01', 'ns')
             + np.sort(rng.randint(0, 300, 50)).astype('timedelta64[D]'))
    vals = rng.randn(50)
    da = DataArray(vals, dims=('time',), coords={'time': times}, name='v')
    ours = da.resample(time=freq).mean()
    try:
        ref = pd.Series(vals, index=pd.DatetimeIndex(times)) \
            .resample(freq).mean().dropna()
    except ValueError:
        pytest.skip('pandas rejects alias %r in this version' % freq)
    np.testing.assert_array_equal(
        ours._coords['time'].values.astype('datetime64[ns]'),
        ref.index.values.astype('datetime64[ns]'))
    np.testing.assert_allclose(ours.values, ref.values, rtol=1e-12)


def test_rolling_datetime_minmax_keeps_dtype():
    # pandas refuses rolling over datetime64 entirely; hand-computed
    # expectation (windows of 2, NaT skipped, min_periods=1)
    times = np.array(['2020-01-03', 'NaT', '2020-01-01', '2020-01-05'],
                     dtype='datetime64[ns]')
    da = DataArray(times, dims=('t',))
    out = da.rolling(t=2, min_periods=1).max()
    assert out.dtype == times.dtype
    expect = np.array(['2020-01-03', '2020-01-03', '2020-01-01',
                       '2020-01-05'], dtype='datetime64[ns]')
    np.testing.assert_array_equal(
        out.values.astype('datetime64[ns]'), expect)


def test_groupby_map_shrinking():
    da = DataArray(np.arange(6.0), dims=('t',),
                   coords={'lab': ('t', list('aabbcc'))})
    out = da.groupby('lab').map(lambda x: x.isel(t=slice(0, 1)))
    assert out.shape == (3,)
    assert out.values.tolist() == [0.0, 2.0, 4.0]
