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


@pytest.mark.parametrize('name', ['sum', 'min', 'max', 'count'])
def test_rolling_reducers_vs_pandas(name):
    vals = _series(31, seed=1)
    da = DataArray(vals, dims=('t',))
    ours = np.asarray(getattr(da.rolling(t=4, min_periods=2),
                              name)().values, dtype=float)
    ref = getattr(pd.Series(vals).rolling(4, min_periods=2),
                  name)().values
    if name == 'count':
        # pandas count honors min_periods by masking; ours reports raw
        # counts (xarray behavior) — compare where pandas is defined
        mask = ~np.isnan(ref)
        np.testing.assert_allclose(ours[mask], ref[mask])
    else:
        np.testing.assert_allclose(ours, ref, equal_nan=True,
                                   rtol=1e-12)


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
