"""xarray-API parity surface of the core data model.

The reference framework's users interact with real ``xarray`` objects
(/root/reference/nd/__init__.py:17); these tests pin the behavior of the
TPU-native core's equivalents for the methods that the reference code
and typical xarray workflows rely on: equals/identical, accumulators,
shift/roll/pad/diff, sortby/reindex/dropna, groupby/resample/rolling,
stack/unstack on Datasets, and the pandas bridge (to_series, used by the
reference's auto_merge: /root/reference/nd/tiling.py:417).

Expected values are hand-computed (real xarray is not installed in this
image); NaN semantics follow xarray: NaN-filling promotes ints to
float64, ``equals`` treats NaN == NaN, rolling edges honor
``min_periods``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nd_tpu.core import DataArray, Dataset, concat, is_device_array


@pytest.fixture
def da():
    return DataArray(np.array([[1.0, 2.0, np.nan], [4.0, 5.0, 6.0]]),
                     dims=('y', 'x'),
                     coords={'y': [10, 20], 'x': [0, 1, 2]}, name='a')


@pytest.fixture
def ds(da):
    return Dataset({'a': (('y', 'x'), da.values.copy())},
                   coords={'y': [10, 20], 'x': [0, 1, 2]})


# -- comparison ------------------------------------------------------------

def test_equals_nan_aware(da):
    assert da.equals(da.copy())
    assert not da.equals(da + 1)
    assert not da.equals(da.rename({'x': 'z'}))


def test_identical_checks_attrs_and_name(da):
    other = da.copy()
    assert da.identical(other)
    other.attrs['units'] = 'm'
    assert other.equals(da) and not other.identical(da)
    assert not da.rename('b').identical(da)


def test_dataset_equals(ds):
    assert ds.equals(ds.copy())
    changed = ds.copy()
    changed['a'] = (('y', 'x'), np.zeros((2, 3)))
    assert not ds.equals(changed)


def test_broadcast_equals():
    a = DataArray(np.ones(3), dims=('x',))
    b = DataArray(np.ones((2, 3)), dims=('y', 'x'))
    assert a.broadcast_equals(b)
    assert not a.broadcast_equals(b + 1)


# -- accumulators / elementwise ---------------------------------------------

def test_cumsum_skips_nan(da):
    assert np.allclose(da.cumsum('x').values[0], [1.0, 3.0, 3.0])


def test_cumprod(da):
    assert np.allclose(da.cumprod('x').values[1], [4.0, 20.0, 120.0])


def test_round(da):
    assert np.allclose((da * 1.111).round(1).values[1], [4.4, 5.6, 6.7])


def test_dataset_clip(ds):
    out = ds.clip(2.0, 5.0)
    assert float(out['a'].min()) == 2.0 and float(out['a'].max()) == 5.0


# -- shift / roll / pad / diff -----------------------------------------------

def test_shift_fills_nan_and_casts_ints():
    ints = DataArray(np.arange(4), dims=('x',))
    out = ints.shift(x=2)
    assert np.issubdtype(out.dtype, np.floating)
    assert np.isnan(out.values[0]) and out.values[2] == 0


def test_shift_negative(da):
    out = da.shift(x=-1)
    assert out.values[1, 0] == 5.0 and np.isnan(out.values[1, 2])


def test_roll_coords(da):
    out = da.roll(x=1, roll_coords=True)
    assert out.values[1].tolist() == [6.0, 4.0, 5.0]
    assert out._coords['x'].values.tolist() == [2, 0, 1]
    kept = da.roll(x=1)
    assert kept._coords['x'].values.tolist() == [0, 1, 2]


def test_pad_nans_coords(da):
    out = da.pad(x=(1, 2))
    assert out.shape == (2, 6)
    assert np.isnan(out.values[:, 0]).all()
    assert np.isnan(out._coords['x'].values[0])
    assert out._coords['x'].values[1:4].tolist() == [0, 1, 2]


def test_pad_datetime_coord():
    times = np.array(['2020-01-01', '2020-01-02'], dtype='datetime64[ns]')
    da = DataArray(np.arange(2.0), dims=('time',), coords={'time': times})
    out = da.pad(time=(1, 0))
    assert np.isnat(out._coords['time'].values[0])


def test_diff(da):
    out = da.diff('y')
    assert out.shape == (1, 3)
    assert out.values[0, 0] == 3.0
    assert out._coords['y'].values.tolist() == [20]
    lower = da.diff('y', label='lower')
    assert lower._coords['y'].values.tolist() == [10]


def test_dataset_diff_keeps_other_vars(ds):
    ds = ds.copy()
    ds['scalar'] = (('y',), np.array([1.0, 2.0]))
    out = ds.diff('x')
    assert out['a'].shape == (2, 2)
    assert out['scalar'].shape == (2,)


# -- sortby / reindex / dropna ------------------------------------------------

def test_sortby_descending(da):
    out = da.sortby('y', ascending=False)
    assert out._coords['y'].values.tolist() == [20, 10]
    assert out.values[0, 0] == 4.0


def test_reindex_fill_and_nearest(da):
    out = da.reindex(x=[2, 0, 7])
    assert out.values[1].tolist()[:2] == [6.0, 4.0]
    assert np.isnan(out.values[:, 2]).all()
    assert out._coords['x'].values.tolist() == [2, 0, 7]
    near = da.reindex(x=[1.9], method='nearest')
    assert near.values[1, 0] == 6.0


def test_reindex_like(da):
    target = da.isel(x=[2, 1])
    out = da.reindex_like(target)
    assert out._coords['x'].values.tolist() == [2, 1]


def test_dropna(da):
    assert da.dropna('x').shape == (2, 2)
    assert da.dropna('x', how='all').shape == (2, 3)
    assert da.dropna('x', thresh=2).shape == (2, 2)
    assert da.dropna('x', thresh=1).shape == (2, 3)
    assert da.dropna('y').shape == (1, 3)


def test_idxmin_idxmax(da):
    assert da.idxmax('x').values.tolist() == [1, 2]
    assert da.idxmin('x').values.tolist() == [0, 0]
    assert da.idxmax('x').dims == ('y',)


# -- metadata assignment -------------------------------------------------------

def test_assign_coords_attrs(da):
    out = da.assign_coords(z=('y', [1, 2])).assign_attrs(units='m')
    assert out._coords['z'].values.tolist() == [1, 2]
    assert out.attrs['units'] == 'm'
    assert 'z' not in da._coords    # original untouched


def test_swap_dims():
    da = DataArray(np.arange(3.0), dims=('x',),
                   coords={'x': [0, 1, 2], 'lon': ('x', [10., 20., 30.])})
    out = da.swap_dims(x='lon')
    assert out.dims == ('lon',)
    assert out._coords['lon'].dims == ('lon',)
    assert out._coords['x'].dims == ('lon',)


def test_dataset_update_assign(ds):
    out = ds.copy()
    ret = out.update(Dataset({'b': (('y', 'x'), np.ones((2, 3)))}))
    assert 'b' in out and ret is out
    ds2 = ds.assign(c=lambda d: d['a'] * 2)
    assert float(ds2['c'].max()) == 12.0
    assert 'c' not in ds


def test_rename_vars_dims(ds):
    assert 'b' in ds.rename_vars(a='b')
    out = ds.rename_dims(x='col')
    assert 'col' in out.sizes and 'a' in out


def test_drop_dims(ds):
    ds = ds.copy()
    ds['v1d'] = (('y',), np.zeros(2))
    out = ds.drop_dims('x')
    assert 'a' not in out and 'v1d' in out


# -- slicing sugar ---------------------------------------------------------------

def test_head_tail_thin(da):
    assert da.head(x=2).shape == (2, 2)
    assert da.tail(x=1)._coords['x'].values.tolist() == [2]
    assert da.thin(x=2)._coords['x'].values.tolist() == [0, 2]


# -- groupby / resample / rolling -------------------------------------------------

def _labelled_series():
    return DataArray(np.arange(6.0), dims=('t',),
                     coords={'t': np.arange(6),
                             'lab': ('t', list('ababab'))}, name='v')


def test_groupby_reduce():
    g = _labelled_series().groupby('lab')
    out = g.mean()
    assert out.dims == ('lab',)
    assert out._coords['lab'].values.tolist() == ['a', 'b']
    assert out.values.tolist() == [2.0, 3.0]
    assert g.sum().values.tolist() == [6.0, 9.0]
    assert g.count().values.tolist() == [3, 3]


def test_groupby_map_restores_order():
    out = _labelled_series().groupby('lab').map(lambda x: x - x.mean('t'))
    assert out.values.tolist() == [-2.0, -2.0, 0.0, 0.0, 2.0, 2.0]
    assert out._coords['t'].values.tolist() == list(range(6))


def test_groupby_iter():
    groups = dict(iter(_labelled_series().groupby('lab')))
    assert set(groups) == {'a', 'b'}
    assert groups['a'].values.tolist() == [0.0, 2.0, 4.0]


def test_groupby_first_last():
    g = _labelled_series().groupby('lab')
    assert g.first().values.tolist() == [0.0, 1.0]
    assert g.last().values.tolist() == [4.0, 5.0]


def test_dataset_groupby():
    ds = Dataset({'v': (('t',), np.arange(6.0))},
                 coords={'t': np.arange(6), 'lab': ('t', list('ababab'))})
    out = ds.groupby('lab').mean()
    assert out['v'].values.tolist() == [2.0, 3.0]


def test_rolling_min_periods():
    da = _labelled_series()
    out = da.rolling(t=3).mean()
    assert np.isnan(out.values[:2]).all()
    assert out.values[2:].tolist() == [1.0, 2.0, 3.0, 4.0]
    relaxed = da.rolling(t=3, min_periods=1).mean()
    assert relaxed.values[0] == 0.0 and relaxed.values[1] == 0.5


def test_rolling_center():
    da = _labelled_series()
    out = da.rolling(t=3, center=True, min_periods=1).mean()
    assert out.values[0] == 0.5 and out.values[5] == 4.5


def test_rolling_construct():
    da = _labelled_series()
    win = da.rolling(t=2).construct('w')
    assert win.dims == ('t', 'w')
    assert np.isnan(win.values[0, 0]) and win.values[1].tolist() == [0.0,
                                                                     1.0]


def test_rolling_keeps_device_payload():
    da = DataArray(jnp.arange(8.0), dims=('t',))
    out = da.rolling(t=2, min_periods=1).sum()
    assert is_device_array(out.data)
    assert np.asarray(out.data)[1] == 1.0


def test_dataset_rolling():
    ds = Dataset({'v': (('t',), np.arange(6.0)),
                  'other': ((), np.float64(7.0))})
    out = ds.rolling(t=2, min_periods=2).sum()
    assert np.isnan(out['v'].values[0]) and out['v'].values[1] == 1.0
    assert float(out['other']) == 7.0


def test_resample_monthly():
    times = np.array(['2020-01-01', '2020-01-15', '2020-02-01',
                      '2020-02-20'], dtype='datetime64[ns]')
    da = DataArray(np.array([1.0, 3.0, 5.0, 7.0]), dims=('time',),
                   coords={'time': times}, name='v')
    out = da.resample(time='1M').mean()
    assert out.values.tolist() == [2.0, 6.0]
    assert out.dims == ('time',)
    # pandas/xarray label convention: 'M'/'ME' labels month ENDS
    ends = out._coords['time'].values.astype('datetime64[D]')
    assert str(ends[0]) == '2020-01-31' and str(ends[1]) == '2020-02-29'
    # ... and 'MS' labels month starts
    starts = da.resample(time='MS').mean()._coords['time'] \
        .values.astype('datetime64[D]')
    assert str(starts[0]) == '2020-01-01' and str(starts[1]) == '2020-02-01'


def test_resample_requires_datetime():
    da = _labelled_series()
    with pytest.raises(TypeError):
        da.resample(t='1M')


# -- dataset stack/unstack ----------------------------------------------------------

def test_dataset_stack_unstack_roundtrip(ds):
    st = ds.stack(z=('y', 'x'))
    assert st['a'].dims == ('z',)
    assert st['a'].shape == (6,)
    assert st.unstack().equals(ds)


def test_dataset_stack_broadcasts_missing_dims(ds):
    ds = ds.copy()
    ds['row'] = (('y',), np.array([1.0, 2.0]))
    st = ds.stack(z=('y', 'x'))
    assert st['row'].shape == (6,)
    assert st['row'].values.tolist() == [1.0, 1.0, 1.0, 2.0, 2.0, 2.0]


# -- pandas bridge --------------------------------------------------------------------

def test_to_series_multiindex(da):
    s = da.to_series()
    assert s.loc[(10, 1)] == 2.0
    assert s.index.names == ['y', 'x']
    assert np.isnan(s.loc[(10, 2)])


def test_to_series_factorize_pattern(da):
    # the reference's auto_merge uses to_series().factorize()
    # (/root/reference/nd/tiling.py:417)
    labels = DataArray(np.array(['a', 'b', 'a']), dims=('i',), name='m')
    codes, uniques = labels.to_series().factorize()
    assert codes.tolist() == [0, 1, 0]
    assert list(uniques) == ['a', 'b']


def test_to_dataframe(ds):
    df = ds.to_dataframe()
    assert df['a'].loc[(20, 2)] == 6.0


def test_to_dataframe_unnamed_dataarray_raises():
    da = DataArray(np.arange(3.0), dims=('x',))
    with pytest.raises(ValueError):
        da.to_dataframe()
    assert da.to_dataframe(name='v')['v'].iloc[2] == 2.0


def test_to_index():
    da = DataArray(np.arange(3.0), dims=('x',), coords={'x': [5, 6, 7]})
    idx = da['x'].to_index()
    assert idx.tolist() == [5, 6, 7]


# ---------------------------------------------------------------------------
# Thirteenth review round regressions
# ---------------------------------------------------------------------------

def test_where_other_aligns_by_name():
    a = DataArray(np.arange(9.).reshape(3, 3), dims=('y', 'x'))
    got = a.where(a > 4, a.transpose('x', 'y') * 100)
    # name-aligned: the fill at (y, x) is a[y, x]*100, NOT a[x, y]*100
    assert float(got.values[0, 1]) == 100.0
    # non-square shapes broadcast instead of crashing
    b = DataArray(np.arange(6.).reshape(2, 3), dims=('y', 'x'))
    got2 = b.where(b > 2, b.transpose('x', 'y') * 10)
    assert float(got2.values[0, 1]) == 10.0


def test_quantile_vector_q_new_dim():
    da = DataArray(np.arange(20.).reshape(4, 5), dims=('x', 'y'),
                   coords={'x': np.arange(4)})
    out = da.quantile([0.25, 0.75], dim='x')
    assert out.dims == ('quantile', 'y')
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out.coords['quantile'].values,
                               [0.25, 0.75])
    assert 'x' not in out.coords


def test_shift_pad_reindex_datetime_nat():
    t = np.array(['2020-01-01', '2020-01-02', '2020-01-03'],
                 dtype='datetime64[ns]')
    da = DataArray(t, dims=('time',), coords={'time': np.arange(3)})
    sh = da.shift(time=1)
    assert sh.dtype == t.dtype
    assert np.isnat(sh.values[0])
    np.testing.assert_array_equal(sh.values[1:], t[:-1])
    pd_ = da.pad(time=(1, 0))
    assert pd_.dtype == t.dtype and np.isnat(pd_.values[0])
    re = da.reindex(time=[0, 7])
    assert re.dtype == t.dtype
    assert not np.isnat(re.values[0]) and np.isnat(re.values[1])


def test_dataset_update_validates_sizes():
    ds = Dataset({'v': (('x',), np.arange(3.))})
    with pytest.raises(ValueError):
        ds.update(Dataset({'w': (('x',), np.arange(5.))}))


def test_reindex_masks_nonindex_coords():
    da = DataArray(np.arange(3.), dims=('x',),
                   coords={'x': np.array([0, 1, 2]),
                           'c': ('x', np.array([10., 11., 12.]))})
    out = da.reindex(x=[0, 3])
    np.testing.assert_allclose(out.values, [0.0, np.nan])
    vals = out.coords['c'].values
    assert vals[0] == 10.0 and np.isnan(vals[1])


def test_concat_missing_coord_fills():
    a = DataArray(np.arange(3.), dims=('t',),
                  coords={'c': ('t', np.array([1., 2., 3.]))})
    b = DataArray(np.arange(3.), dims=('t',))
    out = concat([a, b], 't')
    assert out.sizes['t'] == 6
    cv = out.coords['c'].values
    assert len(cv) == 6
    assert np.isnan(cv[3:]).all()


def test_expand_dims_dict_sizes_and_order():
    da = DataArray(np.arange(4.), dims=('x',))
    out = da.expand_dims({'z': 3})
    assert out.dims == ('z', 'x') and out.shape == (3, 4)
    out2 = da.expand_dims({'z': 2, 'w': 3})
    assert out2.dims == ('z', 'w', 'x') and out2.shape == (2, 3, 4)


def test_dataset_transpose_no_args_reverses():
    ds = Dataset({'v': (('x', 'y'), np.arange(6.).reshape(2, 3))})
    out = ds.transpose()
    assert out['v'].dims == ('y', 'x')


def test_swap_dims_validates_replacement():
    da = DataArray(np.arange(3.), dims=('x',),
                   coords={'c': (('x',), np.array([7, 8, 9]))})
    sw = da.swap_dims({'x': 'c'})
    assert sw.dims == ('c',)
    assert np.array_equal(sw.coords['c'].values, [7, 8, 9])
    bad = DataArray(np.arange(4.).reshape(2, 2), dims=('x', 'y'),
                    coords={'m': (('x', 'y'), np.arange(4.).reshape(2,
                                                                    2))})
    with pytest.raises(ValueError):
        bad.swap_dims({'x': 'm'})


# ---------------------------------------------------------------------------
# Fifteenth review round regressions
# ---------------------------------------------------------------------------

def test_isel_scalar_plus_array_keeps_axis_order():
    """int + array indexers separated by a slice must not transpose
    (numpy moves broadcast advanced axes to the front)."""
    arr = np.arange(2 * 3 * 4.).reshape(2, 3, 4)
    da = DataArray(arr, dims=('time', 'y', 'x'))
    out = da.isel(time=0, x=[0, 1, 2])
    assert out.dims == ('y', 'x') and out.shape == (3, 3)
    np.testing.assert_array_equal(out.values, arr[0][:, [0, 1, 2]])


def test_expand_dims_negative_axis():
    da = DataArray(np.arange(6.).reshape(2, 3), dims=('y', 'x'))
    out = da.variable.expand_dims('z', axis=-1)
    assert out.dims == ('y', 'x', 'z') and out.shape == (2, 3, 1)


def test_squeeze_unknown_dim_raises():
    da = DataArray(np.arange(3.), dims=('x',))
    with pytest.raises(KeyError):
        da.squeeze('tme')


def test_groupby_drops_nan_labels():
    da = DataArray(np.arange(5.), dims=('t',),
                   coords={'g': ('t', np.array([1., np.nan, 1., 2.,
                                                np.nan]))})
    out = da.groupby('g').mean()
    assert len(out.coords['g'].values) == 2
    np.testing.assert_allclose(sorted(out.coords['g'].values), [1, 2])
    np.testing.assert_allclose(
        out.sel(g=1).values if hasattr(out, 'sel') else out.values[0],
        1.0)


def test_rolling_min_periods_validated():
    da = DataArray(np.arange(5.), dims=('t',))
    with pytest.raises(ValueError):
        da.rolling(t=3, min_periods=5)


def test_generator_time_only_and_length_checks():
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'time': 4}, var=['a'])
    assert ds.sizes == {'time': 4}
    with pytest.raises(ValueError):
        generate_test_dataset(var=['a', 'b'], mean=[0])
