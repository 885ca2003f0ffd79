"""Zarr v2 store: roundtrips, chunking, interop conventions."""

import json
import os
import zlib

import numpy as np
import pytest

from nd_tpu.core import DataArray, Dataset
from nd_tpu.io import open_zarr, to_zarr
from nd_tpu.testing import generate_test_dataset


def test_roundtrip_basic(tmp_path):
    ds = generate_test_dataset(dims={'y': 10, 'x': 12, 'time': 3})
    path = str(tmp_path / 'store.zarr')
    to_zarr(ds, path)
    back = open_zarr(path)
    assert set(back.data_vars) == set(ds.data_vars)
    for v in ds.data_vars:
        np.testing.assert_array_equal(np.asarray(back[v].values),
                                      np.asarray(ds[v].values))
        assert back[v].dims == ds[v].dims
    np.testing.assert_array_equal(back._coords['time'].values,
                                  ds._coords['time'].values)
    assert back.attrs['crs'] == ds.attrs['crs']


def test_roundtrip_chunked(tmp_path):
    ds = generate_test_dataset(dims={'y': 10, 'x': 12, 'time': 3})
    path = str(tmp_path / 'chunked.zarr')
    to_zarr(ds, path, chunks={'y': 4, 'x': 5})
    # chunk grid exists on disk
    files = os.listdir(os.path.join(path, 'C11'))
    assert '0.0.0' in files and '2.2.0' in files
    back = open_zarr(path)
    for v in ds.data_vars:
        np.testing.assert_array_equal(np.asarray(back[v].values),
                                      np.asarray(ds[v].values))


def test_complex_and_bool_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ds = Dataset({
        'c': (('y', 'x'), rng.rand(4, 5) + 1j * rng.rand(4, 5)),
        'm': (('y', 'x'), rng.rand(4, 5) > 0.5),
    }, coords={'y': np.arange(4), 'x': np.arange(5)})
    path = str(tmp_path / 'cplx.zarr')
    to_zarr(ds, path)
    back = open_zarr(path)
    np.testing.assert_array_equal(back['c'].values, ds['c'].values)
    assert np.iscomplexobj(back['c'].values)
    assert back['m'].dtype == np.bool_


def test_datetime_coord_roundtrip(tmp_path):
    times = np.array(['2020-01-01', '2020-02-01'],
                     dtype='datetime64[ns]')
    ds = Dataset({'v': (('time',), np.arange(2.0))},
                 coords={'time': times})
    path = str(tmp_path / 'dt.zarr')
    to_zarr(ds, path)
    back = open_zarr(path)
    np.testing.assert_array_equal(back._coords['time'].values, times)


def test_zarr_layout_is_standard(tmp_path):
    """The on-disk layout must be plain Zarr v2 + xarray conventions."""
    ds = Dataset({'v': (('y',), np.arange(6.0))},
                 coords={'y': np.arange(6)})
    path = str(tmp_path / 'std.zarr')
    to_zarr(ds, path, chunks={'y': 4})
    with open(os.path.join(path, '.zgroup')) as fh:
        assert json.load(fh)['zarr_format'] == 2
    with open(os.path.join(path, 'v', '.zarray')) as fh:
        meta = json.load(fh)
    assert meta['shape'] == [6] and meta['chunks'] == [4]
    assert meta['compressor'] == {'id': 'zlib', 'level': 5}
    with open(os.path.join(path, 'v', '.zattrs')) as fh:
        assert json.load(fh)['_ARRAY_DIMENSIONS'] == ['y']
    # decode a chunk by hand: independent readers need no library
    raw = zlib.decompress(open(os.path.join(path, 'v', '0'), 'rb')
                          .read())
    np.testing.assert_array_equal(np.frombuffer(raw, '<f8'),
                                  [0, 1, 2, 3])


def test_uncompressed_store(tmp_path):
    ds = Dataset({'v': (('y',), np.arange(4.0))})
    path = str(tmp_path / 'raw.zarr')
    to_zarr(ds, path, compress=False)
    raw = open(os.path.join(path, 'v', '0'), 'rb').read()
    np.testing.assert_array_equal(np.frombuffer(raw, '<f8'),
                                  [0, 1, 2, 3])
    back = open_zarr(path)
    np.testing.assert_array_equal(back['v'].values, ds['v'].values)


def test_dataarray_input(tmp_path):
    da = DataArray(np.arange(6.0).reshape(2, 3), dims=('y', 'x'),
                   name='v')
    path = str(tmp_path / 'da.zarr')
    to_zarr(da, path)
    back = open_zarr(path)
    np.testing.assert_array_equal(back['v'].values, da.values)


def test_missing_chunk_uses_fill_value(tmp_path):
    path = str(tmp_path / 'fill.zarr')
    ds = Dataset({'v': (('y',), np.array([1.0, 2.0, np.nan, np.nan]))})
    to_zarr(ds, path, chunks={'y': 2})
    # drop the all-NaN chunk like write_empty_chunks=False writers do
    os.remove(os.path.join(path, 'v', '1'))
    back = open_zarr(path)
    got = back['v'].values
    assert got[:2].tolist() == [1.0, 2.0]
    assert np.isnan(got[2:]).all()


def test_nondim_coords_roundtrip(tmp_path):
    ds = Dataset({'v': (('y', 'x'), np.zeros((2, 3)))},
                 coords={'y': [0, 1], 'x': [0, 1, 2]})
    ds = ds.assign_coords(lat=(('y', 'x'), np.random.rand(2, 3)),
                          tag=('x', ['a', 'b', 'c']))
    path = str(tmp_path / 'coords.zarr')
    to_zarr(ds, path)
    back = open_zarr(path)
    assert set(back.coords) >= {'y', 'x', 'lat', 'tag'}
    assert list(back.data_vars) == ['v']


def test_scalar_datetime_roundtrip(tmp_path):
    ds = Dataset({'v': (('y',), np.zeros(2))},
                 coords={'time': np.datetime64('2020-01-02T03:04:05',
                                               'ns')})
    path = str(tmp_path / 'scalar_dt.zarr')
    to_zarr(ds, path)
    back = open_zarr(path)
    tv = back.coords['time'].values
    assert np.asarray(tv).dtype.kind == 'M'
    assert np.asarray(tv) == np.datetime64('2020-01-02T03:04:05', 'ns')
    assert '_nd_tpu_datetime64' not in back.coords['time'].attrs


def test_overwrite_removes_ghost_arrays(tmp_path):
    path = str(tmp_path / 'ghost.zarr')
    to_zarr(Dataset({'a': (('y',), np.zeros(3)),
                     'b': (('y',), np.ones(3))}), path)
    to_zarr(Dataset({'a': (('y',), np.zeros(3))}), path)
    back = open_zarr(path)
    assert 'b' not in back


def test_foreign_order_rejected(tmp_path):
    path = str(tmp_path / 'f.zarr')
    to_zarr(Dataset({'v': (('y', 'x'), np.zeros((2, 2)))}), path)
    meta_path = os.path.join(path, 'v', '.zarray')
    meta = json.load(open(meta_path))
    meta['order'] = 'F'
    json.dump(meta, open(meta_path, 'w'))
    with pytest.raises(IOError, match='order'):
        open_zarr(path)


def test_consolidated_metadata_written_and_faithful(tmp_path):
    """to_zarr writes .zmetadata (zarr consolidated format 1) whose
    entries are byte-faithful copies of the per-array JSON — what
    xr.open_zarr(consolidated=True) reads in one fetch."""
    import json
    import os
    from nd_tpu.io.zarr import to_zarr
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 6, 'x': 5, 'time': 3})
    store = str(tmp_path / 'c.zarr')
    to_zarr(ds, store)
    with open(os.path.join(store, '.zmetadata')) as fh:
        cons = json.load(fh)
    assert cons['zarr_consolidated_format'] == 1
    meta = cons['metadata']
    assert '.zgroup' in meta and '.zattrs' in meta
    assert 'C11/.zarray' in meta
    for key, entry in meta.items():
        with open(os.path.join(store, *key.split('/'))) as fh:
            assert json.load(fh) == entry
    # rewriting refreshes the consolidated view
    ds2 = ds.isel(time=slice(0, 2))
    to_zarr(ds2, store)
    with open(os.path.join(store, '.zmetadata')) as fh:
        cons2 = json.load(fh)
    assert cons2['metadata']['C11/.zarray']['shape'] == [6, 5, 2]
