"""Tiling tests: tile/merge roundtrips, buffered map_over_tiles."""

import os

import numpy as np
import pytest

from nd_tpu.filters import BoxcarFilter
from nd_tpu.testing import (assert_equal_data, generate_test_dataset)
from nd_tpu.tiling import (auto_merge, debuffer, map_over_tiles,
                           sort_into_array, tile)


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 30, 'x': 24, 'time': 4})


@pytest.mark.parametrize('buffer', [0, 2])
@pytest.mark.parametrize('chunks', [{'y': 10}, {'y': 10, 'x': 10}])
def test_tile_and_merge(tmp_path, ds, chunks, buffer):
    tile(ds, str(tmp_path), chunks=chunks, buffer=buffer)
    files = [f for f in os.listdir(tmp_path) if f.endswith('.nc')]
    nx = int(np.ceil(30 / chunks.get('y', 30))) \
        * int(np.ceil(24 / chunks.get('x', 24)))
    assert len(files) == nx
    merged = auto_merge(str(tmp_path) + '/*.nc')
    for v in ds.data_vars:
        np.testing.assert_allclose(
            merged[v].transpose(*ds[v].dims).values, ds[v].values,
            rtol=1e-6)
    np.testing.assert_allclose(merged['y'].values, ds['y'].values)
    np.testing.assert_allclose(merged['x'].values, ds['x'].values)


def test_tile_resumable(tmp_path, ds):
    """Existing tiles are skipped — interrupted jobs resume."""
    tile(ds, str(tmp_path), chunks={'y': 10})
    files = sorted(os.listdir(tmp_path))
    mtimes = {f: os.path.getmtime(os.path.join(tmp_path, f))
              for f in files}
    tile(ds, str(tmp_path), chunks={'y': 10})
    for f in files:
        assert os.path.getmtime(os.path.join(tmp_path, f)) == mtimes[f]


def test_map_over_tiles_identity(tmp_path, ds):
    tile(ds, str(tmp_path), chunks={'y': 10})
    result = map_over_tiles(str(tmp_path) + '/*.nc', lambda d: d)
    for v in ds.data_vars:
        np.testing.assert_allclose(
            result[v].transpose(*ds[v].dims).values, ds[v].values,
            rtol=1e-6)


def test_map_over_tiles_scaling(tmp_path, ds):
    tile(ds, str(tmp_path), chunks={'y': 10})
    result = map_over_tiles(str(tmp_path) + '/*.nc', lambda d: d * 2)
    for v in ds.data_vars:
        np.testing.assert_allclose(
            result[v].transpose(*ds[v].dims).values,
            ds[v].values * 2, rtol=1e-6)


def test_map_over_tiles_with_buffer_matches_whole_image(tmp_path, ds):
    """Boxcar over buffered tiles == boxcar over the whole image."""
    f = BoxcarFilter(w=3)
    whole = f.apply(ds)
    tile(ds, str(tmp_path), chunks={'y': 10}, buffer=1)
    result = map_over_tiles(str(tmp_path) + '/*.nc',
                            lambda d: f.apply(d))
    for v in ds.data_vars:
        np.testing.assert_allclose(
            result[v].transpose(*ds[v].dims).values,
            whole[v].values, rtol=1e-6)


def test_map_over_tiles_deferred(tmp_path, ds):
    tile(ds, str(tmp_path), chunks={'y': 15})
    delayed = map_over_tiles(str(tmp_path) + '/*.nc', lambda d: d,
                             compute=False)
    result = delayed.compute()
    assert set(result.data_vars) == set(ds.data_vars)


def test_sort_into_array(ds):
    from nd_tpu.utils import xr_split
    parts = list(xr_split(ds, 'y', 3))
    grid = sort_into_array(parts)
    ydim = list(ds.sizes).index('y')
    assert grid.shape[ydim] == 3


def test_auto_merge_meta_variables(tmp_path, ds):
    tile(ds, str(tmp_path), chunks={'y': 15})
    files = sorted(str(tmp_path) + '/' + f for f in os.listdir(tmp_path))
    from nd_tpu.io import open_netcdf
    opened = [open_netcdf(f) for f in files]
    for i, o in enumerate(opened):
        o.attrs['orbit'] = 'ascending'
    merged = auto_merge(opened, meta_variables=['orbit'])
    assert 'orbit' in merged
    assert 'legend' in merged._variables['orbit'].attrs


def test_reproject_then_tile_merge_roundtrip(tmp_path):
    """BASELINE config 5: reprojection + tile/merge of a multi-tile
    cube — the merged mosaic equals the unsplit reprojection."""
    from nd_tpu.warp import Reprojection

    ds = generate_test_dataset(dims={'y': 40, 'x': 36, 'time': 3})
    proj = Reprojection(crs='epsg:3395')
    whole = proj.apply(ds)

    tile(whole, str(tmp_path), chunks={'y': 16, 'x': 16})
    merged = auto_merge(str(tmp_path) + '/*.nc')
    for v in ds.data_vars:
        np.testing.assert_allclose(
            merged[v].transpose(*whole[v].dims).values,
            whole[v].values, rtol=1e-6, equal_nan=True)


def test_map_over_tiles_change_detection(tmp_path):
    """Omnibus change detection distributed over disk tiles matches the
    whole-cube result (pixelwise op: buffer 0)."""
    from nd_tpu.change import OmnibusTest

    ds = generate_test_dataset(dims={'y': 24, 'x': 24, 'time': 6},
                               mean=[1, 0, 0, 1], sigma=0.1)
    for v in ('C11', 'C22'):
        ds[v] = (ds[v].dims, np.abs(ds[v].values) + 0.5)
    algo = OmnibusTest(n=9, alpha=0.9)
    whole = algo.apply(ds)

    tile(ds, str(tmp_path), chunks={'y': 8})
    result = map_over_tiles(
        str(tmp_path) + '/*.nc',
        lambda d: algo.apply(d).to_dataset(name='change'))
    np.testing.assert_array_equal(
        np.asarray(result['change'].transpose('y', 'x', 'time').values)
        .astype(bool),
        np.asarray(whole.values))
