"""Lazy / chunked NetCDF reads (VERDICT round-1 item 7): the
reference opens datasets dask-backed (``chunks={}``,
/root/reference/nd/tiling.py:382-385) so larger-than-RAM files can
stream; here data variables become LazyNetCDFArray views that read
only the touched slab."""

import os

import numpy as np
import pytest

from nd_tpu.core.dataarray import Dataset
from nd_tpu.io import open_netcdf, to_netcdf
from nd_tpu.io.lazy import LazyNetCDFArray


@pytest.fixture
def ncfile(tmp_path):
    rng = np.random.RandomState(0)
    ds = Dataset(
        {'a': (('y', 'x', 'time'), rng.rand(40, 50, 6)
               .astype(np.float32)),
         'b': (('y', 'x'), (rng.rand(40, 50) * 100)
               .astype(np.int32)),
         'label': (('y',), np.array(['r%d' % i for i in range(40)]))},
        coords={'y': np.arange(40.0), 'x': np.arange(50.0),
                'time': np.array(['2020-01-%02d' % (d + 1)
                                  for d in range(6)],
                                 dtype='datetime64[ns]')})
    path = str(tmp_path / 'cube.nc')
    to_netcdf(ds, path)
    return path, ds


def test_lazy_open_defers_reads(ncfile, monkeypatch):
    path, ds = ncfile
    reads = []
    orig = LazyNetCDFArray._read

    def counting_read(self):
        reads.append(self.shape)
        return orig(self)

    monkeypatch.setattr(LazyNetCDFArray, '_read', counting_read)
    lazy = open_netcdf(path, chunks={})
    assert isinstance(lazy['a'].data, LazyNetCDFArray)
    assert isinstance(lazy['b'].data, LazyNetCDFArray)
    # string variables and coordinates stay eager
    assert isinstance(lazy['label'].data, np.ndarray)
    assert reads == []                         # nothing read at open

    # dtype/shape metadata available without reading
    assert lazy['a'].dtype == np.float32
    assert lazy['a'].shape == (40, 50, 6)
    assert reads == []

    # an isel slab reads only that slab
    sub = lazy.isel(y=slice(10, 20), x=slice(0, 25))
    assert reads == []
    vals = np.asarray(sub['a'].values)
    assert reads == [(10, 25, 6)]
    np.testing.assert_allclose(
        vals, np.asarray(ds['a'].values)[10:20, :25], rtol=1e-7)


def test_lazy_roundtrip_matches_eager(ncfile):
    path, ds = ncfile
    eager = open_netcdf(path)
    lazy = open_netcdf(path, chunks={})
    for v in ('a', 'b'):
        np.testing.assert_array_equal(np.asarray(lazy[v].values),
                                      np.asarray(eager[v].values))
        assert lazy[v].dims == eager[v].dims
        assert lazy[v].dtype == eager[v].dtype
    np.testing.assert_array_equal(
        np.asarray(lazy.coords['time'].values),
        np.asarray(eager.coords['time'].values))


def test_lazy_cf_decode_per_slab(tmp_path):
    # packed int16 with fill sentinel + scale/offset decodes slab-wise
    import h5py
    path = str(tmp_path / 'packed.nc')
    raw = np.arange(24, dtype=np.int16).reshape(4, 6)
    raw[1, 2] = -99
    with h5py.File(path, 'w') as f:
        d = f.create_dataset('v', data=raw)
        d.attrs['_FillValue'] = np.int16(-99)
        d.attrs['scale_factor'] = 0.5
        d.attrs['add_offset'] = 10.0
    eager = open_netcdf(path, rename_latlon=False)
    lazy = open_netcdf(path, rename_latlon=False, chunks={})
    assert isinstance(lazy['v'].data, LazyNetCDFArray)
    assert lazy['v'].dtype == np.float64      # decoded dtype, no read
    np.testing.assert_array_equal(np.asarray(lazy['v'].values),
                                  np.asarray(eager['v'].values))
    # slab read decodes only the slab (fill -> NaN, unpack applied)
    slab = np.asarray(lazy['v'].isel(
        {lazy['v'].dims[0]: slice(1, 2)}).values)
    expect = raw[1].astype(np.float64) * 0.5 + 10.0
    expect[2] = np.nan
    np.testing.assert_array_equal(slab[0], expect)


def test_lazy_datetime_decode(tmp_path):
    import h5py
    path = str(tmp_path / 'times.nc')
    days = np.arange(10, dtype=np.int32).reshape(2, 5)
    with h5py.File(path, 'w') as f:
        d = f.create_dataset('t', data=days)
        d.attrs['units'] = 'days since 2021-06-01'
    lazy = open_netcdf(path, rename_latlon=False, chunks={})
    assert isinstance(lazy['t'].data, LazyNetCDFArray)
    assert lazy['t'].dtype == np.dtype('datetime64[ns]')
    vals = np.asarray(lazy['t'].values)
    assert vals[0, 0] == np.datetime64('2021-06-01')
    assert vals[1, 4] == np.datetime64('2021-06-10')


def test_lazy_indexing_composes(ncfile):
    path, ds = ncfile
    lazy = open_netcdf(path, chunks={})
    arr = lazy['a'].data
    view = arr[5:30][2:10:2, 3]
    assert isinstance(view, LazyNetCDFArray)
    ref = np.asarray(ds['a'].values)[5:30][2:10:2, 3]
    np.testing.assert_array_equal(np.asarray(view), ref)
    # int drops the axis lazily
    row = arr[7]
    assert isinstance(row, LazyNetCDFArray)
    np.testing.assert_array_equal(np.asarray(row),
                                  np.asarray(ds['a'].values)[7])
    # negative / fancy fall back to a materialized read
    np.testing.assert_array_equal(arr[[1, 3]],
                                  np.asarray(ds['a'].values)[[1, 3]])


def test_tile_streams_lazily(ncfile, tmp_path, monkeypatch):
    """tile() from a path never materializes the full cube: the
    biggest observed read is one (buffered) tile slab."""
    from nd_tpu.tiling import auto_merge, tile

    path, ds = ncfile
    reads = []
    orig = LazyNetCDFArray._read

    def counting_read(self):
        reads.append(self.size)
        return orig(self)

    monkeypatch.setattr(LazyNetCDFArray, '_read', counting_read)
    out = str(tmp_path / 'tiles')
    tile(path, out, chunks={'y': 10, 'x': 25}, buffer=1)
    full = 40 * 50 * 6
    assert reads, 'tiling must have read slabs'
    assert max(reads) < full / 2, (max(reads), full)

    merged = auto_merge(os.path.join(out, '*.nc'))
    np.testing.assert_allclose(
        np.asarray(merged['a'].transpose(*ds['a'].dims).values),
        np.asarray(ds['a'].values), rtol=1e-7)


def test_out_of_core_pipeline_under_rss_cap(tmp_path):
    """End-to-end out-of-core contract: a cube bigger than an
    enforced address-space cap streams through tile -> filter ->
    merge in a subprocess that could not hold it twice over."""
    import subprocess
    import sys

    script = r'''
import os, resource, sys
import numpy as np
cap = 900 * 1024 * 1024     # jax+numpy imports fit in ~190 MB RSS
resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
import h5py
root = sys.argv[1]
src = os.path.join(root, 'big.nc')
# 768 MB cube, written slab-by-slab (never held whole)
NY, NX, K = 4000, 4000, 12
with h5py.File(src, 'w') as f:
    d = f.create_dataset('sar', shape=(NY, NX, K), dtype='f4')
    rng = np.random.RandomState(0)
    for y0 in range(0, NY, 500):
        d[y0:y0 + 500] = rng.rand(500, NX, K).astype('f4')
    for i, (nm, n) in enumerate((('y', NY), ('x', NX), ('k', K))):
        s = f.create_dataset(nm, data=np.arange(n, dtype='f8'))
        s.make_scale(nm)
        d.dims[i].attach_scale(s)

import jax
jax.config.update('jax_platforms', 'cpu')
import nd_tpu
from nd_tpu.io import open_netcdf
from nd_tpu.tiling import tile, map_over_tiles

# the cube cannot be loaded eagerly under this cap
try:
    eager = open_netcdf(src, rename_latlon=False)
    np.asarray(eager['sar'].values).sum()
    sys.exit('eager open unexpectedly fit under the cap')
except (MemoryError, OSError):
    pass

# ... but it streams through the lazy tile pipeline
tiles = os.path.join(root, 'tiles')
tile(src, tiles, chunks={'y': 256}, buffer=1, max_workers=1)
outs = map_over_tiles(os.path.join(tiles, '*.nc'),
                      lambda d: d.isel(y=slice(None)) * 1.0,
                      merge=False, compute=True, max_workers=1)
assert len(outs) == (NY + 255) // 256
print('OK')
'''
    proc = subprocess.run(
        [sys.executable, '-c', script, str(tmp_path)],
        capture_output=True, text=True, timeout=540,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu',
             'XLA_FLAGS': '--xla_force_host_platform_device_count=1'})
    assert proc.returncode == 0, \
        (proc.stdout[-1000:], proc.stderr[-3000:])
    assert 'OK' in proc.stdout


# ---------------------------------------------------------------------------
# lazy GeoTIFF (windowed strip/tile decode)
# ---------------------------------------------------------------------------

def _write_tif(path, data, **kw):
    from nd_tpu.io.geotiff import write_geotiff
    write_geotiff(str(path), data, **kw)


@pytest.mark.parametrize('tiled', [False, True])
@pytest.mark.parametrize('compress', [False, True])
def test_lazy_rasterio_matches_eager(tmp_path, tiled, compress):
    from nd_tpu.io import open_rasterio
    rng = np.random.RandomState(0)
    data = (rng.rand(3, 70, 53) * 100).astype(np.float32)
    p = tmp_path / 'r.tif'
    _write_tif(p, data, tiled=tiled, tile_size=32, compress=compress)
    eager = open_rasterio(p)
    lazy = open_rasterio(p, chunks={})
    from nd_tpu.io.lazy import LazyGeoTIFFArray
    assert isinstance(lazy.variable.data, LazyGeoTIFFArray)
    np.testing.assert_array_equal(np.asarray(lazy.values), eager.values)
    win = lazy.isel(y=slice(5, 41), x=slice(17, 50), band=slice(1, 3))
    np.testing.assert_array_equal(
        np.asarray(win.values), data[1:3, 5:41, 17:50])


def test_lazy_rasterio_reads_only_needed_blocks(tmp_path, monkeypatch):
    """A one-tile window must not decode the rest of the raster."""
    from nd_tpu.io import open_rasterio
    from nd_tpu.io import geotiff as gt
    rng = np.random.RandomState(1)
    data = (rng.rand(1, 128, 128) * 100).astype(np.float32)
    p = tmp_path / 'r.tif'
    _write_tif(p, data, tiled=True, tile_size=32)
    calls = []
    orig = gt._decompress

    def counting(b, c):
        calls.append(len(b))
        return orig(b, c)

    monkeypatch.setattr(gt, '_decompress', counting)
    lazy = open_rasterio(p, chunks={})
    sub = np.asarray(lazy.isel(y=slice(0, 32), x=slice(0, 32)).values)
    np.testing.assert_array_equal(sub[0], data[0, :32, :32])
    assert len(calls) == 1          # 1 of 16 tiles decoded


def test_lazy_rasterio_steps_and_int_axes(tmp_path):
    from nd_tpu.io.lazy import LazyGeoTIFFArray
    rng = np.random.RandomState(2)
    data = (rng.rand(2, 40, 40) * 10).astype(np.float32)
    p = tmp_path / 's.tif'
    _write_tif(p, data, tiled=True, tile_size=16)
    la = LazyGeoTIFFArray.from_file(str(p), data.shape, np.float32)
    np.testing.assert_array_equal(np.asarray(la[1, ::3, 5:30:2]),
                                  data[1, ::3, 5:30:2])
    np.testing.assert_array_equal(np.asarray(la[:, 10, :]),
                                  data[:, 10, :])
    np.testing.assert_array_equal(np.asarray(la[0][2:30][::2]),
                                  data[0][2:30][::2])
    np.testing.assert_array_equal(np.asarray(la[:, ::-1]),
                                  data[:, ::-1])


def test_lazy_rasterio_planar_and_predictor(tmp_path):
    """Windowed decode on hand-rolled planar/predictor layouts: the
    write path is planar band-sequential already; cover int16 too."""
    from nd_tpu.io import open_rasterio
    rng = np.random.RandomState(3)
    data = (rng.rand(2, 37, 29) * 1000).astype(np.int16)
    p = tmp_path / 'p.tif'
    _write_tif(p, data, compress=True)
    lazy = open_rasterio(p, chunks={})
    np.testing.assert_array_equal(
        np.asarray(lazy.isel(band=1, y=slice(30, 37)).values),
        data[1, 30:37])


def test_tile_streams_lazy_geotiff(tmp_path):
    """tile() over a lazily-opened raster materializes per tile."""
    from nd_tpu.io import open_rasterio
    from nd_tpu.tiling import tile
    from nd_tpu import auto_merge
    from nd_tpu.crs import Affine
    rng = np.random.RandomState(4)
    data = (rng.rand(1, 64, 64) * 100).astype(np.float32)
    p = tmp_path / 'big.tif'
    _write_tif(p, data, tiled=True, tile_size=16,
               transform=Affine(0.01, 0, 10.0, 0, -0.01, 50.0),
               crs='epsg:4326')
    da = open_rasterio(p, chunks={})
    ds = da.to_dataset(name='v')
    tile(ds, str(tmp_path / 'tiles'), chunks={'y': 32, 'x': 32})
    merged = auto_merge(str(tmp_path / 'tiles' / '*.nc'))
    np.testing.assert_array_equal(merged['v'].values, data)
