"""Regression tests for defects found in the high-effort code review:
TIFF predictor decoding, NLMeans on bare DataArrays, Dataset integrity
(setitem validation, squeeze guard, dim-named variables), complex
reassembly name anchoring, NaT nullness, nanosecond time roundtrips,
DBF logical fields, and mixed-dim concat."""

import os
import struct
import zlib

import numpy as np
import pytest

from nd_tpu.core import DataArray, Dataset, concat
from nd_tpu.filters import NLMeansFilter
from nd_tpu.io import assemble_complex, open_dataset, to_netcdf
from nd_tpu.io.geotiff import TiffFile


# -- TIFF horizontal predictor ------------------------------------------------

def _write_predictor2_tiff(path, img):
    """Minimal little-endian single-strip deflate TIFF with predictor=2."""
    h, w = img.shape
    diff = img.astype(np.int64)
    diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
    payload = zlib.compress(diff.astype(np.uint8).tobytes())

    def entry(tag, typ, count, value):
        return struct.pack('<HHII', tag, typ, count, value)

    n = 12
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    tags = [
        entry(256, 3, 1, w),            # ImageWidth
        entry(257, 3, 1, h),            # ImageLength
        entry(258, 3, 1, 8),            # BitsPerSample
        entry(259, 3, 1, 8),            # Compression: deflate
        entry(262, 3, 1, 1),            # Photometric
        entry(273, 4, 1, data_off),     # StripOffsets
        entry(277, 3, 1, 1),            # SamplesPerPixel
        entry(278, 3, 1, h),            # RowsPerStrip
        entry(279, 4, 1, len(payload)),  # StripByteCounts
        entry(317, 3, 1, 2),            # Predictor: horizontal
        entry(339, 3, 1, 1),            # SampleFormat: unsigned
        entry(284, 3, 1, 1),            # PlanarConfig
    ]
    with open(path, 'wb') as fh:
        fh.write(b'II*\x00' + struct.pack('<I', ifd_off))
        fh.write(struct.pack('<H', n))
        fh.write(b''.join(tags))
        fh.write(struct.pack('<I', 0))
        fh.write(payload)


def test_geotiff_predictor2_horizontal(tmp_path):
    img = (np.arange(16, dtype=np.uint8).reshape(4, 4) * 3)
    path = str(tmp_path / 'pred2.tif')
    _write_predictor2_tiff(path, img)
    out = TiffFile(path).read()
    np.testing.assert_array_equal(out[0], img)


# -- NLMeans on bare DataArrays -------------------------------------------------

def test_nlmeans_dataarray_2d_matches_dataset():
    rng = np.random.RandomState(0)
    data = rng.rand(16, 16).astype(np.float64)
    da = DataArray(data, dims=('y', 'x'), name='v')
    ds = Dataset({'v': (('y', 'x'), data)})
    flt = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5, h=0.3)
    out_da = flt.apply(da)
    out_ds = flt.apply(ds)
    assert out_da.dims == ('y', 'x')
    np.testing.assert_allclose(np.asarray(out_da.values),
                               np.asarray(out_ds['v'].values),
                               rtol=1e-6)


def test_nlmeans_dataarray_3d_filters_correct_axes():
    rng = np.random.RandomState(1)
    data = rng.rand(3, 12, 12).astype(np.float64)
    da = DataArray(data, dims=('time', 'y', 'x'), name='v')
    ds = Dataset({'v': (('time', 'y', 'x'), data.copy())})
    flt = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5, h=0.3)
    out_da = flt.apply(da)
    out_ds = flt.apply(ds)
    assert out_da.dims == ('time', 'y', 'x')
    np.testing.assert_allclose(np.asarray(out_da.values),
                               np.asarray(out_ds['v'].values),
                               rtol=1e-6)


# -- Dataset integrity --------------------------------------------------------------

def test_setitem_conflicting_overwrite_rejected():
    ds = Dataset()
    ds['a'] = (('x',), np.zeros(5))
    ds['b'] = (('x',), np.zeros(5))
    with pytest.raises(ValueError, match='conflicts'):
        ds['a'] = (('x',), np.zeros(3))
    assert ds.sizes == {'x': 5}
    assert 'b' in ds


def test_setitem_dim_named_variable_becomes_coord():
    ds = Dataset()
    ds['v'] = (('x',), np.arange(4.0))
    ds['x'] = (('x',), np.array([10, 20, 30, 40]))
    assert 'x' in ds._coords and 'x' not in ds._variables
    assert ds.sel(x=30)['v'].item() == 2.0


def test_dim_named_variable_netcdf_roundtrip(tmp_path):
    ds = Dataset()
    ds['v'] = (('x',), np.arange(4.0))
    ds['x'] = (('x',), np.array([10., 20., 30., 40.]))
    path = str(tmp_path / 'dimvar.nc')
    to_netcdf(ds, path)
    back = open_dataset(path)
    assert back._coords['x'].values.tolist() == [10., 20., 30., 40.]


def test_squeeze_rejects_long_dim():
    ds = Dataset(coords={'time': np.arange(5)})
    with pytest.raises(ValueError, match='squeeze'):
        ds.squeeze('time')
    one = Dataset({'a': (('t', 'x'), np.zeros((1, 3)))})
    assert one.squeeze('t')['a'].dims == ('x',)


def test_concat_mixed_dims():
    a = DataArray(np.zeros((2, 3)), dims=('t', 'x'))
    b = DataArray(np.ones(3), dims=('x',))
    out = concat([a, b], dim='t')
    assert out.shape == (3, 3)
    assert out.values[2].tolist() == [1.0, 1.0, 1.0]
    with pytest.raises(ValueError, match='new dim'):
        concat([b, a], dim='t')


# -- complex reassembly name anchoring ------------------------------------------------

def test_assemble_complex_ignores_lookalike_names():
    ds = Dataset({
        'x_realistic': (('i',), np.arange(3.0)),
        'x_imagery': (('i',), np.arange(3.0)),
        'c__re': (('i',), np.arange(3.0)),
        'c__im': (('i',), np.arange(3.0)),
    })
    out = assemble_complex(ds)
    assert 'x_realistic' in out and 'x_imagery' in out
    assert 'c' in out and np.iscomplexobj(out['c'].values)


# -- NaT nullness -----------------------------------------------------------------------

def test_nat_is_null():
    times = np.array(['2020-01-01', 'NaT', '2020-01-03'],
                     dtype='datetime64[ns]')
    da = DataArray(times, dims=('t',))
    assert da.isnull().values.tolist() == [False, True, False]
    assert int(da.count()) == 2
    assert da.dropna('t').shape == (2,)


# -- nanosecond time precision -------------------------------------------------------

def test_netcdf_nanosecond_time_roundtrip(tmp_path):
    times = (np.array(['2020-01-01'], dtype='datetime64[ns]')
             + np.timedelta64(123456789, 'ns'))
    ds = Dataset({'v': (('time',), np.arange(1.0))},
                 coords={'time': times})
    path = str(tmp_path / 'ns.nc')
    to_netcdf(ds, path)
    back = open_dataset(path)
    assert back._coords['time'].values[0] == times[0]


def test_netcdf_microsecond_times_stay_micro(tmp_path):
    # micro-resolution data keeps the more portable encoding
    times = np.array(['2020-01-01T00:00:00.000001'],
                     dtype='datetime64[ns]')
    ds = Dataset({'v': (('time',), np.arange(1.0))},
                 coords={'time': times})
    path = str(tmp_path / 'us.nc')
    to_netcdf(ds, path)
    back = open_dataset(path)
    assert back._coords['time'].values[0] == times[0]


# -- DBF logical fields -----------------------------------------------------------------

def _write_minimal_dbf(path, flags):
    """One 'L' field named FLAG, one record per entry in ``flags``."""
    nrec = len(flags)
    header_len = 32 + 32 + 1
    record_len = 1 + 1
    with open(path, 'wb') as fh:
        fh.write(struct.pack('<B3BIHH20x', 3, 20, 1, 1, nrec,
                             header_len, record_len))
        name = b'FLAG' + b'\x00' * 7
        fh.write(struct.pack('<11sc4xBB14x', name, b'L', 1, 0))
        fh.write(b'\r')
        for v in flags:
            fh.write(b' ' + v)
        fh.write(b'\x1a')


def test_dbf_logical_unset_is_false(tmp_path):
    from nd_tpu.vector.shapefile import _read_dbf
    path = str(tmp_path / 'flags.dbf')
    _write_minimal_dbf(path, [b'T', b'F', b' ', b'?', b'Y'])
    records = _read_dbf(path)
    assert [r['FLAG'] for r in records] == [True, False, False, False,
                                            True]


# -- second review round: split/merge, sharded paths, auto_merge -----------------

def test_xr_split_merge_awkward_sizes():
    from nd_tpu.utils import xr_split, xr_merge
    for n in (5, 7, 11, 13, 24):
        for chunks in (2, 3, 5, 8):
            for buf in (0, 1, 2):
                ds = Dataset({'a': (('y',), np.arange(float(n)))})
                parts = list(xr_split(ds, 'y', chunks, buf))
                assert all(p.sizes['y'] > 0 for p in parts)
                assert xr_merge(parts, 'y', buf).equals(ds)


def test_parallel_filter_awkward_shape():
    from nd_tpu.filters import BoxcarFilter
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 11, 'x': 15, 'time': 3})
    f = BoxcarFilter(w=3)
    a = f.apply(ds, njobs=1)
    b = f.apply(ds, njobs=6)
    assert dict(b.sizes) == dict(a.sizes)
    for v in a.data_vars:
        np.testing.assert_allclose(np.asarray(a[v].values),
                                   np.asarray(b[v].values))


def test_apply_sharded_dataarray_joint_filter():
    from nd_tpu.filters import NLMeansFilter
    from nd_tpu.parallel import apply_sharded
    rng = np.random.RandomState(0)
    da = DataArray(rng.rand(16, 24, 3), dims=('y', 'x', 'time'),
                   name='v')
    algo = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5, h=0.3)
    serial = algo.apply(da)
    sharded = apply_sharded(algo, da)
    np.testing.assert_allclose(np.asarray(sharded.values),
                               np.asarray(serial.values), rtol=1e-6)
    da2 = DataArray(rng.rand(16, 24), dims=('y', 'x'), name='v')
    np.testing.assert_allclose(
        np.asarray(apply_sharded(algo, da2).values),
        np.asarray(algo.apply(da2).values), rtol=1e-6)


def test_sharded_change_detection_non_divisible():
    from nd_tpu.parallel import sharded_change_detection
    from nd_tpu.change import _omnibus_change_detection
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 13, 'x': 10, 'time': 5})
    serial = _omnibus_change_detection(ds, alpha=0.5)
    sharded = sharded_change_detection(ds, alpha=0.5)
    assert sharded.shape == serial.shape
    np.testing.assert_array_equal(np.asarray(sharded.values),
                                  np.asarray(serial.values))


def test_auto_merge_meta_without_time(tmp_path):
    from nd_tpu.tiling import auto_merge
    a = Dataset({'v': (('y', 'x'), np.zeros((2, 3)))},
                coords={'y': [0, 1], 'x': [0, 1, 2]},
                attrs={'sensor': 'S1A'})
    b = Dataset({'v': (('y', 'x'), np.ones((2, 3)))},
                coords={'y': [2, 3], 'x': [0, 1, 2]},
                attrs={'sensor': 'S1A'})
    merged = auto_merge([a, b], buffer=False, meta_variables=['sensor'])
    assert 'time' not in merged.sizes
    assert merged._variables['sensor'].dims == ()
    assert merged._variables['sensor'].attrs['legend'] == ((0, 'S1A'),)


# -- third review round: io/crs/vector fixes ------------------------------------

def test_dimap_affine_latlon_orientation(tmp_path):
    # reference frame (io.py:404-407): lat = a*rows + c, lon = e*cols + f
    from nd_tpu.io.beam_dimap import open_beam_dimap
    data_dir = tmp_path / 'prod.data'
    data_dir.mkdir()
    dim = tmp_path / 'prod.dim'
    # i2m column-major (a, d, b, e, c, f) with the reference's reorder
    # transf[::-1].reshape(3,2).T -> gdal order; pick a north-up case
    # whose lat/lon ranges are unambiguous: lat0=50 step -0.0005,
    # lon0=10 step 0.001
    i2m = '0.001,0.0,0.0,-0.0005,10.0,50.0'
    transf = np.array([float(v) for v in i2m.split(',')])
    gdal = transf[::-1].reshape(3, 2).T.flatten()
    from nd_tpu.crs import Affine
    aff = Affine.from_gdal(*gdal)
    lat = aff.a * np.arange(3) + aff.c
    lon = aff.e * np.arange(4) + aff.f
    assert 49 < lat.max() <= 50.01 and lat.min() > 49, lat
    assert 9.9 < lon.min() < lon.max() < 10.1, lon
    dim.write_text("""<?xml version="1.0"?>
<Dimap_Document>
  <Raster_Dimensions><NCOLS>4</NCOLS><NROWS>3</NROWS>
    <NBANDS>0</NBANDS></Raster_Dimensions>
  <Coordinate_Reference_System><WKT>GEOGCS["WGS 84",DATUM["WGS_1984",
    SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
    UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]</WKT>
  </Coordinate_Reference_System>
  <Geoposition><IMAGE_TO_MODEL_TRANSFORM>%s</IMAGE_TO_MODEL_TRANSFORM>
  </Geoposition>
</Dimap_Document>""" % i2m)
    ds = open_beam_dimap(str(dim))
    got_lat = np.asarray(ds.coords['lat'].values)
    got_lon = np.asarray(ds.coords['lon'].values)
    assert got_lat.min() > 45 and got_lat.max() <= 50.01, got_lat
    assert 9 < got_lon.min() and got_lon.max() < 11, got_lon


def test_cf_fill_masked_before_scaling(tmp_path):
    import h5py
    path = str(tmp_path / 'packed.nc')
    with h5py.File(path, 'w') as f:
        d = f.create_dataset('v', data=np.array([100, -9999, 200],
                                                np.int16))
        d.attrs['scale_factor'] = 0.01
        d.attrs['_FillValue'] = np.int16(-9999)
        d.make_scale('v')   # 1-d, no dims needed
    from nd_tpu.io import open_netcdf
    ds = open_netcdf(path)
    v = np.asarray(ds['v'].values) if 'v' in ds.data_vars \
        else np.asarray(ds.coords['v'].values)
    assert v[0] == pytest.approx(1.0)
    assert np.isnan(v[1])
    assert v[2] == pytest.approx(2.0)


def test_cf_int_fill_without_scale(tmp_path):
    import h5py
    path = str(tmp_path / 'intfill.nc')
    with h5py.File(path, 'w') as f:
        d = f.create_dataset('v', data=np.array([1, -9999, 3], np.int32))
        d.attrs['_FillValue'] = np.int32(-9999)
        d.make_scale('v')
    from nd_tpu.io import open_netcdf
    ds = open_netcdf(path)
    v = np.asarray(ds['v'].values) if 'v' in ds.data_vars \
        else np.asarray(ds.coords['v'].values)
    assert np.isnan(v[1]) and v[0] == 1 and v[2] == 3


WKT2_UTM33 = '''PROJCRS["WGS 84 / UTM zone 33N",
  BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",
    ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0]],
  CONVERSION["UTM zone 33N",METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
    PARAMETER["Longitude of natural origin",15,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
    PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],
    PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],
    PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],
  CS[Cartesian,2],
  AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
  AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]],
  ID["EPSG",32633]]'''


def test_wkt2_projcrs_parses():
    from nd_tpu.crs import CRS
    crs = CRS.from_string(WKT2_UTM33)
    assert crs.is_projected
    assert crs.params['proj'] == 'tmerc'
    assert crs.params['lon_0'] == 15
    assert crs.params['k'] == pytest.approx(0.9996)
    assert crs.params['x_0'] == 500000
    assert crs.to_epsg() == 32633
    ref = CRS.from_epsg(32633)
    assert crs == ref


def test_wkt1_inner_authority_not_taken():
    from nd_tpu.crs import CRS
    wkt = ('PROJCS["custom",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
           'AUTHORITY["EPSG","4326"]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["central_meridian",-2],'
           'PARAMETER["latitude_of_origin",49],'
           'UNIT["metre",1,AUTHORITY["EPSG","9001"]]]')
    crs = CRS.from_wkt(wkt)
    assert crs.to_epsg() is None     # no root authority: no EPSG


def test_polar_stereo_wkt_roundtrip_keeps_lat_ts():
    from nd_tpu.crs import CRS
    src = CRS.from_epsg(3413)
    back = CRS.from_wkt(src.to_wkt())
    assert back.params.get('lat_ts') == src.params.get('lat_ts')
    assert back == src


def test_unknown_ellipsoid_clear_error_and_krass():
    from nd_tpu.crs import CRS
    crs = CRS.from_proj4('+proj=longlat +ellps=krass')
    assert crs.ellipsoid.a == pytest.approx(6378245.0)
    with pytest.raises(ValueError, match='ellipsoid'):
        CRS.from_proj4('+proj=longlat +ellps=nosuch')


def test_geotiff_custom_crs_roundtrip(tmp_path):
    from nd_tpu.io.geotiff import write_geotiff, TiffFile
    from nd_tpu.crs import CRS, Affine
    crs = CRS.from_proj4(
        '+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 '
        '+x_0=400000 +y_0=-100000 +ellps=airy')
    path = str(tmp_path / 'custom.tif')
    write_geotiff(path, np.zeros((4, 5), np.float32),
                  transform=Affine(10, 0, 0, 0, -10, 100), crs=crs)
    back = TiffFile(path).crs
    assert back is not None and back == crs


def test_geotiff_unknown_predictor_rejected(tmp_path):
    # predictor 3 is now decoded (tests/test_geotiff_breadth.py);
    # an unknown predictor id must still fail loudly, not corrupt
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    path = str(tmp_path / 'p9.tif')
    _write_predictor2_tiff(path, img)
    # patch the predictor tag value from 2 to 9 in place
    raw = bytearray(open(path, 'rb').read())
    idx = raw.find(struct.pack('<HHII', 317, 3, 1, 2))
    raw[idx:idx + 12] = struct.pack('<HHII', 317, 3, 1, 9)
    open(path, 'wb').write(bytes(raw))
    with pytest.raises(IOError, match='predictor'):
        TiffFile(path).read()


def test_dbf_deleted_record_keeps_alignment(tmp_path):
    from nd_tpu.vector.shapefile import _read_dbf
    path = str(tmp_path / 'del.dbf')
    nrec = 3
    header_len = 32 + 32 + 1
    record_len = 1 + 1
    with open(path, 'wb') as fh:
        fh.write(struct.pack('<B3BIHH20x', 3, 20, 1, 1, nrec,
                             header_len, record_len))
        fh.write(struct.pack('<11sc4xBB14x', b'FLAG' + b'\x00' * 7,
                             b'L', 1, 0))
        fh.write(b'\r')
        fh.write(b' T')          # live
        fh.write(b'*F')          # deleted
        fh.write(b' F')          # live
        fh.write(b'\x1a')
    records = _read_dbf(path)
    assert len(records) == 3
    assert records[1] is None
    assert records[0]['FLAG'] is True and records[2]['FLAG'] is False


# -- fourth review round: compute-core fixes -----------------------------------

def test_joint_filter_mixed_dim_variables():
    flt = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5, h=0.3)
    rng = np.random.RandomState(0)
    ds = Dataset({'C11': (('y', 'x', 'time'), rng.rand(8, 9, 2)),
                  'dem': (('y', 'x'), rng.rand(8, 9))})
    out = flt.apply(ds)    # reference crashes here; we degrade gracefully
    assert out['C11'].dims == ('y', 'x', 'time')
    assert set(out['dem'].dims) >= {'y', 'x'}


def test_reproject_int_dtype_preserved():
    import nd_tpu
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 20, 'x': 25, 'time': 2})
    ds['labels'] = (('y', 'x'),
                    np.arange(20 * 25, dtype=np.int32).reshape(20, 25))
    out = ds.nd.reproject(crs='epsg:3857')
    assert out['labels'].dtype == np.int32
    assert np.issubdtype(np.dtype(str(out['C11'].dtype)), np.floating)


def test_map_coordinates_nearest_int_default_cval():
    from nd_tpu.ops.interp import map_coordinates
    vals = np.arange(12, dtype=np.int32).reshape(3, 4)
    rows = np.array([0.0, 5.0])       # second is out of bounds
    cols = np.array([1.0, 1.0])
    out = np.asarray(map_coordinates(vals, rows, cols, method='nearest'))
    assert out.tolist() == [1, 0]     # OOB filled with int nodata 0


def test_setitem_failed_overwrite_restores_previous():
    ds = Dataset()
    ds['a'] = (('x',), np.arange(5.0))
    ds['b'] = (('x',), np.zeros(5))
    with pytest.raises(ValueError):
        ds['a'] = (('x',), np.zeros(3))
    assert 'a' in ds and ds['a'].values.tolist() == [0, 1, 2, 3, 4]


def test_coregister_dim_order_invariance():
    from nd_tpu.warp import _coregister
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 32, 'x': 48, 'time': 3})
    ref = _coregister(ds, reference=0, upsampling=10)
    # same data with variables stored (time, x, y)
    ds2 = ds.copy()
    for v in list(ds2.data_vars):
        ds2._variables[v] = ds2._variables[v].transpose('time', 'x', 'y')
    out = _coregister(ds2, reference=0, upsampling=10)
    for v in ref.data_vars:
        np.testing.assert_allclose(
            np.asarray(out[v].transpose(*ref[v].dims).values),
            np.asarray(ref[v].values), rtol=1e-6)


def test_getitem_list_drops_foreign_coords():
    ds = Dataset({'a': (('y', 'x'), np.zeros((2, 3))),
                  'b': (('time',), np.zeros(4))},
                 coords={'y': [0, 1], 'x': [0, 1, 2],
                         'time': np.arange(4)})
    sub = ds[['a']]
    assert 'time' not in sub.coords
    assert 'time' not in sub.sizes
    assert 'y' in sub.coords
