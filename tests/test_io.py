"""I/O tests: format readers, complex conversion, round-trips (mirrors
the reference's test_open.py / test_convert.py)."""

import os

import numpy as np
import pytest

from nd_tpu import io as ndio
from nd_tpu.core import DataArray, Dataset
from nd_tpu.testing import assert_equal_data, generate_test_dataset

DATA = '/root/reference/data'


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 12, 'x': 10, 'time': 4})


# ---------------------------------------------------------------------------
# complex <-> re/im conversion
# ---------------------------------------------------------------------------

def test_disassemble_assemble_roundtrip(ds):
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    del dsc['C12__re']
    del dsc['C12__im']
    dis = ndio.disassemble_complex(dsc)
    assert 'C12__re' in dis.data_vars and 'C12__im' in dis.data_vars
    assert 'C12' not in dis.data_vars
    back = ndio.assemble_complex(dis)
    assert 'C12' in back.data_vars
    np.testing.assert_allclose(back['C12'].values, dsc['C12'].values)


def test_assemble_complex_real_imag_suffixes(ds):
    """*_real/*_imag pairs (SNAP convention) are also assembled."""
    ds2 = Dataset(coords={'y': np.arange(4)})
    ds2['band_real'] = (('y',), np.arange(4.0))
    ds2['band_imag'] = (('y',), np.arange(4.0) * 2)
    out = ndio.assemble_complex(ds2)
    assert 'band' in out.data_vars
    assert np.iscomplexobj(out['band'].values)


def test_assemble_complex_unpaired(ds):
    """A __re without matching __im is left untouched."""
    ds2 = Dataset(coords={'y': np.arange(3)})
    ds2['lonely__re'] = (('y',), np.arange(3.0))
    out = ndio.assemble_complex(ds2)
    assert 'lonely__re' in out.data_vars


def test_disassemble_dataarray():
    da = DataArray(np.ones(4) + 1j * np.ones(4), dims=('y',),
                   name='v')
    out = ndio.disassemble_complex(da)
    assert isinstance(out, Dataset)
    assert 'v__re' in out.data_vars


def test_add_time():
    ds = Dataset(coords={'y': np.arange(3)},
                 attrs={'start_date': '02-DEC-2018 06:54:06'})
    out = ndio.add_time(ds)
    assert 'time' in out.coords
    assert np.asarray(out['time'].values).astype(
        'datetime64[D]')[0] == np.datetime64('2018-12-02')


# ---------------------------------------------------------------------------
# NetCDF round-trips
# ---------------------------------------------------------------------------

def test_netcdf_roundtrip(tmp_path, ds):
    p = str(tmp_path / 'cube.nc')
    ndio.to_netcdf(ds, p)
    back = ndio.open_netcdf(p)
    assert_equal_data(back, ds, rtol=1e-12)
    np.testing.assert_array_equal(back['time'].values,
                                  ds['time'].values)
    assert back.attrs['crs'] == ds.attrs['crs']


def test_netcdf_complex_roundtrip(tmp_path, ds):
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    del dsc['C12__re']
    del dsc['C12__im']
    p = str(tmp_path / 'complex.nc')
    ndio.to_netcdf(dsc, p)
    back = ndio.open_netcdf(p, as_complex=True)
    assert 'C12' in back.data_vars
    np.testing.assert_allclose(back['C12'].values, dsc['C12'].values)


def test_netcdf_bool_roundtrip(tmp_path):
    ds = Dataset(coords={'y': np.arange(5)})
    ds['mask'] = (('y',), np.array([True, False, True, True, False]))
    p = str(tmp_path / 'bool.nc')
    ndio.to_netcdf(ds, p)
    back = ndio.open_netcdf(p)
    assert back['mask'].dtype == bool
    np.testing.assert_array_equal(back['mask'].values,
                                  ds['mask'].values)


def test_netcdf_2d_coord_roundtrip(tmp_path):
    ds = Dataset(coords={'y': np.arange(4), 'x': np.arange(3)})
    ds = ds.assign_coords(lat=(('y', 'x'), np.random.rand(4, 3)))
    ds['v'] = (('y', 'x'), np.random.rand(4, 3))
    p = str(tmp_path / '2dcoord.nc')
    ndio.to_netcdf(ds, p)
    back = ndio.open_netcdf(p)
    assert 'lat' in back.coords
    assert back._coords['lat'].dims == ('y', 'x')
    np.testing.assert_allclose(back._coords['lat'].values,
                               ds._coords['lat'].values)


# ---------------------------------------------------------------------------
# bundled reference products
# ---------------------------------------------------------------------------

def test_open_reference_netcdf():
    ds = ndio.open_dataset(os.path.join(DATA, 'slc.nc'))
    assert ds.sizes == {'y': 206, 'x': 500}
    assert {'C11', 'C22', 'C12_real', 'C12_imag'} <= set(ds.data_vars)
    assert 'lat' in ds.coords and 'lon' in ds.coords


def test_open_reference_netcdf_as_complex():
    ds = ndio.open_netcdf(os.path.join(DATA, 'slc.nc'),
                          as_complex=True)
    assert 'C12' in ds.data_vars
    assert np.iscomplexobj(ds['C12'].values)


def test_open_reference_geotiff():
    da = ndio.open_dataset(os.path.join(DATA, 'slc.tif'))
    assert da.dims == ('band', 'y', 'x')
    assert da.shape == (4, 206, 500)
    nc = ndio.open_netcdf(os.path.join(DATA, 'slc.nc'))
    # the NetCDF decodes _FillValue=0 to NaN; the TIFF carries raw 0s
    tif_vals = da.isel(band=0).values
    nc_vals = nc['C11'].values
    finite = np.isfinite(nc_vals)
    np.testing.assert_array_equal(tif_vals[finite], nc_vals[finite])
    assert (tif_vals[~finite] == 0).all()


def test_open_reference_beam_dimap():
    ds = ndio.open_dataset(os.path.join(DATA, 'slc.dim'))
    assert ds.sizes['lat'] == 206 and ds.sizes['lon'] == 500
    assert 'C12' in ds.data_vars  # assembled by default
    assert 'time' in ds.coords
    assert ds.attrs['orbit_direction'] in ('ASCENDING', 'DESCENDING')


def test_open_beam_dimap_metadata_only():
    ds = ndio.open_beam_dimap(os.path.join(DATA, 'slc.dim'),
                              read_data=False)
    assert len(ds.data_vars) == 0
    assert ds.attrs['ncols'] == 500


def test_open_dataset_unknown_extension(tmp_path):
    p = str(tmp_path / 'garbage.xyz')
    open(p, 'w').write('not a raster')
    with pytest.raises(IOError):
        ndio.open_dataset(p)


# ---------------------------------------------------------------------------
# GeoTIFF writing
# ---------------------------------------------------------------------------

def test_geotiff_write_roundtrip(tmp_path, ds):
    from nd_tpu import warp
    p = str(tmp_path / 'out.tif')
    ndio.to_geotiff(ds.isel(time=0), p)
    back = ndio.open_rasterio(p)
    assert back.shape[0] == 4  # one band per variable
    np.testing.assert_allclose(back.isel(band=0).values,
                               ds['C11'].isel(time=0).values,
                               rtol=1e-6)
    assert warp.get_transform(back).almost_equals(
        warp.get_transform(ds), precision=1e-9)
    from nd_tpu.testing import assert_equal_crs
    assert_equal_crs(warp.get_crs(back), warp.get_crs(ds))


def test_geotiff_write_dataarray(tmp_path, ds):
    p = str(tmp_path / 'da.tif')
    ndio.to_geotiff(ds['C11'].isel(time=0), p, nodata=0.0)
    back = ndio.open_rasterio(p)
    assert back.shape == (1, 12, 10)
    assert back.attrs['nodatavals'] == (0.0,)


def test_geotiff_reread_reference_after_rewrite(tmp_path):
    """read -> write -> read round-trip of the bundled product."""
    da = ndio.open_rasterio(os.path.join(DATA, 'slc.tif'))
    p = str(tmp_path / 'rewrite.tif')
    ndio.to_geotiff(da, p)
    back = ndio.open_rasterio(p)
    np.testing.assert_array_equal(back.values, da.values)


def test_netcdf_scalar_coord_roundtrip(tmp_path):
    """A sel()-produced scalar coord stays a coordinate on reload."""
    from nd_tpu.io import open_netcdf, to_netcdf
    from nd_tpu.testing import generate_test_dataset
    ds = generate_test_dataset(dims={'y': 6, 'x': 5, 'time': 3})
    sub = ds.isel(time=1)
    assert 'time' in sub.coords and sub.coords['time'].dims == ()
    p = str(tmp_path / 'scalar.nc')
    to_netcdf(sub, p)
    back = open_netcdf(p)
    assert 'time' in back.coords, 'scalar coord demoted to variable'
    assert back.coords['time'].dims == ()


# ---------------------------------------------------------------------------
# Seventeenth review round regressions
# ---------------------------------------------------------------------------

def test_netcdf_dim_without_coord_roundtrip(tmp_path):
    """Dims with no coordinate variable must not read back as bogus
    all-zero float coords (the NAME sentinel survives make_scale)."""
    from nd_tpu.io import open_netcdf, to_netcdf
    ds = Dataset({'v': (('y', 'x'), np.arange(12.).reshape(3, 4))})
    p = str(tmp_path / 'nocoord.nc')
    to_netcdf(ds, p)
    back = open_netcdf(p)
    assert 'y' not in back.coords and 'x' not in back.coords
    np.testing.assert_allclose(back['v'].values, ds['v'].values)


def test_netcdf_time_fill_decodes_to_nat(tmp_path):
    """_FillValue sentinels in CF time variables decode to NaT, not a
    bogus 1999 timestamp."""
    import h5py
    p = str(tmp_path / 'timefill.nc')
    with h5py.File(p, 'w') as f:
        d = f.create_dataset('time', data=np.array([0, 86400, -9999],
                                                   np.int64))
        d.attrs['units'] = 'seconds since 2000-01-01'
        d.attrs['_FillValue'] = np.int64(-9999)
        d.make_scale('time')
    from nd_tpu.io.netcdf import open_netcdf_file
    ds = open_netcdf_file(p)
    t = ds.coords['time'].values
    assert t[0] == np.datetime64('2000-01-01')
    assert t[1] == np.datetime64('2000-01-02')
    assert np.isnat(t[2])


def test_netcdf_missing_value_masked(tmp_path):
    import h5py
    p = str(tmp_path / 'missing.nc')
    with h5py.File(p, 'w') as f:
        d = f.create_dataset('v', data=np.array([1.5, -9999.0, 2.5]))
        d.attrs['missing_value'] = -9999.0
    from nd_tpu.io.netcdf import open_netcdf_file
    ds = open_netcdf_file(p)
    vals = ds['v'].values
    assert np.isnan(vals[1]) and vals[0] == 1.5


def test_netcdf_nonstandard_calendar_left_undecoded(tmp_path):
    import h5py
    p = str(tmp_path / 'cal.nc')
    with h5py.File(p, 'w') as f:
        d = f.create_dataset('t', data=np.array([0, 360], np.int64))
        d.attrs['units'] = 'days since 2000-01-01'
        d.attrs['calendar'] = '360_day'
    from nd_tpu.io.netcdf import open_netcdf_file
    ds = open_netcdf_file(p)
    v = ds['t']
    assert v.values.dtype.kind in 'iu'
    assert v.attrs.get('calendar') == '360_day'


def test_netcdf_scalar_string(tmp_path):
    import h5py
    p = str(tmp_path / 'scalar_str.nc')
    with h5py.File(p, 'w') as f:
        f.create_dataset('label', data='hello')
    from nd_tpu.io.netcdf import open_netcdf_file
    ds = open_netcdf_file(p)
    assert str(np.asarray(ds['label'].values)) == 'hello'


def test_netcdf_aux_coord_without_covering_var(tmp_path):
    from nd_tpu.io import open_netcdf, to_netcdf
    ds = Dataset(coords={'x': np.arange(3),
                         'label': (('x',), np.array([1., 2., 3.]))})
    p = str(tmp_path / 'auxonly.nc')
    to_netcdf(ds, p)
    back = open_netcdf(p)
    assert 'label' in back.coords


def test_zarr_bool_attr_and_user_coordinates_attr(tmp_path):
    from nd_tpu.io import open_zarr, to_zarr
    ds = Dataset({'v': (('x',), np.arange(3.))},
                 coords={'x': np.arange(3)})
    ds.attrs['flag'] = np.bool_(False)
    ds.attrs['coordinates'] = 'my special note'
    p = str(tmp_path / 'store.zarr')
    to_zarr(ds, p)
    back = open_zarr(p)
    assert back.attrs['flag'] is False
    assert back.attrs['coordinates'] == 'my special note'
    assert 'x' in back.coords


def test_open_netcdf_classic_cdf(tmp_path):
    """NetCDF classic (CDF magic, not HDF5) opens through the scipy
    fallback with the same CF conventions as the HDF5 path."""
    from scipy.io import netcdf_file

    p = str(tmp_path / 'classic.nc')
    f = netcdf_file(p, 'w')
    f.createDimension('time', None)
    f.createDimension('y', 4)
    f.createDimension('x', 5)
    y = f.createVariable('y', 'f8', ('y',))
    y[:] = np.arange(4.0)
    x = f.createVariable('x', 'f8', ('x',))
    x[:] = np.arange(5.0)
    t = f.createVariable('time', 'f8', ('time',))
    t[:] = np.array([0.0, 1.0])
    t.units = b'days since 2020-01-01'
    v = f.createVariable('temp', 'i2', ('time', 'y', 'x'))
    data = (np.arange(40) % 30).astype(np.int16).reshape(2, 4, 5)
    data[0, 0, 0] = -999
    v[:] = data
    v._FillValue = np.int16(-999)
    v.scale_factor = 0.5
    f.history = b'classic writer'
    f.close()

    ds = ndio.open_netcdf(p)
    assert dict(ds.sizes) == {'time': 2, 'y': 4, 'x': 5}
    tv = np.asarray(ds['temp'].values)
    assert np.isnan(tv[0, 0, 0])                 # fill masked
    assert tv[0, 0, 1] == data[0, 0, 1] * 0.5    # unpacked
    times = np.asarray(ds.coords['time'].values)
    assert times.dtype.kind == 'M'
    assert str(times[1]).startswith('2020-01-02')
    assert ds.attrs['history'] == 'classic writer'


# ---------------------------------------------------------------------
# plain-image rasters (PNG/JPEG/BMP + ESRI world file / .prj sidecars)
# ---------------------------------------------------------------------

def test_open_png_with_world_file_and_prj(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from nd_tpu.crs import CRS
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (20, 30), np.uint8)
    p = str(tmp_path / 'img.png')
    cv2.imwrite(p, img)
    # world file: pixel size 10/-10, center of UL pixel at (105, 495)
    with open(str(tmp_path / 'img.pgw'), 'w') as fh:
        fh.write('10\n0\n0\n-10\n105\n495\n')
    with open(str(tmp_path / 'img.prj'), 'w') as fh:
        fh.write(CRS.from_epsg(32633).to_wkt())
    da = ndio.open_rasterio(p)
    assert da.dims == ('band', 'y', 'x')
    np.testing.assert_array_equal(np.asarray(da.values)[0], img)
    # corner-anchored transform: UL corner = center - half pixel
    assert da.attrs['transform'] == (10.0, 0.0, 100.0, 0.0, -10.0,
                                     500.0)
    np.testing.assert_allclose(da['x'].values[:2], [105.0, 115.0])
    np.testing.assert_allclose(da['y'].values[:2], [495.0, 485.0])
    assert CRS.from_user_input(da.attrs['crs']) == CRS.from_epsg(32633)


def test_open_png_rgb_band_order(tmp_path):
    cv2 = pytest.importorskip('cv2')
    rgb = np.zeros((4, 5, 3), np.uint8)
    rgb[..., 0] = 200    # red plane
    rgb[..., 2] = 50     # blue plane
    p = str(tmp_path / 'rgb.png')
    cv2.imwrite(p, rgb[:, :, ::-1])          # cv2 writes BGR
    da = ndio.open_rasterio(p)
    v = np.asarray(da.values)
    assert v.shape == (3, 4, 5)
    assert (v[0] == 200).all() and (v[2] == 50).all()


def test_open_image_wld_fallback_and_no_georef(tmp_path):
    cv2 = pytest.importorskip('cv2')
    img = np.full((6, 6), 9, np.uint8)
    p = str(tmp_path / 'pic.bmp')
    cv2.imwrite(p, img)
    da = ndio.open_rasterio(p)                    # no sidecars at all
    assert 'transform' not in da.attrs and 'x' not in da.coords
    with open(str(tmp_path / 'pic.wld'), 'w') as fh:
        fh.write('2\n0\n0\n-2\n1\n11\n')
    da2 = ndio.open_rasterio(p)
    assert da2.attrs['transform'] == (2.0, 0.0, 0.0, 0.0, -2.0, 12.0)


def test_open_image_overview_level_rejected(tmp_path):
    cv2 = pytest.importorskip('cv2')
    p = str(tmp_path / 'x.png')
    cv2.imwrite(p, np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        ndio.open_rasterio(p, overview_level=0)
