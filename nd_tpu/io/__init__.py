"""I/O layer: NetCDF, GeoTIFF, BEAM-DIMAP, complex<->real conversion.

Parity surface of /root/reference/nd/io.py, built on this framework's
own format parsers (h5py dimension scales, from-scratch TIFF/ENVI
readers) — no GDAL, netCDF-C or rasterio.
"""

from __future__ import annotations

import os
import re

import numpy as np

from .. import utils
from ..core import DataArray, Dataset
from ..core.variable import Variable

from .zarr import to_zarr, open_zarr  # noqa: E402  (re-export)

__all__ = ['open_dataset', 'open_netcdf', 'open_beam_dimap',
           'open_rasterio', 'open_sentinel2_granule', 'to_netcdf',
           'to_geotiff', 'to_zarr', 'open_zarr',
           'assemble_complex', 'disassemble_complex', 'add_time']


# --------------------
# CONVERSION FUNCTIONS
# --------------------

def disassemble_complex(ds, inplace=False):
    """Split complex variables into ``<name>__re`` / ``<name>__im`` pairs.

    Reference behavior: /root/reference/nd/io.py:26-69.
    """
    if isinstance(ds, DataArray):
        name = ds.name or 'data'
        ds = ds.to_dataset(name=name)

    new_ds = ds if inplace else ds.copy(deep=False)
    for vn in list(new_ds._variables):
        var = new_ds._variables[vn]
        if not np.issubdtype(np.dtype(str(var.dtype)),
                             np.complexfloating):
            continue
        data = var.data
        from ..core.variable import get_xp
        xp = get_xp(data)
        new_ds._variables[vn + '__re'] = Variable(
            var.dims, xp.real(data), dict(var.attrs))
        new_ds._variables[vn + '__im'] = Variable(
            var.dims, xp.imag(data), dict(var.attrs))
        del new_ds._variables[vn]
    if not inplace:
        return new_ds


def assemble_complex(ds, inplace=False):
    """Reassemble ``*_real``/``__re`` + ``*_imag``/``__im`` variable pairs
    into complex variables (reference: io.py:72-123)."""
    new_ds = ds if inplace else ds.copy(deep=False)
    endings = {'re': ['_real', '__re'], 'im': ['_imag', '__im']}
    rex = {}
    matches = {}
    for part, end in endings.items():
        rex[part] = re.compile('(?P<stem>.*)(?:{})$'.format('|'.join(end)))
        matches[part] = [rex[part].match(vn) for vn in new_ds._variables]
        matches[part] = [m for m in matches[part] if m is not None]

    new_var_names = set(m.group('stem')
                        for m in matches['re'] + matches['im'])

    from ..core.variable import get_xp
    for vn in sorted(new_var_names):
        m_re = next((m for m in matches['re'] if m.group('stem') == vn),
                    None)
        m_im = next((m for m in matches['im'] if m.group('stem') == vn),
                    None)
        if m_re is None or m_im is None:
            continue
        re_var = new_ds._variables[m_re.group(0)]
        im_var = new_ds._variables[m_im.group(0)]
        im_b = im_var
        if im_var.dims != re_var.dims:
            im_b = im_var.transpose(*re_var.dims)
        xp = get_xp(re_var.data, im_b.data)
        data = xp.asarray(re_var.data) + 1j * xp.asarray(im_b.data)
        new_ds._variables[vn] = Variable(re_var.dims, data,
                                         dict(re_var.attrs))
        del new_ds._variables[m_re.group(0)]
        del new_ds._variables[m_im.group(0)]
    if not inplace:
        return new_ds


def add_time(ds, inplace=False):
    """Ensure the dataset has a ``time`` coordinate (from
    ``attrs['start_date']`` if missing; reference: io.py:126-148)."""
    result = ds if inplace else ds.copy(deep=False)
    if 'time' not in result._coords:
        times = np.asarray(
            [np.datetime64(utils.str2date(ds.attrs['start_date']), 'ns')])
        result._coords['time'] = Variable(('time',), times)
    if not inplace:
        return result


# -------------
# OPEN DATASETS
# -------------

def open_dataset(path, *args, **kwargs):
    """Open a datacube, dispatching on the file extension.

    ``.nc`` -> :func:`open_netcdf`, ``.dim`` -> :func:`open_beam_dimap`,
    anything else -> :func:`open_rasterio`.
    """
    _, ext = os.path.splitext(str(path))
    if ext == '.nc':
        return open_netcdf(path, *args, **kwargs)
    if ext == '.dim':
        return open_beam_dimap(path, *args, **kwargs)
    try:
        return open_rasterio(path, *args, **kwargs)
    except Exception as e:
        raise IOError('Could not read the file: %s' % e)


# --------------
# FORMAT: NETCDF
# --------------

def to_netcdf(ds, path, *args, **kwargs):
    """Write a Dataset to NetCDF, always disassembling complex variables
    (reassembled on read via ``open_netcdf(as_complex=True)``)."""
    from .netcdf import write_netcdf_file
    if isinstance(ds, DataArray):
        ds = ds.to_dataset(name=ds.name or 'data')
    write = disassemble_complex(ds)
    complevel = kwargs.get('complevel', 5)
    # complevel=0 means truly uncompressed (contiguous datasets, no
    # gzip-filter/chunking overhead), not "gzip at level 0"
    compress = kwargs.get('compress', True) and complevel > 0
    write_netcdf_file(write, path, compress=compress,
                      complevel=complevel,
                      encoding=kwargs.get('encoding'))
    return path


def open_netcdf(path, as_complex=False, rename_latlon=True, *args,
                **kwargs):
    """Read a NetCDF file into a Dataset.

    lat/lon dimensions are renamed to y/x (keeping lat/lon coords),
    matching the reference's convention (io.py:272-275); pass
    ``rename_latlon=False`` for a verbatim read (the tiling round trip
    uses it so tile -> merge never changes dimension names).

    Pass ``chunks`` (any value, e.g. ``{}`` like the reference's
    dask-backed open, /root/reference/nd/tiling.py:382-385) for a LAZY
    open: data variables materialize per-``isel``-slab on first use,
    so a larger-than-RAM file can stream through ``tile()`` /
    ``map_over_tiles`` without ever loading fully.
    """
    from .netcdf import open_netcdf_file
    ds = open_netcdf_file(path,
                          decode_cf=kwargs.get('decode_cf', True),
                          chunks=kwargs.get('chunks'))
    if as_complex:
        ds = assemble_complex(ds)
    if rename_latlon and 'lon' in ds.sizes and 'lat' in ds.sizes:
        lat = ds._coords.get('lat')
        lon = ds._coords.get('lon')
        ds = ds.rename({'lat': 'y', 'lon': 'x'})
        if lat is not None:
            ds._coords['lat'] = Variable(('y',), lat.data, lat.attrs)
        if lon is not None:
            ds._coords['lon'] = Variable(('x',), lon.data, lon.attrs)
    return ds


# ---------------------
# FORMAT: RASTER (TIFF)
# ---------------------

def _read_world_file(path):
    """ESRI world-file georeferencing for plain image rasters.

    GDAL's sidecar rule: ``<first><last>w`` of the image extension
    (``.pgw``/``.jgw``/``.bpw``/``.tfw``) or the generic ``.wld``. The
    six lines anchor at the CENTER of the upper-left pixel; returns a
    corner-anchored Affine matching the GeoTIFF reader's convention.
    """
    from ..crs import Affine
    base, ext = os.path.splitext(str(path))
    ext = ext.lstrip('.')
    candidates = ['%s.%s' % (base, (ext[0] + ext[-1] + 'w').lower()),
                  base + '.wld'] if len(ext) >= 2 else [base + '.wld']
    for cand in candidates:
        if not os.path.exists(cand):
            continue
        with open(cand) as fh:
            vals = [float(line.strip()) for line in fh
                    if line.strip()][:6]
        if len(vals) != 6:
            raise IOError('world file %s must have 6 numeric lines'
                          % cand)
        A, D, B, E, C, F = vals
        return Affine(A, B, C - (A + B) / 2.0,
                      D, E, F - (D + E) / 2.0)
    return None


def _read_prj_file(path):
    from ..crs import CRS
    base, _ = os.path.splitext(str(path))
    prj = base + '.prj'
    if os.path.exists(prj):
        with open(prj) as fh:
            return CRS.from_wkt(fh.read())
    return None


_PLAIN_IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.bmp')


def _open_plain_image(path, overview_level=None):
    """Plain image rasters (PNG/JPEG/BMP via OpenCV) with ESRI
    world-file + ``.prj`` sidecar georeferencing — the reference
    reads these through GDAL's world-file support. Always eager (the
    formats have no internal windowed layout); ``overview_level`` is
    rejected (no pyramid)."""
    try:
        import cv2
    except ImportError:
        raise IOError('reading %s needs OpenCV (cv2), which is not '
                      'installed' % os.path.splitext(str(path))[1])
    if overview_level is not None:
        raise ValueError('plain image rasters carry no overview '
                         'pyramid; open the full resolution')
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError('OpenCV could not decode %s' % path)
    if img.ndim == 2:
        data = img[None]
    else:
        # BGR(A) -> RGB(A) band order, then (band, y, x)
        if img.shape[2] == 3:
            img = img[:, :, ::-1]
        elif img.shape[2] == 4:
            img = np.concatenate([img[:, :, 2::-1], img[:, :, 3:]],
                                 axis=2)
        data = np.moveaxis(img, 2, 0)
    transform = _read_world_file(path)
    crs = _read_prj_file(path)
    return _raster_dataarray(data, transform, crs, nodata=None,
                             is_tiled=0)


def _raster_dataarray(data, transform, crs, nodata, is_tiled):
    """Assemble the (band, y, x) DataArray open_rasterio returns."""
    nbands, height, width = data.shape[0], data.shape[1], data.shape[2]
    attrs = {}
    coords = {'band': np.arange(1, nbands + 1)}
    if transform is not None:
        cols = np.arange(width) + 0.5
        rows = np.arange(height) + 0.5
        if transform.b or transform.d:
            C, R = np.meshgrid(cols, rows)
            coords['xc'] = (('y', 'x'),
                            transform.a * C + transform.b * R
                            + transform.c)
            coords['yc'] = (('y', 'x'),
                            transform.d * C + transform.e * R
                            + transform.f)
        else:
            coords['x'] = transform.a * cols + transform.c
            coords['y'] = transform.e * rows + transform.f
        attrs['transform'] = tuple(transform)[:6]
        attrs['res'] = (abs(transform.a), abs(transform.e))
    if crs is not None:
        attrs['crs'] = crs.to_proj4()
    if nodata is not None:
        attrs['nodatavals'] = (nodata,) * nbands
    attrs['is_tiled'] = int(is_tiled)
    return DataArray(data, dims=('band', 'y', 'x'), coords=coords,
                     attrs=attrs)


_JP2_EXTS = ('.jp2', '.j2k', '.jpc', '.jpx')
# GeoJP2: a uuid box whose payload is a degenerate GeoTIFF carrying
# the affine transform + CRS (the convention GDAL writes and every
# Sentinel-2 granule uses)
_GEOJP2_UUID = bytes([0xb1, 0x4b, 0xf8, 0xbd, 0x08, 0x3d, 0x4b, 0x43,
                      0xa5, 0xae, 0x8c, 0xd7, 0xd5, 0xa6, 0xce, 0x03])


def _jp2_geo_box(path):
    """Extract (transform, crs) from a JP2's GeoJP2 uuid box, if any."""
    import struct as _struct
    import tempfile
    with open(path, 'rb') as fh:
        buf = fh.read()
    if buf[4:8] != b'jP  ':
        return None, None
    pos = 0
    payload = None
    while pos + 8 <= len(buf):
        (lbox,) = _struct.unpack('>I', buf[pos:pos + 4])
        tbox = buf[pos + 4:pos + 8]
        hdr = 8
        if lbox == 1:
            (lbox,) = _struct.unpack('>Q', buf[pos + 8:pos + 16])
            hdr = 16
        elif lbox == 0:
            lbox = len(buf) - pos
        if tbox == b'uuid' \
                and buf[pos + hdr:pos + hdr + 16] == _GEOJP2_UUID:
            payload = buf[pos + hdr + 16:pos + lbox]
            break
        pos += lbox
    if payload is None:
        return None, None
    from .geotiff import TiffFile
    import os as _os
    tmp = tempfile.NamedTemporaryFile(suffix='.tif', delete=False)
    try:
        tmp.write(payload)
        tmp.close()
        t = TiffFile(tmp.name)
        try:
            return t.transform, t.crs
        finally:
            t.close()
    except Exception:
        return None, None
    finally:
        _os.unlink(tmp.name)


def _open_jp2(path, overview_level=None):
    """JPEG 2000 rasters through the built-in decoder (5/3 lossless
    and 9/7 lossy, :mod:`nd_tpu.io.jp2`), with GeoJP2 / world-file /
    .prj georeferencing."""
    from .jp2 import decode_jp2
    # overview_level k = the k-th dyadic overview (half resolution at
    # 0, matching the GeoTIFF reader's first-overview convention):
    # the DWT pyramid IS the overview chain, so the decoder just stops
    # the synthesis (and skips Tier-1 for the dropped resolutions)
    reduce = 0 if overview_level is None else int(overview_level) + 1
    arr = decode_jp2(str(path), reduce=reduce)
    data = arr[None] if arr.ndim == 2 else np.moveaxis(arr, 2, 0)
    transform, crs = _jp2_geo_box(path)
    if transform is None:
        transform = _read_world_file(path)
    if crs is None:
        crs = _read_prj_file(path)
    if reduce and transform is not None:
        from ..crs import Affine
        s = float(1 << reduce)
        t = Affine(*transform) if not hasattr(transform, 'a') \
            else transform
        transform = Affine(t.a * s, t.b * s, t.c,
                           t.d * s, t.e * s, t.f)
    return _raster_dataarray(np.ascontiguousarray(data), transform,
                             crs, nodata=None, is_tiled=0)


def open_sentinel2_granule(path, resolution=None, bands=None,
                           overview_level=None):
    """Open a Sentinel-2 SAFE granule (the directory holding
    ``MTD_TL.xml`` + ``IMG_DATA/``) as a Dataset.

    The reference reads S2 JP2s through GDAL (io.py:283-284); here the
    granule XML supplies the geolocation (``Tile_Geocoding``: EPSG
    code, per-resolution ULX/ULY/XDIM/YDIM) and the band JP2s decode
    through the built-in JPEG 2000 reader.

    Parameters
    ----------
    path : str
        Granule directory, or the ``MTD_TL.xml`` path itself.
    resolution : int, optional
        Grid to load (10/20/60 m). Default: the finest present.
    bands : list of str, optional
        Band ids (e.g. ``['B02', 'B03']``). Default: every JP2 whose
        shape matches the chosen grid.
    overview_level : int, optional
        Dyadic overview to decode (0 = half resolution): the band
        JP2s' DWT pyramids stop early and the grid scales to match —
        the fast path for quicklooks over full granules.
    """
    import glob as _glob
    import xml.etree.ElementTree as ET

    path = str(path)
    if os.path.isdir(path):
        cands = sorted(_glob.glob(os.path.join(path, 'MTD_TL.xml'))) \
            or sorted(_glob.glob(os.path.join(path, '*.xml')))
        if not cands:
            raise IOError('no granule XML found in %s' % path)
        xml_path = cands[0]
        gdir = path
    else:
        xml_path = path
        gdir = os.path.dirname(path)

    root = ET.parse(xml_path).getroot()

    def _findall(tag):
        return [e for e in root.iter() if e.tag.split('}')[-1] == tag]

    epsg = None
    for e in _findall('HORIZONTAL_CS_CODE'):
        epsg = e.text.strip()
        break
    geo = {}
    for e in _findall('Geoposition'):
        res = int(e.get('resolution'))
        vals = {c.tag.split('}')[-1]: float(c.text) for c in e}
        geo[res] = vals
    sizes = {}
    for e in _findall('Size'):
        res = int(e.get('resolution'))
        vals = {c.tag.split('}')[-1]: int(c.text) for c in e}
        sizes[res] = vals
    if not geo:
        raise IOError('granule XML carries no Geoposition')
    if resolution is None:
        resolution = min(geo)
    if resolution not in geo:
        raise ValueError('resolution %r not in granule (has %s)'
                         % (resolution, sorted(geo)))
    g = geo[resolution]
    ulx, uly = g['ULX'], g['ULY']
    xdim, ydim = g['XDIM'], g['YDIM']
    reduce = 0 if overview_level is None else int(overview_level) + 1
    if reduce:
        scale = float(1 << reduce)
        xdim *= scale
        ydim *= scale

    jp2s = sorted(_glob.glob(os.path.join(gdir, 'IMG_DATA', '*.jp2'))
                  + _glob.glob(os.path.join(gdir, 'IMG_DATA', '*',
                                            '*.jp2')))
    if not jp2s:
        raise IOError('no IMG_DATA JP2 bands under %s' % gdir)
    from .jp2 import decode_jp2
    data_vars = {}
    ny = nx = None
    want = set(bands) if bands is not None else None
    for f in jp2s:
        stem = os.path.splitext(os.path.basename(f))[0]
        band_id = stem.split('_')[-1]
        if want is not None and band_id not in want:
            continue
        arr = decode_jp2(f, reduce=reduce)
        if arr.ndim != 2:
            continue
        exp = sizes.get(resolution)
        if exp:
            rd = 1 << reduce
            exp = {'NROWS': -(-exp['NROWS'] // rd),
                   'NCOLS': -(-exp['NCOLS'] // rd)}
        if exp and (arr.shape != (exp['NROWS'], exp['NCOLS'])):
            if want is not None:
                raise ValueError(
                    'band %s is %r, not the %d m grid %r' %
                    (band_id, arr.shape,
                     resolution, (exp['NROWS'], exp['NCOLS'])))
            continue
        data_vars[band_id] = (('y', 'x'), arr)
        ny, nx = arr.shape
    if not data_vars:
        raise IOError('no bands matched the %d m grid' % resolution)

    x = ulx + (np.arange(nx) + 0.5) * xdim
    y = uly + (np.arange(ny) + 0.5) * ydim
    attrs = {'transform': (xdim, 0.0, ulx, 0.0, ydim, uly),
             'res': (abs(xdim), abs(ydim))}
    if epsg:
        from ..crs import CRS
        attrs['crs'] = CRS.from_user_input(epsg).to_proj4()
    return Dataset(data_vars, coords={'y': y, 'x': x}, attrs=attrs)


def open_rasterio(path, chunks=None, overview_level=None, *args,
                  **kwargs):
    """Read a raster (GeoTIFF, or PNG/JPEG/BMP with world-file
    sidecars) into a (band, y, x) DataArray.

    Mirrors ``xarray.open_rasterio`` used by the reference
    (io.py:283-284): coordinates are pixel-center positions from the
    affine transform; attrs carry transform/crs/res/nodatavals.

    With ``chunks`` not None (e.g. ``chunks={}``) the payload is a
    lazy windowed view (:class:`~nd_tpu.io.lazy.LazyGeoTIFFArray`):
    nothing is decoded at open time, and slicing materializes only the
    strips/tiles the window touches — the reference's dask-backed
    windowed GDAL read. (Plain images decode eagerly — they have no
    windowed layout.)

    ``overview_level`` selects a reduced-resolution overview IFD
    (0 = first/largest, like rasterio): the raster decodes at that
    decimation and the transform/coords scale to match.
    """
    from .geotiff import TiffFile
    ext = os.path.splitext(str(path))[1].lower()
    if ext in _PLAIN_IMAGE_EXTS:
        return _open_plain_image(path, overview_level=overview_level)
    if ext in _JP2_EXTS:
        return _open_jp2(path, overview_level=overview_level)
    t = TiffFile(str(path))
    nbands, height, width = t.nbands, t.height, t.width
    if overview_level is not None:
        if chunks is not None:
            t.close()
            raise ValueError(
                'pass either chunks= (lazy full-resolution view) or '
                'overview_level= (eager decimated read), not both')
        data = t.read_overview(int(overview_level))
        ov_h, ov_w = data.shape[1], data.shape[2]
    elif chunks is not None:
        from .lazy import LazyGeoTIFFArray
        data = LazyGeoTIFFArray.from_file(
            str(path), (nbands, height, width), t.band_dtype)
    else:
        data = t.read()
    transform = t.transform
    if overview_level is not None:
        if transform is not None:
            # decimated pixels cover width/ov_w source pixels each
            from ..crs import Affine
            transform = transform * Affine.scale(width / ov_w,
                                                 height / ov_h)
        height, width = ov_h, ov_w
    crs = t.crs
    nodata = t.nodata
    is_tiled = int(322 in t.tags)
    t.close()
    return _raster_dataarray(data, transform, crs, nodata, is_tiled)


def to_geotiff(ds, path, nodata=None, compress=True, tiled=False,
               tile_size=256, overviews=None):
    """Write a Dataset/DataArray to a GeoTIFF.

    A Dataset writes one band per (y, x) variable; a DataArray writes
    its (possibly banded) raster directly. Geo-metadata is taken from
    the object (``nd_tpu.warp.get_transform`` / ``get_crs``).
    ``tiled=True`` + ``overviews=True`` (or a list of decimation
    factors) writes the cloud-optimized layout: square internal tiles
    plus a reduced-resolution overview pyramid.
    """
    from ..crs import Affine
    from ..warp import get_crs, get_transform
    from .geotiff import write_geotiff

    transform = get_transform(ds)
    if transform is not None:
        # the framework's transform maps pixel index -> coordinate
        # (corner-grid convention); GeoTIFF anchors the transform at
        # the outer corner of pixel (0, 0) with centers at +0.5
        transform = transform * Affine.translation(-0.5, -0.5)
    crs = get_crs(ds)
    if isinstance(ds, Dataset):
        from ..utils import get_vars_for_dims
        variables = get_vars_for_dims(ds, ('y', 'x'))
        bands = []
        for v in variables:
            da = ds[v].transpose('y', 'x', *[
                d for d in ds[v].dims if d not in ('y', 'x')])
            vals = np.asarray(da.values)
            vals = vals.reshape(vals.shape[0], vals.shape[1], -1)
            for b in range(vals.shape[2]):
                bands.append(vals[:, :, b])
        data = np.stack(bands, axis=0)
    else:
        da = ds
        order = [d for d in ('band',) if d in da.dims] + ['y', 'x']
        extra = [d for d in da.dims if d not in order]
        da = da.transpose(*(extra + order))
        data = np.asarray(da.values)
        data = data.reshape((-1,) + data.shape[-2:])
    write_geotiff(path, data, transform=transform, crs=crs,
                  nodata=nodata, compress=compress, tiled=tiled,
                  tile_size=tile_size, overviews=overviews)
    return path


from .beam_dimap import open_beam_dimap  # noqa: E402
