"""NetCDF-4 read/write on top of HDF5 (h5py) — no netCDF-C dependency.

NetCDF-4 files *are* HDF5 files following the dimension-scale
convention; this module implements that convention directly so the
framework can round-trip datacubes compatibly with files produced by
xarray/h5netcdf (the reference's engine, /root/reference/nd/io.py:230).

Supported: dimension scales (+ phony dims), CF time encoding/decoding,
_FillValue masking, gzip compression, bool-as-int8, attribute
coercion (CRS/Affine attrs serialized to strings/tuples).
"""

from __future__ import annotations

import os

import numpy as np

from ..core import Dataset
from ..core.variable import Variable

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

_NOT_A_VARIABLE = b'This is a netCDF dimension but not a netCDF variable'

__all__ = ['open_netcdf_file', 'write_netcdf_file']


# ---------------------------------------------------------------------------
# CF time handling
# ---------------------------------------------------------------------------

def _parse_time_units(units):
    """CF time units -> (pandas unit code, epoch string) or None."""
    import re
    m = re.match(
        r'(?i)\s*(nanoseconds|microseconds|milliseconds|seconds|minutes'
        r'|hours|days|weeks)\s+since\s+(.+)', str(units))
    if not m:
        return None
    unit_name, epoch = m.groups()
    unit_map = {'nanoseconds': 'ns', 'microseconds': 'us',
                'milliseconds': 'ms', 'seconds': 's', 'minutes': 'm',
                'hours': 'h', 'days': 'D', 'weeks': 'W'}
    import pandas as pd
    try:
        pd.Timestamp(epoch.strip())
    except (ValueError, OverflowError):
        # an unparseable epoch leaves the variable undecoded (with
        # its units attr) instead of crashing the open
        return None
    return unit_map[unit_name.lower()], epoch.strip()


def _decode_cf_time(values, units, calendar=None):
    import pandas as pd
    parsed = _parse_time_units(units)
    if parsed is None:
        return None
    code, epoch = parsed
    epoch_ts = pd.Timestamp(epoch)
    vals = np.asarray(values)
    flat = vals.ravel()
    if not np.issubdtype(flat.dtype, np.integer):
        # floats can't represent epoch-scale nanosecond counts exactly;
        # only use them when the stored data is already floating
        flat = flat.astype('float64')
    deltas = pd.to_timedelta(flat, unit=code)
    out = (epoch_ts + deltas).values.reshape(vals.shape)
    return out.astype('datetime64[ns]')


def _encode_cf_time(values):
    vals = np.asarray(values).astype('datetime64[ns]')
    epoch = np.datetime64('1970-01-01T00:00:00', 'ns')
    nanos = (vals - epoch).astype('timedelta64[ns]').astype(np.int64)
    if (nanos % 1000 == 0).all():
        # microsecond resolution suffices: stay compatible with readers
        # that don't know nanoseconds
        return nanos // 1000, 'microseconds since 1970-01-01 00:00:00'
    return nanos, 'nanoseconds since 1970-01-01 00:00:00'


# ---------------------------------------------------------------------------
# attribute coercion
# ---------------------------------------------------------------------------

def _coerce_attr(value):
    """Make an attribute HDF5-serializable."""
    from ..crs import CRS, Affine
    if isinstance(value, CRS):
        return value.to_proj4()
    if isinstance(value, Affine):
        return tuple(value)
    if isinstance(value, (list, tuple)) and value and \
            all(isinstance(v, (int, float, np.integer, np.floating))
                for v in value):
        return np.asarray(value)
    if isinstance(value, (str, bytes, int, float, np.integer, np.floating,
                          np.ndarray, np.bool_)):
        return value
    return str(value)


def _decode_attr(value):
    if isinstance(value, bytes):
        return value.decode('utf-8', 'replace')
    if isinstance(value, np.ndarray) and value.ndim == 1 \
            and value.size == 1:
        v = value[0]
        return v.decode() if isinstance(v, bytes) else v.item() \
            if hasattr(v, 'item') else v
    if isinstance(value, np.generic):
        v = value.item()
        return v.decode('utf-8', 'replace') if isinstance(v, bytes) else v
    return value


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------

def _cf_transform(fill, missing, scale, offset, time_units, calendar,
                  to_bool, stable_dtype=False):
    """Slab-wise CF decode closure shared by the eager and lazy read
    paths. CF order: sentinels compare against the RAW stored values
    (both _FillValue and the legacy missing_value convention), then
    unpack, then interpret time; masked entries of time variables
    become NaT, never bogus real timestamps.

    ``stable_dtype`` (the LAZY path) keeps the output dtype a pure
    function of the decode parameters: a declared fill sentinel
    coerces to float even for slabs that happen to contain no fills —
    otherwise two slabs of one variable could materialize with
    different dtypes (and differ from the eager open)."""
    def decode(data):
        mask = None
        for sentinel in (fill, missing):
            if sentinel is None:
                continue
            sv = np.asarray(sentinel).ravel()
            if sv.size and not (np.issubdtype(sv.dtype, np.floating)
                                and np.isnan(sv[0])):
                mm = data == sv[0]
                mask = mm if mask is None else (mask | mm)
        if mask is not None and not np.any(mask) and not stable_dtype:
            mask = None
        if scale is not None or offset is not None:
            data = data.astype('float64')
            if scale is not None:
                data = data * scale
            if offset is not None:
                data = data + offset
        if time_units is not None:
            decoded = _decode_cf_time(data, time_units, calendar)
        else:
            decoded = None
        if decoded is not None:
            data = decoded
            if mask is not None:
                data = data.copy()
                data[mask] = np.datetime64('NaT')
        elif mask is not None:
            if not np.issubdtype(data.dtype, np.floating):
                data = data.astype('float64')
            data = np.where(mask, np.nan, data)
        if to_bool:
            data = data.astype(bool)
        return data

    return decode


def _cf_decode_for(attrs, dtype_kind, with_bool=True):
    """Extract + consume the CF decode parameters from ``attrs`` and
    return the slab decode closure (or None when nothing applies).
    One implementation for the HDF5, lazy, and classic readers — a CF
    rule fixed in one reader must not silently diverge in another.
    The decode is always dtype-STABLE (see :func:`_cf_transform`)."""
    fill = attrs.pop('_FillValue', None)
    missing = attrs.pop('missing_value', None)
    scale = attrs.pop('scale_factor', None)
    offset = attrs.pop('add_offset', None)
    units = attrs.get('units')
    cal = attrs.get('calendar')
    std_cal = cal is None or str(cal).lower() in (
        'standard', 'gregorian', 'proleptic_gregorian')
    # time-decode eligibility is static (dtype + units string):
    # unpacking preserves numeric-ness, so the stored dtype decides.
    # Non-standard calendars (360_day, noleap, ...) stay undecoded
    # with their attrs — silently-wrong proleptic dates are worse.
    decode_time = bool(units) and std_cal and dtype_kind in 'iuf' \
        and _parse_time_units(units) is not None
    to_bool = with_bool and attrs.get('dtype') == 'bool'
    if decode_time:
        attrs.pop('units', None)
        attrs.pop('calendar', None)
    if to_bool:
        attrs.pop('dtype')
    if (fill is not None or missing is not None or scale is not None
            or offset is not None or decode_time or to_bool):
        return _cf_transform(fill, missing, scale, offset,
                             units if decode_time else None, cal,
                             to_bool, stable_dtype=True)
    return None


def _bulk_read(obj, path):
    """Read one dataset's payload, bypassing h5py's global lock for
    contiguous uncompressed data.

    Every h5py call serializes on the non-reentrant `phil` lock
    (HDF5 itself is not thread-safe), so tile reads from a thread
    pool run one at a time. For contiguous uncompressed datasets the
    payload is one flat extent at a known file offset — a raw
    ``readinto`` syscall releases the GIL, letting the tiling
    pipeline's prefetch pool actually read in parallel.
    """
    try:
        if obj.chunks is None and obj.compression is None \
                and obj.ndim > 0 and obj.size > 0 \
                and obj.dtype.kind in 'iufcb' \
                and h5py.check_string_dtype(obj.dtype) is None:
            offset = obj.id.get_offset()
            if offset is not None:
                arr = np.empty(obj.shape, obj.dtype)
                view = memoryview(arr).cast('B')
                with open(path, 'rb', buffering=0) as fh:
                    fh.seek(offset)
                    n = fh.readinto(view)
                if n == view.nbytes:
                    return arr
    except Exception:
        pass
    return obj[()]


def open_netcdf_file(path, decode_cf=True, chunks=None):
    """Read a NetCDF-4/HDF5 file into a Dataset.

    With ``chunks`` (any value, including ``{}`` — xarray-style), data
    variables become :class:`~nd_tpu.io.lazy.LazyNetCDFArray` views:
    nothing is read until the values are used, and ``isel`` slices
    read only their own slab. Coordinates and string variables stay
    eager (they are small and index everything else).
    """
    if h5py is None:
        raise ImportError('h5py is required for NetCDF I/O')
    with open(path, 'rb') as fh:
        magic = fh.read(3)
    if magic == b'CDF':
        # NetCDF classic (versions 1/2/5) is NOT an HDF5 container;
        # plenty of real archives still ship it. scipy's pure-Python
        # reader covers it (the reference gets this via the netCDF-C
        # stack under h5netcdf/xarray).
        return _open_netcdf_classic(path, decode_cf=decode_cf)
    with h5py.File(path, 'r') as f:
        dim_names = {}     # dataset-name -> dim name (for scales)
        coord_like = set()
        phony_count = [0]

        def is_scale(obj):
            return obj.attrs.get('CLASS') == b'DIMENSION_SCALE'

        # First pass: find dimension scales
        for name, obj in f.items():
            if isinstance(obj, h5py.Dataset) and is_scale(obj):
                dim_names[name] = name
                nc_name = obj.attrs.get('NAME', b'')
                if not (isinstance(nc_name, bytes)
                        and nc_name.startswith(_NOT_A_VARIABLE)):
                    coord_like.add(name)

        phony_by_size = {}

        def _phony(size):
            # one phony dim per distinct size (h5netcdf-style): equal-
            # shape scale-less variables share dims, and the global
            # counter can never hand out one name for two sizes
            if size not in phony_by_size:
                phony_by_size[size] = 'phony_dim_%d' % phony_count[0]
                phony_count[0] += 1
            return phony_by_size[size]

        def _phony_unique(size, used):
            d = _phony(size)
            while d in used:        # square arrays need distinct dims
                d = 'phony_dim_%d' % phony_count[0]
                phony_count[0] += 1
            used.add(d)
            return d

        def dims_for(obj, name):
            used = set()
            if 'DIMENSION_LIST' in obj.attrs:
                out = []
                for i, refs in enumerate(obj.attrs['DIMENSION_LIST']):
                    if len(refs):
                        out.append(f[refs[0]].name.lstrip('/'))
                    else:
                        out.append(_phony_unique(obj.shape[i], used))
                return tuple(out)
            if name in dim_names:
                return (name,)
            return tuple(_phony_unique(s, used) for s in obj.shape)

        variables = {}
        coords = {}
        extra_coord_names = set()
        for name, obj in f.items():
            if not isinstance(obj, h5py.Dataset):
                continue
            attrs = {k: _decode_attr(v) for k, v in obj.attrs.items()
                     if k not in ('CLASS', 'NAME', 'DIMENSION_LIST',
                                  'REFERENCE_LIST', '_Netcdf4Dimid',
                                  '_Netcdf4Coordinates')}
            dims = dims_for(obj, name)

            decode = None
            if decode_cf:
                # stable_dtype everywhere (inside _cf_decode_for): a
                # DECLARED fill sentinel fixes the decoded dtype
                # (float, like xarray's mask_and_scale) whether or
                # not this particular file contains fills — so the
                # eager and lazy opens of one file always agree
                decode = _cf_decode_for(attrs, obj.dtype.kind)

            lazy_ok = (chunks is not None
                       and name not in coord_like
                       and obj.ndim >= 1
                       and obj.dtype.kind in 'iufc'
                       and h5py.check_string_dtype(obj.dtype) is None)
            if lazy_ok:
                from .lazy import LazyNetCDFArray
                if decode is None:
                    out_dtype = obj.dtype
                else:
                    # the decode is dtype-stable, so probing one
                    # synthetic element yields every slab's dtype
                    out_dtype = decode(np.ones(1, obj.dtype)).dtype
                data = LazyNetCDFArray(str(path), obj.name, obj.shape,
                                       out_dtype, decode=decode)
            else:
                data = _bulk_read(obj, path)
                if isinstance(data, (bytes, str)):
                    # scalar variable-length string datasets come back
                    # as plain python objects with no .dtype
                    data = np.asarray(data)
                if decode is not None:
                    data = decode(np.asarray(data))
                if data.dtype.kind in ('S', 'O'):
                    try:
                        data = np.char.decode(data.astype('S'),
                                              'utf-8')
                    except Exception:
                        pass

            var = Variable(dims, data, attrs)
            if name in coord_like:
                coords[name] = var
            else:
                cattr = attrs.get('coordinates')
                if cattr:
                    extra_coord_names.update(str(cattr).split())
                variables[name] = var

        # variables referenced as CF "coordinates" (per-variable attrs
        # or the writer's group-level record) become coords
        group_coords = f.attrs.get('_nd_tpu_coordinates')
        if group_coords is not None:
            extra_coord_names.update(
                _decode_attr(group_coords).split())
        for cname in list(extra_coord_names):
            if cname in variables:
                cvar = variables.pop(cname)
                from .lazy import LazyArray
                if isinstance(cvar.data, LazyArray):
                    # "coordinates stay eager": aux coords promoted
                    # via the CF attr index everything else, so a
                    # lazy payload would re-read the file on every
                    # coord access (and supports no arithmetic)
                    cvar = Variable(cvar.dims,
                                    np.asarray(cvar.data),
                                    cvar.attrs)
                coords[cname] = cvar
        for v in variables.values():
            v.attrs.pop('coordinates', None)

        ds = Dataset(attrs={k: _decode_attr(v) for k, v in f.attrs.items()
                            if not str(k).startswith('_nd_tpu')})
        ds._coords = coords
        ds._variables = variables
        return ds


def _open_netcdf_classic(path, decode_cf=True):
    """Read a NetCDF classic (CDF-1/2/5) file via scipy's pure-Python
    reader, with the same CF conventions as the HDF5 path: fill /
    missing_value masking, scale/offset unpacking, standard-calendar
    time decode, dimension-named variables as coordinates, and
    CF ``coordinates`` attribute promotion."""
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), 'r', mmap=False)
    try:
        dim_sizes = dict(f.dimensions)
        variables = {}
        coords = {}
        extra_coord_names = set()
        for name, v in f.variables.items():
            attrs = {k: _decode_attr(val)
                     for k, val in (v._attributes or {}).items()}
            dims = tuple(v.dimensions)
            data = np.asarray(v.data)
            # scipy returns record (unlimited) dims with the real size
            for d, s in zip(dims, data.shape):
                if dim_sizes.get(d) in (None, 0):
                    dim_sizes[d] = s
            if data.dtype.kind == 'S' and data.ndim >= 1:
                try:
                    data = np.char.decode(data, 'utf-8')
                except Exception:
                    pass
            if decode_cf:
                decode = _cf_decode_for(attrs, data.dtype.kind,
                                        with_bool=False)
                if decode is not None:
                    data = decode(data)
            var = Variable(dims, data, attrs)
            if name in dim_sizes and dims == (name,):
                coords[name] = var
            else:
                cattr = attrs.get('coordinates')
                if cattr:
                    extra_coord_names.update(str(cattr).split())
                variables[name] = var
        for cname in list(extra_coord_names):
            if cname in variables:
                coords[cname] = variables.pop(cname)
        for v in variables.values():
            v.attrs.pop('coordinates', None)
        ds = Dataset(attrs={k: _decode_attr(val) for k, val
                            in (f._attributes or {}).items()})
        ds._coords = coords
        ds._variables = variables
        return ds
    finally:
        try:
            f.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------

def _write_chunks(shape, itemsize, target=4 << 20):
    """HDF5 chunk shape for compressed writes: as close to the full
    array as fits ~``target`` bytes, splitting leading axes first.

    h5py's automatic guess targets ~1 MB chunks built by halving EVERY
    axis, which shreds a raster into many small zlib calls; one call
    per multi-MB chunk compresses several times faster at identical
    ratios for row-major rasters.
    """
    if not shape or any(s == 0 for s in shape):
        return None
    chunk = list(shape)
    for i in range(len(chunk)):
        total = int(np.prod(chunk)) * itemsize
        if total <= target:
            break
        shrink = -(-total // target)           # ceil division
        chunk[i] = max(1, chunk[i] // shrink)
    return tuple(chunk)


def _create_contiguous_early(f, name, data):
    """Create a contiguous dataset with EARLY space allocation and no
    fill pass, so its file offset is known before any data is written
    (the bulk payload is then raw-written outside h5py's global lock).
    Returns None when the low-level route isn't applicable."""
    try:
        dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
        dcpl.set_alloc_time(h5py.h5d.ALLOC_TIME_EARLY)
        dcpl.set_fill_time(h5py.h5d.FILL_TIME_NEVER)
        space = h5py.h5s.create_simple(data.shape)
        htype = h5py.h5t.py_create(data.dtype, logical=True)
        did = h5py.h5d.create(f.id, name.encode('utf-8'), htype,
                              space, dcpl=dcpl)
        return h5py.Dataset(did)
    except Exception:
        return None


def write_netcdf_file(ds, path, compress=True, complevel=5,
                      encoding=None):
    """Write a Dataset to a NetCDF-4/HDF5 file (atomic rename)."""
    if h5py is None:
        raise ImportError('h5py is required for NetCDF I/O')
    encoding = encoding or {}
    tmp = str(path) + '.part'

    dim_sizes = ds.sizes

    def _prepare(var):
        data = np.asarray(var.values)
        attrs = {k: _coerce_attr(v) for k, v in var.attrs.items()}
        if np.issubdtype(data.dtype, np.datetime64):
            data, units = _encode_cf_time(data)
            attrs['units'] = units
            attrs['calendar'] = 'proleptic_gregorian'
        elif data.dtype == bool:
            data = data.astype(np.int8)
            attrs['dtype'] = 'bool'
        elif data.dtype.kind == 'U':
            data = data.astype('S')
        elif data.dtype.kind == 'O':
            data = np.asarray([str(x) for x in data.ravel()],
                              dtype='S').reshape(data.shape)
        if np.issubdtype(data.dtype, np.complexfloating):
            raise TypeError(
                'complex variables must be disassembled before writing '
                '(use nd_tpu.io.to_netcdf)')
        return data, attrs

    with h5py.File(tmp, 'w') as f:
        # 1. dimension scales (coordinate variables first)
        created_dims = {}
        for dname, size in dim_sizes.items():
            if dname in ds._coords and ds._coords[dname].dims == (dname,):
                data, attrs = _prepare(ds._coords[dname])
                d = f.create_dataset(
                    dname, data=data,
                    compression='gzip' if compress else None,
                    compression_opts=complevel if compress else None)
                for k, v in attrs.items():
                    d.attrs[k] = v
                d.make_scale(dname)
            else:
                d = f.create_dataset(dname, shape=(size,),
                                     dtype='f4')
                # make_scale writes the NAME attr itself, so the
                # not-a-variable sentinel must go THROUGH it (setting
                # NAME first gets overwritten, and the placeholder
                # would read back as a bogus all-zero coordinate)
                d.make_scale((_NOT_A_VARIABLE + b' %8d'
                              % size).decode('ascii'))
            created_dims[dname] = d

        # 2. non-dimension coordinates
        aux_coords = {}
        for cname, cvar in ds._coords.items():
            if cname in created_dims:
                continue
            data, attrs = _prepare(cvar)
            d = f.create_dataset(
                cname, data=data,
                compression='gzip' if compress and data.ndim else None,
                compression_opts=complevel if compress and data.ndim
                else None)
            for k, v in attrs.items():
                d.attrs[k] = v
            for i, dim in enumerate(cvar.dims):
                d.dims[i].attach_scale(created_dims[dim])
            aux_coords[cname] = cvar

        # 3. data variables
        deferred = []        # (offset, contiguous array): raw-written
        #                      after the h5py handle closes — a
        #                      GIL-releasing pwrite outside h5py's
        #                      global lock, so threads writing
        #                      different tiles overlap (see _bulk_read)
        for vname, var in ds._variables.items():
            data, attrs = _prepare(var)
            enc = encoding.get(vname, {})
            use_comp = enc.get('zlib', compress) and data.ndim > 0
            d = None
            if not use_comp and data.ndim > 0 and data.size > 0 \
                    and data.dtype.kind in 'iufb':
                d = _create_contiguous_early(f, vname, data)
                if d is not None:
                    offset = d.id.get_offset()
                    if offset is None:      # allocation not early?
                        d[...] = data       # fall back to h5py write
                    else:
                        deferred.append(
                            (offset, np.ascontiguousarray(data)))
            if d is None:
                d = f.create_dataset(
                    vname, data=data,
                    compression='gzip' if use_comp else None,
                    compression_opts=enc.get('complevel', complevel)
                    if use_comp else None,
                    chunks=_write_chunks(data.shape,
                                         data.dtype.itemsize)
                    if use_comp else None)
            # CF coordinates attribute for aux coords covering this
            # var; scalar (0-d) coords attach to every variable, like
            # xarray (else a sel()-produced scalar 'time' coord reads
            # back as a data variable)
            cov = [c for c, cv in aux_coords.items()
                   if set(cv.dims).issubset(set(var.dims))]
            if cov:
                attrs.setdefault('coordinates', ' '.join(cov))
            for k, v in attrs.items():
                d.attrs[k] = v
            for i, dim in enumerate(var.dims):
                d.dims[i].attach_scale(created_dims[dim])

        for k, v in ds.attrs.items():
            if k.startswith('_nd_tpu'):
                continue
            f.attrs[k] = _coerce_attr(v)
        if aux_coords:
            # group-level record (like the zarr writer's group attr):
            # aux coords whose dims no data variable covers would
            # otherwise read back as data variables
            f.attrs['_nd_tpu_coordinates'] = ' '.join(aux_coords)

    if deferred:
        with open(tmp, 'r+b', buffering=0) as fh:
            for offset, arr in deferred:
                fh.seek(offset)
                fh.write(memoryview(arr).cast('B'))

    os.replace(tmp, path)
