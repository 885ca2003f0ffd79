"""TPU-native datacube data model: DataArray and Dataset.

This module is a ground-up, JAX-first implementation of the labelled
n-dimensional data structures that the reference framework obtains from
``xarray`` (see /root/reference/nd/__init__.py:17 — everything there flows
through xarray.Dataset/DataArray). Since this framework targets TPUs, the
payload of every variable may be a device-resident ``jax.Array``; all
structural operations route through ``jax.numpy`` in that case so chained
ops never round-trip through host memory. Coordinates and attributes are
host-side NumPy/Python metadata (they drive compilation, not compute).

Supported surface (the xarray API that reference code and its users
rely on): isel/sel, transpose, squeeze, expand_dims, rename/swap_dims,
copy, arithmetic with dimension broadcasting, reductions and
accumulators, where/fillna/clip/round, diff/shift/roll/pad,
sortby/reindex/dropna, equals/identical/broadcast_equals,
assign_coords/assign_attrs, ``Dataset.to_array`` / ``expand_variables``
(the inverse), stack/unstack of dimensions, groupby/resample/rolling/
coarsen/weighted (see ``grouped.py``), gap filling and regridding
(ffill/bfill/interpolate_na/interp/interp_like — pandas-oracle tested),
the pandas bridge (to_series/to_dataframe), complex values, datetime
coordinates, attribute propagation.
"""

from __future__ import annotations

import numpy as np

from .variable import Variable, as_array, get_xp, is_device_array

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

__all__ = ['DataArray', 'Dataset', 'concat', 'merge', 'broadcast',
           'full_like', 'zeros_like', 'ones_like']

_STACK_ATTR = '_nd_tpu_stacked'


def _normalize_indexers(indexers, kwargs):
    if indexers is None:
        indexers = {}
    indexers = dict(indexers)
    indexers.update(kwargs)
    return indexers


def _sel_to_isel(coord_var, label, method=None):
    """Convert a label-based selection on a 1-d coordinate to positions."""
    values = coord_var.values

    def _coerce(x):
        if np.issubdtype(values.dtype, np.datetime64):
            return np.asarray(x, dtype=values.dtype)
        return np.asarray(x, dtype=values.dtype) \
            if not isinstance(x, slice) else x

    if isinstance(label, slice):
        lo, hi = label.start, label.stop
        mask = np.ones(len(values), dtype=bool)
        ascending = len(values) < 2 or values[0] <= values[-1]
        if lo is not None:
            lo = _coerce(lo)
            mask &= (values >= lo) if ascending else (values <= lo)
        if hi is not None:
            hi = _coerce(hi)
            mask &= (values <= hi) if ascending else (values >= hi)
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return slice(0, 0)
        return slice(int(idx[0]), int(idx[-1]) + 1)

    label_arr = _coerce(label)
    scalar = (np.ndim(label_arr) == 0)
    label_arr = np.atleast_1d(label_arr)
    out = np.empty(len(label_arr), dtype=np.int64)
    for i, lab in enumerate(label_arr):
        if method == 'nearest':
            if np.issubdtype(values.dtype, np.datetime64):
                diffs = np.abs(values.astype('int64')
                               - lab.astype('int64'))
            else:
                diffs = np.abs(values - lab)
            out[i] = int(np.argmin(diffs))
        else:
            matches = np.nonzero(values == lab)[0]
            if len(matches) == 0:
                raise KeyError('label %r not found in coordinate' % (lab,))
            out[i] = int(matches[0])
    if scalar:
        return int(out[0])
    return out


class _CoordsView:
    """Mapping view over an object's coordinates."""

    def __init__(self, obj):
        self._obj = obj

    def __getitem__(self, key):
        return self._obj._coord_dataarray(key)

    def __setitem__(self, key, value):
        self._obj._set_coord(key, value)

    def __delitem__(self, key):
        del self._obj._coords[key]

    def __contains__(self, key):
        return key in self._obj._coords

    def __iter__(self):
        return iter(self._obj._coords)

    def __len__(self):
        return len(self._obj._coords)

    def keys(self):
        return self._obj._coords.keys()

    def items(self):
        return ((k, self[k]) for k in self._obj._coords)

    def values(self):
        return (self[k] for k in self._obj._coords)

    def variables(self):
        return dict(self._obj._coords)

    def __repr__(self):
        return 'Coordinates: ' + ', '.join(
            '%s %r' % (k, v.dims) for k, v in self._obj._coords.items())


def _coerce_coord(name, value, dim_sizes):
    """Coerce a user-supplied coordinate into a Variable."""
    if isinstance(value, Variable):
        return value
    if isinstance(value, DataArray):
        return Variable(value.dims, value.data, value.attrs)
    if isinstance(value, tuple) and len(value) in (2, 3) \
            and (isinstance(value[0], (tuple, list, str))):
        dims = value[0]
        attrs = value[2] if len(value) == 3 else None
        return Variable(dims, as_array(value[1]), attrs)
    arr = as_array(value)
    if arr.ndim == 0:
        return Variable((), arr)
    if arr.ndim == 1:
        return Variable((name,), arr)
    raise ValueError(
        'cannot infer dimensions for %d-d coordinate %r; pass '
        '(dims, data)' % (arr.ndim, name))


def _needs_float_fill(fill_value, dtype):
    """True when filling with NaN requires promoting an int/bool dtype.
    Datetimes/timedeltas never promote — their null is NaT (see
    :func:`_fill_for`)."""
    if np.dtype(str(dtype)).kind in 'mM':
        return False
    try:
        is_nan = bool(np.isnan(fill_value))
    except (TypeError, ValueError):
        return False
    return is_nan and not (np.issubdtype(dtype, np.floating)
                           or np.issubdtype(dtype, np.complexfloating))


def _fill_for(fill_value, dtype):
    """The concrete fill for a dtype: NaN requested on a datetime /
    timedelta array means NaT (keeping the dtype), like xarray."""
    dt = np.dtype(str(dtype))
    if dt.kind in 'mM':
        try:
            if np.isnan(fill_value):
                return (np.datetime64('NaT') if dt.kind == 'M'
                        else np.timedelta64('NaT'))
        except (TypeError, ValueError):
            pass
    return fill_value


def _union_align(a, b):
    """Reindex two objects onto the union of their 1-d dimension
    coordinate labels (NaN-filled where one side has no data); unions
    of two descending axes stay descending. Dims without coordinates
    on both sides are left alone."""
    indexers = {}
    for d in set(a.sizes) & set(b.sizes):
        ca = a._coords.get(d)
        cb = b._coords.get(d)
        if ca is None or cb is None or ca.ndim != 1 or cb.ndim != 1:
            continue
        va, vb = ca.values, cb.values
        if va.shape == vb.shape and (va == vb).all():
            continue
        union = np.union1d(va, vb)
        if (len(va) > 1 and va[0] > va[-1]
                and len(vb) > 1 and vb[0] > vb[-1]):
            union = union[::-1]
        indexers[d] = union
    if indexers:
        a = a.reindex(indexers)
        b = b.reindex(indexers)
    return a, b


def _shift_with_fill(xp, a, axis, p, fill):
    """``a`` shifted ``p`` positions toward higher indices along
    ``axis``; vacated entries take ``fill``."""
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    pad[axis] = (p, 0)
    padded = xp.pad(a, pad, mode='constant', constant_values=fill)
    key = [slice(None)] * a.ndim
    key[axis] = slice(0, n)
    return padded[tuple(key)]


def _propagate_last_valid(xp, valid, payloads, axis):
    """Position of (and payloads at) the most recent valid element at
    or before each index along ``axis``, by log-step pointer doubling
    — shifts and selects only, NO take_along_axis (the repo TPU rule:
    XLA lowers per-pixel gathers serially; the gather formulation of
    ffill measured 66 Mpix/s on-chip vs ~1 Gpix/s elementwise).

    Returns ``(pos, payloads)``: ``pos`` is -1 where no valid element
    precedes; payload entries there are garbage and must stay masked.
    """
    n = valid.shape[axis]
    shape = [1] * valid.ndim
    shape[axis] = n
    ar = xp.arange(n, dtype=xp.int32).reshape(shape)
    pos = xp.where(valid, ar, np.int32(-1))
    payloads = list(payloads)
    p = 1
    while p < n:
        pos_c = _shift_with_fill(xp, pos, axis, p, -1)
        take = pos_c > pos
        payloads = [
            xp.where(take, _shift_with_fill(xp, x, axis, p, 0), x)
            for x in payloads]
        pos = xp.where(take, pos_c, pos)
        p *= 2
    return pos, payloads


def _as_float_index(values):
    """A coordinate as float64 positions: datetimes become ns-since-
    epoch so gap arithmetic works uniformly."""
    values = np.asarray(values)
    if values.dtype.kind == 'M':
        return values.astype('datetime64[ns]').astype('int64') \
            .astype('float64')
    if values.dtype.kind == 'm':
        return values.astype('timedelta64[ns]').astype('int64') \
            .astype('float64')
    return values.astype('float64')


def _validate_swap(mapping, coords):
    """swap_dims contract (xarray): an existing replacement coordinate
    must be 1-d along the dimension it replaces."""
    for old, new in mapping.items():
        if new in coords and coords[new].dims != (old,):
            raise ValueError(
                'replacement dimension %r must be a 1-d variable '
                'along %r, not dims %r'
                % (new, old, coords[new].dims))


def _mask_missing(var, d, missing, fill_value):
    """Variable with ``missing`` positions along dim ``d`` set to the
    fill (float-promoting ints, NaT for datetimes)."""
    data = var.data
    fill = _fill_for(fill_value, data.dtype)
    if _needs_float_fill(fill, data.dtype):
        data = data.astype(np.float64)
    xp = get_xp(data)
    mshape = [1] * var.ndim
    mshape[var.dims.index(d)] = len(missing)
    return Variable(var.dims,
                    xp.where(missing.reshape(mshape),
                             xp.asarray(fill, data.dtype)
                             if np.dtype(str(data.dtype)).kind in 'mM'
                             else fill, data),
                    var.attrs)


def _pad_coord(cv, widths):
    """Pad a coordinate Variable: NaN for numeric, NaT for datetimes."""
    vals = cv.values
    if np.issubdtype(vals.dtype, np.datetime64) or \
            np.issubdtype(vals.dtype, np.timedelta64):
        fill = np.asarray('NaT', dtype=vals.dtype)
        padded = np.pad(vals, widths, mode='constant')
        # np.pad zero-fills datetimes; overwrite the pad regions with NaT
        for ax, (lo, hi) in enumerate(widths):
            key = [slice(None)] * vals.ndim
            if lo:
                key[ax] = slice(0, lo)
                padded[tuple(key)] = fill
            if hi:
                key[ax] = slice(-hi, None)
                padded[tuple(key)] = fill
            key[ax] = slice(None)
    else:
        if not np.issubdtype(vals.dtype, np.floating):
            vals = vals.astype(np.float64)
        padded = np.pad(vals, widths, mode='constant',
                        constant_values=np.nan)
    return Variable(cv.dims, padded, cv.attrs)


def _reindex_positions(coord_var, new_labels, method=None):
    """Match new labels against an existing 1-d coordinate.

    Returns (positions, missing_mask, labels_array); missing positions
    point at 0 and are masked by the caller.
    """
    values = coord_var.values
    if hasattr(new_labels, 'variable'):     # DataArray
        labels = np.asarray(new_labels.values)
    else:
        labels = np.asarray(new_labels)
        if labels.dtype != values.dtype and \
                np.issubdtype(values.dtype, np.datetime64):
            labels = labels.astype(values.dtype)
    idx = np.zeros(len(labels), dtype=np.int64)
    missing = np.zeros(len(labels), dtype=bool)
    for i, lab in enumerate(labels):
        m = np.nonzero(values == lab)[0]
        if len(m):
            idx[i] = m[0]
        elif method == 'nearest':
            if np.issubdtype(values.dtype, np.datetime64):
                diffs = np.abs(values.astype('int64')
                               - np.asarray(lab).astype(values.dtype)
                               .astype('int64'))
            else:
                diffs = np.abs(values - lab)
            idx[i] = int(np.argmin(diffs))
        elif method is None:
            missing[i] = True
        else:
            raise NotImplementedError(
                'reindex method %r not supported' % method)
    return idx, missing, labels


def _array_equiv(a, b):
    """Elementwise equality with NaN == NaN (xarray semantics)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        return False
    if a.dtype.kind in 'fc' and b.dtype.kind in 'fc':
        return bool(np.array_equal(a, b, equal_nan=True))
    if a.dtype.kind in 'mM' or b.dtype.kind in 'mM':
        return bool(np.array_equal(a.astype('int64'), b.astype('int64')))
    return bool(np.array_equal(a, b))


def _coords_equiv(a, b):
    if set(a) != set(b):
        return False
    for k in a:
        if a[k].dims != b[k].dims:
            return False
        if not _array_equiv(a[k].values, b[k].values):
            return False
    return True


class _NDOpsMixin:
    """Shared arithmetic/reduction machinery for DataArray."""

    def _apply_binary(self, other, op, reflexive=False):
        raise NotImplementedError

    def __add__(self, o):
        return self._apply_binary(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._apply_binary(o, lambda a, b: a + b, True)

    def __sub__(self, o):
        return self._apply_binary(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._apply_binary(o, lambda a, b: a - b, True)

    def __mul__(self, o):
        return self._apply_binary(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._apply_binary(o, lambda a, b: a * b, True)

    def __truediv__(self, o):
        return self._apply_binary(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._apply_binary(o, lambda a, b: a / b, True)

    def __pow__(self, o):
        return self._apply_binary(o, lambda a, b: a ** b)

    def __mod__(self, o):
        return self._apply_binary(o, lambda a, b: a % b)

    def __and__(self, o):
        return self._apply_binary(o, lambda a, b: a & b)

    def __or__(self, o):
        return self._apply_binary(o, lambda a, b: a | b)

    def __xor__(self, o):
        return self._apply_binary(o, lambda a, b: a ^ b)

    def __lt__(self, o):
        return self._apply_binary(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._apply_binary(o, lambda a, b: a <= b)

    def __gt__(self, o):
        return self._apply_binary(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._apply_binary(o, lambda a, b: a >= b)

    def __eq__(self, o):  # elementwise, like xarray
        return self._apply_binary(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._apply_binary(o, lambda a, b: a != b)

    __hash__ = None


class DataArray(_NDOpsMixin):
    """A labelled n-dimensional array with coordinates and attributes."""

    def __init__(self, data, coords=None, dims=None, attrs=None, name=None):
        if isinstance(data, DataArray):
            if dims is None:
                dims = data.dims
            if coords is None:
                coords = dict(data._coords)
            if attrs is None:
                attrs = dict(data.attrs)
            if name is None:
                name = data.name
            data = data.data
        if isinstance(data, Variable):
            if dims is None:
                dims = data.dims
            if attrs is None:
                attrs = dict(data.attrs)
            data = data.data
        data = as_array(data)
        if dims is None:
            if coords is not None and len(coords) == data.ndim and \
                    not isinstance(coords, dict):
                raise ValueError('pass dims explicitly')
            dims = tuple('dim_%d' % i for i in range(data.ndim))
        if isinstance(dims, str):
            dims = (dims,)
        dims = tuple(dims)
        self.variable = Variable(dims, data)
        self._coords = {}
        self.attrs = dict(attrs) if attrs else {}
        self.name = name
        if coords:
            if not isinstance(coords, dict):
                coords = {d: c for d, c in zip(dims, coords)}
            for k, v in coords.items():
                self._set_coord(k, v)

    # -- construction helpers ------------------------------------------------
    @classmethod
    def _from_parts(cls, variable, coords, attrs, name):
        obj = cls.__new__(cls)
        obj.variable = variable
        obj._coords = dict(coords)
        obj.attrs = dict(attrs) if attrs else {}
        obj.name = name
        return obj

    def _set_coord(self, key, value):
        var = _coerce_coord(key, value, self.sizes)
        for d, s in zip(var.dims, var.shape):
            if d in self.sizes and self.sizes[d] != s:
                raise ValueError(
                    'coordinate %r has size %d along %r; expected %d'
                    % (key, s, d, self.sizes[d]))
        self._coords[key] = var

    def _coord_dataarray(self, key):
        var = self._coords[key]
        sub = {k: v for k, v in self._coords.items()
               if set(v.dims).issubset(set(var.dims))}
        return DataArray._from_parts(var, sub, var.attrs, key)

    # -- properties -----------------------------------------------------------
    @property
    def data(self):
        return self.variable.data

    @data.setter
    def data(self, value):
        value = as_array(value)
        if tuple(value.shape) != self.shape:
            raise ValueError('shape mismatch')
        self.variable = Variable(self.dims, value, self.variable.attrs)

    @property
    def values(self):
        return self.variable.values

    @values.setter
    def values(self, value):
        self.data = np.asarray(value)

    @property
    def dims(self):
        return self.variable.dims

    @property
    def shape(self):
        return self.variable.shape

    @property
    def ndim(self):
        return self.variable.ndim

    @property
    def size(self):
        return self.variable.size

    @property
    def dtype(self):
        return self.variable.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.shape))

    @property
    def coords(self):
        return _CoordsView(self)

    @property
    def real(self):
        xp = get_xp(self.data)
        return self._replace(xp.real(self.data))

    @property
    def imag(self):
        xp = get_xp(self.data)
        return self._replace(xp.imag(self.data))

    @property
    def chunks(self):
        return None

    @property
    def loc(self):
        raise NotImplementedError('use .sel()')

    def jax(self):
        """Return the payload as a device array (uploading if needed)."""
        return self.variable.jax()

    def item(self):
        return self.values.item()

    # scalar conversion (xarray parity: works on any size-1 array)
    def __bool__(self):
        return bool(self.values)

    def __float__(self):
        return float(self.values)

    def __int__(self):
        return int(self.values)

    def __complex__(self):
        return complex(self.values)

    def __len__(self):
        return self.shape[0]

    def __array__(self, dtype=None, copy=None):
        v = self.values
        return v.astype(dtype) if dtype is not None else v

    def _replace(self, data, dims=None, coords=None, name=None):
        dims = self.dims if dims is None else dims
        coords = self._coords if coords is None else coords
        coords = {k: v for k, v in coords.items()
                  if set(v.dims).issubset(set(dims))}
        return DataArray._from_parts(
            Variable(dims, data), coords, self.attrs,
            self.name if name is None else name)

    # -- mapping access --------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return self._coord_dataarray(key)
        # positional indexing
        if not isinstance(key, tuple):
            key = (key,)
        indexers = {}
        for d, k in zip(self.dims, key):
            indexers[d] = k
        return self.isel(indexers)

    def __setitem__(self, key, value):
        if isinstance(key, str):
            self._set_coord(key, value)
            return
        raise TypeError('positional assignment not supported')

    def __delitem__(self, key):
        del self._coords[key]

    def __contains__(self, key):
        return key in self._coords

    # -- structural ops ----------------------------------------------------------
    def copy(self, deep=True):
        return DataArray._from_parts(
            self.variable.copy(deep), {k: v.copy(deep)
                                       for k, v in self._coords.items()},
            dict(self.attrs), self.name)

    def isel(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        new_var = self.variable.isel(indexers)
        new_coords = {}
        for k, v in self._coords.items():
            sub = {d: i for d, i in indexers.items() if d in v.dims}
            new_coords[k] = v.isel(sub) if sub else v
        # Drop coords that became 0-d scalars but keep them (xarray keeps
        # scalar coords); we keep them too.
        return DataArray._from_parts(new_var, new_coords, self.attrs,
                                     self.name)

    def sel(self, indexers=None, method=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        isel_kw = {}
        for d, label in indexers.items():
            if d not in self._coords:
                raise KeyError('no coordinate for dimension %r' % d)
            isel_kw[d] = _sel_to_isel(self._coords[d], label, method)
        return self.isel(isel_kw)

    def transpose(self, *dims):
        if not dims:
            dims = self.dims[::-1]
        dims = tuple(d for d in dims if d in self.dims)
        return DataArray._from_parts(self.variable.transpose(*dims),
                                     self._coords, self.attrs, self.name)

    def squeeze(self, dim=None):
        var = self.variable.squeeze(dim)
        coords = {}
        for k, v in self._coords.items():
            dropped = set(self.dims) - set(var.dims)
            sub = {d: 0 for d in v.dims if d in dropped}
            coords[k] = v.isel(sub) if sub else v
        return DataArray._from_parts(var, coords, self.attrs, self.name)

    def expand_dims(self, dim, axis=0):
        if isinstance(dim, dict):
            # reversed: each insertion lands at ``axis``, so walking
            # the dict backwards leaves the FIRST key outermost (the
            # xarray order)
            out = self
            for d, val in reversed(list(dim.items())):
                out = out.expand_dims(d, axis)
                if np.isscalar(val):
                    # integer size (xarray: expand_dims({'z': 3}))
                    n = int(val)
                    if n != 1:
                        out = out._replace(
                            get_xp(out.data).broadcast_to(
                                out.data, (n,) + out.shape[1:]))
                else:
                    out = out._replace(
                        get_xp(out.data).broadcast_to(
                            out.data,
                            (len(val),) + out.shape[1:]))
                    out._coords[d] = Variable((d,), as_array(val))
            return out
        var = self.variable.expand_dims(dim, axis)
        coords = dict(self._coords)
        if dim in coords and coords[dim].ndim == 0:
            coords[dim] = Variable((dim,), coords[dim].values.reshape(1))
        return DataArray._from_parts(var, coords, self.attrs, self.name)

    def rename(self, mapping=None, **kwargs):
        if isinstance(mapping, str):
            # renaming the array itself
            out = self.copy(deep=False)
            out.name = mapping
            return out
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        var = self.variable.rename_dims(mapping)
        coords = {}
        for k, v in self._coords.items():
            coords[mapping.get(k, k)] = v.rename_dims(mapping)
        return DataArray._from_parts(var, coords, self.attrs,
                                     mapping.get(self.name, self.name))

    def astype(self, dtype):
        return self._replace(self.data.astype(dtype))

    def fillna(self, value):
        xp = get_xp(self.data)
        return self._replace(xp.where(xp.isnan(self.data), value, self.data))

    def where(self, cond, other=np.nan):
        xp = get_xp(self.data)
        cond_data = cond.data if isinstance(cond, DataArray) else cond
        if isinstance(cond, DataArray):
            a, b = broadcast_variables(self.variable,
                                       Variable(cond.dims, cond_data))
            if isinstance(other, DataArray):
                # align `other` by DIMENSION NAME (a positional
                # broadcast would silently mix axes)
                a, o = broadcast_variables(a, other.variable)
                b, _ = broadcast_variables(b, o)
                other_data = o.data
            else:
                other_data = other
            data = xp.where(b.data, a.data, other_data)
            return self._replace(data, dims=a.dims)
        if isinstance(other, DataArray):
            a, o = broadcast_variables(self.variable, other.variable)
            return self._replace(xp.where(cond_data, a.data, o.data),
                                 dims=a.dims)
        return self._replace(xp.where(cond_data, self.data, other))

    def isnull(self):
        xp = get_xp(self.data)
        kind = np.dtype(str(self.dtype)).kind
        if kind in 'fc':
            return self._replace(xp.isnan(self.data))
        if kind in 'mM':
            # datetimes/timedeltas are host numpy; NaT is null (xarray)
            return self._replace(np.isnat(self.values))
        return self._replace(np.zeros(self.shape, dtype=bool))

    def notnull(self):
        xp = get_xp(self.data)
        out = self.isnull()
        return out._replace(xp.logical_not(out.data))

    def clip(self, min=None, max=None):
        xp = get_xp(self.data)
        return self._replace(xp.clip(self.data, min, max))

    def to_dataset(self, name=None, dim=None):
        if dim is not None:
            return expand_variables_da(self, dim)
        name = name or self.name
        if name is None:
            raise ValueError('cannot convert unnamed DataArray to Dataset')
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            ds._coords[k] = v
        ds[name] = self
        return ds

    # -- stack/unstack ------------------------------------------------------------
    def stack(self, **kwargs):
        """Stack multiple dims into one. Only one new dim per call."""
        (new_dim, dims), = kwargs.items()
        dims = tuple(dims)
        other = tuple(d for d in self.dims if d not in dims)
        ordered = other + dims
        var = self.variable.transpose(*ordered)
        n_other = len(other)
        xp = get_xp(var.data)
        stacked_size = int(np.prod([self.sizes[d] for d in dims],
                                   dtype=np.int64))
        new_shape = var.shape[:n_other] + (stacked_size,)
        data = var.data.reshape(new_shape)
        new_dims = other + (new_dim,)
        coords = {k: v for k, v in self._coords.items()
                  if not (set(v.dims) & set(dims))}
        out = DataArray._from_parts(Variable(new_dims, data), coords,
                                    self.attrs, self.name)
        out.attrs[_STACK_ATTR] = {
            'dim': new_dim,
            'dims': dims,
            'shape': tuple(self.sizes[d] for d in dims),
            'coords': {k: (v.dims, v.values)
                       for k, v in self._coords.items()
                       if set(v.dims) & set(dims)},
        }
        return out

    def unstack(self, dim=None):
        info = self.attrs.get(_STACK_ATTR)
        if info is None:
            raise ValueError('DataArray was not stacked by nd_tpu')
        new_dim = info['dim']
        dims = info['dims']
        shape = info['shape']
        other = tuple(d for d in self.dims if d != new_dim)
        var = self.variable.transpose(*(other + (new_dim,)))
        data = var.data.reshape(var.shape[:-1] + tuple(shape))
        coords = {k: v for k, v in self._coords.items() if k != new_dim}
        for k, (cdims, cvals) in info['coords'].items():
            coords[k] = Variable(cdims, cvals)
        attrs = {k: v for k, v in self.attrs.items() if k != _STACK_ATTR}
        out = DataArray._from_parts(Variable(other + dims, data), coords,
                                    attrs, self.name)
        return out

    # -- arithmetic -----------------------------------------------------------------
    def _apply_binary(self, other, op, reflexive=False):
        if isinstance(other, Dataset):
            return NotImplemented
        if isinstance(other, DataArray):
            var = self.variable._binary_op(other.variable, op, reflexive)
            coords = dict(other._coords)
            coords.update(self._coords)
            coords = {k: v for k, v in coords.items()
                      if set(v.dims).issubset(set(var.dims))}
            name = self.name if self.name == other.name else None
            return DataArray._from_parts(var, coords, {}, name)
        var = self.variable._binary_op(other, op, reflexive)
        return DataArray._from_parts(var, self._coords, {}, self.name)

    def __neg__(self):
        return self._replace(-self.data)

    def __abs__(self):
        xp = get_xp(self.data)
        return self._replace(xp.abs(self.data))

    def __invert__(self):
        xp = get_xp(self.data)
        return self._replace(xp.logical_not(self.data))

    # -- reductions --------------------------------------------------------------------
    def _reduce(self, npfunc, jnpfunc, dim=None, **kwargs):
        xp = get_xp(self.data)
        func = jnpfunc if xp is jnp else npfunc
        var = self.variable.reduce(func, dim, **kwargs)
        coords = {k: v for k, v in self._coords.items()
                  if set(v.dims).issubset(set(var.dims))}
        return DataArray._from_parts(var, coords, self.attrs, self.name)

    def mean(self, dim=None, **kw):
        return self._reduce(np.nanmean, jnp.nanmean if jnp else None,
                            dim, **kw)

    def std(self, dim=None, **kw):
        return self._reduce(np.nanstd, jnp.nanstd if jnp else None, dim, **kw)

    def var(self, dim=None, **kw):
        return self._reduce(np.nanvar, jnp.nanvar if jnp else None, dim, **kw)

    def min(self, dim=None, **kw):
        return self._reduce(np.nanmin, jnp.nanmin if jnp else None, dim, **kw)

    def max(self, dim=None, **kw):
        return self._reduce(np.nanmax, jnp.nanmax if jnp else None, dim, **kw)

    def sum(self, dim=None, **kw):
        return self._reduce(np.nansum, jnp.nansum if jnp else None, dim, **kw)

    def median(self, dim=None, **kw):
        return self._reduce(np.nanmedian, jnp.nanmedian if jnp else None,
                            dim, **kw)

    def prod(self, dim=None, **kw):
        return self._reduce(np.nanprod, jnp.nanprod if jnp else None,
                            dim, **kw)

    def all(self, dim=None, **kw):
        return self._reduce(np.all, jnp.all if jnp else None, dim, **kw)

    def any(self, dim=None, **kw):
        return self._reduce(np.any, jnp.any if jnp else None, dim, **kw)

    def count(self, dim=None, **kw):
        notnull = self.notnull().astype(np.int64)
        return notnull._reduce(np.sum, jnp.sum if jnp else None, dim, **kw)

    def argmin(self, dim=None, **kw):
        return self._reduce(np.nanargmin, jnp.nanargmin if jnp else None,
                            dim, **kw)

    def argmax(self, dim=None, **kw):
        return self._reduce(np.nanargmax, jnp.nanargmax if jnp else None,
                            dim, **kw)

    def quantile(self, q, dim=None, **kw):
        q_arr = np.asarray(q, np.float64)
        if q_arr.ndim == 0:
            return self._reduce(np.nanquantile,
                                jnp.nanquantile if jnp else None, dim,
                                q=float(q_arr), **kw)
        # vector q: a NEW leading 'quantile' dim (xarray) — the rank-
        # preserving result would otherwise be mistaken for a keepdims
        # reduction and keep the reduced dim's stale coords
        xp = get_xp(self.data)
        func = (jnp.nanquantile if xp is jnp and jnp else np.nanquantile)
        if dim is None:
            red = self.dims
        else:
            red = (dim,) if isinstance(dim, str) else tuple(dim)
        axes = tuple(self.dims.index(d) for d in red)
        data = func(self.data, xp.asarray(q_arr), axis=axes, **kw)
        out_dims = ('quantile',) + tuple(d for d in self.dims
                                         if d not in red)
        coords = {k: v for k, v in self._coords.items()
                  if set(v.dims).issubset(set(out_dims))}
        coords['quantile'] = Variable(('quantile',), q_arr)
        return DataArray._from_parts(Variable(out_dims, data), coords,
                                     self.attrs, self.name)

    def reduce(self, func, dim=None, **kwargs):
        """Reduce with an arbitrary ``func(data, axis=...)`` callable."""
        var = self.variable.reduce(func, dim, **kwargs)
        coords = {k: v for k, v in self._coords.items()
                  if set(v.dims).issubset(set(var.dims))}
        return DataArray._from_parts(var, coords, self.attrs, self.name)

    def idxmin(self, dim):
        return self._idx_reduce(dim, 'argmin')

    def idxmax(self, dim):
        return self._idx_reduce(dim, 'argmax')

    def _idx_reduce(self, dim, which):
        if dim not in self._coords:
            raise KeyError('no coordinate for dimension %r' % dim)
        idx = getattr(self, which)(dim=dim)
        labels = self._coords[dim].values[np.asarray(idx.values)]
        return DataArray._from_parts(
            Variable(idx.dims, labels), dict(idx._coords), self.attrs,
            self.name)

    # -- elementwise / accumulating ---------------------------------------------
    def round(self, decimals=0):
        xp = get_xp(self.data)
        return self._replace(xp.round(self.data, decimals))

    def _accumulate(self, npfunc, jnpfunc, dim=None):
        dims = (self.dims if dim is None
                else ((dim,) if isinstance(dim, str) else tuple(dim)))
        xp = get_xp(self.data)
        func = jnpfunc if xp is jnp else npfunc
        data = self.data
        for d in dims:
            data = func(data, axis=self.dims.index(d))
        return self._replace(data)

    def cumsum(self, dim=None, **kw):
        return self._accumulate(np.nancumsum,
                                jnp.nancumsum if jnp else None, dim)

    def cumprod(self, dim=None, **kw):
        return self._accumulate(np.nancumprod,
                                jnp.nancumprod if jnp else None, dim)

    # -- shifting / padding -------------------------------------------------------
    def diff(self, dim, n=1, label='upper'):
        out = self
        for _ in range(n):
            upper = out.isel({dim: slice(1, None)})
            lower = out.variable.isel({dim: slice(None, -1)})
            base = (upper if label == 'upper'
                    else out.isel({dim: slice(None, -1)}))
            out = base._replace(upper.data - lower.data)
        return out

    def shift(self, shifts=None, fill_value=np.nan, **kwargs):
        shifts = _normalize_indexers(shifts, kwargs)
        data = self.data
        xp = get_xp(data)
        fill_value = _fill_for(fill_value, data.dtype)
        if _needs_float_fill(fill_value, data.dtype):
            data = data.astype(np.float64)
        for d, k in shifts.items():
            k = int(k)
            if k == 0:
                continue
            ax = self.dims.index(d)
            n = self.shape[ax]
            fill_shape = list(data.shape)
            fill_shape[ax] = min(abs(k), n)
            fill = xp.full(tuple(fill_shape), fill_value, dtype=data.dtype)
            key = [slice(None)] * self.ndim
            if k > 0:
                key[ax] = slice(0, max(n - k, 0))
                data = xp.concatenate([fill, data[tuple(key)]], axis=ax)
            else:
                key[ax] = slice(min(-k, n), None)
                data = xp.concatenate([data[tuple(key)], fill], axis=ax)
        return self._replace(data)

    def roll(self, shifts=None, roll_coords=False, **kwargs):
        shifts = _normalize_indexers(shifts, kwargs)
        xp = get_xp(self.data)
        data = self.data
        for d, k in shifts.items():
            data = xp.roll(data, int(k), axis=self.dims.index(d))
        out = self._replace(data)
        if roll_coords:
            for ck, cv in list(out._coords.items()):
                for d, k in shifts.items():
                    if d in cv.dims:
                        cv = Variable(cv.dims,
                                      np.roll(cv.values, int(k),
                                              axis=cv.dims.index(d)),
                                      cv.attrs)
                out._coords[ck] = cv
        return out

    def pad(self, pad_width=None, mode='constant',
            constant_values=np.nan, **kwargs):
        pad_width = _normalize_indexers(pad_width, kwargs)
        norm = {d: ((w, w) if np.isscalar(w) else tuple(w))
                for d, w in pad_width.items()}
        widths = [norm.get(d, (0, 0)) for d in self.dims]
        xp = get_xp(self.data)
        data = self.data
        if mode == 'constant':
            constant_values = _fill_for(constant_values, data.dtype)
            if _needs_float_fill(constant_values, data.dtype):
                data = data.astype(np.float64)
        kw = ({'constant_values': constant_values}
              if mode == 'constant' else {})
        data = xp.pad(data, widths, mode=mode, **kw)
        coords = {}
        for ck, cv in self._coords.items():
            cw = [norm.get(d, (0, 0)) for d in cv.dims]
            coords[ck] = (_pad_coord(cv, cw)
                          if any(a or b for a, b in cw) else cv)
        return DataArray._from_parts(Variable(self.dims, data), coords,
                                     self.attrs, self.name)

    # -- reordering / realignment --------------------------------------------------
    def sortby(self, variables, ascending=True):
        if isinstance(variables, (str, DataArray)):
            variables = [variables]
        out = self
        for v in variables:
            cv = out._coords[v] if isinstance(v, str) else v.variable
            if cv.ndim != 1:
                raise ValueError('sortby only supports 1-d keys')
            order = np.argsort(cv.values, kind='stable')
            if not ascending:
                order = order[::-1]
            out = out.isel({cv.dims[0]: order})
        return out

    def reindex(self, indexers=None, method=None, fill_value=np.nan,
                **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, new_labels in indexers.items():
            idx, missing, labels = _reindex_positions(
                out._coords[d], new_labels, method)
            sub = out.isel({d: idx})
            if missing.any():
                masked = _mask_missing(sub.variable, d, missing,
                                       fill_value)
                sub = sub._replace(masked.data)
                # non-index coords along d would otherwise keep stale
                # position-0 values at the missing labels
                for ck in list(sub._coords):
                    cv = sub._coords[ck]
                    if ck != d and d in cv.dims:
                        sub._coords[ck] = _mask_missing(cv, d, missing,
                                                        fill_value)
            sub._coords[d] = Variable((d,), labels)
            out = sub
        return out

    def reindex_like(self, other, method=None, fill_value=np.nan):
        indexers = {d: other._coords[d].values
                    for d in self.dims
                    if d in other._coords and d in self._coords}
        return self.reindex(indexers, method=method, fill_value=fill_value)

    def dropna(self, dim, how='any', thresh=None):
        other = tuple(d for d in self.dims if d != dim)
        counts = np.asarray(self.notnull().sum(dim=other).values
                            if other else self.notnull().values)
        total = int(np.prod([self.sizes[d] for d in other],
                            dtype=np.int64)) if other else 1
        if thresh is not None:
            keep = counts >= thresh
        elif how == 'any':
            keep = counts == total
        elif how == 'all':
            keep = counts > 0
        else:
            raise ValueError("how must be 'any' or 'all'")
        return self.isel({dim: np.nonzero(keep)[0]})

    def broadcast_like(self, other):
        bc = broadcast(self, other)[0]
        for ck, cv in other._coords.items():
            if ck not in bc._coords and \
                    set(cv.dims).issubset(set(bc.dims)):
                bc._coords[ck] = cv
        return bc

    # -- metadata assignment -----------------------------------------------------
    def assign_coords(self, coords=None, **kwargs):
        out = self.copy(deep=False)
        for k, v in {**(coords or {}), **kwargs}.items():
            out._set_coord(k, v)
        return out

    def assign_attrs(self, *args, **kwargs):
        out = self.copy(deep=False)
        out.attrs.update(dict(*args, **kwargs))
        return out

    def drop_vars(self, names):
        """Drop coordinates (a DataArray has no other variables)."""
        if isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for n in names:
            out._coords.pop(n, None)
        return out

    drop = drop_vars

    def swap_dims(self, mapping=None, **kwargs):
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        _validate_swap(mapping, self._coords)
        var = self.variable.rename_dims(mapping)
        coords = {k: v.rename_dims(mapping)
                  for k, v in self._coords.items()}
        return DataArray._from_parts(var, coords, self.attrs, self.name)

    # -- slicing sugar -------------------------------------------------------------
    def head(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(0, int(n)) for d, n in indexers.items()})

    def tail(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(-int(n), None)
                          for d, n in indexers.items()})

    def thin(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(None, None, int(n))
                          for d, n in indexers.items()})

    # -- grouped / windowed ----------------------------------------------------------
    def groupby(self, group):
        from .grouped import GroupBy
        return GroupBy.from_group(self, group)

    def resample(self, indexer=None, **kwargs):
        from .grouped import Resample
        indexer = _normalize_indexers(indexer, kwargs)
        (dim, freq), = indexer.items()
        return Resample.from_freq(self, dim, freq)

    def rolling(self, dim=None, min_periods=None, center=False,
                **window_kwargs):
        from .grouped import Rolling
        spec = _normalize_indexers(dim if isinstance(dim, dict) else None,
                                   window_kwargs)
        (d, w), = spec.items()
        return Rolling(self, d, w, min_periods=min_periods, center=center)

    def coarsen(self, dim=None, boundary='exact', side='left',
                coord_func='mean', **window_kwargs):
        from .grouped import Coarsen
        windows = _normalize_indexers(dim if isinstance(dim, dict)
                                      else None, window_kwargs)
        return Coarsen(self, windows, boundary=boundary, side=side,
                       coord_func=coord_func)

    def weighted(self, weights):
        from .grouped import Weighted
        return Weighted(self, weights)

    @property
    def dt(self):
        """Calendar fields of a datetime array (``da.dt.month`` etc.,
        the xarray ``.dt`` accessor)."""
        from .grouped import DatetimeAccessor
        return DatetimeAccessor(self)

    # -- gap filling / interpolation --------------------------------------------
    def ffill(self, dim, limit=None):
        """Propagate the last valid value forward along ``dim``
        (optionally at most ``limit`` steps past it)."""
        return self._fill_directional(dim, limit, forward=True)

    def bfill(self, dim, limit=None):
        """Propagate the next valid value backward along ``dim``."""
        return self._fill_directional(dim, limit, forward=False)

    def _fill_directional(self, dim, limit, forward):
        kind = np.dtype(str(self.dtype)).kind
        if kind in 'iub':          # no NaN representable: nothing to fill
            return self.copy(deep=False)
        if limit is not None and int(limit) < 1:
            raise ValueError('limit must be >= 1')
        axis = self.dims.index(dim)
        n = self.shape[axis]
        dt_dtype = None
        if kind in 'mM':           # NaT fills run on the host (int64)
            dt_dtype = self.values.dtype
            data = self.values.astype('int64')
            xp = np
            nanmask = np.isnat(self.values)
        else:
            data = self.data
            xp = get_xp(data)
            nanmask = xp.isnan(data)
        if not forward:
            data = xp.flip(data, axis=axis)
            nanmask = xp.flip(nanmask, axis=axis)
        pos, (val,) = _propagate_last_valid(xp, ~nanmask, (data,), axis)
        filled = xp.where(pos >= 0, val, data)
        if limit is not None:
            shape = [1] * self.ndim
            shape[axis] = n
            ar = xp.arange(n, dtype=np.int32).reshape(shape)
            filled = xp.where(ar - pos <= int(limit), filled, data)
        if not forward:
            filled = xp.flip(filled, axis=axis)
        if dt_dtype is not None:
            filled = filled.astype(dt_dtype)
        return self._replace(filled)

    def interpolate_na(self, dim=None, method='linear', limit=None,
                       use_coordinate=True, max_gap=None):
        """Fill interior NaN runs along ``dim`` from the nearest valid
        neighbors — ``'linear'`` in the dim's coordinate (or position,
        ``use_coordinate=False``) or ``'nearest'``. Leading/trailing
        NaNs are preserved (no extrapolation, the xarray behavior);
        ``limit`` caps the fill distance (steps past the previous
        valid point), ``max_gap`` skips gaps wider than that many
        coordinate units (a timedelta for datetime coordinates)."""
        if method not in ('linear', 'nearest'):
            raise ValueError("method must be 'linear' or 'nearest'")
        if dim is None:
            raise ValueError('interpolate_na requires a dim')
        kind = np.dtype(str(self.dtype)).kind
        if kind in 'iub':
            return self.copy(deep=False)
        axis = self.dims.index(dim)
        n = self.shape[axis]
        if use_coordinate and dim in self._coords \
                and self._coords[dim].ndim == 1:
            x = _as_float_index(self._coords[dim].values)
        else:
            x = np.arange(n, dtype=np.float64)
        is_dt = kind in 'mM'
        ints = None
        if is_dt:
            base = self.values
            ints = base.astype('int64')
            nanmask = np.isnat(base)
            data = np.where(nanmask, np.nan, ints.astype('float64'))
            xp = np
        else:
            data = self.data
            xp = get_xp(data)
            nanmask = xp.isnan(data)
        valid = ~nanmask
        shape = [1] * self.ndim
        shape[axis] = n
        ar = xp.arange(n, dtype=np.int32).reshape(shape)
        xarr = xp.asarray(x)
        xfull = xp.broadcast_to(xarr.reshape(shape), data.shape)
        # neighbor values AND their coordinates ride the gather-free
        # pointer-doubling scan as payloads (datetimes also carry the
        # exact int64 counts — see the assembly below)
        payloads = (data, xfull) + ((ints,) if is_dt else ())
        prev, fwd = _propagate_last_valid(xp, valid, payloads, axis)
        vp, x_p = fwd[0], fwd[1]

        def fl(a):
            return xp.flip(a, axis=axis)

        nxt_f, bwd = _propagate_last_valid(
            xp, fl(valid), tuple(fl(a) for a in payloads), axis)
        nxt_pos = fl(nxt_f)
        nxt = xp.where(nxt_pos >= 0, (n - 1) - nxt_pos, np.int32(n))
        vn, x_n = fl(bwd[0]), fl(bwd[1])
        denom = x_n - x_p
        w = (xarr.reshape(shape) - x_p) / xp.where(denom == 0, 1, denom)
        if method == 'nearest':
            fill = xp.where(w <= 0.5, vp, vn)
        else:
            # keep f32 cubes f32: the f64 coordinate weights would
            # silently promote the whole payload
            wc = w.astype(data.dtype) \
                if np.dtype(str(data.dtype)).kind in 'fc' else w
            fill = vp + (vn - vp) * wc
        can = (~valid) & (prev >= 0) & (nxt <= n - 1)
        if limit is not None:
            if int(limit) < 1:
                raise ValueError('limit must be >= 1')
            can = can & (ar - prev <= int(limit))
        if max_gap is not None:
            gap_limit = max_gap
            if isinstance(gap_limit, (np.timedelta64,)) or (
                    hasattr(gap_limit, 'dtype')
                    and np.asarray(gap_limit).dtype.kind == 'm'):
                gap_limit = float(np.asarray(gap_limit)
                                  .astype('timedelta64[ns]')
                                  .astype('int64'))
            can = can & (xp.abs(denom) <= float(gap_limit))
        if is_dt:
            # exact int64 assembly: epoch counts exceed float64's 2^53
            # integer range (ulp ~256 ns for 2024 ns-stamps), so the
            # float pipeline is only trusted for masks/weights — values
            # interpolate as base + round(delta * w) with the SMALL
            # delta in float, and untouched positions keep their
            # original bytes verbatim
            base = self.values
            vp_i, vn_i = fwd[2], fl(bwd[2])
            if method == 'nearest':
                fill_i = np.where(np.broadcast_to(w, ints.shape) <= 0.5,
                                  vp_i, vn_i)
            else:
                delta = (vn_i - vp_i).astype('float64')
                fill_i = vp_i + np.round(
                    delta * np.broadcast_to(w, ints.shape)
                ).astype('int64')
            out = np.where(can, fill_i, ints).astype(base.dtype)
            return self._replace(out)
        out = xp.where(can, fill, data)
        return self._replace(out)

    def interp(self, coords=None, method='linear', assume_sorted=False,
               **coords_kwargs):
        """Interpolate onto new coordinate values, dim by dim
        (orthogonal 1-d interpolation like xarray's default engine).
        ``method`` is ``'linear'`` or ``'nearest'``; targets outside
        the source range come back NaN. Descending source coordinates
        (the usual ``y`` axis) are handled via an index sort on the
        host."""
        del assume_sorted  # sortedness is detected, not assumed
        indexers = _normalize_indexers(coords, coords_kwargs)
        adv = {d: t for d, t in indexers.items()
               if isinstance(t, DataArray) and t.ndim >= 1
               and t.dims != (d,)}
        if adv:
            # DataArray indexers on foreign dims = vectorized
            # (pointwise) interpolation — transect/trajectory
            # extraction in xarray terms
            if set(adv) != set(indexers):
                rest = {d: t for d, t in indexers.items()
                        if d not in adv}
                return self.interp(rest, method=method) \
                    .interp(adv, method=method)
            return self._interp_pointwise(adv, method)
        out = self
        for d, t in indexers.items():
            out = out._interp_dim(d, t, method)
        return out

    def _interp_pointwise(self, indexers, method):
        """Vectorized interpolation: every indexer is a DataArray on a
        shared set of NEW dims (e.g. ``points``); the result samples
        the field at each joint position — the xarray advanced-interp
        contract used for transects and trajectories."""
        import itertools
        if method not in ('linear', 'nearest'):
            raise ValueError("method must be 'linear' or 'nearest'")
        dims_new = None
        for d, t in indexers.items():
            if dims_new is None:
                dims_new = t.dims
            elif t.dims != dims_new:
                raise ValueError(
                    'vectorized interp indexers must share one dim '
                    'set (got %r vs %r)' % (t.dims, dims_new))
            if d not in self.dims:
                raise ValueError('dim %r not in %r' % (d, self.dims))
            if d not in self._coords or self._coords[d].ndim != 1:
                raise ValueError('interp needs a 1-d coordinate on %r'
                                 % d)
        pshape = next(iter(indexers.values())).shape

        # per-dim corner indices + weights at each target point
        per_dim = {}
        oob = np.zeros(pshape, bool)
        for d, t in indexers.items():
            raw_c = self._coords[d].values
            c = _as_float_index(raw_c)
            tv = np.asarray(t.values)
            if raw_c.dtype.kind == 'M':
                tv = np.asarray(tv, dtype='datetime64[ns]')
            tq = _as_float_index(tv)
            n = len(c)
            order = np.arange(n)
            cs = c
            if n > 1 and not np.all(np.diff(c) >= 0):
                order = np.argsort(c, kind='stable')
                cs = c[order]
            j = np.searchsorted(cs, tq.ravel(), side='left')
            lo_s = np.clip(j - 1, 0, n - 1)
            hi_s = np.clip(j, 0, n - 1)
            denom = cs[hi_s] - cs[lo_s]
            w = np.where(denom == 0, 0.0,
                         (tq.ravel() - cs[lo_s])
                         / np.where(denom == 0, 1, denom))
            exact = cs[hi_s] == tq.ravel()
            w = np.where(exact, 1.0, w)
            lo = order[np.where(exact, hi_s, lo_s)]
            hi = order[hi_s]
            oob |= ((tq < cs[0]) | (tq > cs[-1])
                    | np.isnan(tq)).reshape(pshape)
            per_dim[d] = (lo.reshape(pshape), hi.reshape(pshape),
                          w.reshape(pshape))

        data = self.data
        xp = get_xp(data)
        if np.dtype(str(data.dtype)).kind in 'iub' \
                and method == 'linear':
            data = data.astype(np.float64)
        # move the interped axes last, batched dims first
        keep = tuple(d for d in self.dims if d not in indexers)
        perm = [self.dims.index(d) for d in keep] \
            + [self.dims.index(d) for d in indexers]
        data_t = xp.transpose(data, perm)
        ndim_q = len(indexers)
        names = list(indexers)
        if method == 'nearest':
            idx = tuple(
                xp.asarray(np.where(per_dim[names[k]][2] <= 0.5,
                                    per_dim[names[k]][0],
                                    per_dim[names[k]][1]))
                for k in range(ndim_q))
            out = data_t[(Ellipsis,) + idx]
        else:
            out = None
            for corner in itertools.product((0, 1), repeat=ndim_q):
                idx = tuple(xp.asarray(per_dim[names[k]][corner[k]])
                            for k in range(ndim_q))
                vals = data_t[(Ellipsis,) + idx]
                wgt = None
                for k in range(ndim_q):
                    w = per_dim[names[k]][2]
                    wk = w if corner[k] else 1.0 - w
                    wgt = wk if wgt is None else wgt * wk
                wv = xp.asarray(wgt)
                if np.dtype(str(vals.dtype)).kind in 'fc':
                    wv = wv.astype(vals.dtype)
                term = vals * wv
                out = term if out is None else out + term
        if oob.any():
            if np.dtype(str(out.dtype)).kind in 'iub':
                out = out.astype(np.float64)
            mask = xp.asarray(oob)
            out = xp.where(mask, xp.asarray(np.nan, dtype=out.dtype),
                           out)

        dims_out = keep + dims_new
        coords = {k: v for k, v in self._coords.items()
                  if set(v.dims).issubset(set(keep))}
        first = next(iter(indexers.values()))
        for ck, cv in first._coords.items():
            if set(cv.dims).issubset(set(dims_new)) \
                    and ck not in coords:
                coords[ck] = cv
        for d, t in indexers.items():
            coords[d] = Variable(dims_new, np.asarray(t.values),
                                 self._coords[d].attrs)
        return DataArray._from_parts(Variable(dims_out, out), coords,
                                     self.attrs, self.name)

    def interp_like(self, other, method='linear'):
        """Interpolate onto ``other``'s 1-d coordinates (shared dims
        only)."""
        indexers = {d: other._coords[d].values for d in self.dims
                    if d in other._coords and other._coords[d].ndim == 1
                    and d in self._coords}
        return self.interp(indexers, method=method)

    def _interp_dim(self, dim, target, method):
        if method not in ('linear', 'nearest'):
            raise ValueError("method must be 'linear' or 'nearest'")
        if dim not in self.dims:
            raise ValueError('dim %r not in %r' % (dim, self.dims))
        if dim not in self._coords or self._coords[dim].ndim != 1:
            raise ValueError('interp needs a 1-d coordinate on %r' % dim)
        raw_c = self._coords[dim].values
        c = _as_float_index(raw_c)
        if isinstance(target, DataArray):
            tv_raw = np.asarray(target.values)
        else:
            tv_raw = np.asarray(target)
        scalar = tv_raw.ndim == 0
        if raw_c.dtype.kind == 'M':
            tv_raw = np.asarray(tv_raw, dtype='datetime64[ns]')
        tv = np.atleast_1d(tv_raw)
        t = _as_float_index(tv)
        n = len(c)
        axis = self.dims.index(dim)

        order = np.arange(n)
        cs = c
        if n > 1 and not np.all(np.diff(c) >= 0):
            order = np.argsort(c, kind='stable')
            cs = c[order]
        j = np.searchsorted(cs, t, side='left')
        lo_s = np.clip(j - 1, 0, n - 1)
        hi_s = np.clip(j, 0, n - 1)
        denom = cs[hi_s] - cs[lo_s]
        w = np.where(denom == 0, 0.0, (t - cs[lo_s])
                     / np.where(denom == 0, 1, denom))
        exact = cs[hi_s] == t
        w = np.where(exact, 1.0, w)
        lo = order[np.where(exact, hi_s, lo_s)]
        hi = order[hi_s]
        oob = (t < cs[0]) | (t > cs[-1]) | np.isnan(t)

        kind = np.dtype(str(self.dtype)).kind
        is_dt = kind in 'mM'
        if is_dt:
            # exact int64 arithmetic: epoch counts exceed float64's
            # 2^53 integer range, so a float round-trip would corrupt
            # sub-microsecond stamps — values combine as
            # lo + round(delta * w) with only the small delta in float
            base = self.values
            ints = base.astype('int64')
            nat = np.isnat(base)
            vlo_i = np.take(ints, lo, axis=axis)
            vhi_i = np.take(ints, hi, axis=axis)
            bad = np.take(nat, lo, axis=axis) \
                | np.take(nat, hi, axis=axis)
            shape = [1] * vlo_i.ndim
            shape[axis] = len(tv)
            if method == 'nearest':
                pick = (w <= 0.5).reshape(shape)
                out_i = np.where(np.broadcast_to(pick, vlo_i.shape),
                                 vlo_i, vhi_i)
            else:
                delta = (vhi_i - vlo_i).astype('float64')
                out_i = vlo_i + np.round(
                    delta * w.reshape(shape)).astype('int64')
            bad = bad | oob.reshape(shape)
            out = np.where(bad,
                           np.full(1, 'NaT', dtype=base.dtype)
                           .astype('int64'),
                           out_i).astype(base.dtype)
            return self._finish_interp_dim(out, np, dim, tv, tv_raw,
                                           scalar, lo, hi, w, oob,
                                           axis)
        data = self.data
        xp = get_xp(data)

        if method == 'nearest':
            idx = np.where(w <= 0.5, lo, hi)
            out = xp.take(data, xp.asarray(idx), axis=axis)
            if oob.any():
                if np.dtype(str(out.dtype)).kind in 'iub':
                    out = out.astype(np.float64)
                shape = [1] * out.ndim
                shape[axis] = len(tv)
                out = xp.where(xp.asarray(oob).reshape(shape),
                               xp.asarray(np.nan, dtype=out.dtype), out)
        else:
            if np.dtype(str(data.dtype)).kind in 'iub':
                data = data.astype(np.float64)
            vlo = xp.take(data, xp.asarray(lo), axis=axis)
            vhi = xp.take(data, xp.asarray(hi), axis=axis)
            shape = [1] * vlo.ndim
            shape[axis] = len(tv)
            wv = xp.asarray(np.where(oob, np.nan, w)).reshape(shape)
            if np.dtype(str(vlo.dtype)).kind in 'fc':
                # keep f32 cubes f32: a float64 weight array would
                # promote the whole result (and double its HBM cost)
                wv = wv.astype(vlo.dtype)
            out = vlo + (vhi - vlo) * wv
        return self._finish_interp_dim(out, xp, dim, tv, tv_raw,
                                       scalar, lo, hi, w, oob, axis)

    def _finish_interp_dim(self, out, xp, dim, tv, tv_raw, scalar,
                           lo, hi, w, oob, axis):
        # rebuild coordinates: the index coord takes the target values;
        # other coords along ``dim`` interpolate on the host, non-
        # numeric ones are dropped (xarray drops them too)
        coords = {}
        for ck, cv in self._coords.items():
            if dim not in cv.dims:
                coords[ck] = cv
                continue
            if ck == dim:
                continue
            ckind = cv.values.dtype.kind
            if ckind not in 'fiuMm':
                continue
            cax = cv.dims.index(dim)
            cfl = _as_float_index(cv.values) if ckind in 'Mm' \
                else cv.values.astype(np.float64)
            clo = np.take(cfl, lo, axis=cax)
            chi = np.take(cfl, hi, axis=cax)
            cshape = [1] * clo.ndim
            cshape[cax] = len(tv)
            cw = np.where(oob, np.nan, w).reshape(cshape)
            cval = clo + (chi - clo) * cw
            if ckind in 'Mm':
                cval = np.where(np.isnan(cval),
                                np.full(1, 'NaT', dtype=cv.values.dtype),
                                np.round(cval).astype('int64')
                                .astype(cv.values.dtype))
            if scalar:
                cval = np.take(cval, 0, axis=cax)
                cdims = tuple(d2 for d2 in cv.dims if d2 != dim)
            else:
                cdims = cv.dims
            coords[ck] = Variable(cdims, cval, cv.attrs)
        if scalar:
            out = xp.take(out, 0, axis=axis)
            dims = tuple(d2 for d2 in self.dims if d2 != dim)
            coords[dim] = Variable((), tv_raw,
                                   self._coords[dim].attrs)
        else:
            dims = self.dims
            coords[dim] = Variable((dim,), tv,
                                   self._coords[dim].attrs)
        return DataArray._from_parts(Variable(dims, out), coords,
                                     self.attrs, self.name)

    # -- comparison ------------------------------------------------------------------
    def equals(self, other):
        """True if dims, coordinates and values (NaN-aware) match."""
        if not isinstance(other, DataArray):
            return False
        if self.dims != other.dims or self.shape != other.shape:
            return False
        if not _coords_equiv(self._coords, other._coords):
            return False
        return _array_equiv(self.values, other.values)

    def identical(self, other):
        return (self.equals(other) and self.name == other.name
                and self.attrs == other.attrs)

    def broadcast_equals(self, other):
        if not isinstance(other, DataArray):
            return False
        try:
            a, b = broadcast(self, other)
        except Exception:
            return False
        return a.equals(b)

    # -- pandas bridge -----------------------------------------------------------------
    def to_index(self):
        import pandas as pd
        if self.ndim != 1:
            raise ValueError('to_index requires a 1-d array')
        return pd.Index(self.values, name=self.name or self.dims[0])

    def _pandas_index(self):
        import pandas as pd
        arrays = []
        for d in self.dims:
            if d in self._coords and self._coords[d].dims == (d,):
                arrays.append(np.asarray(self._coords[d].values))
            else:
                arrays.append(np.arange(self.sizes[d]))
        if len(arrays) == 1:
            return pd.Index(arrays[0], name=self.dims[0])
        return pd.MultiIndex.from_product(arrays, names=self.dims)

    def to_series(self):
        import pandas as pd
        return pd.Series(self.values.ravel(),
                         index=self._pandas_index(), name=self.name)

    def to_dataframe(self, name=None):
        name = name or self.name
        if name is None:
            raise ValueError(
                'cannot convert an unnamed DataArray to a DataFrame: '
                'pass name=')
        return self.to_series().rename(name).to_frame()

    def to_numpy(self):
        return self.values

    def as_numpy(self):
        """A copy whose payload is host numpy (device data fetched)."""
        return self._replace(self.values)

    def load(self):
        """Materialize the payload on the host in place (the xarray/
        dask ``load`` contract) and return self."""
        self.variable = Variable(self.dims, self.values,
                                 self.variable.attrs)
        return self

    # -- elementwise / structural conveniences -------------------------------
    @property
    def T(self):
        return self.transpose()

    def conj(self):
        xp = get_xp(self.data)
        return self._replace(xp.conj(self.data))

    conjugate = conj

    def isin(self, test_elements):
        """Elementwise membership mask (classified-map selection)."""
        if isinstance(test_elements, DataArray):
            test_elements = test_elements.values
        xp = get_xp(self.data)
        test = xp.asarray(np.asarray(test_elements).ravel())
        return self._replace(xp.isin(self.data, test))

    def argsort(self, axis=-1):
        xp = get_xp(self.data)
        return self._replace(xp.argsort(self.data, axis=axis))

    def broadcast_like(self, other):
        """Self expanded/broadcast against ``other``'s dimensions."""
        a, _ = broadcast(self, other)
        return a

    def drop_isel(self, indexers=None, **kwargs):
        """Drop positions along dimensions (complement of isel)."""
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, pos in indexers.items():
            n = out.sizes[d]
            pos = np.atleast_1d(np.asarray(pos, dtype=np.int64))
            pos = np.where(pos < 0, pos + n, pos)
            if (pos < 0).any() or (pos >= n).any():
                raise IndexError('drop_isel positions out of bounds '
                                 'for dim %r of size %d' % (d, n))
            keep = np.delete(np.arange(n), pos)
            out = out.isel({d: keep})
        return out

    def drop_sel(self, indexers=None, **kwargs):
        """Drop coordinate labels along dimensions."""
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, labels in indexers.items():
            if d not in self._coords:
                raise KeyError('no coordinate on dim %r' % d)
            cv = self._coords[d].values
            labels = np.atleast_1d(np.asarray(labels, dtype=cv.dtype))
            pos = []
            for lab in labels:
                hits = np.nonzero(cv == lab)[0]
                if len(hits) == 0:
                    raise KeyError('label %r not found in dim %r'
                                   % (lab, d))
                pos.extend(hits.tolist())
            out = out.drop_isel({d: pos})
        return out

    def combine_first(self, other):
        """Union-aligned NaN fill: self's values where valid, else
        ``other``'s — the xarray mosaicking idiom. Dimensions with 1-d
        coordinates on both sides align to the sorted union of labels
        (descending if both sides descend); NaN elsewhere."""
        a, b = _union_align(self, other)
        a, b = broadcast(a, b)
        return a.where(a.notnull(), b)

    def get_index(self, dim):
        import pandas as pd
        if dim not in self._coords:
            raise KeyError('no coordinate on dim %r' % dim)
        return pd.Index(self._coords[dim].values)

    def reset_coords(self, names=None, drop=False):
        """Demote non-index coordinates: ``drop=True`` removes them,
        otherwise they become data variables of a Dataset."""
        if names is None:
            names = [k for k, v in self._coords.items()
                     if k not in self.dims]
        elif isinstance(names, str):
            names = [names]
        for k in names:
            if k in self.dims:
                raise ValueError('cannot reset index coordinate %r' % k)
        if drop:
            out = self.copy(deep=False)
            for k in names:
                out._coords.pop(k, None)
            return out
        if self.name is None:
            raise ValueError('cannot convert an unnamed DataArray to '
                             'a Dataset: pass name first')
        ds = Dataset({self.name: self})
        for k in names:
            if k in ds._coords:
                ds._variables[k] = ds._coords.pop(k)
        return ds

    # -- derivatives / integrals along a coordinate --------------------------
    def differentiate(self, coord):
        """d(self)/d(coord) by second-order differences on the (possibly
        non-uniform) coordinate, one-sided at the edges — the xarray /
        numpy.gradient formulation."""
        dim, x, axis, n = self._coord_axis_for_calculus(coord)
        if n < 2:
            raise ValueError('differentiate needs at least 2 points')
        data = self.data
        xp = get_xp(data)
        kind = np.dtype(str(data.dtype)).kind
        if kind in 'iub':
            data = data.astype(np.float64)
        shape = [1] * self.ndim
        shape[axis] = n

        def sl(lo, hi):
            key = [slice(None)] * self.ndim
            key[axis] = slice(lo, hi)
            return tuple(key)

        xv = np.asarray(x, dtype=np.float64)
        h_prev = (xv[1:-1] - xv[:-2])
        h_next = (xv[2:] - xv[1:-1])
        wp = -h_next / (h_prev * (h_prev + h_next))
        wc = (h_next - h_prev) / (h_prev * h_next)
        wn = h_prev / (h_next * (h_prev + h_next))
        ishape = [1] * self.ndim
        ishape[axis] = n - 2
        interior = (xp.asarray(wp.reshape(ishape)) * data[sl(0, -2)]
                    + xp.asarray(wc.reshape(ishape)) * data[sl(1, -1)]
                    + xp.asarray(wn.reshape(ishape)) * data[sl(2, None)])
        first = (data[sl(1, 2)] - data[sl(0, 1)]) / (xv[1] - xv[0])
        last = (data[sl(-1, None)] - data[sl(-2, -1)]) \
            / (xv[-1] - xv[-2])
        out = xp.concatenate([first, interior, last], axis=axis)
        return self._replace(out)

    def integrate(self, coord):
        """Trapezoid-rule integral along a coordinate (reduces the
        dimension, like xarray)."""
        dim, x, axis, n = self._coord_axis_for_calculus(coord)
        data = self.data
        xp = get_xp(data)
        kind = np.dtype(str(data.dtype)).kind
        if kind in 'iub':
            data = data.astype(np.float64)
        xv = np.asarray(x, dtype=np.float64)
        dx = xv[1:] - xv[:-1]
        shape = [1] * self.ndim
        shape[axis] = n - 1
        key_lo = [slice(None)] * self.ndim
        key_lo[axis] = slice(None, -1)
        key_hi = [slice(None)] * self.ndim
        key_hi[axis] = slice(1, None)
        tot = ((data[tuple(key_lo)] + data[tuple(key_hi)]) * 0.5
               * xp.asarray(dx.reshape(shape))).sum(axis=axis)
        dims = tuple(d for d in self.dims if d != dim)
        coords = {k: v for k, v in self._coords.items()
                  if dim not in v.dims}
        return DataArray._from_parts(Variable(dims, tot), coords,
                                     self.attrs, self.name)

    def _coord_axis_for_calculus(self, coord):
        if coord not in self._coords or self._coords[coord].ndim != 1:
            raise ValueError('%r must be a 1-d coordinate' % coord)
        dim = self._coords[coord].dims[0]
        if dim not in self.dims:
            raise ValueError('coordinate %r is not along a dimension '
                             'of this array' % coord)
        x = _as_float_index(self._coords[coord].values)
        return dim, x, self.dims.index(dim), self.sizes[dim]

    # -- dict serialization ---------------------------------------------------
    def to_dict(self, data=True):
        """Nested-dict form (the xarray serialization schema)."""
        d = {'dims': self.dims, 'attrs': dict(self.attrs),
             'name': self.name,
             'coords': {k: {'dims': v.dims,
                            'data': v.values.tolist() if data
                            else v.shape,
                            'attrs': dict(v.attrs)}
                        for k, v in self._coords.items()}}
        d['data'] = self.values.tolist() if data else self.shape
        return d

    @classmethod
    def from_dict(cls, d):
        coords = {k: (tuple(c['dims']), np.asarray(c['data']),
                      c.get('attrs'))
                  for k, c in d.get('coords', {}).items()}
        return cls(np.asarray(d['data']), dims=tuple(d['dims']),
                   coords=coords, attrs=d.get('attrs'),
                   name=d.get('name'))

    # -- misc ---------------------------------------------------------------------------
    def persist(self):
        return self

    def compute(self):
        return self

    def chunk(self, *args, **kwargs):
        return self

    def __repr__(self):
        coord_names = ', '.join(self._coords)
        return ('<nd_tpu.DataArray %r %s dims=%r coords=[%s] %s>'
                % (self.name, self.shape, self.dims, coord_names,
                   self.dtype))

    # Accessor namespaces are attached by nd_tpu.core.accessors at import
    # time (mirrors the reference's register_dataset_accessor pattern,
    # /root/reference/nd/_xarray.py:48).


class Dataset(_NDOpsMixin):
    """A dict of DataArrays sharing dimensions and coordinates."""

    def __init__(self, data_vars=None, coords=None, attrs=None):
        self._variables = {}
        self._coords = {}
        self.attrs = dict(attrs) if attrs else {}
        if coords:
            for k, v in dict(coords).items():
                self._set_coord(k, v)
        if data_vars:
            for k, v in dict(data_vars).items():
                self[k] = v

    # -- helpers ------------------------------------------------------------
    def _set_coord(self, key, value):
        var = _coerce_coord(key, value, self.sizes)
        for d, s in zip(var.dims, var.shape):
            if d in self.sizes and self.sizes[d] != s:
                raise ValueError(
                    'coordinate %r conflicts on dim %r (%d != %d)'
                    % (key, d, s, self.sizes[d]))
        self._coords[key] = var

    # -- properties ------------------------------------------------------------
    @property
    def data_vars(self):
        return {k: self[k] for k in self._variables}

    @property
    def coords(self):
        return _CoordsView(self)

    def _coord_dataarray(self, key):
        var = self._coords[key]
        sub = {k: v for k, v in self._coords.items()
               if set(v.dims).issubset(set(var.dims))}
        return DataArray._from_parts(var, sub, var.attrs, key)

    @property
    def sizes(self):
        """Mapping dim -> size, in coordinate-then-variable order."""
        out = {}
        for v in self._coords.values():
            for d, s in zip(v.dims, v.shape):
                out.setdefault(d, s)
        for v in self._variables.values():
            for d, s in zip(v.dims, v.shape):
                out.setdefault(d, s)
        return out

    @property
    def dims(self):
        # xarray sorts Dataset.dims alphabetically; mirror that quirk since
        # reference code (filters.py:128) works around it.
        return dict(sorted(self.sizes.items()))

    @property
    def chunks(self):
        return {}

    @property
    def nbytes(self):
        return sum(v.data.nbytes for v in self._variables.values())

    # -- mapping interface ----------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, (list, tuple)):
            ds = Dataset(attrs=self.attrs)
            keep_dims = set()
            for k in key:
                if k not in self._variables:
                    raise KeyError(k)
                ds._variables[k] = self._variables[k]
                keep_dims |= set(self._variables[k].dims)
            for ck, cv in self._coords.items():
                # xarray drops coords over dims absent from the subset
                # (scalar coords are kept)
                if set(cv.dims).issubset(keep_dims):
                    ds._coords[ck] = cv
            return ds
        if key in self._variables:
            var = self._variables[key]
            coords = {k: v for k, v in self._coords.items()
                      if set(v.dims).issubset(set(var.dims))}
            return DataArray._from_parts(var, coords, var.attrs, key)
        if key in self._coords:
            return self._coord_dataarray(key)
        raise KeyError(key)

    def __setitem__(self, key, value):
        prev = self._variables.get(key)
        if isinstance(value, (DataArray, Variable, tuple)) and not \
                isinstance(value, str):
            dims = (value.dims if not isinstance(value, tuple)
                    else ((value[0],) if isinstance(value[0], str)
                          else tuple(value[0])))
            if key in dims and len(dims) == 1:
                # xarray semantics: a 1-d variable named after its own
                # dimension is an index coordinate, not a data variable
                # (also keeps NetCDF dimension scales collision-free)
                self._set_coord(key, value)
                return
        if isinstance(value, DataArray):
            self._variables[key] = Variable(value.dims, value.data,
                                            value.attrs)
            for ck, cv in value._coords.items():
                if ck not in self._coords:
                    self._coords[ck] = cv
        elif isinstance(value, Variable):
            self._variables[key] = value
        elif isinstance(value, tuple) and len(value) in (2, 3):
            dims, data = value[0], value[1]
            attrs = value[2] if len(value) == 3 else None
            self._variables[key] = Variable(dims, as_array(data), attrs)
        elif np.isscalar(value) or (hasattr(value, 'ndim')
                                    and np.ndim(value) == 0):
            self._variables[key] = Variable((), as_array(value))
        else:
            raise TypeError(
                'cannot assign %r to a Dataset variable; use '
                '(dims, data) or a DataArray' % type(value))
        # validate shapes against everything EXCEPT the entry being
        # (over)written — self.sizes would let a conflicting overwrite
        # win the setdefault race and corrupt the Dataset
        var = self._variables[key]
        sizes = {}
        for v2 in self._coords.values():
            for d, s in zip(v2.dims, v2.shape):
                sizes.setdefault(d, s)
        for k2, v2 in self._variables.items():
            if k2 == key:
                continue
            for d, s in zip(v2.dims, v2.shape):
                sizes.setdefault(d, s)
        for d, s in zip(var.dims, var.shape):
            if sizes.get(d, s) != s:
                # restore the previous entry: a rejected assignment
                # must leave the Dataset unchanged
                if prev is not None:
                    self._variables[key] = prev
                else:
                    del self._variables[key]
                raise ValueError(
                    'variable %r conflicts on dim %r (%d != %d)'
                    % (key, d, s, sizes[d]))

    def __delitem__(self, key):
        if key in self._variables:
            del self._variables[key]
        elif key in self._coords:
            del self._coords[key]
        else:
            raise KeyError(key)

    def __contains__(self, key):
        return key in self._variables or key in self._coords

    def __iter__(self):
        return iter(self._variables)

    def __len__(self):
        return len(self._variables)

    def keys(self):
        return self._variables.keys()

    def items(self):
        return ((k, self[k]) for k in self._variables)

    def values(self):
        return (self[k] for k in self._variables)

    # -- structural ops ----------------------------------------------------------------
    def copy(self, deep=True):
        ds = Dataset(attrs=dict(self.attrs))
        ds._coords = {k: v.copy(deep) for k, v in self._coords.items()}
        ds._variables = {k: v.copy(deep) for k, v in self._variables.items()}
        return ds

    def isel(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            sub = {d: i for d, i in indexers.items() if d in v.dims}
            ds._coords[k] = v.isel(sub) if sub else v
        for k, v in self._variables.items():
            sub = {d: i for d, i in indexers.items() if d in v.dims}
            ds._variables[k] = v.isel(sub) if sub else v
        return ds

    def sel(self, indexers=None, method=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        isel_kw = {}
        for d, label in indexers.items():
            if d not in self._coords:
                raise KeyError('no coordinate for dimension %r' % d)
            isel_kw[d] = _sel_to_isel(self._coords[d], label, method)
        return self.isel(isel_kw)

    def transpose(self, *dims):
        ds = Dataset(attrs=self.attrs)
        ds._coords = dict(self._coords)
        if not dims:
            # xarray: no arguments reverses each variable's OWN dim
            # order (a variable ordered differently from ds.sizes is
            # still reversed relative to itself)
            for ck, cv in self._coords.items():
                if cv.ndim > 1:
                    ds._coords[ck] = cv.transpose(
                        *tuple(reversed(cv.dims)))
            for k, v in self._variables.items():
                ds._variables[k] = v.transpose(
                    *tuple(reversed(v.dims)))
            return ds
        for ck, cv in self._coords.items():
            if cv.ndim > 1:
                order = tuple(d for d in dims if d in cv.dims)
                extra = tuple(d for d in cv.dims if d not in order)
                ds._coords[ck] = cv.transpose(*(order + extra))
        for k, v in self._variables.items():
            order = tuple(d for d in dims if d in v.dims)
            extra = tuple(d for d in v.dims if d not in order)
            ds._variables[k] = v.transpose(*(order + extra))
        return ds

    def squeeze(self, dim=None):
        if dim is not None and self.sizes.get(dim, 1) != 1:
            raise ValueError(
                'cannot squeeze dim %r of length %d'
                % (dim, self.sizes[dim]))
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            if dim is not None and dim in v.dims:
                ds._coords[k] = v.isel({dim: 0})
            elif dim is None:
                sq = {d: 0 for d, s in zip(v.dims, v.shape)
                      if s == 1 and self.sizes.get(d) == 1}
                ds._coords[k] = v.isel(sq) if sq else v
            else:
                ds._coords[k] = v
        for k, v in self._variables.items():
            if dim is not None:
                ds._variables[k] = (v.squeeze(dim) if dim in v.dims else v)
            else:
                sq = {d: 0 for d, s in zip(v.dims, v.shape) if s == 1}
                ds._variables[k] = v.isel(sq) if sq else v
        return ds

    def expand_dims(self, dim, axis=0):
        ds = Dataset(attrs=self.attrs)
        ds._coords = dict(self._coords)
        for k, v in self._variables.items():
            ds._variables[k] = v.expand_dims(dim, axis)
        if dim in ds._coords and ds._coords[dim].ndim == 0:
            ds._coords[dim] = Variable((dim,),
                                       ds._coords[dim].values.reshape(1))
        return ds

    def rename(self, mapping=None, **kwargs):
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            ds._coords[mapping.get(k, k)] = v.rename_dims(mapping)
        for k, v in self._variables.items():
            ds._variables[mapping.get(k, k)] = v.rename_dims(mapping)
        return ds

    def drop_vars(self, names):
        if isinstance(names, str):
            names = [names]
        ds = self.copy(deep=False)
        for n in names:
            if n in ds._variables:
                del ds._variables[n]
            elif n in ds._coords:
                del ds._coords[n]
        return ds

    def astype(self, dtype):
        ds = self.copy(deep=False)
        ds._variables = {k: v.astype(dtype)
                         for k, v in self._variables.items()}
        return ds

    # -- conversions --------------------------------------------------------------------
    def to_array(self, dim='variable'):
        """Stack all data variables into a single DataArray."""
        if not self._variables:
            raise ValueError('empty dataset')
        names = list(self._variables)
        # Broadcast all variables to the union of dims.
        union_dims = []
        for v in self._variables.values():
            for d in v.dims:
                if d not in union_dims:
                    union_dims.append(d)
        sizes = self.sizes
        shape = tuple(sizes[d] for d in union_dims)
        use_jax = any(is_device_array(v.data)
                      for v in self._variables.values())
        xp = jnp if use_jax and jnp is not None else np
        arrays = [self._variables[n].broadcast_to(union_dims, shape).data
                  for n in names]
        data = xp.stack([xp.asarray(a) for a in arrays], axis=0)
        coords = {k: v for k, v in self._coords.items()}
        coords[dim] = Variable((dim,), np.asarray(names, dtype=object)
                               if not all(isinstance(n, str) for n in names)
                               else np.asarray(names))
        return DataArray._from_parts(
            Variable((dim,) + tuple(union_dims), data), coords,
            self.attrs, None)

    def map(self, func, **kwargs):
        ds = Dataset(attrs=self.attrs)
        ds._coords = dict(self._coords)
        for k in self._variables:
            res = func(self[k], **kwargs)
            ds._variables[k] = Variable(res.dims, res.data, res.attrs)
            for ck, cv in res._coords.items():
                if ck not in ds._coords:
                    ds._coords[ck] = cv
        return ds

    def apply(self, func, **kwargs):
        return self.map(func, **kwargs)

    def merge(self, other):
        ds = self.copy(deep=False)
        for k, v in other._variables.items():
            ds._variables[k] = v
        for k, v in other._coords.items():
            if k not in ds._coords:
                ds._coords[k] = v
        ds.attrs.update(other.attrs)
        return ds

    # -- arithmetic ------------------------------------------------------------------------
    def _apply_binary(self, other, op, reflexive=False):
        ds = Dataset(attrs={})
        ds._coords = dict(self._coords)
        for k, v in self._variables.items():
            if isinstance(other, Dataset):
                o = other._variables.get(k)
                if o is None:
                    continue
            elif isinstance(other, DataArray):
                o = other.variable
            else:
                o = other
            ds._variables[k] = v._binary_op(o, op, reflexive)
        return ds

    # -- reductions -------------------------------------------------------------------------
    def _reduce_all(self, name, dim=None, **kw):
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            if dim is None or not (set(v.dims) &
                                   ({dim} if isinstance(dim, str)
                                    else set(dim))):
                ds._coords[k] = v
        for k in self._variables:
            da = self[k]
            if dim is not None:
                dd = {dim} if isinstance(dim, str) else set(dim)
                sub = tuple(d for d in da.dims if d in dd)
                res = getattr(da, name)(dim=sub, **kw) if sub else da
            else:
                res = getattr(da, name)(dim=None, **kw)
            ds._variables[k] = Variable(res.dims, res.data, res.attrs)
        return ds

    def mean(self, dim=None, **kw):
        return self._reduce_all('mean', dim, **kw)

    def std(self, dim=None, **kw):
        return self._reduce_all('std', dim, **kw)

    def var(self, dim=None, **kw):
        return self._reduce_all('var', dim, **kw)

    def min(self, dim=None, **kw):
        return self._reduce_all('min', dim, **kw)

    def max(self, dim=None, **kw):
        return self._reduce_all('max', dim, **kw)

    def sum(self, dim=None, **kw):
        return self._reduce_all('sum', dim, **kw)

    def median(self, dim=None, **kw):
        return self._reduce_all('median', dim, **kw)

    def prod(self, dim=None, **kw):
        return self._reduce_all('prod', dim, **kw)

    def all(self, dim=None, **kw):
        return self._reduce_all('all', dim, **kw)

    def any(self, dim=None, **kw):
        return self._reduce_all('any', dim, **kw)

    def count(self, dim=None, **kw):
        return self._reduce_all('count', dim, **kw)

    def argmin(self, dim=None, **kw):
        return self._reduce_all('argmin', dim, **kw)

    def argmax(self, dim=None, **kw):
        return self._reduce_all('argmax', dim, **kw)

    def quantile(self, q, dim=None, **kw):
        return self._reduce_all('quantile', dim, q=q, **kw)

    def reduce(self, func, dim=None, **kw):
        ds = Dataset(attrs=self.attrs)
        dimset = (set(self.sizes) if dim is None
                  else ({dim} if isinstance(dim, str) else set(dim)))
        for k, v in self._coords.items():
            if not (set(v.dims) & dimset):
                ds._coords[k] = v
        for k in self._variables:
            da = self[k]
            sub = tuple(d for d in da.dims if d in dimset)
            res = da.reduce(func, dim=sub, **kw) if sub else da
            ds._variables[k] = Variable(res.dims, res.data, res.attrs)
        return ds

    # -- elementwise / accumulating (per-variable) -------------------------------
    def round(self, decimals=0):
        return self.map(lambda da: da.round(decimals))

    def clip(self, min=None, max=None):
        return self.map(lambda da: da.clip(min, max))

    def isnull(self):
        return self.map(lambda da: da.isnull())

    def notnull(self):
        return self.map(lambda da: da.notnull())

    def cumsum(self, dim=None, **kw):
        return self._accumulate_all('cumsum', dim)

    def cumprod(self, dim=None, **kw):
        return self._accumulate_all('cumprod', dim)

    def _accumulate_all(self, name, dim):
        ds = self.copy(deep=False)
        for k in list(ds._variables):
            da = self[k]
            sub = (tuple(d for d in da.dims
                         if dim is None or d == dim
                         or (not isinstance(dim, str) and d in dim)))
            if sub:
                ds._variables[k] = getattr(da, name)(dim=sub).variable
        return ds

    # -- shifting / padding --------------------------------------------------------
    def diff(self, dim, n=1, label='upper'):
        ds = Dataset(attrs=self.attrs)
        sl = slice(n, None) if label == 'upper' else slice(None, -n)
        for k, v in self._coords.items():
            ds._coords[k] = v.isel({dim: sl}) if dim in v.dims else v
        for k, v in self._variables.items():
            if dim in v.dims:
                ds._variables[k] = self[k].diff(dim, n=n,
                                                label=label).variable
            else:
                ds._variables[k] = v
        return ds

    def shift(self, shifts=None, fill_value=np.nan, **kwargs):
        shifts = _normalize_indexers(shifts, kwargs)
        ds = self.copy(deep=False)
        for k in list(ds._variables):
            da = self[k]
            sub = {d: s for d, s in shifts.items() if d in da.dims}
            if sub:
                ds._variables[k] = da.shift(sub,
                                            fill_value=fill_value).variable
        return ds

    def roll(self, shifts=None, roll_coords=False, **kwargs):
        shifts = _normalize_indexers(shifts, kwargs)
        ds = self.copy(deep=False)
        for k in list(ds._variables):
            da = self[k]
            sub = {d: s for d, s in shifts.items() if d in da.dims}
            if sub:
                ds._variables[k] = da.roll(sub).variable
        if roll_coords:
            for ck, cv in list(ds._coords.items()):
                for d, s in shifts.items():
                    if d in cv.dims:
                        cv = Variable(cv.dims,
                                      np.roll(cv.values, int(s),
                                              axis=cv.dims.index(d)),
                                      cv.attrs)
                ds._coords[ck] = cv
        return ds

    def pad(self, pad_width=None, mode='constant',
            constant_values=np.nan, **kwargs):
        pad_width = _normalize_indexers(pad_width, kwargs)
        norm = {d: ((w, w) if np.isscalar(w) else tuple(w))
                for d, w in pad_width.items()}
        ds = Dataset(attrs=self.attrs)
        for k, v in self._coords.items():
            cw = [norm.get(d, (0, 0)) for d in v.dims]
            ds._coords[k] = (_pad_coord(v, cw)
                             if any(a or b for a, b in cw) else v)
        for k in self._variables:
            da = self[k]
            sub = {d: w for d, w in norm.items() if d in da.dims}
            if sub:
                ds._variables[k] = da.pad(
                    sub, mode=mode,
                    constant_values=constant_values).variable
            else:
                ds._variables[k] = self._variables[k]
        return ds

    # -- reordering / realignment ----------------------------------------------------
    def sortby(self, variables, ascending=True):
        if isinstance(variables, (str, DataArray)):
            variables = [variables]
        out = self
        for v in variables:
            cv = out._coords[v] if isinstance(v, str) else v.variable
            if cv.ndim != 1:
                raise ValueError('sortby only supports 1-d keys')
            order = np.argsort(cv.values, kind='stable')
            if not ascending:
                order = order[::-1]
            out = out.isel({cv.dims[0]: order})
        return out

    def reindex(self, indexers=None, method=None, fill_value=np.nan,
                **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, new_labels in indexers.items():
            idx, missing, labels = _reindex_positions(
                out._coords[d], new_labels, method)
            sub = out.isel({d: idx})
            if missing.any():
                for k in list(sub._variables):
                    v = sub._variables[k]
                    if d in v.dims:
                        sub._variables[k] = _mask_missing(
                            v, d, missing, fill_value)
                for ck in list(sub._coords):
                    cv = sub._coords[ck]
                    if ck != d and d in cv.dims:
                        sub._coords[ck] = _mask_missing(cv, d, missing,
                                                        fill_value)
            sub._coords[d] = Variable((d,), labels)
            out = sub
        return out

    def reindex_like(self, other, method=None, fill_value=np.nan):
        indexers = {d: other._coords[d].values
                    for d in self.sizes
                    if d in other._coords and d in self._coords}
        return self.reindex(indexers, method=method, fill_value=fill_value)

    def dropna(self, dim, how='any', thresh=None):
        counts = None
        total = 0
        for k in self._variables:
            da = self[k]
            if dim not in da.dims:
                continue
            other = tuple(d for d in da.dims if d != dim)
            c = np.asarray(da.notnull().sum(dim=other).values
                           if other else da.notnull().values)
            counts = c if counts is None else counts + c
            total += int(np.prod([da.sizes[d] for d in other],
                                 dtype=np.int64)) if other else 1
        if counts is None:
            return self
        if thresh is not None:
            keep = counts >= thresh
        elif how == 'any':
            keep = counts == total
        elif how == 'all':
            keep = counts > 0
        else:
            raise ValueError("how must be 'any' or 'all'")
        return self.isel({dim: np.nonzero(keep)[0]})

    # -- metadata / variable assignment ----------------------------------------------
    def update(self, other):
        """Merge ``other``'s variables/coords in place (xarray contract).

        Routed through ``__setitem__`` so dim-size conflicts raise
        instead of leaving the Dataset internally inconsistent."""
        if isinstance(other, Dataset):
            for k, v in other._coords.items():
                self._coords[k] = v
            for k, v in other._variables.items():
                self[k] = (v.dims, v.data, v.attrs)
        else:
            for k, v in dict(other).items():
                self[k] = v
        return self

    def assign(self, variables=None, **kwargs):
        out = self.copy(deep=False)
        for k, v in {**(variables or {}), **kwargs}.items():
            out[k] = v(out) if callable(v) else v
        return out

    def assign_coords(self, coords=None, **kwargs):
        out = self.copy(deep=False)
        for k, v in {**(coords or {}), **kwargs}.items():
            out._set_coord(k, v)
        return out

    def assign_attrs(self, *args, **kwargs):
        out = self.copy(deep=False)
        out.attrs.update(dict(*args, **kwargs))
        return out

    def rename_vars(self, mapping=None, **kwargs):
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        ds = self.copy(deep=False)
        ds._variables = {mapping.get(k, k): v
                         for k, v in self._variables.items()}
        ds._coords = {mapping.get(k, k): v
                      for k, v in self._coords.items()}
        return ds

    def rename_dims(self, mapping=None, **kwargs):
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        ds = Dataset(attrs=self.attrs)
        ds._coords = {k: v.rename_dims(mapping)
                      for k, v in self._coords.items()}
        ds._variables = {k: v.rename_dims(mapping)
                         for k, v in self._variables.items()}
        return ds

    drop = drop_vars

    def drop_dims(self, dims):
        if isinstance(dims, str):
            dims = [dims]
        dims = set(dims)
        ds = Dataset(attrs=self.attrs)
        ds._coords = {k: v for k, v in self._coords.items()
                      if not (set(v.dims) & dims)}
        ds._variables = {k: v for k, v in self._variables.items()
                         if not (set(v.dims) & dims)}
        return ds

    def swap_dims(self, mapping=None, **kwargs):
        mapping = dict(mapping or {})
        mapping.update(kwargs)
        _validate_swap(mapping, self._coords)
        ds = Dataset(attrs=self.attrs)
        ds._coords = {k: v.rename_dims(mapping)
                      for k, v in self._coords.items()}
        ds._variables = {k: v.rename_dims(mapping)
                         for k, v in self._variables.items()}
        return ds

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    # -- slicing sugar ------------------------------------------------------------------
    def head(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(0, int(n)) for d, n in indexers.items()})

    def tail(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(-int(n), None)
                          for d, n in indexers.items()})

    def thin(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        return self.isel({d: slice(None, None, int(n))
                          for d, n in indexers.items()})

    # -- stack/unstack --------------------------------------------------------------
    def stack(self, **kwargs):
        """Stack dims into one on every variable (vars missing a stacked
        dim are broadcast over it first, like xarray)."""
        (new_dim, dims), = kwargs.items()
        dims = tuple(dims)
        sizes = self.sizes
        ds = Dataset(attrs=dict(self.attrs))
        ds._coords = {k: v for k, v in self._coords.items()
                      if not (set(v.dims) & set(dims))}
        for k in self._variables:
            da = self[k]
            missing = [d for d in dims if d not in da.dims]
            if missing:
                target_dims = tuple(da.dims) + tuple(missing)
                target_shape = tuple(da.shape) + tuple(sizes[d]
                                                       for d in missing)
                da = DataArray._from_parts(
                    da.variable.broadcast_to(target_dims, target_shape),
                    da._coords, da.attrs, da.name)
            stacked = da.stack(**{new_dim: dims})
            ds._variables[k] = stacked.variable
        ds.attrs[_STACK_ATTR] = {
            'dim': new_dim,
            'dims': dims,
            'shape': tuple(sizes[d] for d in dims),
            'coords': {k: (v.dims, v.values)
                       for k, v in self._coords.items()
                       if set(v.dims) & set(dims)},
        }
        return ds

    def unstack(self, dim=None):
        info = self.attrs.get(_STACK_ATTR)
        if info is None:
            raise ValueError('Dataset was not stacked by nd_tpu')
        new_dim = info['dim']
        dims = tuple(info['dims'])
        shape = tuple(info['shape'])
        ds = Dataset(attrs={k: v for k, v in self.attrs.items()
                            if k != _STACK_ATTR})
        ds._coords = {k: v for k, v in self._coords.items()
                      if new_dim not in v.dims}
        for k, (cdims, cvals) in info['coords'].items():
            ds._coords[k] = Variable(cdims, cvals)
        for k, v in self._variables.items():
            if new_dim not in v.dims:
                ds._variables[k] = v
                continue
            other = tuple(d for d in v.dims if d != new_dim)
            vt = v.transpose(*(other + (new_dim,)))
            ds._variables[k] = Variable(other + dims,
                                        vt.data.reshape(vt.shape[:-1]
                                                        + shape),
                                        v.attrs)
        return ds

    # -- grouped / windowed --------------------------------------------------------------
    def groupby(self, group):
        from .grouped import GroupBy
        return GroupBy.from_group(self, group)

    def resample(self, indexer=None, **kwargs):
        from .grouped import Resample
        indexer = _normalize_indexers(indexer, kwargs)
        (dim, freq), = indexer.items()
        return Resample.from_freq(self, dim, freq)

    def rolling(self, dim=None, min_periods=None, center=False,
                **window_kwargs):
        from .grouped import Rolling
        spec = _normalize_indexers(dim if isinstance(dim, dict) else None,
                                   window_kwargs)
        (d, w), = spec.items()
        return Rolling(self, d, w, min_periods=min_periods, center=center)

    def coarsen(self, dim=None, boundary='exact', side='left',
                coord_func='mean', **window_kwargs):
        from .grouped import Coarsen
        windows = _normalize_indexers(dim if isinstance(dim, dict)
                                      else None, window_kwargs)
        return Coarsen(self, windows, boundary=boundary, side=side,
                       coord_func=coord_func)

    def weighted(self, weights):
        from .grouped import Weighted
        return Weighted(self, weights)

    def _map_gapfill(self, name, dim, **kw):
        out = self.copy(deep=False)
        for k in list(out._variables):
            if dim in out._variables[k].dims:
                out._variables[k] = getattr(self[k], name)(
                    dim, **kw).variable
        return out

    def ffill(self, dim, limit=None):
        return self._map_gapfill('ffill', dim, limit=limit)

    def bfill(self, dim, limit=None):
        return self._map_gapfill('bfill', dim, limit=limit)

    def interpolate_na(self, dim=None, method='linear', limit=None,
                       use_coordinate=True, max_gap=None):
        return self._map_gapfill(
            'interpolate_na', dim, method=method, limit=limit,
            use_coordinate=use_coordinate, max_gap=max_gap)

    def interp(self, coords=None, method='linear', assume_sorted=False,
               **coords_kwargs):
        """Per-variable orthogonal interpolation onto new coordinate
        values; variables without an interpolated dim pass through."""
        del assume_sorted
        indexers = _normalize_indexers(coords, coords_kwargs)
        out = Dataset({}, attrs=dict(self.attrs))
        for k in self._variables:
            da = self[k]
            sub = {d: t for d, t in indexers.items() if d in da.dims}
            out[k] = da.interp(sub, method=method) if sub else da
        for ck, cv in self._coords.items():
            if ck not in out._coords \
                    and not any(d in indexers for d in cv.dims):
                out._coords[ck] = cv
        return out

    def interp_like(self, other, method='linear'):
        dims = set()
        for v in self._variables.values():
            dims.update(v.dims)
        indexers = {d: other._coords[d].values for d in dims
                    if d in other._coords and other._coords[d].ndim == 1
                    and d in self._coords}
        return self.interp(indexers, method=method)

    # -- comparison -------------------------------------------------------------------------
    def equals(self, other):
        if not isinstance(other, Dataset):
            return False
        if set(self._variables) != set(other._variables):
            return False
        if not _coords_equiv(self._coords, other._coords):
            return False
        for k, v in self._variables.items():
            o = other._variables[k]
            if v.dims != o.dims or not _array_equiv(v.values, o.values):
                return False
        return True

    def identical(self, other):
        if not self.equals(other) or self.attrs != other.attrs:
            return False
        return all(self._variables[k].attrs == other._variables[k].attrs
                   for k in self._variables)

    def broadcast_equals(self, other):
        if not isinstance(other, Dataset):
            return False
        if set(self._variables) != set(other._variables):
            return False
        for k in self._variables:
            if not self[k].broadcast_equals(other[k]):
                return False
        return True

    # -- pandas bridge -------------------------------------------------------------------
    def to_dataframe(self):
        import pandas as pd
        frames = {}
        union_dims = tuple(self.sizes)
        for k in self._variables:
            da = self[k]
            missing = [d for d in union_dims if d not in da.dims]
            if missing:
                target = tuple(da.dims) + tuple(missing)
                shape = tuple(da.shape) + tuple(self.sizes[d]
                                                for d in missing)
                da = DataArray._from_parts(
                    da.variable.broadcast_to(target, shape),
                    self._coords, da.attrs, k)
            frames[k] = da.transpose(*union_dims).to_series()
        return pd.DataFrame(frames)

    # -- laziness stubs (we are eager; XLA async dispatch provides overlap) ---
    def persist(self):
        return self

    def compute(self):
        return self

    def chunk(self, *args, **kwargs):
        return self

    def load(self):
        for k, v in list(self._variables.items()):
            self._variables[k] = Variable(v.dims, v.values, v.attrs)
        return self

    def as_numpy(self):
        return self.map(lambda da: da.as_numpy())

    # -- elementwise / structural conveniences -------------------------------
    def isin(self, test_elements):
        return self.map(lambda da: da.isin(test_elements))

    def drop_isel(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, pos in indexers.items():
            n = out.sizes[d]
            pos = np.atleast_1d(np.asarray(pos, dtype=np.int64))
            pos = np.where(pos < 0, pos + n, pos)
            if (pos < 0).any() or (pos >= n).any():
                raise IndexError('drop_isel positions out of bounds '
                                 'for dim %r of size %d' % (d, n))
            keep = np.delete(np.arange(n), pos)
            out = out.isel({d: keep})
        return out

    def drop_sel(self, indexers=None, **kwargs):
        indexers = _normalize_indexers(indexers, kwargs)
        out = self
        for d, labels in indexers.items():
            if d not in self._coords:
                raise KeyError('no coordinate on dim %r' % d)
            cv = self._coords[d].values
            labels = np.atleast_1d(np.asarray(labels, dtype=cv.dtype))
            pos = []
            for lab in labels:
                hits = np.nonzero(cv == lab)[0]
                if len(hits) == 0:
                    raise KeyError('label %r not found in dim %r'
                                   % (lab, d))
                pos.extend(hits.tolist())
            out = out.drop_isel({d: pos})
        return out

    def combine_first(self, other):
        """Union-aligned NaN fill per variable; variables present in
        only one input pass through (reindexed to the union grid)."""
        a, b = _union_align(self, other)
        out = Dataset({}, attrs=dict(a.attrs))
        for k in a._variables:
            da = a[k]
            if k in b._variables:
                db = b[k]
                da2, db2 = broadcast(da, db)
                out[k] = da2.where(da2.notnull(), db2)
            else:
                out[k] = da
        for k in b._variables:
            if k not in a._variables:
                out[k] = b[k]
        for ck, cv in a._coords.items():
            out._coords.setdefault(ck, cv)
        return out

    def get_index(self, dim):
        import pandas as pd
        if dim not in self._coords:
            raise KeyError('no coordinate on dim %r' % dim)
        return pd.Index(self._coords[dim].values)

    def set_coords(self, names):
        """Promote data variables to coordinates."""
        if isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for k in names:
            if k not in out._variables:
                raise KeyError('no variable %r' % k)
            out._coords[k] = out._variables.pop(k)
        return out

    def reset_coords(self, names=None, drop=False):
        """Demote non-index coordinates to data variables (or drop)."""
        if names is None:
            names = [k for k, v in self._coords.items()
                     if k not in self.sizes]
        elif isinstance(names, str):
            names = [names]
        out = self.copy(deep=False)
        for k in names:
            if k in self.sizes:
                raise ValueError('cannot reset index coordinate %r' % k)
            if k not in out._coords:
                raise KeyError('no coordinate %r' % k)
            cv = out._coords.pop(k)
            if not drop:
                out._variables[k] = cv
        return out

    def differentiate(self, coord):
        return self.map(lambda da: da.differentiate(coord)
                        if coord in da._coords
                        and da._coords[coord].ndim == 1
                        and da._coords[coord].dims[0] in da.dims
                        else da)

    def integrate(self, coord):
        dim = self._coords[coord].dims[0]
        out = Dataset({}, attrs=dict(self.attrs))
        for k in self._variables:
            da = self[k]
            out[k] = da.integrate(coord) if dim in da.dims else da
        for ck, cv in self._coords.items():
            if dim not in cv.dims:
                out._coords.setdefault(ck, cv)
        return out

    def to_dataarray(self, dim='variable'):
        return self.to_array(dim)

    def to_dict(self, data=True):
        return {'dims': dict(self.sizes), 'attrs': dict(self.attrs),
                'coords': {k: {'dims': v.dims,
                               'data': v.values.tolist() if data
                               else v.shape,
                               'attrs': dict(v.attrs)}
                           for k, v in self._coords.items()},
                'data_vars': {k: {'dims': v.dims,
                                  'data': v.values.tolist() if data
                                  else v.shape,
                                  'attrs': dict(v.attrs)}
                              for k, v in self._variables.items()}}

    @classmethod
    def from_dict(cls, d):
        coords = {k: (tuple(c['dims']), np.asarray(c['data']),
                      c.get('attrs'))
                  for k, c in d.get('coords', {}).items()}
        data_vars = {k: (tuple(c['dims']), np.asarray(c['data']),
                         c.get('attrs'))
                     for k, c in d.get('data_vars', {}).items()}
        return cls(data_vars, coords=coords, attrs=d.get('attrs'))

    def fillna(self, value):
        return self.map(lambda da: da.fillna(value))

    def where(self, cond, other=np.nan):
        return self.map(lambda da: da.where(
            cond if not isinstance(cond, Dataset) else cond[da.name], other))

    def __repr__(self):
        lines = ['<nd_tpu.Dataset>']
        lines.append('Dimensions: ' + ', '.join(
            '%s: %d' % (d, s) for d, s in self.sizes.items()))
        for k, v in self._coords.items():
            lines.append('  coord %s %r %s' % (k, v.dims, v.dtype))
        for k, v in self._variables.items():
            lines.append('  var   %s %r %s' % (k, v.dims, v.dtype))
        if self.attrs:
            lines.append('Attributes: ' + ', '.join(self.attrs))
        return '\n'.join(lines)


# -------------------------------------------------------------------------
# module-level functions
# -------------------------------------------------------------------------

def broadcast_variables(a, b):
    """Broadcast two Variables against each other by dimension name."""
    out_dims = list(a.dims)
    for d in b.dims:
        if d not in out_dims:
            out_dims.append(d)
    sizes = dict(zip(a.dims, a.shape))
    for d, s in zip(b.dims, b.shape):
        sizes[d] = max(sizes.get(d, s), s)
    shape = tuple(sizes[d] for d in out_dims)
    return (a.broadcast_to(out_dims, shape), b.broadcast_to(out_dims, shape))


def broadcast(*objs):
    """Broadcast DataArrays against each other."""
    variables = [o.variable for o in objs]
    out_dims = []
    sizes = {}
    for v in variables:
        for d, s in zip(v.dims, v.shape):
            if d not in out_dims:
                out_dims.append(d)
            sizes[d] = max(sizes.get(d, s), s)
    shape = tuple(sizes[d] for d in out_dims)
    out = []
    for o in objs:
        bv = o.variable.broadcast_to(out_dims, shape)
        out.append(DataArray._from_parts(bv, o._coords, o.attrs, o.name))
    return tuple(out)


def _concat_variables(variables, dim, dim_exists):
    xps = [get_xp(v.data) for v in variables]
    xp = jnp if any(x is jnp for x in xps) else np
    if dim_exists:
        axis = variables[0].dims.index(dim)
        data = xp.concatenate([xp.asarray(v.data) for v in variables],
                              axis=axis)
        return Variable(variables[0].dims, data, variables[0].attrs)
    else:
        data = xp.stack([xp.asarray(v.data) for v in variables], axis=0)
        return Variable((dim,) + variables[0].dims, data,
                        variables[0].attrs)


def concat(objs, dim):
    """Concatenate Datasets or DataArrays along a dimension.

    Mirrors ``xarray.concat`` as used by the reference's split/merge
    machinery (/root/reference/nd/utils.py:340).
    """
    objs = list(objs)
    if not objs:
        raise ValueError('nothing to concatenate')
    if isinstance(objs[0], DataArray):
        dim_exists = dim in objs[0].dims
        variables = []
        for o in objs:
            v = o.variable
            if dim_exists and dim not in v.dims:
                # length-1 broadcast so mixed inputs concatenate cleanly
                v = v.expand_dims(dim, objs[0].dims.index(dim))
            elif not dim_exists and dim in v.dims:
                raise ValueError(
                    'cannot concatenate along new dim %r: input %r '
                    'already has it' % (dim, o.name))
            variables.append(v)
        var = _concat_variables(variables, dim, dim_exists)
        coords = {}
        for k, v in objs[0]._coords.items():
            if dim in v.dims:
                axis = v.dims.index(dim)
                # inputs missing the coord contribute NaN/NaT fill so
                # the coord's length always matches the concatenated
                # dim (xarray's alignment behavior)
                parts = []
                for o in objs:
                    if k in o._coords:
                        parts.append(o._coords[k].values)
                    else:
                        shape = list(v.shape)
                        shape[axis] = o.sizes.get(dim, 1)
                        vals0 = np.asarray(v.values)
                        if vals0.dtype.kind in 'mM':
                            fill = np.full(shape, 'NaT',
                                           dtype=vals0.dtype)
                        elif vals0.dtype.kind in 'fc':
                            fill = np.full(shape, np.nan, vals0.dtype)
                        else:
                            fill = np.full(shape, np.nan)
                        parts.append(fill)
                coords[k] = Variable(
                    v.dims, np.concatenate(parts, axis=axis), v.attrs)
            else:
                coords[k] = v
        if not dim_exists:
            # collect scalar coords into the new dim
            vals = []
            ok = True
            for o in objs:
                if dim in o._coords and o._coords[dim].ndim == 0:
                    vals.append(o._coords[dim].values)
                else:
                    ok = False
                    break
            if ok and vals:
                coords[dim] = Variable((dim,), np.stack(vals))
        return DataArray._from_parts(var, coords, objs[0].attrs,
                                     objs[0].name)

    # Dataset concat
    first = objs[0]
    dim_exists = dim in first.sizes
    ds = Dataset(attrs=dict(first.attrs))
    for k, v in first._coords.items():
        if dim in v.dims:
            axis = v.dims.index(dim)
            ds._coords[k] = Variable(
                v.dims,
                np.concatenate([o._coords[k].values for o in objs],
                               axis=axis), v.attrs)
        else:
            ds._coords[k] = v
    for k, v in first._variables.items():
        if dim in v.dims:
            ds._variables[k] = _concat_variables(
                [o._variables[k] for o in objs], dim, True)
        elif not dim_exists:
            # concatenating along a NEW dimension: stack and append it
            stacked = _concat_variables(
                [o._variables[k] for o in objs], dim, False)
            # new dim goes last (xarray puts it first; appending keeps
            # the (y, x, time) cube convention natural)
            order = v.dims + (dim,)
            ds._variables[k] = stacked.transpose(*order)
        else:
            ds._variables[k] = v
    if not dim_exists:
        # collect scalar coords of the concat dim if every input has one
        vals = []
        for o in objs:
            cv = o._coords.get(dim)
            if cv is not None and cv.ndim == 0:
                vals.append(cv.values)
        if len(vals) == len(objs) and vals:
            ds._coords[dim] = Variable((dim,), np.stack(vals))
    return ds


def merge(objs):
    """Merge datasets/named DataArrays into one Dataset."""
    ds = Dataset()
    for o in objs:
        if isinstance(o, DataArray):
            o = o.to_dataset()
        for k, v in o._coords.items():
            if k not in ds._coords:
                ds._coords[k] = v
        for k, v in o._variables.items():
            ds._variables[k] = v
        ds.attrs.update(o.attrs)
    return ds


def expand_variables_da(da, dim='variable'):
    """Inverse of Dataset.to_array() (reference: utils.py:472-499)."""
    names = [str(n) for n in np.asarray(da[dim].values)]
    axis = da.dims.index(dim)
    ds = Dataset(attrs=dict(da.attrs))
    for k, v in da._coords.items():
        if k == dim:
            continue
        ds._coords[k] = v
    new_dims = tuple(d for d in da.dims if d != dim)
    for i, n in enumerate(names):
        key = [slice(None)] * da.ndim
        key[axis] = i
        ds._variables[n] = Variable(new_dims, da.data[tuple(key)])
    return ds


def full_like(obj, fill_value, dtype=None):
    xp = get_xp(obj.data)
    data = xp.full(obj.shape, fill_value,
                   dtype=dtype or obj.dtype)
    if isinstance(obj, DataArray):
        return obj._replace(data)
    raise TypeError(type(obj))


def zeros_like(obj, dtype=None):
    return full_like(obj, 0, dtype)


def ones_like(obj, dtype=None):
    return full_like(obj, 1, dtype)
