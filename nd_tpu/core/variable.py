"""Low-level n-dimensional variable: (dims, data, attrs).

This is the foundation of the TPU-native datacube data model. A
``Variable`` pairs a raw array (NumPy on host *or* a ``jax.Array`` on
device) with named dimensions. It deliberately carries no coordinates —
those live on :class:`nd_tpu.core.dataarray.DataArray`.

Design notes (TPU-first):
  - Data may live on device (``jax.Array``). All structural operations
    (transpose, indexing, broadcasting) are expressed through
    ``jax.numpy`` when the payload is a device array so that chained
    operations never bounce through host memory.
  - ``.values`` is the only API that forces a host round-trip.

Capability parity: the reference keeps this role inside
``xarray.Variable`` (see /root/reference/nd/utils.py:111-128 for how the
reference introspects dims/shapes).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - jax is a hard dependency in practice
    import jax
    import jax.numpy as jnp

    _JAX_ARRAY_TYPES = (jax.Array,)
except Exception:  # pragma: no cover
    jax = None
    jnp = None
    _JAX_ARRAY_TYPES = ()


def is_device_array(x):
    """True if ``x`` is a JAX device array."""
    return _JAX_ARRAY_TYPES and isinstance(x, _JAX_ARRAY_TYPES)


def get_xp(*arrays):
    """Return the array namespace (numpy or jax.numpy) for the payload."""
    for a in arrays:
        if is_device_array(a):
            return jnp
    return np


def is_lazy_array(x):
    """True for lazily-materialized file-backed payloads (kept as-is
    so indexing reads only the touched slab)."""
    from ..io.lazy import LazyArray
    return isinstance(x, LazyArray)


def as_array(data):
    """Coerce input to a NumPy or JAX array without copying device data."""
    if is_device_array(data):
        return data
    if is_lazy_array(data):
        return data
    if isinstance(data, Variable):
        return data.data
    arr = np.asarray(data)
    if arr.dtype == object:
        # Try to coerce object arrays (e.g. lists of datetimes/strings).
        try:
            arr = np.asarray(data, dtype='datetime64[ns]')
        except (ValueError, TypeError):
            arr = np.asarray([str(x) for x in arr.ravel()]).reshape(arr.shape)
    return arr


def _expand_dims_to(data, dims, target_dims):
    """Reshape+transpose ``data`` with ``dims`` to cover ``target_dims``."""
    xp = get_xp(data)
    missing = [d for d in target_dims if d not in dims]
    if missing:
        data = data.reshape(data.shape + (1,) * len(missing))
        dims = tuple(dims) + tuple(missing)
    order = [dims.index(d) for d in target_dims]
    if order != list(range(len(order))):
        data = xp.transpose(data, order)
    return data


class Variable:
    """A named-dimension array (no coordinates).

    Parameters
    ----------
    dims : tuple of str
    data : array-like (numpy or jax)
    attrs : dict, optional
    """

    __slots__ = ('dims', 'data', 'attrs')

    def __init__(self, dims, data, attrs=None):
        if isinstance(dims, str):
            dims = (dims,)
        data = as_array(data)
        dims = tuple(dims)
        if len(dims) != data.ndim:
            raise ValueError(
                'dimensions %r do not match array of shape %r'
                % (dims, data.shape))
        self.dims = dims
        self.data = data
        self.attrs = dict(attrs) if attrs else {}

    # -- basic properties -------------------------------------------------
    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def size(self):
        return int(np.prod(self.data.shape, dtype=np.int64))

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.shape))

    @property
    def values(self):
        """Host NumPy view of the data (forces device->host copy)."""
        return np.asarray(self.data)

    def jax(self):
        """Device array view of the data (uploads host data)."""
        if is_device_array(self.data):
            return self.data
        return jnp.asarray(self.data)

    def copy(self, deep=True):
        data = self.data
        if deep and isinstance(data, np.ndarray):
            data = data.copy()
        # device arrays are immutable; no copy needed
        return Variable(self.dims, data, dict(self.attrs))

    # -- structural ops ----------------------------------------------------
    def transpose(self, *dims):
        if not dims:
            dims = self.dims[::-1]
        if set(dims) != set(self.dims):
            raise ValueError('transpose dims %r != variable dims %r'
                             % (dims, self.dims))
        xp = get_xp(self.data)
        order = [self.dims.index(d) for d in dims]
        return Variable(dims, xp.transpose(self.data, order), self.attrs)

    def isel(self, indexers):
        """Integer/slice/array indexing by dimension name."""
        key = []
        new_dims = []
        adv_dims = {}
        for d in self.dims:
            if d in indexers:
                idx = indexers[d]
                if isinstance(idx, slice):
                    key.append(idx)
                    new_dims.append(d)
                elif np.isscalar(idx) or (hasattr(idx, 'ndim')
                                          and idx.ndim == 0):
                    key.append(int(idx))
                else:
                    idx = np.asarray(idx)
                    if idx.dtype == bool:
                        idx = np.nonzero(idx)[0]
                    # applied via take() AFTER the basic indexing:
                    # mixing an array index with integer indices makes
                    # numpy move the broadcast advanced axes to the
                    # FRONT (x[0, :, [0,1]] is the transpose of
                    # x[0][:, [0,1]]), silently mislabeling dims
                    key.append(slice(None))
                    new_dims.append(d)
                    adv_dims[d] = idx
            else:
                key.append(slice(None))
                new_dims.append(d)
        if len(adv_dims) > 1:
            raise NotImplementedError(
                'fancy indexing over multiple dims is not supported')
        data = self.data[tuple(key)]
        for d, idx in adv_dims.items():
            xp = get_xp(data)
            data = xp.take(data, xp.asarray(idx),
                           axis=new_dims.index(d))
        return Variable(tuple(new_dims), data, self.attrs)

    def squeeze(self, dim=None):
        if dim is not None and dim not in self.dims:
            raise KeyError('cannot squeeze unknown dim %r (dims %r)'
                           % (dim, self.dims))
        dims = []
        key = []
        for d, s in zip(self.dims, self.shape):
            if (dim is None and s == 1) or d == dim:
                if s != 1:
                    raise ValueError('cannot squeeze dim %r of size %d'
                                     % (d, s))
                key.append(0)
            else:
                key.append(slice(None))
                dims.append(d)
        return Variable(tuple(dims), self.data[tuple(key)], self.attrs)

    def expand_dims(self, dim, axis=0):
        xp = get_xp(self.data)
        data = xp.expand_dims(self.data, axis)
        dims = list(self.dims)
        # normalize: a negative axis APPENDS in numpy (-1 == end), but
        # list.insert(-1, ...) inserts BEFORE the last entry
        if axis < 0:
            axis = self.ndim + 1 + axis
        dims.insert(axis, dim)
        return Variable(tuple(dims), data, self.attrs)

    def rename_dims(self, mapping):
        dims = tuple(mapping.get(d, d) for d in self.dims)
        return Variable(dims, self.data, self.attrs)

    def broadcast_to(self, target_dims, target_shape):
        xp = get_xp(self.data)
        data = _expand_dims_to(self.data, self.dims, target_dims)
        data = xp.broadcast_to(data, tuple(target_shape))
        return Variable(tuple(target_dims), data, self.attrs)

    def astype(self, dtype):
        return Variable(self.dims, self.data.astype(dtype), self.attrs)

    # -- arithmetic ---------------------------------------------------------
    def _binary_op(self, other, op, reflexive=False):
        if isinstance(other, Variable):
            out_dims = list(self.dims)
            for d in other.dims:
                if d not in out_dims:
                    out_dims.append(d)
            sizes = {}
            sizes.update(dict(zip(self.dims, self.shape)))
            for d, s in zip(other.dims, other.shape):
                if sizes.get(d, s) not in (s, 1) and s != 1:
                    raise ValueError('conflicting size for dim %r' % d)
                sizes[d] = max(sizes.get(d, s), s)
            a = _expand_dims_to(self.data, self.dims, out_dims)
            b = _expand_dims_to(other.data, other.dims, out_dims)
            data = op(b, a) if reflexive else op(a, b)
            return Variable(tuple(out_dims), data)
        else:
            data = (op(other, self.data) if reflexive
                    else op(self.data, other))
            return Variable(self.dims, data)

    # -- reductions ----------------------------------------------------------
    def reduce(self, func, dim=None, **kwargs):
        if dim is None:
            axes = None
            dims = ()
        else:
            if isinstance(dim, str):
                dim = (dim,)
            axes = tuple(self.dims.index(d) for d in dim)
            dims = tuple(d for d in self.dims if d not in dim)
            if len(axes) == 1:
                # int axis keeps argmin/argmax-style reducers working
                axes = axes[0]
        data = func(self.data, axis=axes, **kwargs)
        # keepdims-style reducers preserve rank; otherwise trust `dims`
        if np.ndim(data) == self.ndim:
            dims = self.dims
        elif np.ndim(data) != len(dims):
            raise ValueError(
                'reduction produced rank %d, expected %d'
                % (np.ndim(data), len(dims)))
        return Variable(dims, data)

    # scalar conversion (xarray parity: works on any size-1 array)
    def __bool__(self):
        return bool(self.values)

    def __float__(self):
        return float(self.values)

    def __int__(self):
        return int(self.values)

    def __complex__(self):
        return complex(self.values)

    def __repr__(self):
        return '<nd_tpu.Variable %r %s %s>' % (
            self.dims, self.shape, self.dtype)
