"""Lazily-materialized HDF5-backed arrays.

``open_netcdf(..., chunks=...)`` returns datasets whose data variables
are :class:`LazyNetCDFArray` views: nothing is read at open time, basic
indexing (slices/ints) composes lazily, and the HDF5 slab is only read
when the values are actually needed (``np.asarray`` / ``.values`` /
any computation). This is the reference's dask-backed
``chunks={}`` open (/root/reference/nd/tiling.py:382-385): it lets
``tile()`` and ``map_over_tiles`` stream a larger-than-RAM file —
each tile's ``isel`` slices the lazy view and materializes only its
own slab at write time.

The file is opened per read and closed immediately, so lazy views are
safe to pass between threads and never pin file descriptors.
"""

from __future__ import annotations

import numpy as np

__all__ = ['LazyNetCDFArray']


def _normalize_slice(s, n):
    start, stop, step = s.indices(n)
    return start, stop, step


class LazyNetCDFArray:
    """A lazy view of one HDF5 dataset with an optional decode step.

    Parameters
    ----------
    path, name : str
        File path and dataset name.
    shape, dtype :
        Shape and dtype of THIS VIEW after decode.
    key : tuple of (slice or int), optional
        Indexing into the stored dataset (defaults to everything).
    decode : callable, optional
        Applied to each raw slab after reading (CF unpacking).
    """

    def __init__(self, path, name, shape, dtype, key=None, decode=None):
        self._path = path
        self._name = name
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        if key is None:
            key = tuple(slice(0, s, 1) for s in self.shape)
        self._key = tuple(key)
        self._decode = decode

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64))

    @property
    def nbytes(self):
        return self.size * self.dtype.itemsize

    def __len__(self):
        if not self.shape:
            raise TypeError('len() of a 0-d lazy array')
        return self.shape[0]

    # -- materialization ---------------------------------------------------
    def _read(self):
        import h5py
        with h5py.File(self._path, 'r') as f:
            raw = f[self._name][self._key]
        raw = np.asarray(raw)
        if self._decode is not None:
            raw = self._decode(raw)
        return raw

    def __array__(self, dtype=None, copy=None):
        out = self._read()
        if dtype is not None:
            out = out.astype(dtype, copy=False)
        return out

    @property
    def values(self):
        return self._read()

    # -- lazy indexing -----------------------------------------------------
    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        if any(k is None or k is Ellipsis or not
               (isinstance(k, slice) or np.isscalar(k)
                or (hasattr(k, 'ndim') and np.ndim(k) == 0))
               for k in key):
            # fancy/newaxis indexing: materialize, then defer to numpy
            return self._read()[key]
        key = key + (slice(None),) * (self.ndim - len(key))

        new_key = []
        new_shape = []
        view_axis = 0
        for stored in self._key:
            if isinstance(stored, int):
                new_key.append(stored)       # already-dropped axis
                continue
            b0, _, bs = _normalize_slice(stored,
                                         np.iinfo(np.int64).max)
            n = self.shape[view_axis]
            k = key[view_axis]
            view_axis += 1
            if isinstance(k, slice):
                s0, s1, ss = k.indices(n)
                if ss < 0 or bs < 0:
                    return self._read()[key]   # keep the math simple
                new_key.append(slice(b0 + s0 * bs, b0 + s1 * bs,
                                     bs * ss))
                new_shape.append(max(0, -(-(s1 - s0) // ss)))
            else:
                i = int(k)
                if i < 0:
                    i += n
                if not 0 <= i < n:
                    raise IndexError(
                        'index %d out of bounds for axis of size %d'
                        % (k, n))
                new_key.append(b0 + i * bs)
        return LazyNetCDFArray(self._path, self._name,
                               new_shape, self.dtype,
                               key=tuple(new_key),
                               decode=self._decode)

    def astype(self, dtype, copy=True):
        return self._read().astype(dtype, copy=copy)

    def __repr__(self):
        return ('LazyNetCDFArray(%r:%r, shape=%s, dtype=%s)'
                % (self._path, self._name, self.shape, self.dtype))
