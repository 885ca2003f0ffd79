"""Tiling and mosaicking: larger-than-memory processing via on-disk
tiles with overlap buffers.

Parity surface of /root/reference/nd/tiling.py, minus the dask
dependency: deferred execution is provided by a small built-in
``Delayed`` wrapper and tiles are mapped over a thread pool (device
kernels dispatch asynchronously, so threads pipeline I/O with TPU
compute). The NetCDF tile store doubles as the checkpoint/resume
mechanism: tiles are written atomically (.part + rename) and existing
tiles are skipped, so interrupted jobs are resumable — same contract as
the reference (tiling.py:96-100 there).
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np

from . import utils
from .core import Dataset, concat
from .core.variable import Variable
from .io import add_time, open_netcdf, to_netcdf

__all__ = ['tile', 'map_over_tiles', 'auto_merge', 'debuffer',
           'sort_key', 'sort_into_array', 'Delayed']


class Delayed:
    """Minimal stand-in for dask.delayed: a thunk with .compute()."""

    def __init__(self, fn, *args, **kwargs):
        self._fn = fn
        self._args = args
        self._kwargs = kwargs

    def compute(self):
        args = [a.compute() if isinstance(a, Delayed) else
                [x.compute() if isinstance(x, Delayed) else x
                 for x in a] if isinstance(a, list) else a
                for a in self._args]
        return self._fn(*args, **self._kwargs)


def tile(ds, path, prefix='part', chunks=None, buffer=0, complevel=5):
    """Split a dataset into (buffered) tiles and write them to disk.

    Parameters
    ----------
    ds : Dataset or str
        The dataset (or NetCDF path) to split into tiles.
    path : str
        Output directory.
    prefix : str, optional
        Tile file names start with ``{prefix}.``.
    chunks : dict, optional
        Chunk size per dimension to split along, e.g. ``{'y': 100}``.
    buffer : int or dict, optional
        Overlapping pixels stored around each tile (default: 0).
    complevel : int, optional
        zlib level for the tile files (default 5, like ``to_netcdf``).
        Tiles are intermediates — level 1 typically halves the write
        time of a streaming pipeline for a modest size increase.
    """
    if os.path.isfile(path):
        raise ValueError('`path` cannot be a file!')
    if not os.path.isdir(path):
        os.makedirs(path)

    if isinstance(ds, str):
        # verbatim read: tile() must honor whatever dim names the file
        # has (a lat/lon product keeps lat/lon through the round trip)
        ds = open_netcdf(ds, rename_latlon=False)

    if not chunks:
        raise ValueError('`chunks` must be provided (e.g. {"y": 100}).')

    slices = {}
    for dim, chunk_len in chunks.items():
        n = ds.sizes[dim]
        if isinstance(buffer, int):
            _buf = buffer
        elif isinstance(buffer, dict) and dim in buffer:
            _buf = buffer[dim]
        else:
            _buf = 0
        slices[dim] = []
        start = 0
        while start < n:
            _start = max(0, start - _buf)
            stop = min(start + chunk_len + _buf, n)
            slices[dim].append(slice(_start, stop))
            start += chunk_len

    def _write_tile(slice_dict):
        subset = ds.isel(slice_dict)
        suffix = '.'.join('{}_{}_{}'.format(dim, s.start, s.stop)
                          for dim, s in slice_dict.items())
        tile_name = '{}.{}.nc'.format(prefix, suffix)
        tile_path = os.path.join(path, tile_name)
        if not os.path.isfile(tile_path):
            # to_netcdf writes to .part and renames atomically
            to_netcdf(subset, tile_path, complevel=complevel)

    for slice_dict in utils.dict_product(slices):
        _write_tile(slice_dict)


def map_over_tiles(files, fn, args=(), kwargs={}, path=None, suffix='',
                   merge=True, overwrite=False, compute=True,
                   max_workers=4, complevel=5):
    """Apply a function to each tile file: open -> fn -> write.

    Parameters
    ----------
    files : str or list of str
        Glob expression or list of tile paths.
    fn : callable
        Function applied to each opened tile dataset.
    args, kwargs : optional
        Extra arguments for ``fn``.
    path : str, optional
        Output directory (default: alongside inputs).
    suffix : str, optional
        Inserted before the extension of each output file.
    merge : bool, optional
        Return a merged dataset (default: True).
    overwrite : bool, optional
        Overwrite existing outputs; otherwise append ``_new``.
    compute : bool, optional
        If False, return a ``Delayed`` instead of computing now.
    max_workers : int, optional
        Thread-pool width for pipelining tiles (default: 4).
    complevel : int, optional
        zlib level for the per-tile outputs (default 5).

    Returns
    -------
    Dataset or list or Delayed
    """
    if isinstance(files, str):
        files = sorted(glob.glob(files))
    if path is not None:
        os.makedirs(path, exist_ok=True)

    def _wrapper(f):
        data = open_netcdf(f, rename_latlon=False)
        result = fn(data, *args, **kwargs)
        root, name = os.path.split(f)
        stem, ext = os.path.splitext(name)
        out_name = '{}{}{}'.format(stem, suffix, ext)
        out_path = root if path is None else path
        out_file = os.path.join(out_path, out_name)
        if not overwrite and os.path.exists(out_file):
            out_file = '{}_new{}'.format(*os.path.splitext(out_file))
        to_netcdf(result, out_file, complevel=complevel)
        return out_file

    def _run_all(fs):
        if len(fs) <= 1 or (max_workers is not None
                            and max_workers <= 1):
            return [_wrapper(f) for f in fs]
        # Run the FIRST tile alone: tiles share compiled programs, and
        # launching them all at once makes every thread compile the
        # same executable concurrently (none sees the others' cache
        # entry until one finishes) — with remote-compile backends that
        # multiplies a ~minute compile by the pool width. One warm tile
        # populates the jit caches; the rest then pipeline I/O.
        head = [_wrapper(fs[0])]
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return head + list(pool.map(_wrapper, fs[1:]))

    if merge:
        result = Delayed(lambda fs: auto_merge(_run_all(fs)), files)
    else:
        result = Delayed(_run_all, files)

    if compute:
        return result.compute()
    return result


def sort_key(ds, dims):
    """Sort key ordering datasets by their position on the tile grid."""
    keys = []
    for d in dims:
        vals = np.asarray(ds[d].values)
        if len(vals) < 2 or vals[-1] >= vals[0]:
            keys.append(vals[0])
            keys.append(vals[-1])
        else:
            # descending coords sort by NEGATED key; datetimes negate
            # via their integer ticks (not np.number, but ordered)
            def neg(v):
                if np.issubdtype(vals.dtype, np.number):
                    return -v
                if vals.dtype.kind in 'mM':
                    return -v.astype('int64')
                return v          # unordered-negation types: best effort
            keys.append(neg(vals[0]))
            keys.append(neg(vals[-1]))
    return tuple(keys)


def sort_into_array(datasets, dims=None):
    """Arrange tiles into a grid array by their coordinate origins."""
    dims = utils.get_dims(datasets[0]) if dims is None else tuple(dims)
    initials = {}
    for dim in dims:
        initials[dim] = np.unique([np.asarray(d[dim].values)[0]
                                   for d in datasets])
    shape = tuple(len(initials[dim]) for dim in dims)
    grid = np.empty(shape, dtype=object)

    def _idx(ds):
        result = []
        for dim in dims:
            vals = np.asarray(ds[dim].values)
            order = 1 if (len(vals) < 2 or vals[-1] >= vals[0]) else -1
            result.append(int(np.argmax(
                initials[dim][::order] == vals[0])))
        return tuple(result)

    for d in datasets:
        grid[_idx(d)] = d
    return grid


def debuffer(datasets, flat=True):
    """Remove overlap buffers from tiled datasets.

    The per-dimension overlap between adjacent tiles is detected from
    their shared coordinate values and trimmed half/half
    (reference: tiling.py:243-285).
    """
    def _remove_buffer(data, dim):
        data = list(data)
        overlap = []
        for a, b in zip(data[:-1], data[1:]):
            av = np.asarray(a[dim].values)
            bv = np.asarray(b[dim].values)
            overlap.append(len(np.intersect1d(av, bv)))
        buf_start = [o // 2 for o in overlap]
        buf_stop = [-(o - b) if (o - b) > 0 else None
                    for b, o in zip(buf_start, overlap)]
        debuf = [d.isel(**{dim: slice(start, stop)})
                 for d, start, stop in zip(
                     data, [None] + buf_start, buf_stop + [None])]
        arr = np.empty(len(debuf), dtype=object)
        for i, d in enumerate(debuf):
            arr[i] = d
        return arr

    dims = utils.get_dims(datasets[0])
    grid = sort_into_array(datasets)
    for axis, dim in enumerate(dims):
        func = partial(_remove_buffer, dim=dim)
        grid = np.apply_along_axis(func, axis, grid)

    if flat:
        return list(grid.flatten())
    return grid


def _combine_grid(datasets):
    """Combine de-buffered tiles by recursively concatenating along each
    split dimension (our equivalent of xr.combine_by_coords)."""
    dims = utils.get_dims(datasets[0])
    grid = sort_into_array(datasets)

    def _merge_axis(grid, axis, dim):
        if grid.shape[axis] == 1:
            return np.take(grid, 0, axis=axis)
        out_shape = grid.shape[:axis] + grid.shape[axis + 1:]
        out = np.empty(out_shape, dtype=object)
        for idx in np.ndindex(out_shape):
            full_idx = idx[:axis] + (slice(None),) + idx[axis:]
            # grid order along the axis already matches coordinate
            # order (sort_into_array handles descending coords)
            out[idx] = concat(list(grid[full_idx]), dim)
        return out

    # Collapse grid axes from last to first; axis i corresponds to
    # dims[i] by construction of sort_into_array.
    for axis in range(grid.ndim - 1, -1, -1):
        grid = _merge_axis(grid, axis, dims[axis])

    return grid.item() if isinstance(grid, np.ndarray) else grid


def _get_common_attrs(datasets):
    """All attributes that are identical in every dataset."""
    attrs = {}
    not_equal = []
    for d in datasets:
        for key, val in d.attrs.items():
            if key not in attrs:
                attrs[key] = val
            elif not np.array_equal(val, attrs[key]):
                not_equal.append(key)
    return {k: v for k, v in attrs.items() if k not in not_equal}


def auto_merge(datasets, buffer=True, chunks={}, meta_variables=[],
               use_xarray_combine=True):
    """Automatically merge a split dataset (multi-dimensional mosaic).

    Parameters
    ----------
    datasets : str, list of str, or list of Dataset
        Glob expression, tile paths, or opened datasets.
    buffer : bool, optional
        Auto-detect and remove overlap buffers (default: True).
    meta_variables : list, optional
        Metadata attributes lifted into (time) variables, categorical
        values factorized with a ``legend`` attribute.
    use_xarray_combine : bool, optional
        Kept for API parity (ignored; the built-in combine is used).

    Returns
    -------
    Dataset
    """
    pattern = datasets if isinstance(datasets, str) else None
    if pattern is not None:
        datasets = sorted(glob.glob(pattern))
    if len(datasets) == 0:
        raise ValueError('no tile inputs%s'
                         % (' matched %r' % pattern if pattern
                            else ''))
    if isinstance(datasets[0], str):
        datasets = [add_time(open_netcdf(path, rename_latlon=False))
                    for path in datasets]

    for meta in meta_variables:
        for d in datasets:
            val = d.attrs.get(meta)
            if 'time' in d.sizes:
                d[meta] = (('time',),
                           np.asarray([val] * d.sizes['time']))
            else:
                d[meta] = ((), np.asarray(val))

    if buffer:
        datasets = debuffer(datasets, flat=True)

    merged = _combine_grid(datasets)
    merged.attrs.clear()
    merged.attrs.update(_get_common_attrs(datasets))

    for meta in meta_variables:
        mvar = merged._variables[meta]
        vals = np.asarray(mvar.values)
        if not np.issubdtype(vals.dtype, np.number):
            import pandas as pd
            codes, legend = pd.factorize(vals.ravel())
            # keep the variable's own dims — rebuilding as ('time',)
            # fabricated a time dimension on datasets without one
            merged._variables[meta] = Variable(
                mvar.dims, codes.astype(int).reshape(vals.shape),
                {'legend': tuple((i, v)
                                 for i, v in enumerate(legend))})
    return merged
