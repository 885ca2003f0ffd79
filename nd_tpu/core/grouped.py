"""Grouped and windowed operations: groupby, resample, rolling.

The reference framework gets these from xarray (its tests use e.g.
``ds.groupby``/``to_series`` patterns; see /root/reference/nd/tiling.py:417
for a ``to_series`` consumer). This module provides the TPU-native
equivalents on :class:`nd_tpu.core.DataArray` / :class:`Dataset`:

- group *membership* is computed on the host from (host-side) coordinate
  values — it drives program structure, not compute;
- the per-group/window *reductions* run through the normal payload path,
  so device-resident data stays on device (jax.numpy ops under the hood).

Rolling windows are built by stacking ``window`` shifted slices along a
new axis — a static, gather-free formulation that XLA fuses well (the
same pattern the Pallas kernels use for neighborhood scans).
"""

from __future__ import annotations

import numpy as np

__all__ = ['GroupBy', 'Resample', 'Rolling']


def _nan_pad_value(dtype):
    """Fill value used when a window/shift runs off the edge."""
    if np.issubdtype(dtype, np.floating) or \
            np.issubdtype(dtype, np.complexfloating):
        return np.nan, dtype
    # xarray promotes ints/bools to float64 when NaN padding is needed
    return np.nan, np.float64


class GroupBy:
    """Split an object along one dimension by coordinate value.

    Mirrors ``xarray``'s groupby for 1-d groups: iterate ``(label,
    subset)`` pairs, ``map`` a function over groups, or call a reduction
    (``mean``/``sum``/...), which reduces each group over the grouped
    dimension and concatenates the results along a new dimension.
    """

    _REDUCERS = ('mean', 'std', 'var', 'min', 'max', 'sum', 'median',
                 'prod', 'all', 'any', 'count')

    def __init__(self, obj, dim, labels, indices, result_dim,
                 restore_order=None):
        self._obj = obj
        self._dim = dim                  # dimension being grouped
        self._labels = labels            # unique group labels (host array)
        self._indices = indices          # list of int index arrays
        self._result_dim = result_dim    # dim name of the grouped output
        self._restore_order = restore_order

    @classmethod
    def from_group(cls, obj, group):
        """Build from a coordinate name or a 1-d DataArray of labels."""
        from .dataarray import DataArray
        if isinstance(group, str):
            name = group
            if group not in obj._coords:
                raise KeyError('no coordinate %r to group by' % group)
            gvar = obj._coords[group]
        elif isinstance(group, DataArray):
            name = group.name or 'group'
            gvar = group.variable
        else:
            raise TypeError('group must be a coordinate name or DataArray')
        if gvar.ndim != 1:
            raise ValueError('can only group by 1-d coordinates')
        dim = gvar.dims[0]
        values = gvar.values
        labels, inverse = np.unique(values, return_inverse=True)
        # NaN-labeled elements are EXCLUDED (xarray drops them; a NaN
        # group would also be unreachable via sel on the label)
        if len(labels) and np.issubdtype(labels.dtype, np.floating) \
                and np.isnan(labels[-1]):
            nan_code = len(labels) - 1
            keep = inverse != nan_code
            labels = labels[:-1]
            values_idx = np.nonzero(keep)[0]
            inverse = inverse[keep]
        else:
            values_idx = None
        # single argsort + split: O(n log n), not one full scan per
        # label (groupby over ~1e5 unique labels was O(n * n_groups))
        order_all = np.argsort(inverse, kind='stable')
        bounds = np.searchsorted(inverse[order_all],
                                 np.arange(1, len(labels)))
        indices = np.split(order_all, bounds)
        if values_idx is not None:
            # re-map positions to the original (NaN-inclusive) axis
            indices = [values_idx[i] for i in indices]
        # map back: original position of each element after group-concat
        order = np.concatenate(indices) if indices else np.empty(0, int)
        restore = np.argsort(order, kind='stable')
        gb = cls(obj, dim, labels, indices, result_dim=name,
                 restore_order=restore)
        gb._group_name = name
        return gb

    def __len__(self):
        return len(self._labels)

    def __iter__(self):
        for label, idx in zip(self._labels, self._indices):
            yield label, self._obj.isel({self._dim: idx})

    def groups(self):
        return {label: idx for label, idx in
                zip(self._labels, self._indices)}

    # -- application -------------------------------------------------------
    def map(self, func, **kwargs):
        """Apply ``func`` to each group and reassemble.

        If the result still has the grouped dimension, groups are
        concatenated along it and restored to the original element
        order; otherwise they are stacked along the group-label dim.
        """
        from .dataarray import concat
        results = [func(sub, **kwargs)
                   for _, sub in self]
        if not results:
            raise ValueError('cannot map over zero groups')
        if self._dim in getattr(results[0], 'dims', ()):
            out = concat(results, dim=self._dim)
            # restoring the original element order only makes sense
            # when func preserved the group lengths; a shrinking or
            # growing map keeps group-concatenation order (xarray-like)
            if self._restore_order is not None and \
                    out.sizes[self._dim] == len(self._restore_order):
                out = out.isel({self._dim: self._restore_order})
            return out
        return self._stack_results(results)

    apply = map

    def _stack_results(self, results):
        from .dataarray import concat
        out = concat(results, dim=self._result_dim)
        out._coords[self._result_dim] = _label_variable(self._result_dim,
                                                        self._labels)
        return out

    def _reduce(self, name, **kwargs):
        results = [getattr(sub, name)(dim=self._dim, **kwargs)
                   for _, sub in self]
        return self._stack_results(results)

    def first(self):
        results = [sub.isel({self._dim: 0}) for _, sub in self]
        return self._stack_results(results)

    def last(self):
        results = [sub.isel({self._dim: -1}) for _, sub in self]
        return self._stack_results(results)

    def __getattr__(self, name):
        if name in self._REDUCERS:
            def method(**kwargs):
                return self._reduce(name, **kwargs)
            method.__name__ = name
            return method
        raise AttributeError(name)


def _label_variable(dim, labels):
    from .variable import Variable
    return Variable((dim,), np.asarray(labels))


# older offset aliases removed by pandas 3.0 -> their modern spelling
_FREQ_MODERNIZE = {'M': 'ME', 'Q': 'QE', 'A': 'YE', 'Y': 'YE'}


class Resample(GroupBy):
    """Time-binned groupby with pandas bin edges and labels (matching
    xarray: '1ME'/'1M' labels month ends, 'MS' month starts); the
    output keeps the time dimension's name. Empty bins are skipped."""

    @classmethod
    def from_freq(cls, obj, dim, freq):
        import pandas as pd
        if dim not in obj._coords:
            raise KeyError('no coordinate for dimension %r' % dim)
        values = obj._coords[dim].values
        if not np.issubdtype(values.dtype, np.datetime64):
            raise TypeError('resample requires a datetime64 coordinate')
        idx = pd.DatetimeIndex(values)
        s = pd.Series(np.arange(len(idx)), index=idx)
        try:
            grouped = s.resample(freq)
            binned = list(grouped)
        except ValueError:
            head = freq.lstrip('0123456789')
            alias = freq[:len(freq) - len(head)] \
                + _FREQ_MODERNIZE.get(head, head)
            binned = list(s.resample(alias))
        labels = []
        indices = []
        for label, grp in binned:
            if len(grp):
                labels.append(np.datetime64(label, 'ns'))
                indices.append(grp.values.astype(np.int64))
        labels = np.asarray(labels, dtype='datetime64[ns]')
        order = np.concatenate(indices) if indices else np.empty(0, int)
        gb = cls(obj, dim, labels, indices, result_dim=dim,
                 restore_order=np.argsort(order, kind='stable'))
        return gb


class Rolling:
    """Fixed-length rolling windows along one dimension.

    ``construct(window_dim)`` materializes the windows as a new
    dimension (NaN-padded at the edges); the named reductions apply a
    NaN-aware reduce over that dimension and blank out positions with
    fewer than ``min_periods`` valid points (xarray default: the full
    window).
    """

    def __init__(self, obj, dim, window, min_periods=None, center=False):
        if window < 1:
            raise ValueError('window must be >= 1')
        if min_periods is not None and not \
                (1 <= int(min_periods) <= int(window)):
            # pandas/xarray contract — a typo'd min_periods would
            # otherwise silently produce an all-NaN result
            raise ValueError('min_periods %r must be in [1, window=%d]'
                             % (min_periods, int(window)))
        self._obj = obj
        self._dim = dim
        self._window = int(window)
        self._min_periods = (int(min_periods) if min_periods is not None
                             else int(window))
        self._center = bool(center)

    def _offsets(self):
        w = self._window
        if self._center:
            # pandas/xarray convention: even windows put the extra
            # element BEFORE the label
            before = w // 2
        else:
            before = w - 1
        return before, w - 1 - before

    # -- DataArray path ------------------------------------------------------
    def construct(self, window_dim='window'):
        """Return the windowed view: same dims plus ``window_dim``."""
        from .dataarray import DataArray, Dataset
        if isinstance(self._obj, Dataset):
            ds = self._obj.copy(deep=False)
            for k in list(ds._variables):
                da = ds[k]
                if self._dim in da.dims:
                    ds._variables[k] = Rolling(
                        da, self._dim, self._window, self._min_periods,
                        self._center).construct(window_dim).variable
            return ds
        return self._construct_da(self._obj, window_dim)

    def _construct_da(self, da, window_dim):
        from .variable import Variable, get_xp
        from .dataarray import DataArray
        axis = da.dims.index(self._dim)
        n = da.shape[axis]
        w = self._window
        before, after = self._offsets()
        kind = np.dtype(str(da.dtype)).kind
        if kind in 'mM':
            # datetimes pad with NaT and keep their dtype (min/max/
            # count work; mean/sum raise, like numpy)
            xp = np
            data = da.values
            pad_shape_lo = list(data.shape)
            pad_shape_lo[axis] = before
            pad_shape_hi = list(data.shape)
            pad_shape_hi[axis] = after
            nat = np.full(1, 'NaT', dtype=data.dtype)
            padded = np.concatenate(
                [np.broadcast_to(nat, pad_shape_lo), data,
                 np.broadcast_to(nat, pad_shape_hi)], axis=axis)
        else:
            xp = get_xp(da.data)
            fill, dtype = _nan_pad_value(da.dtype)
            data = da.data.astype(dtype) if dtype != da.dtype \
                else da.data
            pad_width = [(0, 0)] * da.ndim
            pad_width[axis] = (before, after)
            padded = xp.pad(data, pad_width, mode='constant',
                            constant_values=fill)
        # stack w shifted slices: window position j holds x[i - before + j]
        slices = []
        for j in range(w):
            key = [slice(None)] * da.ndim
            key[axis] = slice(j, j + n)
            slices.append(padded[tuple(key)])
        stacked = xp.stack(slices, axis=da.ndim)  # window dim last
        var = Variable(da.dims + (window_dim,), stacked)
        out = DataArray._from_parts(var, dict(da._coords), da.attrs,
                                    da.name)
        return out

    def _reduce(self, name, **kwargs):
        from .dataarray import Dataset
        if isinstance(self._obj, Dataset):
            ds = self._obj.copy(deep=False)
            for k in list(ds._variables):
                da = self._obj[k]
                if self._dim in da.dims:
                    red = Rolling(da, self._dim, self._window,
                                  self._min_periods, self._center)
                    ds._variables[k] = getattr(red, name)(**kwargs).variable
            return ds
        win = self._construct_da(self._obj, '_rolling_window')
        counts = win.notnull().sum(dim='_rolling_window')
        if name == 'count':
            # xarray masks counts below max(min_periods, 1) too
            return counts.where(counts >= max(self._min_periods, 1))
        red = getattr(win, name)(dim='_rolling_window', **kwargs)
        kind = np.dtype(str(red.dtype)).kind
        other = (np.asarray('NaT', dtype=str(red.dtype))
                 if kind in 'mM' else np.nan)
        return red.where(counts >= self._min_periods, other)

    def mean(self, **kw):
        return self._reduce('mean', **kw)

    def sum(self, **kw):
        return self._reduce('sum', **kw)

    def std(self, **kw):
        return self._reduce('std', **kw)

    def var(self, **kw):
        return self._reduce('var', **kw)

    def min(self, **kw):
        return self._reduce('min', **kw)

    def max(self, **kw):
        return self._reduce('max', **kw)

    def median(self, **kw):
        return self._reduce('median', **kw)

    def count(self, **kw):
        return self._reduce('count', **kw)
