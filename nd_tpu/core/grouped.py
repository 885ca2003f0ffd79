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

__all__ = ['GroupBy', 'Resample', 'Rolling', 'Coarsen', 'Weighted']


def _nan_pad_value(dtype):
    """Fill value used when a window/shift runs off the edge."""
    if np.issubdtype(dtype, np.floating) or \
            np.issubdtype(dtype, np.complexfloating):
        return np.nan, dtype
    # xarray promotes ints/bools to float64 when NaN padding is needed
    return np.nan, np.float64


_DT_FIELDS = ('year', 'month', 'day', 'hour', 'minute', 'second',
              'dayofyear', 'dayofweek', 'weekday', 'quarter',
              'season', 'date', 'week', 'weekofyear', 'days_in_month',
              'time')


def dt_field(values, field):
    """A derived calendar field of a datetime64 array (the xarray
    ``.dt`` / ``'time.month'`` virtual-coordinate surface), computed
    via pandas."""
    import pandas as pd
    values = np.asarray(values)
    if values.dtype.kind != 'M':
        raise TypeError("'.%s' only works on datetime coordinates "
                        '(got dtype %s)' % (field, values.dtype))
    idx = pd.DatetimeIndex(values.ravel())
    if field == 'season':
        season_of = {12: 'DJF', 1: 'DJF', 2: 'DJF',
                     3: 'MAM', 4: 'MAM', 5: 'MAM',
                     6: 'JJA', 7: 'JJA', 8: 'JJA',
                     9: 'SON', 10: 'SON', 11: 'SON'}
        out = np.asarray([season_of[m] for m in idx.month])
    elif field == 'date':
        out = np.asarray(idx.date)
    elif field == 'time':
        out = np.asarray(idx.time)
    elif field in ('week', 'weekofyear'):
        out = np.asarray(idx.isocalendar().week.to_numpy(), np.int64)
    elif field in ('weekday', 'dayofweek'):
        out = np.asarray(idx.dayofweek, np.int64)
    elif field in _DT_FIELDS:
        out = np.asarray(getattr(idx, field))
    else:
        raise AttributeError(
            'unknown datetime field %r (choose from %s)'
            % (field, ', '.join(_DT_FIELDS)))
    return out.reshape(values.shape)


class DatetimeAccessor:
    """``da.dt.<field>``: calendar fields of a datetime DataArray."""

    def __init__(self, obj):
        self._obj = obj

    def __getattr__(self, field):
        if field.startswith('_'):
            raise AttributeError(field)
        from .dataarray import DataArray
        da = self._obj
        vals = dt_field(da.values, field)
        return DataArray._from_parts(
            type(da.variable)(da.dims, vals), dict(da._coords), {},
            field)

    def __dir__(self):
        return list(_DT_FIELDS)


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
        """Build from a coordinate name, a virtual datetime field
        (``'time.month'``-style, the xarray idiom), or a 1-d DataArray
        of labels."""
        from .dataarray import DataArray
        from .variable import Variable
        if isinstance(group, str):
            name = group
            if group not in obj._coords and '.' in group:
                base, _, field = group.partition('.')
                if base not in obj._coords:
                    raise KeyError('no coordinate %r to group by'
                                   % base)
                cv = obj._coords[base]
                gvar = Variable(cv.dims,
                                dt_field(cv.values, field))
                # xarray names the result dim after the field:
                # groupby('time.month') -> a selectable 'month' dim
                name = field
            elif group not in obj._coords:
                raise KeyError('no coordinate %r to group by' % group)
            else:
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


class Coarsen:
    """Block-window aggregation along one or more dimensions (the
    xarray ``coarsen`` API): each output element reduces one
    ``windows[dim]``-long block per coarsened dim.

    ``boundary`` handles non-divisible axes: ``'exact'`` (default)
    raises, ``'trim'`` drops the remainder from the ``side`` end,
    ``'pad'`` NaN-pads to a whole block (promoting ints to float like
    rolling). Coordinates along coarsened dims reduce with
    ``coord_func`` (``'mean'`` default; datetimes average in int64).
    """

    _REDUCERS = ('mean', 'sum', 'std', 'var', 'min', 'max', 'median',
                 'count')

    def __init__(self, obj, windows, boundary='exact', side='left',
                 coord_func='mean'):
        if boundary not in ('exact', 'trim', 'pad'):
            raise ValueError("boundary must be 'exact', 'trim' or 'pad'")
        if side not in ('left', 'right'):
            raise ValueError("side must be 'left' or 'right'")
        windows = {d: int(w) for d, w in windows.items()}
        if any(w < 1 for w in windows.values()):
            raise ValueError('window sizes must be >= 1')
        sizes = obj.sizes
        for d in windows:
            if d not in sizes:
                raise ValueError('coarsen dimension %r not in object '
                                 'dims %r' % (d, tuple(sizes)))
            if boundary == 'exact' and sizes[d] % windows[d]:
                raise ValueError(
                    'size %d of dim %r is not divisible by window %d '
                    "(use boundary='trim' or 'pad')"
                    % (sizes[d], d, windows[d]))
        self._obj = obj
        self._windows = windows
        self._boundary = boundary
        self._side = side
        self._coord_func = coord_func

    # -- blocking ----------------------------------------------------------
    def _block_values(self, values, dims, xp=np):
        """Reshape ``values`` so every coarsened axis becomes an
        (nblocks, window) pair; returns (blocked, window_axes)."""
        arr = values
        out_dims = []
        window_axes = []
        axis = 0
        for d in dims:
            if d not in self._windows:
                out_dims.append(d)
                axis += 1
                continue
            w = self._windows[d]
            n = arr.shape[axis]
            rem = n % w
            if rem and self._boundary == 'trim':
                key = [slice(None)] * arr.ndim
                key[axis] = (slice(None, n - rem) if self._side == 'left'
                             else slice(rem, None))
                arr = arr[tuple(key)]
                n -= rem
            elif rem:  # pad
                fill, dtype = _nan_pad_value(arr.dtype)
                if np.issubdtype(np.dtype(str(arr.dtype)), np.datetime64):
                    fill = np.datetime64('NaT')
                    dtype = arr.dtype
                pad = [(0, 0)] * arr.ndim
                pad[axis] = ((0, w - rem) if self._side == 'left'
                             else (w - rem, 0))
                if str(dtype) != str(arr.dtype):
                    arr = arr.astype(dtype)
                if np.issubdtype(np.dtype(str(arr.dtype)), np.datetime64):
                    lo = np.full([p if i == axis else s for i, (s, p) in
                                  enumerate(zip(arr.shape,
                                                [p[0] for p in pad]))],
                                 fill, arr.dtype)
                    hi = np.full([p if i == axis else s for i, (s, p) in
                                  enumerate(zip(arr.shape,
                                                [p[1] for p in pad]))],
                                 fill, arr.dtype)
                    arr = np.concatenate([lo, arr, hi], axis=axis)
                else:
                    arr = xp.pad(arr, pad, mode='constant',
                                 constant_values=fill)
                n += w - rem
            new_shape = arr.shape[:axis] + (n // w, w) \
                + arr.shape[axis + 1:]
            arr = arr.reshape(new_shape)
            out_dims.append(d)
            window_axes.append(axis + 1)
            axis += 2
        return arr, window_axes

    # -- reductions --------------------------------------------------------
    def _reduce_da(self, da, name, skipna=True):
        from .variable import Variable, get_xp
        from .dataarray import DataArray
        if not any(d in da.dims for d in self._windows):
            return da
        xp = get_xp(da.data)
        kind = np.dtype(str(da.dtype)).kind
        data = da.values if kind in 'mM' else da.data
        blocked, window_axes = self._block_values(
            data, da.dims, np if kind in 'mM' else xp)
        axes = tuple(window_axes)
        if kind in 'mM':
            red = self._reduce_datetime(blocked, axes, name)
            bxp = np
        else:
            bxp = get_xp(blocked)
            if name == 'count':
                red = (~bxp.isnan(blocked)).sum(axis=axes) \
                    if np.dtype(str(blocked.dtype)).kind in 'fc' else \
                    np.prod([blocked.shape[a] for a in axes]) \
                    * bxp.ones([s for i, s in enumerate(blocked.shape)
                                if i not in axes], np.int64)
            else:
                fn = getattr(bxp, ('nan' + name) if skipna else name)
                red = fn(blocked, axis=axes)
        coords = {}
        for ck, cv in da._coords.items():
            if not any(d in self._windows for d in cv.dims):
                coords[ck] = cv
                continue
            coords[ck] = Variable(
                cv.dims, self._coarsen_coord(cv.values, cv.dims), cv.attrs)
        return DataArray._from_parts(Variable(da.dims, red), coords,
                                     da.attrs, da.name)

    def _reduce_datetime(self, blocked, axes, name):
        if name in ('min', 'max'):
            return getattr(np, name)(blocked, axis=axes)
        if name == 'count':
            return (~np.isnat(blocked)).sum(axis=axes)
        if name in ('mean', 'median'):
            base = blocked.astype('int64')
            red = getattr(np, 'nan' + name)(
                np.where(np.isnat(blocked), np.nan, base), axis=axes)
            return np.round(red).astype('int64').astype(blocked.dtype)
        raise TypeError('%s() is not defined for datetime blocks' % name)

    def _coarsen_coord(self, values, dims):
        blocked, axes = self._block_values(values, dims, np)
        fn = self._coord_func
        if np.issubdtype(values.dtype, np.datetime64):
            return self._reduce_datetime(
                blocked, tuple(axes),
                'mean' if fn in ('mean', 'median') else fn)
        if fn == 'first':
            key = [slice(None)] * blocked.ndim
            for a in axes:
                key[a] = 0
            return blocked[tuple(key)]
        if fn == 'last':
            key = [slice(None)] * blocked.ndim
            for a in axes:
                key[a] = -1
            return blocked[tuple(key)]
        return getattr(np, 'nan' + fn)(blocked, axis=tuple(axes))

    def _reduce(self, name, skipna=True):
        from .dataarray import Dataset
        if isinstance(self._obj, Dataset):
            ds = self._obj
            out = ds.copy(deep=False)
            done_coords = {}
            for k in list(out._variables):
                da = ds[k]
                sub = Coarsen(da, {d: w for d, w in self._windows.items()
                                   if d in da.dims},
                              self._boundary, self._side, self._coord_func)
                red = sub._reduce_da(da, name, skipna=skipna)
                out._variables[k] = red.variable
                for ck, cv in red._coords.items():
                    done_coords.setdefault(ck, cv)
            for ck in list(out._coords):
                if any(d in self._windows for d in out._coords[ck].dims):
                    if ck in done_coords:
                        out._coords[ck] = done_coords[ck]
                    else:
                        from .variable import Variable
                        cv = out._coords[ck]
                        out._coords[ck] = Variable(
                            cv.dims,
                            self._coarsen_coord(cv.values, cv.dims),
                            cv.attrs)
            return out
        return self._reduce_da(self._obj, name, skipna=skipna)

    def __getattr__(self, name):
        if name in self._REDUCERS:
            def reducer(skipna=True, **kw):
                if kw:
                    raise TypeError(
                        'coarsen reductions accept only skipna=, got '
                        '%r' % sorted(kw))
                return self._reduce(name, skipna=skipna)
            return reducer
        raise AttributeError(name)


class Weighted:
    """Weighted reductions (the xarray ``.weighted(weights)`` API).

    ``weights`` must be a DataArray free of NaNs (xarray contract);
    reductions broadcast it against the object and, with the default
    ``skipna=True``, ignore NaN data points (their weight drops out of
    the normalization)."""

    def __init__(self, obj, weights):
        from .dataarray import DataArray
        if not isinstance(weights, DataArray):
            raise TypeError('weights must be a DataArray')
        kind = np.dtype(str(weights.dtype)).kind
        if kind in 'fc':
            wv = weights.values
            if np.isnan(wv).any():
                raise ValueError('weights cannot contain NaN (mask or '
                                 'fill them first)')
        self._obj = obj
        self._weights = weights

    def _per_da(self, da, fn, dim, skipna):
        from .dataarray import broadcast
        x, w = broadcast(da, self._weights)
        return fn(x, w, dim, skipna)

    def _apply(self, fn, dim, skipna):
        from .dataarray import Dataset
        if isinstance(self._obj, Dataset):
            ds = self._obj
            out = {k: self._per_da(ds[k], fn, dim, skipna)
                   for k in ds.data_vars}
            return Dataset(out, attrs=dict(ds.attrs))
        return self._per_da(self._obj, fn, dim, skipna)

    @staticmethod
    def _masked(x, w, skipna):
        valid = x.notnull() if skipna else None
        if valid is not None:
            xw = (x.fillna(0) * w)
            sw = w.where(valid, 0)
        else:
            xw = x * w
            sw = w
        return xw, sw, valid

    def sum_of_weights(self, dim=None):
        def fn(x, w, dim, skipna):
            _, sw, _ = self._masked(x, w, True)
            s = sw.sum(dim)
            return s.where(s != 0)
        return self._apply(fn, dim, True)

    def sum(self, dim=None, skipna=True):
        def fn(x, w, dim, skipna):
            xw, _, _ = self._masked(x, w, skipna)
            return xw.sum(dim) if skipna else (x * w).sum(dim)
        return self._apply(fn, dim, skipna)

    def mean(self, dim=None, skipna=True):
        def fn(x, w, dim, skipna):
            xw, sw, _ = self._masked(x, w, skipna)
            denom = sw.sum(dim)
            denom = denom.where(denom != 0)
            return xw.sum(dim) / denom
        return self._apply(fn, dim, skipna)

    def var(self, dim=None, skipna=True):
        def fn(x, w, dim, skipna):
            xw, sw, valid = self._masked(x, w, skipna)
            denom = sw.sum(dim)
            denom = denom.where(denom != 0)
            m = xw.sum(dim) / denom
            d2 = (x - m) ** 2
            if skipna:
                d2 = d2.fillna(0)
            return (d2 * sw).sum(dim) / denom
        return self._apply(fn, dim, skipna)

    def std(self, dim=None, skipna=True):
        out = self.var(dim, skipna)
        return out ** 0.5
