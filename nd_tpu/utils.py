"""Helper functions: chunking, split/merge, parallel map, docstring
tooling, gufunc-style apply.

Re-implements the reference's ``nd/utils.py`` utility surface
(/root/reference/nd/utils.py) for the TPU-native data model. The key
semantic difference: the reference's ``parallel()`` forked a
``multiprocess.Pool`` because its kernels were GIL-bound Cython
(utils.py:389-392 there); here the hot kernels are XLA/Pallas programs
that the TPU executes asynchronously, so host-side chunk mapping uses a
thread pool (no pickling of device buffers) and *device*-level
parallelism is provided by ``nd_tpu.parallel`` (mesh + shard_map with
halo exchange).
"""

from __future__ import annotations

import datetime
import importlib
import inspect
import itertools
import re
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from functools import wraps

import numpy as np

from .core import DataArray, Dataset, concat
from .core.dataarray import expand_variables_da

__all__ = ['get_shape', 'get_dims', 'str2date', 'dict_product', 'chunks',
           'array_chunks', 'block_split', 'block_merge', 'xr_split',
           'xr_merge', 'parallel', 'select', 'get_vars_for_dims',
           'expand_variables', 'is_complex', 'apply', 'requires',
           'check_requirements', 'parse_docstring', 'assemble_docstring',
           'extract_arguments', 'ncpus']


# -------------------------------------------------------------------
# Dependency checks.
# The reference gated OmnibusTest on the GSL C library and warping on
# GDAL (utils.py:42-44 there). This framework owns those capabilities
# natively (chi-square CDF in JAX, pure-JAX warping), so the
# corresponding feature flags are always available. Optional *host*
# dependencies (video, maps) are probed as importable modules.
# -------------------------------------------------------------------
check_dependencies = {
    'gsl': True,    # built-in: nd_tpu.ops.stats.chi2_cdf
    'gdal': True,   # built-in: nd_tpu.crs + nd_tpu.ops.interp
}


def check_requirements(dependency=()):
    def _check(dep):
        if dep in check_dependencies:
            return check_dependencies[dep]
        try:
            importlib.import_module(dep)
        except ImportError:
            return False
        return True

    if isinstance(dependency, (list, tuple)):
        return all(_check(d) for d in dependency)
    return _check(dependency)


def requires(dependency=()):
    """Declare that a class or function needs optional dependencies.

    Calling a decorated function — or instantiating a decorated class —
    while any declared dependency is unavailable raises ImportError.
    Decorated classes additionally carry ``_requires`` (the declared
    dependencies) and ``_skip`` (True when unavailable); the test
    registry consumes those two attributes, so their names are part of
    the capability contract (same gate the reference exposes,
    /root/reference/nd/utils.py; implementation is this framework's own).
    """
    available = check_requirements(dependency)

    def decorator(obj):
        is_class = inspect.isclass(obj)
        # one guarded wrapper serves both cases: for classes it stands
        # in for __init__, for functions it IS the returned object
        target = obj.__init__ if is_class else obj

        @wraps(target)
        def guarded(*args, **kwargs):
            if not available:
                raise ImportError(
                    'missing dependencies {!r} (required by {})'.format(
                        dependency, getattr(obj, '__name__', obj)))
            return target(*args, **kwargs)

        if not is_class:
            return guarded
        obj.__init__ = guarded
        obj._requires = dependency
        obj._skip = not available
        return obj

    return decorator


def ncpus():
    import os
    return os.cpu_count() or 1


def get_shape(ds):
    """Shape of a Dataset/DataArray in coordinate order."""
    if isinstance(ds, DataArray):
        return ds.shape
    sizes = ds.sizes
    return tuple(sizes[d] for d in sizes)


def get_dims(ds):
    """Return the dimensions of ``ds`` in (insertion) order."""
    if isinstance(ds, DataArray):
        return ds.dims
    return tuple(ds.sizes)


def squeeze(obj):
    """Return the item of a length-1 array, else the object."""
    try:
        return obj.item()
    except (ValueError, AttributeError):
        return obj


def str2date(string, fmt=None, tz=False):
    """Parse a date string to a datetime (optionally tz-aware UTC)."""
    if fmt is not None:
        date_object = datetime.datetime.strptime(string, fmt)
    else:
        import pandas as pd
        date_object = pd.Timestamp(string).to_pydatetime()
    if tz:
        if date_object.tzinfo is None:
            date_object = date_object.replace(
                tzinfo=datetime.timezone.utc)
    elif date_object.tzinfo is not None:
        date_object = date_object.replace(tzinfo=None)
    return date_object


def dict_product(d):
    """itertools.product over a dict of lists."""
    return (dict(zip(d, x)) for x in itertools.product(*d.values()))


def chunks(lst, n):
    """Yield successive n-sized chunks from ``lst``."""
    for i in range(0, len(lst), n):
        yield lst[i:i + n]


def array_chunks(array, n, axis=0, return_indices=False):
    """Chunk an array along the given axis."""
    if axis >= array.ndim:
        raise ValueError('axis {:d} is out of range for given array.'
                         .format(axis))
    arr_len = array.shape[axis]
    for i in range(0, arr_len, n):
        indices = [slice(None)] * array.ndim
        indices[axis] = slice(i, i + n)
        if return_indices:
            yield indices, array[tuple(indices)]
        else:
            yield array[tuple(indices)]


def block_split(array, blocks):
    """Split an ndarray into subarrays (column-major block order)."""
    if array.ndim != len(blocks):
        raise ValueError("Length of 'blocks' must equal array "
                         "dimensionality.")
    result = [array]
    for axis, nblocks in enumerate(blocks):
        result = [np.array_split(_, nblocks, axis=axis) for _ in result]
        result = [item for sublist in result for item in sublist]
    return result


def block_merge(array_list, blocks):
    """Inverse of block_split: stitch a flat block list back together.

    The flat list is laid out with the first axis outermost (the order
    block_split emits); it is arranged into an object grid of shape
    ``blocks`` and stitched in one ``np.block`` call.
    """
    blocks = tuple(int(b) for b in blocks)
    expected = int(np.prod(blocks))
    if len(array_list) != expected:
        raise ValueError('block_merge: got %d blocks but grid %r needs %d'
                         % (len(array_list), blocks, expected))
    grid = np.empty(blocks, dtype=object)
    for idx, arr in zip(np.ndindex(*blocks), array_list):
        grid[idx] = arr
    return np.block(grid.tolist())


def xr_split(ds, dim, chunks, buffer=0):
    """Split a Dataset into overlapping chunks along one dimension.

    The overlap (``buffer``) is the halo needed by windowed kernels —
    the host-level analogue of the device-level halo exchange in
    ``nd_tpu.parallel.halo``.

    The chunk count is clamped so that every chunk is at least
    ``buffer + 1`` wide (fewer chunks than requested may be yielded);
    otherwise the trim-and-concat merge could not reconstruct the
    original array.
    """
    n = ds.sizes[dim]
    max_chunks = max(1, n // (buffer + 1)) if buffer > 0 \
        else max(1, min(chunks, n))
    chunks = max(1, min(chunks, max_chunks))
    # balanced cores (np.array_split sizing): chunk sizes differ by at
    # most one and are never empty — ceil-sized chunks could overshoot
    # the array, leaving clipped/empty tails whose buffer trims in
    # xr_merge silently removed real data
    base, extra = divmod(n, chunks)
    sizes = [base + 1 if i < extra else base for i in range(chunks)]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    for i in range(chunks):
        low = int(max(starts[i] - buffer, 0))
        high = int(min(starts[i + 1] + buffer, n))
        yield ds.isel(**{dim: slice(low, high)})


def xr_merge(ds_list, dim, buffer=0):
    """Inverse of xr_split: trim halos and concatenate.

    Every chunk loses its halo on each side that has a neighbour —
    positionally: no head trim on the first, no tail trim on the last.
    """
    b, last = int(buffer), len(ds_list) - 1
    if b > 0 and last > 0:
        parts = [ds.isel(**{dim: slice(b if i else None,
                                       -b if i < last else None)})
                 for i, ds in enumerate(ds_list)]
    else:
        parts = list(ds_list)
    return concat(parts, dim=dim)


def _invoke_chunk(fn, args, kwargs, part):
    """Module-level chunk applier (picklable for process pools)."""
    return fn(part, *args, **kwargs)


def parallel(fn, dim=None, chunks=None, chunksize=None, merge=True,
             buffer=0, use_threads=True, scheduler=None):
    """Parallelize a function taking a Dataset as first argument.

    Splits along ``dim`` with a halo, maps over a worker pool, trims
    and concatenates.

    ``scheduler`` selects the pool: ``'threads'`` (default) overlaps
    host work and asynchronous device dispatches; ``'processes'``
    runs each chunk in a spawned worker process — real multi-core
    speedup for GIL-bound pure-numpy host paths, the capability the
    reference gets from ``multiprocessing.Pool``
    (/root/reference/nd/utils.py:389-392). ``'serial'`` maps in-line
    (debugging). With processes, ``fn`` and its arguments must be
    picklable (module-level functions) and, from a script, the call
    must run under ``if __name__ == '__main__':`` (spawn re-imports
    the main module); device kernels should stay on threads — each
    spawned worker would re-initialize its own jax client. For true
    multi-chip execution use ``nd_tpu.parallel.shard_apply``.

    ``use_threads=False`` is the legacy spelling of
    ``scheduler='serial'``.
    """
    if dim is None:
        dim = 'y'
    if chunks is None:
        chunks = ncpus()
    if scheduler is None:
        scheduler = 'threads' if use_threads else 'serial'
    if scheduler not in ('threads', 'processes', 'serial'):
        raise ValueError("scheduler must be 'threads', 'processes' or "
                         "'serial', got %r" % (scheduler,))

    def wrapper(ds, *args, **kwargs):
        if dim not in ds.sizes:
            raise ValueError("The dataset has no dimension '{}'."
                             .format(dim))
        parts = list(xr_split(ds, dim=dim, chunks=chunks, buffer=buffer))

        def _fn(part):
            return fn(part, *args, **kwargs)

        if scheduler == 'threads' and chunks > 1:
            with ThreadPoolExecutor(max_workers=chunks) as pool:
                output = list(pool.map(_fn, parts))
        elif scheduler == 'processes' and chunks > 1:
            # spawn, not fork: forking a process with a live jax/TPU
            # client (import nd_tpu initializes one lazily) deadlocks
            # in the child's runtime threads
            import functools
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            call = functools.partial(_invoke_chunk, fn, args, kwargs)
            with ProcessPoolExecutor(
                    max_workers=min(len(parts), ncpus()),
                    mp_context=mp.get_context('spawn')) as pool:
                output = list(pool.map(call, parts))
        else:
            output = [_fn(p) for p in parts]

        if merge:
            return xr_merge(output, dim=dim, buffer=buffer)
        return output

    return wrapper


def select(objects, fn, unlist=True, first=False):
    """Return the subset of ``objects`` matching a predicate."""
    filtered = objects
    if type(objects) is list:
        filtered = [obj for obj in filtered if fn(obj)]
    elif type(objects) is dict:
        filtered = {k: v for k, v in filtered.items() if fn(v)}
    if first:
        if len(filtered) == 0:
            return None
        if type(filtered) is list:
            return filtered[0]
        if type(filtered) is dict:
            return filtered[list(filtered.keys())[0]]
    elif unlist and len(filtered) == 1 and type(filtered) is list:
        return filtered[0]
    else:
        return filtered


def get_vars_for_dims(ds, dims, invert=False):
    """All variables in ``ds`` whose dims are a superset of ``dims``."""
    return [v for v in ds.data_vars
            if set(ds[v].dims).issuperset(set(dims)) != invert]


def expand_variables(da, dim='variable'):
    """Inverse of Dataset.to_array()."""
    return expand_variables_da(da, dim)


def is_complex(ds):
    """True if the Dataset/DataArray contains complex data."""
    if isinstance(ds, DataArray):
        return np.issubdtype(np.dtype(str(ds.dtype)), np.complexfloating)
    if isinstance(ds, Dataset):
        return any(np.issubdtype(np.dtype(str(v.dtype)),
                                 np.complexfloating)
                   for v in ds.data_vars.values())
    raise ValueError('Not a Dataset or DataArray: {}'.format(repr(ds)))


# -------------------------------------------------------------------
# Docstring tooling (numpydoc section parser) — used by the algorithm
# functionalizer for generated API docs.
# -------------------------------------------------------------------

def _margin(line):
    """Width of a line's leading whitespace."""
    return len(line) - len(line.lstrip())


def _is_dash_rule(line):
    """True for a numpydoc underline: dashes only (ignoring padding)."""
    body = line.strip()
    return bool(body) and set(body) == {'-'}


def parse_docstring(doc):
    """Parse a numpydoc docstring into an ordered mapping.

    Keys: ``'indent'`` (the stripped common indentation), ``None``
    (preamble lines before the first section), and one entry per
    section title mapping to a list of *blocks* — each block is the
    list of lines of one definition item (a new item begins at a line
    with no leading whitespace).
    """
    parsed = OrderedDict()
    if doc is None:
        return parsed

    raw = doc.split('\n')
    # Common indentation, measured over the body only: the first line
    # hugs the opening quotes and the closing line is artificial.
    interior = [_margin(ln) for ln in raw[1:-1] if ln.strip()] \
        if len(raw) >= 3 else []
    width = min(interior, default=0)
    lines = [ln[width:] if _margin(ln) >= width else ln for ln in raw]
    parsed['indent'] = width

    # A section header is a title line whose successor is a dash rule.
    header_at = [i for i in range(1, len(lines))
                 if _is_dash_rule(lines[i]) and lines[i - 1].strip()]

    if not header_at:
        parsed[None] = lines
        return parsed

    def _strip_trailing_blanks(chunk):
        while chunk and not chunk[-1].strip():
            chunk.pop()
        return chunk

    parsed[None] = _strip_trailing_blanks(lines[:header_at[0] - 1])
    for here, nxt in itertools.zip_longest(header_at, header_at[1:]):
        title = lines[here - 1].strip()
        end = len(lines) if nxt is None else nxt - 1
        body = _strip_trailing_blanks(lines[here + 1:end])
        # chunk into definition items in one pass: flush-left lines
        # (including blank ones) open a new item; indented lines
        # continue the current one
        blocks = []
        for ln in body:
            if _margin(ln) == 0:
                blocks.append([ln])
            elif blocks:
                blocks[-1].append(ln)
        parsed[title] = blocks
    return parsed


def assemble_docstring(parsed, sig=None):
    """Assemble a docstring from the parse_docstring() representation.

    With ``sig``, the ``Parameters`` blocks are re-ordered to follow
    the signature; blocks naming no known parameter keep their
    relative order after the known ones (sorted is stable).
    """
    parsed = parsed.copy()
    pad = ' ' * parsed.pop('indent', 0)

    if sig is not None and parsed.get('Parameters'):
        rank = {name: i for i, name in enumerate(sig.parameters)}

        def block_rank(block):
            described = block[0].partition(':')[0].strip(' *')
            return rank.get(described, len(rank))

        parsed['Parameters'] = sorted(parsed['Parameters'],
                                      key=block_rank)

    out = []
    for title, content in parsed.items():
        if not content:
            continue
        if isinstance(content[0], list):     # section: list of blocks
            body = itertools.chain.from_iterable(content)
        else:                                # preamble: plain lines
            body = content
        if title is not None:
            out += ['', pad + title, pad + '-' * len(title)]
        out += [(pad + ln).rstrip() for ln in body]
    return '\n'.join(out)


# -------------------------------------------------------------------
# gufunc-style apply — the reference used np.vectorize
# (utils.py:627-724 there); here the fast path is jax.vmap over the
# stacked dimension, with a numpy fallback for non-traceable functions.
# -------------------------------------------------------------------

def apply(ds, fn, signature=None, njobs=1):
    """Apply a function operating on a subset of dimensions.

    Parameters
    ----------
    ds : Dataset or DataArray
    fn : callable
        Operates on numpy/jax arrays whose dims follow ``signature``.
    signature : str, optional
        e.g. ``'(time,var)->(time)'``. If ``var`` is included, variables
        are stacked into a dimension first.
    njobs : int, optional
        Kept for API parity; the jax.vmap path is already data-parallel.
    """
    import jax
    import jax.numpy as jnp

    def _parse_signature(sig):
        if sig is None:
            sig = '(time,var)->(time)'
        m = re.match(r'\((.*)\)->\((.*)\)', sig)
        if m is None:
            raise ValueError('Invalid signature')
        dims = tuple(group.split(',') if len(group) > 0 else []
                     for group in m.groups())
        return dims

    signature = signature or '(time,var)->(time)'
    dims_in, dims_out = _parse_signature(signature)

    if len(dims_out) > 0 and not set(dims_out).issubset(dims_in):
        raise ValueError('Invalid signature: All output dimensions must '
                         'also be input dimensions.')

    was_dataset = isinstance(ds, Dataset)
    if was_dataset and 'var' in dims_in:
        ds = ds.to_array(dim='var')

    def _apply_da(da):
        src_dims = da.dims
        dims_removed = set(dims_in) - set(dims_out)
        output_dims = [d for d in src_dims if d not in dims_removed]
        extra_dims = tuple(d for d in src_dims if d not in dims_in)
        stacked = da.stack(z=extra_dims).transpose('z', *dims_in)

        data = stacked.data
        # Fast path: vmap over the stacked leading dimension. Only
        # trace-INCOMPATIBILITY errors select the np.vectorize slow
        # path (host-python fns hit ConcretizationTypeError /
        # TracerArrayConversionError — both JAXTypeError — or
        # TypeError/NotImplementedError from non-traceable ops);
        # genuine bugs in `fn` (e.g. ValueError from a shape mistake)
        # propagate instead of silently re-running element-wise.
        try:
            out = jax.vmap(fn)(jnp.asarray(data))
            out = np.asarray(out)
        except (jax.errors.JAXTypeError, TypeError,
                NotImplementedError, AttributeError):
            fn_vec = np.vectorize(fn, signature=signature)
            out = fn_vec(np.asarray(data))

        res_dims = ('z',) + tuple(dims_out)
        res = DataArray(out, dims=res_dims)
        res._coords = {k: v for k, v in stacked._coords.items()
                       if set(v.dims).issubset(set(res_dims))}
        res.attrs[_stack_attr()] = stacked.attrs[_stack_attr()]
        res = res.unstack()
        return res.transpose(*output_dims)

    if isinstance(ds, DataArray):
        result = _apply_da(ds)
    else:
        result = ds.map(_apply_da)
        # prune coordinates whose dimensions were consumed by fn
        live_dims = set()
        for v in result._variables.values():
            live_dims |= set(v.dims)
        result._coords = {
            k: v for k, v in result._coords.items()
            if set(v.dims).issubset(live_dims)}

    if isinstance(result, DataArray) and 'var' in result.dims:
        result = expand_variables(result, dim='var')
    return result


def _stack_attr():
    from .core.dataarray import _STACK_ATTR
    return _STACK_ATTR


def extract_arguments(fn, args, kwargs):
    """Match ``args``/``kwargs`` to fn's named parameters; whatever
    does not fit lands in the ``'args'`` / ``'kwargs'`` entries of the
    returned dict (always present, even when empty). ``self`` is
    ignored so unbound methods can be passed directly.
    """
    params = [p for p in inspect.signature(fn).parameters.values()
              if p.name != 'self']
    named = [p for p in params
             if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD,
                           p.KEYWORD_ONLY)]
    out = OrderedDict()
    overflow_pos = []
    for i, value in enumerate(args):
        slot = named[i] if i < len(named) else None
        if slot is not None and slot.kind != slot.KEYWORD_ONLY:
            out[slot.name] = value
        else:
            overflow_pos.append(value)
    overflow_kw = {}
    by_name = {p.name: p for p in named}
    for key, value in kwargs.items():
        if key in out:
            raise TypeError('%s() got multiple values for %r'
                            % (getattr(fn, '__name__', fn), key))
        if key in by_name:
            out[key] = value
        else:
            overflow_kw[key] = value
    for p in named:
        if p.name not in out:
            if p.default is inspect.Parameter.empty:
                raise TypeError('%s() missing required argument: %r'
                                % (getattr(fn, '__name__', fn), p.name))
            out[p.name] = p.default
    out['args'] = tuple(overflow_pos)
    out['kwargs'] = overflow_kw
    return out
