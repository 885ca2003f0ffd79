"""Mesh-sharded execution of datacube algorithms.

This is the device-level counterpart of ``Algorithm.apply(njobs=...)``:
instead of chunking on the host, the cube is sharded over a named device
mesh; windowed filters get their halos over the interconnect
(``nd_tpu.parallel.halo``), pixelwise kernels (change detection,
classification) are plainly data-parallel via NamedSharding and XLA's
partitioner. Results are bit-equal to single-device execution — the
multi-chip analogue of the reference's parallel==serial test contract
(SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import DataArray, Dataset
from ..core.variable import Variable
from .halo import shard_apply
from .mesh import get_mesh

__all__ = ['apply_sharded', 'shard_dataset', 'sharded_change_detection']

# numpy.pad-style boundary modes of each filter kernel family;
# scipy.ndimage 'reflect' (used by convolution filters) is numpy
# 'symmetric', the NLMeans _idx convention is numpy 'reflect'.
# Shared with the conv kernels so the halo-exchange boundary fill can
# never diverge from what convolve itself does.
from ..ops.conv import _SCIPY_TO_NP_PAD as _SCIPY_TO_NP


def _fit_mesh_to_dims(mesh, ds, dims, halos):
    """Shrink mesh axes that don't fit the data (shard >= halo rule)."""
    shape = []
    names = []
    for name in mesh.axis_names:
        n = mesh.shape[name]
        if name in dims:
            size = ds.sizes[name]
            halo = halos.get(name, 0)
            max_shards = max(1, size // max(2 * halo, 1))
            n = min(n, max_shards, size)
        shape.append(n)
        names.append(name)
    devices = np.asarray(mesh.devices).reshape(-1)
    total = int(np.prod(shape))
    return jax.sharding.Mesh(
        devices[:total].reshape(shape), tuple(names))


def _filter_pad_mode(algo):
    from ..filters import NLMeansFilter
    if isinstance(algo, NLMeansFilter):
        return 'reflect'
    mode = getattr(algo, 'kwargs', {}).get('mode', 'reflect')
    return _SCIPY_TO_NP.get(mode, 'symmetric')


def apply_sharded(algo, ds, mesh=None):
    """Apply a Filter algorithm sharded across the device mesh.

    The mesh axes named after dataset dims are sharded; the filter's
    ``_buffer(dim)`` supplies the halo per axis. Non-filter
    (batch) dims stay replicated within each shard's slab.

    Parameters
    ----------
    algo : nd_tpu.filters.Filter
    ds : Dataset or DataArray
    mesh : jax.sharding.Mesh, optional

    Returns
    -------
    Same type as ``ds``, equal to ``algo.apply(ds)``.
    """
    from ..filters import Filter
    from ..io import disassemble_complex
    from ..utils import get_vars_for_dims, expand_variables, is_complex

    if not isinstance(algo, Filter):
        raise TypeError('apply_sharded expects a Filter algorithm; use '
                        'sharded_change_detection or NamedSharding for '
                        'pixelwise ops.')

    mesh = mesh if mesh is not None else get_mesh()
    halos = {d: int(algo._buffer(d)) for d in mesh.axis_names}
    shard_dims = [d for d in mesh.axis_names
                  if d in ds.sizes and d in algo.dims]
    mesh = _fit_mesh_to_dims(mesh, ds, shard_dims, halos)
    # axes the fit shrank to a single shard need no halo exchange at
    # all — keeping them in shard_dims sent them through halo_pad,
    # whose halo<=shard-size guard then crashed for big-halo filters
    # on small axes (where the serial apply works fine)
    shard_dims = [d for d in shard_dims if mesh.shape[d] > 1]
    mode = _filter_pad_mode(algo)
    cval = float(getattr(algo, 'kwargs', {}).get('cval', 0.0))
    if mode == 'wrap':
        # periodic halos cannot ride divisibility padding (see
        # halo.shard_apply); keep such axes replicated instead
        shard_dims = [d for d in shard_dims
                      if ds.sizes[d] % mesh.shape[d] == 0]

    convert_complex = is_complex(ds) and not algo.supports_complex
    if convert_complex:
        ds = disassemble_complex(ds)

    def _run(arr, dims):
        axes = tuple(dims.index(d) for d in algo.dims)
        sharded_axes = {d: (dims.index(d), halos.get(d, 0))
                        for d in shard_dims if d in dims}
        if not sharded_axes:
            return algo._filter(jnp.asarray(arr), axes)
        return shard_apply(lambda x: algo._filter(x, axes),
                           jnp.asarray(arr), mesh, sharded_axes,
                           mode=mode, cval=cval)

    if isinstance(ds, DataArray):
        if algo.per_variable:
            out = ds.copy(deep=False)
            out.data = _run(ds.data, ds.dims)
            return out
        # joint-weight filters (NLMeans) expect the canonical layout
        # (filter dims..., extra dims..., variable) — same shim as
        # Filter.apply's DataArray branch
        ordered = algo.dims + tuple(d for d in tuple(ds.sizes)
                                    if d not in algo.dims)
        da_o = ds.transpose(*ordered)
        filtered = _run(da_o.data[..., None],
                        da_o.dims + ('variable',))[..., 0]
        return da_o._replace(filtered).transpose(*ds.dims)

    if algo.per_variable:
        result = ds.copy(deep=False)
        # same-layout variables stack into ONE sharded dispatch (the
        # stacking axis is a plain batch axis: `_run` indexes filter/
        # shard axes by dim name, so the +1 shift is automatic) —
        # mirrors Filter.apply's fusion, which exists because each
        # dispatch costs ~40 ms of host-link latency on tunneled hosts
        groups = {}
        for v in get_vars_for_dims(ds, algo.dims):
            key = (ds[v].dims, np.dtype(getattr(ds[v].data, 'dtype')))
            groups.setdefault(key, []).append(v)
        for (vdims, _), vs in groups.items():
            if len(vs) == 1:
                v = vs[0]
                filtered = _run(ds[v].data, vdims)
                result._variables[v] = Variable(vdims, filtered,
                                                ds[v].attrs)
                continue
            # stack TRAILING (not leading): the fused Pallas conv only
            # accepts filter taps on axes (0, 1, 2), so a leading stack
            # axis silently knocked every 3-axis filter (e.g. a
            # spatio-temporal boxcar) off the fused path under sharding
            stacked = jnp.stack([jnp.asarray(ds[v].data) for v in vs],
                                axis=-1)
            filtered = _run(stacked, tuple(vdims) + ('_stack_',))
            for i, v in enumerate(vs):
                result._variables[v] = Variable(vdims,
                                                filtered[..., i],
                                                ds[v].attrs)
        return result

    # joint-variable path (NLMeans)
    orig_dims = tuple(ds.sizes)
    ordered = algo.dims + tuple(d for d in orig_dims
                                if d not in algo.dims) + ('variable',)
    variables = get_vars_for_dims(ds, algo.dims)
    other = get_vars_for_dims(ds, algo.dims, invert=True)
    da = ds[variables].to_array().transpose(*ordered)
    filtered = _run(da.data, da.dims)
    result = expand_variables(da._replace(filtered))
    for v in result.data_vars:
        # original dim order first, broadcast extras appended (same
        # graceful handling as Filter.apply)
        have = result._variables[v].dims
        order = (tuple(d for d in ds[v].dims if d in have)
                 + tuple(d for d in have if d not in ds[v].dims))
        result._variables[v] = result._variables[v].transpose(*order)
    for v in other:
        result._variables[v] = ds._variables[v]
    result.attrs.update(ds.attrs)
    for ck, cv in ds._coords.items():
        result._coords.setdefault(ck, cv)
    return result


def shard_dataset(ds, mesh=None, dims=('y', 'x')):
    """Place dataset variables on the mesh with NamedSharding.

    Pixelwise kernels applied afterwards are partitioned automatically
    by XLA (no halo needed). Mesh axes that don't divide the
    corresponding dimension are shrunk to the largest divisor
    (NamedSharding requires even shards); ``sharded_change_detection``
    pads instead, to keep full parallelism.
    """
    mesh = mesh if mesh is not None else get_mesh()
    shape = []
    for name in mesh.axis_names:
        count = mesh.shape[name]
        if name in dims and name in ds.sizes:
            size = ds.sizes[name]
            count = min(count, size)
            while size % count:
                count -= 1
        shape.append(count)
    if tuple(shape) != tuple(mesh.shape.values()):
        devices = np.asarray(mesh.devices).reshape(-1)
        total = int(np.prod(shape))
        mesh = jax.sharding.Mesh(devices[:total].reshape(shape),
                                 tuple(mesh.axis_names))
    out = ds.copy(deep=False)
    for v, var in ds._variables.items():
        spec = P(*[d if (d in dims and d in mesh.axis_names) else None
                   for d in var.dims])
        sharding = NamedSharding(mesh, spec)
        out._variables[v] = Variable(
            var.dims, jax.device_put(jnp.asarray(var.data), sharding),
            var.attrs)
    return out


def sharded_change_detection(ds, alpha=0.01, ml=None, n=1, mesh=None):
    """Omnibus change detection data-parallel over the mesh.

    The (y, x) pixel grid is sharded; the time axis stays on-shard
    (the per-pixel scan needs the full series — SURVEY §5,
    long-context note). Multilook halos ride the halo engine.
    """
    from ..change import _omnibus_change_detection
    from ..filters import BoxcarFilter

    mesh = mesh if mesh is not None else get_mesh()

    work = ds
    if ml is not None:
        # halo-correct multilook across the mesh
        work = apply_sharded(BoxcarFilter(w=ml), ds, mesh=mesh)
        n = ml ** 2

    # pad (y, x) up to mesh-divisible sizes so NamedSharding keeps full
    # parallelism on awkward shapes; pixels are independent, so the pad
    # region cannot influence real pixels and is cropped afterwards
    ny, nx = work.sizes['y'], work.sizes['x']
    pad_y = (-ny) % mesh.shape.get('y', 1)
    pad_x = (-nx) % mesh.shape.get('x', 1)
    if pad_y or pad_x:
        work = work.pad(y=(0, pad_y), x=(0, pad_x), constant_values=0.0)

    sharded = shard_dataset(work, mesh, dims=('y', 'x'))
    result = _omnibus_change_detection(sharded, alpha=alpha, ml=None,
                                       n=n)
    if pad_y or pad_x:
        result = result.isel(y=slice(0, ny), x=slice(0, nx))
    return result


def sharded_reproject(ds, mesh=None, batch_dim='time', **kwargs):
    """Reprojection data-parallel over the device mesh.

    Warping is gather-based and needs arbitrary source pixels per
    output pixel, so the pixel grid itself is not sharded; instead the
    batch dimension (``time`` by default — the same axis the
    reference's process pool splits, warp.py:948) is sharded across
    all mesh devices and GSPMD partitions the batched gather. The
    destination coordinate grid is replicated (it is shared by every
    slice).

    Equal to ``reproject(ds, **kwargs)``; batch sizes that don't
    divide the device count use the largest divisor.
    """
    from ..warp import Reprojection

    mesh = mesh if mesh is not None else get_mesh()
    devices = np.asarray(mesh.devices).reshape(-1)
    n = len(devices)

    out = ds.copy(deep=False)
    size = ds.sizes.get(batch_dim, 1)
    count = min(n, size)
    while size % count:
        count -= 1
    if count > 1:
        bmesh = jax.sharding.Mesh(devices[:count], ('batch',))
        for v, var in ds._variables.items():
            if batch_dim not in var.dims:
                continue
            spec = P(*['batch' if d == batch_dim else None
                       for d in var.dims])
            out._variables[v] = Variable(
                var.dims,
                jax.device_put(jnp.asarray(var.data),
                               NamedSharding(bmesh, spec)),
                var.attrs)
    return Reprojection(**kwargs).apply(out)
