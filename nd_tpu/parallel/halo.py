"""Halo exchange over the device mesh.

The device-level equivalent of the reference's buffered split/merge
(``xr_split``/``xr_merge``, /root/reference/nd/utils.py:288-340): each
shard receives ``halo`` rows of real neighbor data over the interconnect
(``lax.ppermute`` — rides ICI on a TPU slice), global edges are filled
with the kernel's own boundary condition, the windowed kernel runs on
the padded shard, and the halo is trimmed from the result. Outputs are
bit-equal to the unsharded kernel as long as ``halo`` covers the kernel
radius — the same correctness contract as ``Algorithm._buffer``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = ['halo_pad', 'halo_trim', 'shard_apply']


def _boundary_slab(x, axis, halo, mode, side, cval=0.0):
    """The pad slab a global-boundary shard supplies for itself."""
    size = x.shape[axis]
    if mode == 'symmetric':
        sl = lax.slice_in_dim(x, 0, halo, axis=axis) if side == 'left' \
            else lax.slice_in_dim(x, size - halo, size, axis=axis)
        return jnp.flip(sl, axis=axis)
    if mode == 'reflect':
        sl = lax.slice_in_dim(x, 1, halo + 1, axis=axis) \
            if side == 'left' \
            else lax.slice_in_dim(x, size - halo - 1, size - 1, axis=axis)
        return jnp.flip(sl, axis=axis)
    if mode == 'edge':
        sl = lax.slice_in_dim(x, 0, 1, axis=axis) if side == 'left' \
            else lax.slice_in_dim(x, size - 1, size, axis=axis)
        reps = [1] * x.ndim
        reps[axis] = halo
        return jnp.tile(sl, reps)
    if mode == 'constant':
        shape = list(x.shape)
        shape[axis] = halo
        return jnp.full(shape, cval, x.dtype)
    raise ValueError('unsupported halo mode %r' % mode)


def halo_pad(x, axis_name, axis, halo, mode='symmetric', cval=0.0):
    """Pad a shard with ``halo`` entries per side along ``axis``.

    Interior sides receive real neighbor data via ppermute; global
    boundary sides are filled per ``mode`` (numpy.pad naming:
    'symmetric' == scipy.ndimage 'reflect').

    Must be called inside shard_map.
    """
    if halo == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    size = x.shape[axis]
    # 'reflect' (edge excluded) mirrors indices 1..halo, so it needs
    # one row more than the halo itself
    limit = size - 1 if mode == 'reflect' else size
    if halo > limit:
        raise ValueError(
            'halo (%d) exceeds the largest supported value (%d) for a '
            'shard of %d rows with mode %r along %r — use fewer shards'
            % (halo, limit, size, mode, axis_name))

    left_edge = lax.slice_in_dim(x, 0, halo, axis=axis)
    right_edge = lax.slice_in_dim(x, size - halo, size, axis=axis)

    if n > 1:
        from_left = lax.ppermute(right_edge, axis_name,
                                 [(j, j + 1) for j in range(n - 1)])
        from_right = lax.ppermute(left_edge, axis_name,
                                  [(j + 1, j) for j in range(n - 1)])
    else:
        from_left = jnp.zeros_like(right_edge)
        from_right = jnp.zeros_like(left_edge)

    if mode == 'wrap':
        wrap_left = lax.ppermute(right_edge, axis_name, [(n - 1, 0)]) \
            if n > 1 else right_edge
        wrap_right = lax.ppermute(left_edge, axis_name, [(0, n - 1)]) \
            if n > 1 else left_edge
        left_pad = jnp.where(idx == 0, wrap_left, from_left)
        right_pad = jnp.where(idx == n - 1, wrap_right, from_right)
    else:
        left_pad = jnp.where(idx == 0,
                             _boundary_slab(x, axis, halo, mode, 'left',
                                            cval),
                             from_left)
        right_pad = jnp.where(idx == n - 1,
                              _boundary_slab(x, axis, halo, mode,
                                             'right', cval),
                              from_right)

    return jnp.concatenate([left_pad, x, right_pad], axis=axis)


def halo_trim(x, axis, halo):
    """Drop ``halo`` entries from both ends of ``axis``."""
    if halo == 0:
        return x
    return lax.slice_in_dim(x, halo, x.shape[axis] - halo, axis=axis)


def shard_apply(fn, arr, mesh, sharded_axes, mode='symmetric',
                cval=0.0):
    """Run a windowed kernel sharded over a mesh with halo exchange.

    Parameters
    ----------
    fn : callable
        Array function; must produce an output of the same shape along
        the sharded axes (it sees the halo-padded shard and its output
        halo is trimmed).
    arr : array
        The global input array.
    mesh : jax.sharding.Mesh
    sharded_axes : dict
        ``{axis_name: (array_axis, halo)}``.
    mode : str, optional
        Boundary fill mode at the global edges (numpy.pad naming).
    """
    ndim = arr.ndim
    spec_entries = [None] * ndim
    for axis_name, (axis, _) in sharded_axes.items():
        spec_entries[axis] = axis_name
    spec = P(*spec_entries)

    # Pad the global array so every axis divides evenly across the mesh,
    # using the same boundary mode — trimmed off at the end, and
    # mode-consistent so edge outputs are unchanged.
    pads = [(0, 0)] * ndim
    global_trim = [None] * ndim
    padded = jnp.asarray(arr)
    if mode not in ('symmetric', 'reflect', 'edge', 'constant', 'wrap'):
        raise ValueError('unsupported boundary mode %r' % mode)
    np_mode = mode
    for axis_name, (axis, halo) in sharded_axes.items():
        n_shards = mesh.shape[axis_name]
        size = arr.shape[axis]
        rem = (-size) % n_shards
        if rem:
            if mode == 'wrap':
                # Padding breaks periodicity: the wrap exchange would
                # hand shard 0 rows from the pad region instead of the
                # true opposite edge, silently corrupting left-edge
                # outputs. Callers must pick a divisible decomposition
                # (apply_sharded drops such axes automatically).
                raise ValueError(
                    "mode='wrap' requires the %r axis size (%d) to "
                    'divide the mesh (%d shards)'
                    % (axis_name, size, n_shards))
            # The pad must be at least `halo` wide, otherwise outputs
            # near the true edge would see the last shard's local
            # boundary slab instead of the global boundary condition.
            while 0 < rem < halo:
                rem += n_shards
            pads[axis] = (0, rem)
            global_trim[axis] = size
    if any(p != (0, 0) for p in pads):
        kwargs = {'constant_values': cval} if np_mode == 'constant' \
            else {}
        padded = jnp.pad(padded, pads, mode=np_mode, **kwargs)

    def local_fn(x):
        for axis_name, (axis, halo) in sharded_axes.items():
            x = halo_pad(x, axis_name, axis, halo, mode=mode, cval=cval)
        y = fn(x)
        for axis_name, (axis, halo) in sharded_axes.items():
            y = halo_trim(y, axis, halo)
        return y

    # check_vma=False: Pallas kernels inside the shard can't annotate
    # their outputs' varying mesh axes; equality with the unsharded
    # kernel is covered by the parallel==serial test suite instead.
    sharded = jax.shard_map(local_fn, mesh=mesh, in_specs=spec,
                            out_specs=spec, check_vma=False)
    out = sharded(padded)

    # remove the divisibility padding
    slices = tuple(slice(0, global_trim[i]) for i in range(ndim))
    if any(s != slice(0, None) for s in slices):
        out = out[slices]
    return out
