"""Multi-host execution over DCN (jax.distributed).

The reference's multi-node story was the filesystem (NetCDF tiles +
dask, SURVEY §2.3); here a pod slice is driven with one process per
host: ICI carries the halo exchanges inside the slice
(``nd_tpu.parallel.halo``) and DCN carries only process coordination.
Each host loads its own tile files and contributes them to a global
sharded cube without ever materializing the full array on one host.
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = ['initialize', 'process_info', 'global_mesh',
           'cube_from_process_tiles', 'host_local_slices']


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """Initialize multi-process JAX (idempotent).

    On cloud TPU pods the arguments are auto-detected; pass them
    explicitly elsewhere.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            **kwargs)
    except RuntimeError as e:  # already initialized
        # jax <=0.4 raises '... is already initialized'; jax 0.9 raises
        # 'distributed.initialize should only be called once.'
        msg = str(e).lower()
        if 'already' not in msg and 'only be called once' not in msg:
            raise
        if coordinator_address is not None or process_id is not None:
            # a second call with explicit arguments cannot take
            # effect — the first configuration stays live; silence
            # here would let a caller believe it joined a different
            # cluster
            import warnings
            warnings.warn(
                'jax.distributed is already initialized; the '
                'arguments of this initialize() call are IGNORED '
                '(the first configuration stays in effect)',
                RuntimeWarning, stacklevel=2)


def process_info():
    """(process_index, process_count, local_device_count)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count())


def global_mesh(axis_names=('y', 'x'), shape=None):
    """A mesh over ALL devices of all processes.

    The y axis is laid out across processes (DCN boundary), the x axis
    across the local devices (ICI) by default, so halo ppermutes along x
    stay on-slice and only the y-halo crosses hosts.
    """
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        local = jax.local_device_count()
        shape = (n // local, local)
    dev_array = np.asarray(devices).reshape(shape)
    return jax.sharding.Mesh(dev_array, axis_names)


def host_local_slices(mesh, global_shape, dims=('y', 'x')):
    """The slice of the global cube this process is responsible for.

    Returns a dict dim -> slice for loading only the local tile from
    the tile store (nd_tpu.tiling) on each host.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P(*dims)
    sharding = NamedSharding(mesh, spec)
    # union of this process's addressable shards
    idx_map = sharding.addressable_devices_indices_map(
        tuple(global_shape))
    lo = [min(sl[d].start or 0 for sl in idx_map.values())
          for d in range(len(global_shape))]
    hi = [max(sl[d].stop if sl[d].stop is not None
              else global_shape[d] for sl in idx_map.values())
          for d in range(len(global_shape))]
    # the bounding box is only the process's slice when its shards
    # tile the box exactly — on meshes whose local devices wrap a
    # row, the box over-covers rows owned by OTHER processes and the
    # assembled cube would be silently wrong
    box_cells = int(np.prod([hi[d] - lo[d]
                             for d in range(len(global_shape))]))
    shard_cells = sum(
        int(np.prod([(sl[d].stop if sl[d].stop is not None
                      else global_shape[d]) - (sl[d].start or 0)
                     for d in range(len(global_shape))]))
        for sl in set(tuple(s) for s in idx_map.values()))
    if shard_cells != box_cells:
        raise ValueError(
            "this process's shards are not contiguous along the mesh "
            'dims (local devices wrap a mesh row); lay the mesh out '
            'with process-contiguous blocks (see global_mesh) or '
            'load per-shard instead of per-process')
    return {dim: slice(lo[i], hi[i]) for i, dim in enumerate(dims)}


def cube_from_process_tiles(local_array, mesh, global_shape,
                            dims=('y', 'x')):
    """Assemble a globally sharded array from per-process local tiles.

    ``local_array`` is this process's slice (as returned by
    :func:`host_local_slices`); no host ever holds the full cube.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    extra = len(global_shape) - len(dims)
    spec = P(*(list(dims) + [None] * extra))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_array), tuple(global_shape))
