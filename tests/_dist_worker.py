"""Worker for the real multi-process DCN test (spawned by
tests/test_distributed_multiprocess.py — one OS process per simulated
host, 2 local CPU devices each, coordinated over localhost like a pod
slice's DCN).

Exercises the full nd_tpu.parallel.distributed surface: initialize,
process_info, global_mesh (y across processes / x across local
devices), host_local_slices (each host loads ONLY its slice) and
cube_from_process_tiles (global sharded assembly), then a jitted
cross-process reduction whose collective rides the distributed
backend.
"""

import os
import sys


def main():
    proc = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

    import jax

    jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from nd_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address='127.0.0.1:' + port,
                    num_processes=nproc, process_id=proc)

    pi, pc, local = dist.process_info()
    assert pi == proc and pc == nproc and local == 2, (pi, pc, local)

    mesh = dist.global_mesh()              # (nproc, 2): y over DCN
    global_shape = (12, 8, 3)              # (y, x, time)
    sl = dist.host_local_slices(mesh, global_shape)

    # every "host" synthesizes the same deterministic cube but LOADS
    # only its slice — the full array never exists on one process
    full = np.arange(np.prod(global_shape), dtype=np.float32) \
        .reshape(global_shape)
    local_tile = full[sl['y'], sl['x']]
    expected_rows = 12 // nproc
    assert local_tile.shape == (expected_rows, 8, 3), local_tile.shape

    arr = dist.cube_from_process_tiles(local_tile, mesh, global_shape)
    assert arr.shape == tuple(global_shape)

    from jax.sharding import NamedSharding, PartitionSpec as P

    # cross-process reduction: the psum over the y axis crosses the
    # process boundary (Gloo here, DCN on a real pod)
    total = jax.jit(
        lambda a: (2.0 * a + 1.0).sum(),
        out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(np.asarray(jax.device_get(total)))
    want = float((2.0 * full + 1.0).sum())
    assert abs(got - want) <= 1e-3 * abs(want), (got, want)

    # halo exchange across the process boundary: a 3x3 mean stencil
    # sharded over the (process, local-device) mesh — the y-halo
    # ppermute crosses DCN — must equal the unsharded stencil
    import jax.numpy as jnp

    from nd_tpu.ops.conv import convolve
    from nd_tpu.parallel.halo import shard_apply

    kernel = jnp.ones((3, 3), jnp.float32) / 9

    def stencil(x):
        return convolve(x, kernel, axes=(0, 1), mode='reflect')

    plane = full[..., 0]
    ref = np.asarray(stencil(jnp.asarray(plane)))
    g = dist.cube_from_process_tiles(local_tile[..., 0], mesh,
                                     plane.shape)
    out = shard_apply(stencil, g, mesh, {'y': (0, 1), 'x': (1, 1)},
                      mode='symmetric')
    for shard in out.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   ref[shard.index], atol=1e-5)

    print('WORKER_OK %d %.1f' % (proc, got), flush=True)


if __name__ == '__main__':
    main()
