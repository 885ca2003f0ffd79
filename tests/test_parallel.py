"""Mesh-sharding tests on the 8-device CPU mesh: sharded == serial is
THE distributed correctness contract (mirrors the reference's
parallel==serial strategy, SURVEY §4.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nd_tpu.filters import (BoxcarFilter, ConvolutionFilter,
                            GaussianFilter, NLMeansFilter)
from nd_tpu.parallel import (apply_sharded, get_mesh, shard_apply,
                             shard_dataset, sharded_change_detection)
from nd_tpu.testing import assert_equal_data, generate_test_dataset


@pytest.fixture(scope='module')
def mesh():
    return get_mesh()  # 8 virtual CPU devices -> (2, 4) y/x mesh


def test_mesh_shape(mesh):
    assert len(jax.devices()) == 8
    assert dict(mesh.shape) == {'y': 2, 'x': 4}


def test_shard_apply_identity(mesh):
    arr = np.arange(64.).reshape(8, 8)
    out = shard_apply(lambda x: x, jnp.asarray(arr), mesh,
                      {'y': (0, 0), 'x': (1, 0)})
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_shard_apply_halo_stencil(mesh):
    """A 3x3 mean stencil sharded over the mesh == unsharded."""
    from nd_tpu.ops.conv import convolve
    rng = np.random.RandomState(0)
    arr = rng.rand(32, 40)
    kernel = jnp.ones((3, 3)) / 9

    def stencil(x):
        return convolve(x, kernel, axes=(0, 1), mode='reflect')

    ref = np.asarray(stencil(jnp.asarray(arr)))
    out = shard_apply(stencil, jnp.asarray(arr), mesh,
                      {'y': (0, 1), 'x': (1, 1)}, mode='symmetric')
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)


def test_shard_apply_non_divisible(mesh):
    """Global sizes that don't divide the mesh are padded and trimmed."""
    from nd_tpu.ops.conv import convolve
    rng = np.random.RandomState(1)
    arr = rng.rand(17, 23)
    kernel = jnp.ones((3, 3)) / 9

    def stencil(x):
        return convolve(x, kernel, axes=(0, 1), mode='reflect')

    ref = np.asarray(stencil(jnp.asarray(arr)))
    out = shard_apply(stencil, jnp.asarray(arr), mesh,
                      {'y': (0, 1), 'x': (1, 1)}, mode='symmetric')
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)


@pytest.mark.parametrize('make', [
    lambda: BoxcarFilter(w=3),
    lambda: ConvolutionFilter(kernel=np.random.RandomState(0)
                              .rand(3, 3)),
    lambda: GaussianFilter(sigma=1.5),
    lambda: NLMeansFilter(r=1, f=1, sigma=1, h=1),
])
def test_sharded_filter_equals_serial(mesh, make):
    ds = generate_test_dataset(dims={'y': 24, 'x': 32, 'time': 3})
    algo = make()
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_sharded_filter_non_divisible(mesh):
    ds = generate_test_dataset(dims={'y': 21, 'x': 19, 'time': 2})
    algo = BoxcarFilter(w=5)
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_shard_dataset_sharding(mesh):
    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 4})
    sharded = shard_dataset(ds, mesh)
    v = sharded['C11'].data
    assert v.sharding.spec == P('y', 'x', None)


def test_sharded_change_detection(mesh):
    from nd_tpu.change import OmnibusTest
    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 6},
                               mean=[1, 0, 0, 1], sigma=0.1)
    for v in ('C11', 'C22'):
        ds[v] = (ds[v].dims, np.abs(ds[v].values) + 0.5)
    serial = OmnibusTest(n=9, alpha=0.9).apply(ds)
    sharded = sharded_change_detection(ds, alpha=0.9, n=9, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(sharded.values),
                                  np.asarray(serial.values))


def test_sharded_change_with_multilook(mesh):
    from nd_tpu.change import OmnibusTest
    ds = generate_test_dataset(dims={'y': 24, 'x': 24, 'time': 6},
                               mean=[1, 0, 0, 1], sigma=0.1)
    for v in ('C11', 'C22'):
        ds[v] = (ds[v].dims, np.abs(ds[v].values) + 0.5)
    serial = OmnibusTest(ml=3, alpha=0.9).apply(ds)
    sharded = sharded_change_detection(ds, alpha=0.9, ml=3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(sharded.values),
                                  np.asarray(serial.values))


def test_one_dim_mesh():
    mesh1 = get_mesh(shape=(8,), axis_names=('y',))
    ds = generate_test_dataset(dims={'y': 32, 'x': 16, 'time': 2})
    algo = BoxcarFilter(w=3)
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh1)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_distributed_helpers_single_process(mesh):
    """Multi-host helpers degrade to single-process semantics."""
    from nd_tpu.parallel import distributed as dist

    idx, count, local = dist.process_info()
    assert idx == 0 and count == 1 and local == 8

    gmesh = dist.global_mesh()
    assert int(np.prod(tuple(gmesh.shape.values()))) == 8

    sl = dist.host_local_slices(gmesh, (32, 16), dims=('y', 'x'))
    assert sl['y'] == slice(0, 32)
    assert sl['x'] == slice(0, 16)

    local_arr = np.random.rand(32, 16).astype(np.float32)
    cube = dist.cube_from_process_tiles(local_arr, gmesh, (32, 16))
    np.testing.assert_allclose(np.asarray(cube), local_arr)


def test_sharded_reproject_equals_serial():
    from nd_tpu.parallel import sharded_reproject
    from nd_tpu.warp import reproject
    from nd_tpu.testing import generate_test_dataset
    # time=6 on 8 devices: falls back to the largest divisor (6)
    ds = generate_test_dataset(dims={'y': 24, 'x': 30, 'time': 6})
    serial = reproject(ds, crs='epsg:3857')
    sharded = sharded_reproject(ds, crs='epsg:3857')
    assert dict(sharded.sizes) == dict(serial.sizes)
    for v in serial.data_vars:
        np.testing.assert_allclose(
            np.asarray(sharded[v].values), np.asarray(serial[v].values),
            equal_nan=True)


def test_sharded_wrap_non_divisible_falls_back(mesh):
    """Periodic halos can't ride divisibility padding: wrap-mode
    filters on awkward sizes keep those axes replicated and still
    equal the serial result (a padded wrap exchange used to hand
    shard 0 pad rows instead of the true opposite edge)."""
    ds = generate_test_dataset(dims={'y': 10, 'x': 11, 'time': 2})
    algo = BoxcarFilter(w=3, mode='wrap')
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_sharded_constant_cval_forwarded(mesh):
    """mode='constant' with a nonzero cval must fill global edges with
    the kernel's cval, not 0."""
    ds = generate_test_dataset(dims={'y': 24, 'x': 32, 'time': 2})
    algo = BoxcarFilter(w=3, mode='constant', cval=2.5)
    serial = algo.apply(ds)
    sharded = apply_sharded(algo, ds, mesh=mesh)
    assert_equal_data(serial, sharded, rtol=1e-10, atol=1e-12)


def test_shard_apply_wrap_divisible(mesh):
    """Wrap halos on a divisible grid match numpy's periodic pad."""
    from nd_tpu.ops.conv import convolve
    rng = np.random.RandomState(1)
    arr = rng.rand(16, 16)
    k = jnp.ones((3, 3)) / 9

    def fn(x):
        return convolve(x, k, axes=(0, 1), mode='wrap')

    out = shard_apply(fn, jnp.asarray(arr), mesh,
                      {'y': (0, 1), 'x': (1, 1)}, mode='wrap')
    ref = fn(jnp.asarray(arr))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12)


def test_checkpoint_treedef_mismatch_raises(tmp_path):
    from nd_tpu.models.checkpoint import load_params, save_params
    p = str(tmp_path / 'ckpt.npz')
    save_params({'w': np.ones((2, 2)), 'b': np.zeros(2)}, p)
    ok = load_params(p, like={'w': 0, 'b': 0})
    assert set(ok) == {'w', 'b'}
    with pytest.raises(ValueError):
        load_params(p, like={'w': 0, 'b': 0, 'extra': 0})
