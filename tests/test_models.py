"""Flagship pipeline + driver entry tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nd_tpu.models import SARChangePipeline, change_features, multilook
from nd_tpu.parallel import get_mesh


def _cube(ny=32, nx=32, k=6, seed=0):
    rng = np.random.RandomState(seed)
    cube = np.abs(rng.normal(1.0, 0.2, size=(ny, nx, k, 4))) \
        .astype(np.float32)
    cube[..., 1] *= 0.05
    cube[..., 2] *= 0.05
    cube[:, :, k // 2:, 0] += 2.0
    cube[:, :, k // 2:, 3] += 2.0
    return cube


def test_forward_detects_step():
    pipe = SARChangePipeline(ml=3, alpha=0.9)
    cube = _cube()
    change = np.asarray(jax.jit(pipe.forward)(jnp.asarray(cube)))
    assert change.shape == (32, 32, 6)
    # most pixels flag the step
    assert change.any(axis=-1).mean() > 0.5


def test_change_features_shape():
    feats = np.asarray(change_features(jnp.asarray(_cube()), n=9))
    assert feats.shape == (32, 32, SARChangePipeline.N_FEATURES)
    assert np.isfinite(feats).all()


def test_multilook_matches_boxcar():
    from nd_tpu.ops.conv import convolve
    cube = jnp.asarray(_cube())
    out = multilook(cube, 3)
    ref = convolve(cube, jnp.ones((3, 3)) / 9, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)


def test_train_step_reduces_loss():
    pipe = SARChangePipeline(ml=3, alpha=0.9, n_classes=2, lr=0.1)
    cube = jnp.asarray(_cube())
    labels = jnp.asarray(
        (np.arange(32)[:, None] + np.arange(32)[None, :]) % 2,
        jnp.int32)
    params = pipe.init_params()
    step = jax.jit(pipe.train_step)
    losses = []
    for _ in range(15):
        params, loss = step(params, cube, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_sharded_step_matches_single_device():
    mesh = get_mesh()
    pipe = SARChangePipeline(ml=3, alpha=0.9)
    cube = jnp.asarray(_cube(ny=16, nx=32))
    labels = jnp.asarray(np.zeros((16, 32)), jnp.int32)
    params = pipe.init_params()

    p1, l1 = jax.jit(pipe.train_step)(params, cube, labels)
    step, ds_shard, lb_shard = pipe.make_sharded_step(mesh)
    cube_s = jax.device_put(cube, ds_shard)
    labels_s = jax.device_put(labels, lb_shard)
    p2, l2 = step(params, cube_s, labels_s)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in ('w', 'b'):
        np.testing.assert_allclose(np.asarray(p1[k]),
                                   np.asarray(p2[k]), rtol=1e-5,
                                   atol=1e-7)


def test_graft_entry():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 64, 8)


def test_graft_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip
    from nd_tpu.ops.pallas_guard import pallas_disabled
    dryrun_multichip(8)
    # the dryrun's explicit Pallas gate exists for processes where an
    # accelerator backend won the default election before the CPU mesh
    # was built; in THIS process (default backend == mesh platform) it
    # must not fire — a process-wide disable here poisons every
    # Pallas-dispatch test that runs after this one
    assert not pallas_disabled()


def test_save_load_params(tmp_path):
    from nd_tpu.models.checkpoint import save_params, load_params
    pipe = SARChangePipeline()
    params = pipe.init_params()
    p = str(tmp_path / 'params.npz')
    save_params(params, p)
    back = load_params(p, like=params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(back[k]))


def test_orbax_checkpointer(tmp_path):
    from nd_tpu.models.checkpoint import Checkpointer
    pipe = SARChangePipeline()
    params = jax.tree_util.tree_map(np.asarray, pipe.init_params())
    ck = Checkpointer(str(tmp_path / 'ckpt'), max_to_keep=2)
    ck.save(0, params)
    ck.save(1, params)
    assert ck.latest_step() == 1
    back = ck.restore(like=params)
    np.testing.assert_array_equal(back['w'], params['w'])
    ck.close()
