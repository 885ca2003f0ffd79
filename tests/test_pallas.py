"""Pallas kernel tests (interpret mode on CPU; the same code path runs
compiled on TPU — validated by bench.py on hardware)."""

import numpy as np
import pytest

from nd_tpu.ops.nlmeans import nlmeans
from nd_tpu.ops.nlmeans_pallas import nlmeans_spatial_pallas


@pytest.mark.parametrize('shape', [(20, 17, 3, 4), (9, 40, 1, 2)])
@pytest.mark.parametrize('rf', [(1, 1), (2, 1)])
def test_pallas_nlmeans_matches_xla(shape, rf):
    r, f = rf
    rng = np.random.RandomState(0)
    arr = rng.rand(*shape).astype(np.float32)
    ref = np.asarray(nlmeans(arr, (r, r, 0), (f, f, 0), 0.5, 0.8,
                             -1.0))
    got = np.asarray(nlmeans_spatial_pallas(
        arr, (r, r), (f, f), 0.5, 0.8, -1.0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_pallas_nlmeans_n_eff():
    rng = np.random.RandomState(1)
    arr = rng.rand(16, 16, 2, 4).astype(np.float32)
    ref = np.asarray(nlmeans(arr, (2, 2, 0), (1, 1, 0), 2.0, 2.0, 4.0))
    got = np.asarray(nlmeans_spatial_pallas(
        arr, (2, 2), (1, 1), 2.0, 2.0, 4.0, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('shape,alpha,n', [
    ((48, 40, 8), 0.99, 9),
    ((16, 24, 6), 0.9, 4),
    ((20, 130, 12), 0.99, 9),
])
def test_pallas_omnibus_matches_xla_f32(shape, alpha, n):
    from nd_tpu.ops.change import change_detection
    from nd_tpu.ops.change_pallas import change_detection_pallas
    rng = np.random.RandomState(0)
    ny, nx, k = shape
    cube = np.abs(rng.normal(1, 0.3, size=(ny, nx, k, 4))) \
        .astype(np.float32)
    cube[..., 1:3] *= 0.2
    cube[:, :, k // 2:, 0] += 2.0
    cube[:, :, k // 2:, 3] += 2.0
    ref = np.asarray(change_detection(cube, alpha=alpha, n=n,
                                      stat_dtype='float32'))
    got = np.asarray(change_detection_pallas(cube, alpha=alpha, n=n,
                                             interpret=True))
    np.testing.assert_array_equal(got, ref)
