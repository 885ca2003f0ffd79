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
