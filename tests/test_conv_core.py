"""Factorized shift-add convolution core: separable kernels run as
unrolled per-axis shifted adds (faster AND more accurate on TPU than
the conv lowering, which multiplies in bf16); non-separable kernels
keep the general XLA convolution."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from nd_tpu.ops.conv import (_separable_factors, convolve,
                             gaussian_kernel1d, separable_convolve)


def test_separable_factors_uniform_and_rank1():
    f = _separable_factors(np.ones((3, 3)) / 9)
    assert f is not None and len(f) == 2
    k = np.outer(f[0], f[1])
    np.testing.assert_allclose(k, np.ones((3, 3)) / 9, atol=1e-12)

    g = gaussian_kernel1d(1.2)
    outer = np.outer(g, g)
    f = _separable_factors(outer)
    assert f is not None
    np.testing.assert_allclose(np.outer(f[0], f[1]), outer, atol=1e-12)

    # 3-d uniform (boxcar over 3 dims)
    f = _separable_factors(np.full((3, 3, 3), 1 / 27))
    assert f is not None and len(f) == 3
    prod = np.einsum('i,j,k->ijk', *f)
    np.testing.assert_allclose(prod, np.full((3, 3, 3), 1 / 27),
                               atol=1e-12)


def test_separable_factors_rejects_full_rank():
    k = np.array([[1.0, 0.0, -1.0],
                  [2.0, 0.0, -2.0],
                  [1.0, 1.0, -1.0]])          # rank 2
    assert _separable_factors(k) is None


@pytest.mark.parametrize('mode', ['reflect', 'nearest', 'constant',
                                  'mirror', 'wrap'])
def test_separable_kernel_matches_scipy(mode):
    rng = np.random.RandomState(0)
    arr = rng.rand(20, 24, 3).astype(np.float64)
    g = gaussian_kernel1d(0.9)
    kernel = np.outer(g, g)
    ref = ndimage.convolve(arr, kernel[:, :, None], mode=mode, cval=0.5)
    got = np.asarray(convolve(jnp.asarray(arr), jnp.asarray(kernel),
                              axes=(0, 1), mode=mode, cval=0.5))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_asymmetric_separable_kernel_flip_semantics():
    # a NON-symmetric separable kernel exercises the flip handling of
    # the factorized path (scipy convolve flips; correlation doesn't)
    rng = np.random.RandomState(1)
    arr = rng.rand(16, 18).astype(np.float64)
    ky = np.array([0.1, 0.5, 0.2, 0.2])
    kx = np.array([0.7, 0.2, 0.1])
    kernel = np.outer(ky, kx)
    ref = ndimage.convolve(arr, kernel, mode='reflect')
    got = np.asarray(convolve(jnp.asarray(arr), jnp.asarray(kernel),
                              axes=(0, 1), mode='reflect'))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_non_separable_kernel_still_exact():
    rng = np.random.RandomState(2)
    arr = rng.rand(14, 15).astype(np.float64)
    kernel = rng.rand(3, 3)                   # full rank
    ref = ndimage.convolve(arr, kernel, mode='reflect')
    got = np.asarray(convolve(jnp.asarray(arr), jnp.asarray(kernel),
                              axes=(0, 1), mode='reflect'))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_separable_convolve_shift_add_matches_scipy():
    rng = np.random.RandomState(3)
    arr = rng.rand(22, 26, 2).astype(np.float64)
    g = gaussian_kernel1d(1.5)
    ref = ndimage.convolve1d(arr, g, axis=0, mode='reflect')
    ref = ndimage.convolve1d(ref, g, axis=1, mode='reflect')
    got = np.asarray(separable_convolve(jnp.asarray(arr), [g, g],
                                        axes=(0, 1)))
    np.testing.assert_allclose(got, ref, atol=1e-10)
