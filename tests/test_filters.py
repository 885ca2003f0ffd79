"""Filter tests: oracle parity vs scipy, NLMeans parity vs a literal
loop oracle, contract tests, parallel == serial equivalence."""

import numpy as np
import pytest
import scipy.ndimage as snf

from nd_tpu.filters import (BoxcarFilter, ConvolutionFilter,
                            GaussianFilter, NLMeansFilter, boxcar,
                            convolution, gaussian, nlmeans)
from nd_tpu.testing import (assert_equal_data, generate_test_dataset,
                            generate_test_dataarray)

from reference_impls import nlmeans_oracle

ALL_FILTERS = [
    lambda: ConvolutionFilter(kernel=np.random.RandomState(0)
                              .rand(3, 3)),
    lambda: BoxcarFilter(w=3),
    lambda: GaussianFilter(sigma=1.5),
    lambda: NLMeansFilter(r=1, f=1, sigma=1, h=1),
]


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 16, 'x': 14, 'time': 5})


# ---------------------------------------------------------------------------
# generic contract tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('make', ALL_FILTERS)
def test_filter_output_contract(make, ds):
    f = make()
    out = f.apply(ds)
    assert type(out) is type(ds)
    assert out.sizes == ds.sizes
    assert set(out.data_vars) == set(ds.data_vars)
    for v in ds.data_vars:
        assert out[v].dims == ds[v].dims


@pytest.mark.parametrize('make', ALL_FILTERS)
def test_filter_dim_order_invariance(make, ds):
    f = make()
    out1 = f.apply(ds)
    out2 = f.apply(ds.transpose('time', 'x', 'y'))
    for v in ds.data_vars:
        np.testing.assert_allclose(
            out1[v].values,
            out2[v].transpose(*out1[v].dims).values, rtol=1e-10)


@pytest.mark.parametrize('make', ALL_FILTERS)
def test_parallelized_filter(make, ds):
    """parallel == serial, which also validates the halo (_buffer)."""
    f = make()
    serial = f.apply(ds)
    parallel = f.apply(ds, njobs=3)
    assert_equal_data(serial, parallel, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# oracle tests vs scipy
# ---------------------------------------------------------------------------

def test_convolution_vs_scipy(ds):
    kernel = np.random.RandomState(1).rand(3, 5)
    out = ConvolutionFilter(dims=('y', 'x'), kernel=kernel).apply(ds)
    for v in ds.data_vars:
        ref = snf.convolve(ds[v].values,
                           kernel.reshape(3, 5, 1), mode='reflect')
        np.testing.assert_allclose(out[v].values, ref, atol=1e-10)


def test_convolution_identity(ds):
    kernel = np.zeros((3, 3))
    kernel[1, 1] = 1
    out = ConvolutionFilter(kernel=kernel).apply(ds)
    assert_equal_data(out, ds, atol=1e-12)


def test_boxcar_equals_convolution(ds):
    w = 3
    out1 = BoxcarFilter(w=w).apply(ds)
    out2 = ConvolutionFilter(kernel=np.ones((w, w)) / w ** 2).apply(ds)
    assert_equal_data(out1, out2, atol=1e-12)


def test_boxcar_3d(ds):
    out = BoxcarFilter(dims=('y', 'x', 'time'), w=3).apply(ds)
    for v in ds.data_vars:
        ref = snf.uniform_filter(ds[v].values, size=3, mode='reflect')
        np.testing.assert_allclose(out[v].values, ref, atol=1e-8)


@pytest.mark.parametrize('sigma', [0.5, 1.0, 2.5])
def test_gaussian_vs_scipy(ds, sigma):
    out = GaussianFilter(dims=('y', 'x'), sigma=sigma).apply(ds)
    for v in ds.data_vars:
        ref = snf.gaussian_filter(ds[v].values, sigma=[sigma, sigma, 0],
                                  mode='reflect')
        np.testing.assert_allclose(out[v].values, ref, atol=1e-10)


def test_gaussian_spatiotemporal(ds):
    out = GaussianFilter(dims=('y', 'x', 'time'),
                         sigma=[1, 2, 0.5]).apply(ds)
    for v in ds.data_vars:
        ref = snf.gaussian_filter(ds[v].values, sigma=[1, 2, 0.5],
                                  mode='reflect')
        np.testing.assert_allclose(out[v].values, ref, atol=1e-10)


def test_convolution_complex():
    ds = generate_test_dataset(dims={'y': 10, 'x': 12, 'time': 3})
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    del dsc['C12__re']
    del dsc['C12__im']
    kernel = np.random.RandomState(2).rand(3, 3)
    out = ConvolutionFilter(kernel=kernel).apply(dsc)
    ref_re = snf.convolve(np.real(dsc['C12'].values),
                          kernel.reshape(3, 3, 1), mode='reflect')
    ref_im = snf.convolve(np.imag(dsc['C12'].values),
                          kernel.reshape(3, 3, 1), mode='reflect')
    np.testing.assert_allclose(np.real(out['C12'].values), ref_re,
                               atol=1e-10)
    np.testing.assert_allclose(np.imag(out['C12'].values), ref_im,
                               atol=1e-10)


# ---------------------------------------------------------------------------
# NLMeans
# ---------------------------------------------------------------------------

def test_nlmeans_vs_oracle():
    ds = generate_test_dataset(dims={'y': 8, 'x': 7, 'time': 3})
    out = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5,
                        h=0.8).apply(ds)
    arr = ds.to_array().transpose('y', 'x', 'time', 'variable').values
    ref = nlmeans_oracle(arr, r=(1, 1, 0), f=(1, 1, 0), sigma=0.5, h=0.8)
    got = out.to_array().transpose('y', 'x', 'time', 'variable').values
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_nlmeans_3d_vs_oracle():
    ds = generate_test_dataset(dims={'y': 6, 'x': 6, 'time': 4})
    out = NLMeansFilter(dims=('y', 'x', 'time'), r=[1, 1, 1], f=1,
                        sigma=0.3, h=0.5).apply(ds)
    arr = ds.to_array().transpose('y', 'x', 'time', 'variable').values
    ref = nlmeans_oracle(arr, r=(1, 1, 1), f=(1, 1, 1), sigma=0.3, h=0.5)
    got = out.to_array().transpose('y', 'x', 'time', 'variable').values
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_nlmeans_n_eff_vs_oracle():
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 2})
    out = NLMeansFilter(dims=('y', 'x'), r=2, f=1, sigma=2, h=2,
                        n_eff=4).apply(ds)
    arr = ds.to_array().transpose('y', 'x', 'time', 'variable').values
    ref = nlmeans_oracle(arr, r=(2, 2, 0), f=(1, 1, 0), sigma=2, h=2,
                         n_eff=4)
    got = out.to_array().transpose('y', 'x', 'time', 'variable').values
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)


def test_nlmeans_r0_identity():
    """r=0 means no neighborhood: the filter is the identity."""
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 3})
    out = NLMeansFilter(dims=('y', 'x'), r=0, f=1, sigma=1, h=1).apply(ds)
    assert_equal_data(out, ds, atol=1e-12)


def test_nlmeans_reduces_noise():
    ds = generate_test_dataset(dims={'y': 30, 'x': 30, 'time': 2})
    out = NLMeansFilter(dims=('y', 'x'), r=2, f=1, sigma=1,
                        h=1).apply(ds)
    for v in ds.data_vars:
        assert (np.nanstd(out[v].values)
                < np.nanstd(ds[v].values))


def test_nlmeans_time_slices_independent():
    """With r_time = 0, each time slice is filtered independently."""
    ds = generate_test_dataset(dims={'y': 10, 'x': 10, 'time': 4})
    out_full = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5,
                             h=0.7).apply(ds)
    sl = ds.isel(time=slice(0, 1))
    out_slice = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.5,
                              h=0.7).apply(sl)
    for v in ds.data_vars:
        np.testing.assert_allclose(
            out_full[v].isel(time=0).values,
            out_slice[v].isel(time=0).values, rtol=1e-10)


# ---------------------------------------------------------------------------
# functional wrappers
# ---------------------------------------------------------------------------

def test_functional_wrappers(ds):
    np.testing.assert_allclose(
        boxcar(ds, w=3)['C11'].values,
        BoxcarFilter(w=3).apply(ds)['C11'].values)
    np.testing.assert_allclose(
        gaussian(ds, sigma=1.0)['C11'].values,
        GaussianFilter(sigma=1.0).apply(ds)['C11'].values)
    k = np.random.RandomState(3).rand(3, 3)
    np.testing.assert_allclose(
        convolution(ds, kernel=k)['C11'].values,
        ConvolutionFilter(kernel=k).apply(ds)['C11'].values)
    np.testing.assert_allclose(
        nlmeans(ds, r=1, f=1, sigma=1, h=1)['C11'].values,
        NLMeansFilter(r=1, f=1, sigma=1, h=1).apply(ds)['C11'].values)
