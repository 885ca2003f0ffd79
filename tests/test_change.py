"""Omnibus change detection: parity vs the literal oracle, step-change
localization, contracts."""

import numpy as np
import pytest

from nd_tpu.change import ChangeDetection, OmnibusTest, omnibus
from nd_tpu.ops.change import change_detection, omnibus_probabilities
from nd_tpu.ops.stats import chi2_cdf
from nd_tpu.testing import generate_test_dataset

from reference_impls import (change_detection_oracle,
                             omnibus_probability)


def _step_change_cube(ny=8, nx=8, k=10, t_change=5, seed=0):
    """A C2 cube with an abrupt intensity step at t_change."""
    rng = np.random.RandomState(seed)
    ds = generate_test_dataset(dims={'y': ny, 'x': nx, 'time': k},
                               mean=[1, 0, 0, 1], sigma=0.1,
                               random_seed=seed)
    for v, m in [('C11', 5.0), ('C22', 5.0)]:
        data = ds[v].values
        data[:, :, t_change:] += m
        ds[v] = (ds[v].dims, data)
    # make diagonal entries positive and the matrix PSD-ish
    for v in ('C11', 'C22'):
        ds[v] = (ds[v].dims, np.abs(ds[v].values) + 0.5)
    for v in ('C12__re', 'C12__im'):
        ds[v] = (ds[v].dims, ds[v].values * 0.05)
    return ds


def test_chi2_cdf_vs_scipy():
    from scipy.stats import chi2
    x = np.linspace(0, 80, 200)
    for df in (3.0, 4.0, 7.0, 16.0):
        ref = chi2.cdf(x, df)
        got = np.asarray(chi2_cdf(x, df))
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_omnibus_probability_vs_oracle():
    rng = np.random.RandomState(1)
    for n in (1, 9):
        ts = np.abs(rng.normal(1, 0.2, size=(7, 4)))
        ts[:, 1:3] *= 0.1
        ref = omnibus_probability(ts, n)
        got = float(omnibus_probabilities(ts[None, None], n=n)[0, 0])
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_change_detection_vs_oracle():
    ds = _step_change_cube()
    values = np.stack([ds['C11'].values, ds['C12__re'].values,
                       ds['C12__im'].values, ds['C22'].values], axis=-1)
    alpha = 0.99
    ref = change_detection_oracle(values, alpha=alpha, n=9)
    got = np.asarray(change_detection(values, alpha=alpha, n=9))
    np.testing.assert_array_equal(got, ref)


def test_change_detection_vs_oracle_noisy():
    """Random (non-PSD-guaranteed) data: NaN handling must match too."""
    rng = np.random.RandomState(3)
    values = rng.normal(1, 0.5, size=(6, 5, 8, 4))
    for alpha in (0.5, 0.9, 0.99):
        ref = change_detection_oracle(values, alpha=alpha, n=4)
        got = np.asarray(change_detection(values, alpha=alpha, n=4))
        np.testing.assert_array_equal(got, ref)


def test_omnibus_step_change_detected():
    ds = _step_change_cube(t_change=5)
    result = OmnibusTest(n=9, alpha=0.9).apply(ds)
    change = result.values
    assert change.shape == (8, 8, 10)
    # change detected at exactly t=5, everywhere
    assert change[:, :, 5].all()
    # and nowhere else
    assert not change[:, :, :5].any()
    assert not change[:, :, 6:].any()


def test_omnibus_complex_input():
    ds = _step_change_cube()
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    del dsc['C12__re']
    del dsc['C12__im']
    r1 = OmnibusTest(n=9, alpha=0.99).apply(ds)
    r2 = OmnibusTest(n=9, alpha=0.99).apply(dsc)
    np.testing.assert_array_equal(r1.values, r2.values)


def test_omnibus_multilook():
    ds = _step_change_cube(ny=12, nx=12)
    result = OmnibusTest(ml=3, alpha=0.9).apply(ds)
    assert result.values[:, :, 5].all()


def test_omnibus_functional_wrapper():
    ds = _step_change_cube()
    r1 = omnibus(ds, n=9, alpha=0.99)
    r2 = OmnibusTest(n=9, alpha=0.99).apply(ds)
    np.testing.assert_array_equal(r1.values, r2.values)


def test_omnibus_output_metadata():
    ds = _step_change_cube()
    result = OmnibusTest(n=9, alpha=0.99).apply(ds)
    assert result.name == 'change'
    assert result.dims == ('y', 'x', 'time')
    np.testing.assert_array_equal(result['time'].values,
                                  ds['time'].values)
    np.testing.assert_array_equal(result['y'].values, ds['y'].values)
    assert result.attrs.get('crs') == ds.attrs.get('crs')


def test_change_detection_is_abstract():
    with pytest.raises(TypeError):
        ChangeDetection(njobs=2)


def test_change_detection_long_series():
    """k > 31 exercises the multi-word bit packing and deep scans."""
    rng = np.random.RandomState(7)
    k = 36
    values = np.abs(rng.normal(1, 0.2, size=(6, 5, k, 4))) \
        .astype(np.float32)
    values[..., 1:3] *= 0.2
    values[:, :, 12:, 0] *= 3.0
    values[:, :, 24:, 3] *= 0.3
    from reference_impls import change_detection_oracle
    ref = change_detection_oracle(values.astype(np.float64),
                                  alpha=0.95, n=9)
    got = np.asarray(change_detection(values, alpha=0.95, n=9,
                                      stat_dtype='float64'))
    np.testing.assert_array_equal(got, ref)


def test_hybrid_cpu_fallback():
    """On CPU the hybrid helper falls back to the exact device path."""
    from nd_tpu.ops.change import change_detection_hybrid
    rng = np.random.RandomState(1)
    values = np.abs(rng.normal(1, 0.2, size=(8, 8, 6, 4))) \
        .astype(np.float32)
    values[..., 1:3] *= 0.2
    out = change_detection_hybrid(values, alpha=0.9, n=9)
    ref = np.asarray(change_detection(values, alpha=0.9, n=9))
    np.testing.assert_array_equal(out, ref)


def test_single_pixel_exact_matches_oracle():
    from nd_tpu.ops.change import _single_pixel_exact
    from reference_impls import single_pixel_change_oracle
    rng = np.random.RandomState(2)
    for _ in range(20):
        ts = np.abs(rng.normal(1, 0.4, size=(9, 4)))
        ts[:, 1:3] *= 0.2
        got = _single_pixel_exact(ts, 0.9, 9)
        ref = single_pixel_change_oracle(ts, 0.9, 9)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize('n', [1, 4, 9, 25])
@pytest.mark.parametrize('alpha', [0.5, 0.9, 0.99, 0.999])
def test_threshold_equivalence_with_probability(n, alpha):
    """z > z*(j) must decide identically to P(z) > alpha for every
    window length — the core soundness assumption of the device
    kernels (P is monotone in z)."""
    from scipy.stats import chi2
    from nd_tpu.ops.change import omnibus_rho, omnibus_thresholds

    k = 16
    thresholds = omnibus_thresholds(k, n, alpha)
    for j in range(2, k + 1):
        rho = float(omnibus_rho(j, n))
        f = (j - 1) * 4.0
        omega2 = (4.0 * 3.0 / (24 * rho ** 2)
                  * (j / n ** 2 - 1 / (n * j) ** 2)
                  - 4.0 * (j - 1) / 4 * (1 - 1 / rho) ** 2)
        zs = np.concatenate([
            np.linspace(0, 4 * thresholds[j], 2000),
            thresholds[j] * (1 + np.linspace(-1e-6, 1e-6, 200)),
        ])
        P = chi2.cdf(zs, f) + omega2 * (chi2.cdf(zs, f + 4)
                                        - chi2.cdf(zs, f))
        want = P > alpha
        got = zs > thresholds[j]
        np.testing.assert_array_equal(got, want,
                                      err_msg='j=%d' % j)


def test_chi2_cdf_integer_input():
    """Integer statistics must not crash under x64 (mixed-dtype igamma)."""
    from scipy.stats import chi2
    got = np.asarray(chi2_cdf(np.array([0, 4, 9]), 2))
    np.testing.assert_allclose(got, chi2.cdf([0, 4, 9], 2), atol=1e-12)


def test_native_singular_step_detected():
    """A zero-filled acquisition (singular determinant -> z=+inf) must
    be flagged by the native kernel like scipy/TPU (chi2_cdf(inf)=1);
    the continued fraction used to yield NaN and silently miss it."""
    pytest.importorskip('ctypes')
    from nd_tpu._native import NativeUnavailable, change_detection_native
    rng = np.random.RandomState(0)
    v = np.abs(rng.normal(1, .1, (2, 2, 6, 4))).astype(np.float64)
    v[..., 1] *= .01
    v[..., 2] *= .01
    v[:, :, 3, :] = 0.0                     # singular time step
    try:
        out = change_detection_native(v, alpha=0.9, n=9)
    except NativeUnavailable:
        pytest.skip('native lib unavailable')
    assert out[:, :, 3].all()


def test_native_rejects_bad_channel_count():
    from nd_tpu._native import NativeUnavailable, change_detection_native
    try:
        with pytest.raises(ValueError):
            change_detection_native(np.ones((2, 2, 4, 3)), alpha=0.9)
    except NativeUnavailable:
        pytest.skip('native lib unavailable')


def test_mixed_decisions_batch_shape_invariant():
    """A pixel's 'mixed' decisions are a function of its series alone.

    The interval sums accumulate with a strict left-to-right lax.scan
    (not jnp.cumsum, whose XLA lowering reassociates f32 adds
    differently per batch shape), so evaluating a pixel inside the
    full cube and re-evaluating it as a gathered row batch — exactly
    what the exact mode's f64 patch rescan does — must produce
    bit-identical flags. Guards ops/change.py change_detection's scan
    accumulation against regressing to a shape-dependent cumsum.
    """
    rng = np.random.RandomState(11)
    ny, nx, k = 10, 12, 16
    values = rng.normal(1, 0.4, size=(ny, nx, k, 4)).astype(np.float32)
    values[..., 0] = np.abs(values[..., 0]) + 0.3
    values[..., 3] = np.abs(values[..., 3]) + 0.3
    values[..., 1:3] *= 0.2
    alpha = 0.9
    full = np.asarray(change_detection(values, alpha=alpha, n=4))
    flat = values.reshape(ny * nx, k, 4)
    idx = rng.choice(ny * nx, size=23, replace=False)
    batch = flat[idx][:, None]              # (N, 1, k, 4) gathered rows
    got = np.asarray(change_detection(batch, alpha=alpha, n=4))
    np.testing.assert_array_equal(got[:, 0],
                                  full.reshape(ny * nx, k)[idx])
    # the unrolled straight-line graph makes the same decisions as the
    # while_loop driver (the patch rescan runs unrolled)
    unrolled = np.asarray(change_detection(values, alpha=alpha, n=4,
                                           unroll=True))
    np.testing.assert_array_equal(unrolled, full)
    # and the exact configuration the f64 patch rescan uses — unrolled
    # on a gathered row batch — matches the full cube directly
    got_unrolled = np.asarray(change_detection(batch, alpha=alpha, n=4,
                                               unroll=True))
    np.testing.assert_array_equal(got_unrolled[:, 0],
                                  full.reshape(ny * nx, k)[idx])


def test_omnibus_device_in_device_out():
    """A device-resident cube chained into OmnibusTest keeps its
    change map ON DEVICE (no forced host materialization — the round-4
    residency fix), with decisions identical to the host-input path."""
    import jax
    import jax.numpy as jnp

    from nd_tpu.change import OmnibusTest
    from nd_tpu.testing import generate_test_dataset

    ds = generate_test_dataset(dims={'y': 12, 'x': 14, 'time': 6})
    host = OmnibusTest(ml=3, alpha=0.9).apply(ds)
    assert isinstance(host.data, np.ndarray)       # numpy in, numpy out

    dev = ds.copy()
    for v in list(dev.data_vars):
        dev[v] = (dev[v].dims,
                  jnp.asarray(np.asarray(dev[v].values)))
    out = OmnibusTest(ml=3, alpha=0.9).apply(dev)
    assert isinstance(out.data, jax.Array)         # device in, device out
    np.testing.assert_array_equal(np.asarray(out.values),
                                  np.asarray(host.values))
