"""Runtime Pallas->XLA fallback (VERDICT round-1 item 1).

A transient ``INTERNAL: TPU backend error`` in a Pallas launch voided
round 1's bench artifact; these tests pin the contract that a raising
Pallas path degrades to the numerically-identical XLA kernel.
"""

import warnings

import numpy as np
import pytest

import jax

from nd_tpu.ops import pallas_guard
from nd_tpu.ops.pallas_guard import (
    is_pallas_runtime_error, pallas_disabled, reset_pallas_strikes,
    run_with_fallback)


@pytest.fixture(autouse=True)
def _clean_guard_state():
    reset_pallas_strikes()
    yield
    reset_pallas_strikes()


def _launch_error():
    return jax.errors.JaxRuntimeError('INTERNAL: TPU backend error: '
                                      'Mosaic failure')


def test_is_pallas_runtime_error_classification():
    assert is_pallas_runtime_error(_launch_error())
    assert is_pallas_runtime_error(
        RuntimeError('RESOURCE_EXHAUSTED: out of memory'))
    assert not is_pallas_runtime_error(ValueError('INTERNAL'))
    assert not is_pallas_runtime_error(RuntimeError('shape mismatch'))


def test_run_with_fallback_retries_then_falls_back():
    calls = {'primary': 0, 'fallback': 0}

    def primary(x):
        calls['primary'] += 1
        raise _launch_error()

    def fallback(x):
        calls['fallback'] += 1
        return x * 2

    x = np.arange(4.0)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        out = run_with_fallback(primary, fallback, x)
    np.testing.assert_array_equal(out, x * 2)
    assert calls == {'primary': 2, 'fallback': 1}   # retry once


def test_run_with_fallback_transient_clears_on_retry():
    calls = {'n': 0}

    def primary(x):
        calls['n'] += 1
        if calls['n'] == 1:
            raise _launch_error()
        return x + 1

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        out = run_with_fallback(primary, lambda x: x, np.zeros(3))
    np.testing.assert_array_equal(np.asarray(out), np.ones(3))
    assert not pallas_disabled()


def test_run_with_fallback_propagates_programming_errors():
    def primary(x):
        raise ValueError('bad kernel arg')

    with pytest.raises(ValueError):
        run_with_fallback(primary, lambda x: x, np.zeros(2))


def test_strikeout_disables_pallas_for_session():
    def primary(x):
        raise _launch_error()

    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        for _ in range(pallas_guard._MAX_STRIKES):
            run_with_fallback(primary, lambda x: x, np.zeros(2))
    assert pallas_disabled()
    from nd_tpu.ops.change_pallas import supports_pallas as cp
    from nd_tpu.ops.nlmeans_pallas import supports_pallas as npll
    assert not cp(4)
    assert not npll()
    # once disabled, primary is never attempted again
    calls = {'primary': 0}

    def primary2(x):
        calls['primary'] += 1
        return x

    out = run_with_fallback(primary2, lambda x: x + 5, np.zeros(2))
    assert calls['primary'] == 0
    np.testing.assert_array_equal(np.asarray(out), np.full(2, 5.0))


def test_nlmeans_filter_degrades_to_xla_identically(monkeypatch):
    import jax.numpy as jnp

    from nd_tpu.filters import NLMeansFilter
    from nd_tpu.ops import nlmeans_pallas
    from nd_tpu.testing import generate_test_dataset

    ds = generate_test_dataset(dims={'y': 16, 'x': 20, 'time': 3})
    for v in list(ds.data_vars):
        ds[v] = (ds[v].dims, ds[v].values.astype(np.float32))
    flt = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=1.0, h=0.5)
    expected = flt.apply(ds)          # XLA path (CPU backend)

    def raising_pallas(*a, **kw):
        raise _launch_error()

    monkeypatch.setattr(nlmeans_pallas, 'supports_pallas', lambda: True)
    monkeypatch.setattr(nlmeans_pallas, 'nlmeans_spatial_pallas',
                        raising_pallas)
    monkeypatch.setattr(nlmeans_pallas, 'nlmeans_pallas',
                        raising_pallas)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        out = flt.apply(ds)
    for v in expected.data_vars:
        np.testing.assert_allclose(np.asarray(out[v].values),
                                   np.asarray(expected[v].values),
                                   rtol=1e-6)


def test_change_hybrid_degrades_to_mixed_identically(monkeypatch):
    from nd_tpu.ops import change as change_mod

    rng = np.random.RandomState(1)
    vals = np.abs(rng.normal(1, 0.2, size=(6, 8, 5, 4))) \
        .astype(np.float32)
    vals[..., 1] *= 0.1
    vals[..., 2] *= 0.1
    vals[:, :, 2:, 0] *= 4.0
    expected = np.asarray(change_mod.change_detection(
        vals, alpha=0.99, n=9, stat_dtype='mixed'))

    def raising_impl(*a, **kw):
        raise _launch_error()

    monkeypatch.setattr(change_mod, '_change_detection_hybrid',
                        raising_impl)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        out = change_mod.change_detection_hybrid(vals, alpha=0.99, n=9)
    np.testing.assert_array_equal(out, expected)
    assert expected.any()             # the cube does contain changes
