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


@pytest.mark.parametrize('shape,r,f', [
    ((20, 17, 5, 4), (1, 1, 1), (1, 1, 1)),   # full 3-D window
    ((12, 16, 7, 3), (0, 0, 2), (1, 1, 0)),   # temporal-only radius
    ((10, 14, 5, 1), (1, 0, 1), (0, 1, 1)),   # active axes {0, 2}
    ((18, 15, 4, 4), (2, 1, 0), (1, 1, 1)),   # spatial r, temporal f
])
def test_pallas_nlmeans_3d_matches_xla(shape, r, f):
    """The generalized kernel (temporal radius / full 3-D window —
    the reference's _filters.pyx 3-dim case) matches the XLA scan."""
    from nd_tpu.ops.nlmeans_pallas import nlmeans_pallas
    rng = np.random.RandomState(5)
    arr = rng.rand(*shape).astype(np.float32)
    ref = np.asarray(nlmeans(arr, r, f, 0.6, 0.9, -1.0))
    got = np.asarray(nlmeans_pallas(arr, r, f, 0.6, 0.9, -1.0,
                                    interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_filter_dispatches_3d_window_to_pallas(monkeypatch):
    """NLMeansFilter(dims=('y','x','time')) routes through the fused
    3-D kernel when Pallas is available and matches the XLA oracle."""
    import functools

    import nd_tpu.filters as flt_mod
    import nd_tpu.ops.nlmeans_pallas as npall
    from nd_tpu.filters import NLMeansFilter
    from nd_tpu.testing import generate_test_dataset

    calls = []
    orig = npall.nlmeans_pallas

    def spy(v, r, f, *a, **kw):
        calls.append(r)
        return orig(v, r, f, *a, interpret=True,
                    **{k: w for k, w in kw.items()
                       if k != 'interpret'})

    monkeypatch.setattr(npall, 'supports_pallas', lambda: True)
    monkeypatch.setattr(npall, 'nlmeans_pallas', spy)

    ds = generate_test_dataset(dims={'y': 14, 'x': 12, 'time': 6})
    for v in list(ds.data_vars):
        ds[v] = (ds[v].dims,
                 np.asarray(ds[v].values).astype(np.float32))
    flt = NLMeansFilter(dims=('y', 'x', 'time'), r=1, f=1,
                        sigma=1.0, h=1.5)
    got = flt.apply(ds)
    assert calls and calls[0] == (1, 1, 1)
    monkeypatch.setattr(npall, 'supports_pallas', lambda: False)
    ref = flt.apply(ds)
    for name in ref.data_vars:
        np.testing.assert_allclose(
            np.asarray(got[name].values),
            np.asarray(ref[name].values), rtol=1e-5, atol=1e-6)


def test_nlmeans_vmem_gate_routes_deep_stacks_to_xla(monkeypatch):
    """A time/variable stack whose minimum tile exceeds the VMEM
    floor must route to the XLA scan without touching pallas (a hard
    Mosaic compile failure under jit has no runtime fallback)."""
    import nd_tpu.ops.nlmeans_pallas as npall
    from nd_tpu.filters import NLMeansFilter
    from nd_tpu.ops.nlmeans_pallas import fits_vmem

    assert fits_vmem((1024, 1024, 12, 4), (1, 1, 0), (1, 1, 0))
    assert not fits_vmem((512, 512, 400, 4), (1, 1, 1), (1, 1, 1))

    calls = []
    monkeypatch.setattr(npall, 'supports_pallas', lambda: True)
    monkeypatch.setattr(npall, 'nlmeans_pallas',
                        lambda *a, **k: calls.append(1))
    monkeypatch.setattr(npall, 'nlmeans_spatial_pallas',
                        lambda *a, **k: calls.append(1))
    flt = NLMeansFilter(dims=('y', 'x', 'time'), r=1, f=1, sigma=1,
                        h=1)
    arr = np.random.RandomState(0).rand(8, 10, 130, 4) \
        .astype(np.float32)
    out = flt._filter(arr, axes=(0, 1, 2))
    assert not calls
    assert np.asarray(out).shape == arr.shape


def test_nlmeans_rowfused_routing_and_equality(monkeypatch):
    """Spatial windows take the row-fused kernel (t-chunked grid,
    full-width rows) whenever a geometry fits, and its output equals
    the tiled kernel BIT-EXACTLY (same ``_kernel`` body, same add
    order)."""
    import nd_tpu.ops.nlmeans_pallas as npall

    rng = np.random.RandomState(3)
    arr = rng.rand(24, 150, 5, 4).astype(np.float32)

    calls = []
    orig = npall._nlmeans_rowfused

    def spy(*a, **kw):
        calls.append(a[6])              # geometry
        return orig(*a, **kw)

    monkeypatch.setattr(npall, '_nlmeans_rowfused', spy)
    got = np.asarray(npall.nlmeans_spatial_pallas(
        arr, (2, 2), (2, 2), 0.5, 0.8, -1.0, interpret=True))
    assert calls, 'spatial call must route to the row-fused kernel'

    # nx=256 rides the MAIN combined-reflect-pad branch (the
    # production path: pad widths within the reflect limit); nx=150
    # above rides the narrow-extent fallback — both must match the
    # tiled kernel bit-for-bit
    arr2 = np.random.RandomState(8).rand(24, 256, 5, 2) \
        .astype(np.float32)
    got2 = np.asarray(npall.nlmeans_spatial_pallas(
        arr2, (2, 2), (2, 2), 0.5, 0.8, -1.0, interpret=True))

    # tiled twin: disable the row-fused route
    monkeypatch.setattr(npall, '_rowfused_geometry',
                        lambda *a, **k: None)
    ref = np.asarray(npall.nlmeans_spatial_pallas(
        arr, (2, 2), (2, 2), 0.5, 0.8, -1.0, interpret=True))
    np.testing.assert_array_equal(got, ref)
    ref2 = np.asarray(npall.nlmeans_spatial_pallas(
        arr2, (2, 2), (2, 2), 0.5, 0.8, -1.0, interpret=True))
    np.testing.assert_array_equal(got2, ref2)

    # temporal windows must NOT route row-fused
    calls.clear()
    np.asarray(npall.nlmeans_pallas(
        arr, (1, 1, 1), (1, 1, 0), 0.5, 0.8, -1.0, interpret=True))
    assert not calls


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


def _change_cube(ny, nx, k, seed=0):
    rng = np.random.RandomState(seed)
    c11 = np.abs(rng.normal(1, .25, (ny, nx, k))) + .3
    c22 = np.abs(rng.normal(1, .25, (ny, nx, k))) + .3
    mag = .4 * np.sqrt(c11 * c22) * rng.uniform(0, 1, (ny, nx, k))
    ph = rng.uniform(0, 2 * np.pi, (ny, nx, k))
    cube = np.stack([c11, mag * np.cos(ph), mag * np.sin(ph), c22],
                    -1).astype(np.float32)
    cube[:, :, k // 2:, 0] *= 2.5
    cube[:, :, k // 2:, 3] *= 2.5
    return cube


@pytest.mark.parametrize('density', [0.0, 0.01, 0.6])
def test_compact_indices(density):
    import jax.numpy as jnp
    from nd_tpu.ops.change import _compact_indices
    rng = np.random.RandomState(3)
    mask = rng.rand(37, 211) < density
    cap = 64
    idx, count = _compact_indices(jnp.asarray(mask), cap)
    ref = np.flatnonzero(mask.ravel())
    assert int(count) == len(ref)
    head = min(cap, len(ref))
    np.testing.assert_array_equal(np.asarray(idx)[:head], ref[:head])
    # every returned index is a valid flat pixel index
    assert (np.asarray(idx) >= 0).all()
    assert (np.asarray(idx) < mask.size).all()


def test_exact_device_matches_mixed():
    """Pallas fast scan + on-device f64 patching == full 'mixed' map."""
    from nd_tpu.ops.change import (change_detection,
                                   change_detection_exact)
    cube = _change_cube(40, 48, 8, seed=7)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    got = np.asarray(change_detection_exact(
        cube, alpha=0.99, n=9, capacity=256, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_exact_device_overflow_falls_back():
    """Suspect counts beyond capacity rerun the full exact scan."""
    from nd_tpu.ops.change import (change_detection,
                                   change_detection_exact)
    cube = _change_cube(12, 16, 6, seed=1)
    ref = np.asarray(change_detection(cube, alpha=0.9, n=4,
                                      stat_dtype='mixed'))
    # margin_eps so large every pixel is suspect -> guaranteed overflow
    got = np.asarray(change_detection_exact(
        cube, alpha=0.9, n=4, capacity=8, margin_eps=1e12,
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_exact_device_multiplane_k_over_31():
    """k > 31 packs into multiple int32 planes."""
    from nd_tpu.ops.change import (change_detection,
                                   change_detection_exact)
    cube = _change_cube(8, 12, 35, seed=2)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    got = np.asarray(change_detection_exact(
        cube, alpha=0.99, n=9, capacity=96, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_k_cap(monkeypatch):
    """Long time series (O(k^2) unrolled kernel graph) fall back to
    the XLA scan: supports_pallas(k) gates on _K_MAX; rescan-capable
    callers stay eligible up to _K_RESCAN_MAX (round-capped kernel)."""
    import nd_tpu.ops.change_pallas as cp
    if cp.pltpu is None:
        pytest.skip('pallas tpu module unavailable')
    monkeypatch.setattr(cp.jax, 'default_backend', lambda: 'tpu')
    assert cp.supports_pallas()
    assert cp.supports_pallas(cp._K_MAX)
    assert not cp.supports_pallas(cp._K_MAX + 1)
    assert cp.supports_pallas_rescan(cp._K_MAX + 1)
    assert cp.supports_pallas_rescan(cp._K_RESCAN_MAX)
    assert not cp.supports_pallas_rescan(cp._K_RESCAN_MAX + 1)


def _many_change_cube(ny, nx, k, period=3, seed=11):
    """Cube whose FIRST column of pixels alternates strongly every
    ``period`` steps (more change points than the round cap) while the
    rest carries a single mid-series step."""
    cube = _change_cube(ny, nx, k, seed=seed)
    t = np.arange(k)
    burst = np.where((t // period) % 2 == 0, 1.0, 6.0) \
        .astype(np.float32)
    cube[:, 0, :, 0] = burst
    cube[:, 0, :, 3] = burst
    cube[:, 0, :, 1] = 0.05
    cube[:, 0, :, 2] = 0.03
    return cube


def test_round_capped_kernel_forces_overflow_suspects():
    """max_rounds < k-1: pixels still scanning at the cap come back
    with margin = -inf (forced suspects); finished pixels keep finite
    margins; max_rounds without margin tracking is rejected."""
    from nd_tpu.ops.change_pallas import change_detection_pallas
    cube = _many_change_cube(8, 128, 20, period=2)
    with pytest.raises(ValueError, match='return_margin'):
        change_detection_pallas(cube, alpha=0.99, n=9, max_rounds=3,
                                interpret=True)
    _, margin = change_detection_pallas(
        cube, alpha=0.99, n=9, max_rounds=3, return_margin=True,
        interpret=True)
    margin = np.asarray(margin)
    # the alternating column restarts ~k/2 times: capped at 3 rounds
    # it MUST be forced suspect
    assert np.all(np.isneginf(margin[:, 0]))
    # most of the remaining field finishes within 3 rounds
    assert np.isfinite(margin[:, 1:]).mean() > 0.5


def test_long_series_exact_matches_mixed(monkeypatch):
    """k > _K_MAX routes through the sequential-scan kernel + rescan
    and still reproduces the full 'mixed' scan bit-exactly — including
    pixels with MANY change points (the scan kernel has no round cap).
    _K_MAX is lowered so the long path runs at an interpret-affordable
    length (the unrolled scan kernel's CPU interpret harness compiles
    O(minutes) at the production k = 56; the real-k path is exercised
    on hardware by bench.py's omnibus_long/omnibus_k200 configs)."""
    import nd_tpu.ops.change_pallas as cp
    from nd_tpu.ops.change import (change_detection,
                                   change_detection_exact)
    monkeypatch.setattr(cp, '_K_MAX', 8)
    k = 20
    cube = _many_change_cube(8, 128, k, period=3)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    got = np.asarray(change_detection_exact(
        cube, alpha=0.99, n=9, capacity=1024, interpret=True))
    np.testing.assert_array_equal(got, ref)
    # sanity: the alternating column really has many change points
    assert ref[:, 0].sum() >= 8 * 4


def test_hybrid_x64_off_host_patches(monkeypatch):
    """With jax x64 off, the hybrid patches near-margin pixels on the
    HOST with the f64 kernel (the device rescan can't hold f64).
    Simulated on CPU: pallas forced to interpret mode, x64 flag faked
    off — result must still equal the f64 oracle."""
    import functools

    import jax

    import nd_tpu.ops.change as ch
    import nd_tpu.ops.change_pallas as cp
    from nd_tpu.ops.change import change_detection

    monkeypatch.setattr(cp, 'supports_pallas', lambda k=None: True)
    monkeypatch.setattr(cp, 'supports_pallas_rescan',
                        lambda k=None, n=None, alpha=None: True)
    monkeypatch.setattr(
        cp, 'change_detection_pallas',
        functools.partial(cp.change_detection_pallas, interpret=True))

    class _FakeCfg:
        jax_enable_x64 = False

        def __getattr__(self, name):
            return getattr(jax.config, name)

    monkeypatch.setattr(ch, 'jax',
                        type('J', (), {'config': _FakeCfg(),
                                       'jit': jax.jit})())

    cube = _change_cube(10, 14, 6, seed=4).astype(np.float64)
    # huge margin_eps: every pixel is suspect, so the host patch loop
    # actually runs (it must write into a WRITABLE flags copy)
    got = ch.change_detection_hybrid(cube, alpha=0.9, n=4,
                                     margin_eps=1e12)
    ref = np.asarray(change_detection(cube, alpha=0.9, n=4,
                                      stat_dtype='mixed'))
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_pallas_nlmeans_guards():
    """Pallas NLMeans enforces the same r+f bound and identity cases
    as the XLA kernel."""
    from nd_tpu.ops.nlmeans_pallas import nlmeans_spatial_pallas
    arr = np.random.RandomState(0).rand(4, 20, 1, 1).astype(np.float32)
    with pytest.raises(ValueError, match='must be smaller'):
        nlmeans_spatial_pallas(arr, (3, 1), (1, 1), 0.5, 0.8,
                               interpret=True)
    out = nlmeans_spatial_pallas(arr, (0, 0), (1, 1), 0.5, 0.8,
                                 n_eff=4.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), arr)
