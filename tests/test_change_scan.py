"""Sequential-scan omnibus kernel (long-series path) — interpret-mode
parity against the float64 'mixed' oracle plus the host-side threshold
fit contracts."""

import numpy as np
import pytest

from nd_tpu.ops.change import change_detection
from nd_tpu.ops.change_scan_pallas import (K_SCAN_MAX,
                                           change_detection_scan,
                                           scan_tables)


def _cube_with_changes(ny, nx, k, seed=0, neg_dets=False):
    rng = np.random.RandomState(seed)
    c11 = np.abs(rng.normal(1, .3, (ny, nx, k))) + .2
    c22 = np.abs(rng.normal(1, .3, (ny, nx, k))) + .2
    hi = 1.3 if neg_dets else 0.9
    mag = np.sqrt(c11 * c22) * rng.uniform(0.2, hi, (ny, nx, k))
    ph = rng.uniform(0, 2 * np.pi, (ny, nx, k))
    cube = np.stack([c11, mag * np.cos(ph), mag * np.sin(ph), c22],
                    -1).astype(np.float32)
    cube[:, :, k // 2:, 0] *= 2.5
    cube[:, :, k // 2:, 3] *= 2.5
    # a bursty column with many change points (scan restart churn)
    t = np.arange(k)
    burst = np.where((t // 3) % 2 == 0, 1.0, 5.0).astype(np.float32)
    cube[:, 0, :, 0] = burst
    cube[:, 0, :, 3] = burst
    cube[:, 0, :, 1] = 0.05
    cube[:, 0, :, 2] = 0.02
    return cube


def _assert_scan_matches_mixed(cube, alpha, n, eps=3e-4):
    """The scan kernel's contract: every pixel whose margin exceeds
    ``eps`` carries the float64 'mixed' decisions verbatim, and
    patching the rest with the oracle is exact (what the callers'
    rescan does)."""
    flags, margin = change_detection_scan(cube, alpha=alpha, n=n,
                                          interpret=True)
    flags = np.asarray(flags)
    margin = np.asarray(margin)
    ref = np.asarray(change_detection(cube, alpha=alpha, n=n,
                                      stat_dtype='mixed'))
    suspect = ~(margin > eps)
    mism = (flags != ref) & ~suspect[..., None]
    assert mism.sum() == 0
    assert np.array_equal(np.where(suspect[..., None], ref, flags),
                          ref)
    return suspect


def test_scan_matches_mixed_small():
    cube = _cube_with_changes(8, 128, 16, seed=3)
    suspect = _assert_scan_matches_mixed(cube, 0.99, 9)
    # margins must be informative, not a blanket suspect set
    assert suspect.mean() < 0.05


def test_scan_negative_determinants():
    """Windows with negative-determinant products (NaN statistics) and
    near-zero determinants follow the oracle through the margin
    machinery."""
    cube = _cube_with_changes(8, 128, 14, seed=42, neg_dets=True)
    dets = (cube[..., 0] * cube[..., 3] - cube[..., 1] ** 2
            - cube[..., 2] ** 2)
    assert (dets < 0).mean() > 0.1        # the fixture really does it
    _assert_scan_matches_mixed(cube, 0.99, 9)


def test_scan_tables_fit_contracts():
    """The F2 threshold polynomial's f32 evaluation error is measured
    and bounded — the kernel SUBTRACTS it from every reported margin,
    so exactness never depends on margin_eps exceeding it, but a loose
    fit silently turns the whole grid suspect and overflows the rescan
    (an earlier absolute-C fit at k=200 ate 0.5 in rel units); the
    derived margin scale 1/(F2 (1+err)) never exceeds the exact
    S(j)."""
    from nd_tpu.ops.change import omnibus_rho, omnibus_thresholds
    from nd_tpu.ops.change_scan_pallas import _sim_f32

    for k, n, alpha in ((56, 9, 0.99), (200, 9, 0.99), (64, 1, 0.9),
                        (256, 1, 0.9), (56, 9, 0.01)):
        tabs = scan_tables(k, n, alpha)
        assert tabs is not None
        thr = omnibus_thresholds(k, n, alpha)
        rho = omnibus_rho(np.arange(k + 1), n)
        js = np.arange(2, k + 1, dtype=np.float64)
        f2_exact = thr[2:] / (2 * rho[2:])
        s_exact = 2 * rho[2:] / np.maximum(np.abs(thr[2:]), 1.0)
        nsm = len(tabs['f2_small'])

        def f2_f32(j):
            jj = int(j)
            if jj - 2 < nsm:
                return np.float32(tabs['f2_small'][jj - 2])
            w = np.float32(np.sqrt(np.float32(j)))
            z = np.float32(w * np.float32(tabs['za'])
                           + np.float32(tabs['zb']))
            return _sim_f32(tabs['f2_coefs'], z)

        got = np.array([f2_f32(j) for j in js], np.float64)
        assert np.abs(got / f2_exact - 1.0).max() \
            <= tabs['f2_rel_err']
        assert tabs['f2_rel_err'] < 2e-4, (k, n, tabs['f2_rel_err'])
        # the margin scale never exceeds exact S: 1/(F2 (1+err)) on
        # the fitted range, exact deflated immediates below it (where
        # thr < 1 breaks the S = 1/F2 identity — e.g. alpha = 0.01)
        s_got = 1.0 / (got * (1.0 + tabs['f2_rel_err']))
        s_got[:nsm] = [np.float32(v) for v in tabs['s_small']]
        assert (s_got > 0).all()
        assert (s_got <= s_exact * (1 + 1e-12)).all()
        # pass-B immediates are the exact folded values
        c_exact = (-f2_exact - n * 2.0 * js * np.log(js))
        np.testing.assert_allclose(tabs['cg_tab'][2:], c_exact)


def test_scan_small_alpha():
    """alpha = 0.01 (the OmnibusTest default) puts thr(j=2) below 1,
    which the S = 1/F2 identity can't serve — the one-hot exact
    immediates must, and the public long-k path must not raise (a
    round-3 session crash: ValueError('folded thresholds infeasible')
    escaped change_detection_hybrid through the accessor)."""
    cube = _cube_with_changes(8, 128, 16, seed=11)
    _assert_scan_matches_mixed(cube, 0.01, 9)


def test_rescan_gate_checks_feasibility(monkeypatch):
    """supports_pallas_rescan(k, n, alpha) consults table feasibility
    for long series so infeasible parameterizations route to the XLA
    path instead of raising inside the kernel wrapper."""
    import nd_tpu.ops.change_pallas as cp

    monkeypatch.setattr(cp, 'supports_pallas', lambda k=None: True)
    assert cp.supports_pallas_rescan(56, 9, 0.01)
    assert cp.supports_pallas_rescan(56, 9, 0.99)
    # an absurd alpha drops thr below 1 on the fitted range (thr(6) =
    # 0.59 at n=9) -> infeasible tables -> the gate says no
    assert scan_tables(56, 9, 1e-12) is None
    assert not cp.supports_pallas_rescan(56, 9, 1e-12)
    # short series never consult the tables (round kernel serves them)
    assert cp.supports_pallas_rescan(12, 9, 1e-12)


def test_scan_k_bounds():
    """Cap agreement with the rescan gate, and loud refusals."""
    import nd_tpu.ops.change_pallas as cp
    assert cp._K_RESCAN_MAX == K_SCAN_MAX
    cube = _cube_with_changes(8, 128, 8)
    with pytest.raises(ValueError, match='too long'):
        change_detection_scan(
            np.repeat(cube, (K_SCAN_MAX + 8) // 8, axis=2),
            alpha=0.99, n=9, interpret=True)


def test_exact_long_series_routes_through_scan(monkeypatch):
    """change_detection_exact at k > _K_MAX uses the scan kernel and
    still reproduces the mixed oracle bit-exactly — with the short-k
    threshold lowered so the long path runs at an interpret-affordable
    length."""
    import nd_tpu.ops.change as ch
    import nd_tpu.ops.change_pallas as cp
    import nd_tpu.ops.change_scan_pallas as cs
    from nd_tpu.ops.change import change_detection_exact

    monkeypatch.setattr(cp, '_K_MAX', 8)
    calls = []
    orig = cs.change_detection_scan

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(cs, 'change_detection_scan', spy)
    cube = _cube_with_changes(8, 128, 18, seed=9)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    got = np.asarray(change_detection_exact(
        cube, alpha=0.99, n=9, capacity=512, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert calls


def test_capacity_ladder_second_rung(monkeypatch):
    """When the suspect count overflows the base capacity, the jitted
    exact scan takes the 4x ladder rung (lax.cond, no host sync) and
    stays exact — long-k suspect fractions grow with k, so a static
    base capacity must not force the full-grid fallback."""
    import nd_tpu.ops.change_pallas as cp
    from nd_tpu.ops.change import (_capacity_ladder,
                                   _change_detection_exact_core,
                                   change_detection_exact)

    monkeypatch.setattr(cp, '_K_MAX', 8)
    cube = _cube_with_changes(8, 128, 20, seed=11)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))

    # short series rescan at a small base rung with geometric 4x
    # escalation up to the requested capacity; the long path starts at
    # the request and adds the 2x/4x rungs
    assert _capacity_ladder(8, 256, 1024) == (256,)
    assert _capacity_ladder(8, 16384, 1 << 20) == (2048, 8192, 16384)
    # long-k rungs are geometric (r5: the gather-latency-bound patch
    # pays the RUNG, not the true count, so a [cap, 4cap] ladder paid
    # 2x too much whenever the count landed between the rungs)
    assert _capacity_ladder(20, 256, 1024) == (256, 512, 1024)
    assert _capacity_ladder(20, 4096, 1 << 20) == (4096, 8192, 16384)

    # a huge margin_eps makes EVERY pixel suspect: count (1024)
    # overflows the base rung (256) but fits the wide one (1024), so
    # the rescan must patch the whole grid and still match the oracle
    flags, count = _change_detection_exact_core(
        cube, 0.99, 9, 1e9, 256, interpret=True)
    assert int(count) == 8 * 128 > 256
    np.testing.assert_array_equal(np.asarray(flags), ref)

    # the eager wrapper compares overflow against the LAST rung, so
    # this same call must not fall back to the full-grid mixed path
    got = np.asarray(change_detection_exact(
        cube, alpha=0.99, n=9, margin_eps=1e9, capacity=256,
        interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_round_cap_many_changes_exact():
    """The short-k exact pass caps its unrolled restart rounds; a cube
    whose pixels restart MORE times than the cap (a change every other
    step) must still match the f64 'mixed' oracle — the capped pixels
    ride the margin = -inf suspect escape into the rescan."""
    from nd_tpu.ops.change import _change_detection_exact_core
    from nd_tpu.ops.change_pallas import _round_cap

    k = 20
    assert _round_cap(k) < k - 1
    rng = np.random.RandomState(7)
    ny, nx = 8, 128
    c11 = np.abs(rng.normal(1.0, 0.05, size=(ny, nx, k))) + 0.5
    c22 = np.abs(rng.normal(1.0, 0.05, size=(ny, nx, k))) + 0.5
    # strong alternating scale jumps: a detectable change point every
    # 2 steps -> ~k/2 restarts per pixel, far beyond the cap
    scale = np.where(np.arange(k) % 4 < 2, 1.0, 8.0)
    c11 *= scale
    c22 *= scale
    mag = 0.1 * np.sqrt(c11 * c22)
    cube = np.stack([c11, mag, 0 * mag, c22], axis=-1) \
        .astype(np.float32)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    assert ref.sum() > ny * nx * 4          # the scan really restarts
    flags, count = _change_detection_exact_core(
        cube, 0.99, 9, 3e-4, 1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(flags), ref)


def test_capacity_ladder_short_k_escalation():
    """Short series rescan at the small base rung; an overflowing
    suspect count (every pixel, via a huge margin_eps) must escalate
    to the requested-capacity rung inside the jit and stay exact."""
    from nd_tpu.ops.change import (_capacity_ladder,
                                   _change_detection_exact_core)

    # 32x128 = 4096 px > the 2048 base rung
    cube = _cube_with_changes(32, 128, 8, seed=13)
    ref = np.asarray(change_detection(cube, alpha=0.99, n=9,
                                      stat_dtype='mixed'))
    assert _capacity_ladder(8, 4096, 1 << 19) == (2048, 4096)
    flags, count = _change_detection_exact_core(
        cube, 0.99, 9, 1e9, 4096, interpret=True)
    assert int(count) == 4096 > 2048
    np.testing.assert_array_equal(np.asarray(flags), ref)


def test_scan_tile_chooser_prefers_measured_order():
    """The tile chooser is ordered by the round-5 on-chip sweep
    ((8, 256) 20.0 / (16, 128) 17.2 / (16, 256) 8.9 Gpix/s at k=56):
    wide-lane low-sublane tiles must win while VMEM admits them."""
    import nd_tpu.ops.change_scan_pallas as csp

    def pick(k):
        for ty, tx in ((8, 256), (16, 128), (32, 128), (8, 128)):
            if 40 * k * ty * tx <= csp._VMEM_BUDGET:
                return ty, tx
        return 8, 128

    assert pick(56) == (8, 256)
    # k=200: only (8, 128) fits the 40*k*ty*tx budget
    assert pick(200) == (8, 128)
    # and the module's own chooser table starts with (8, 256)
    import inspect
    src = inspect.getsource(csp.change_detection_scan)
    assert src.index('(8, 256)') < src.index('(16, 128)')
