"""Cubic (Catmull-Rom) and average resampling — the round-2 widening
of the warp engine's method set toward the reference's GDAL
``Resampling`` breadth (/root/reference/nd/warp.py:724-732 dispatches
by dtype but accepts any rasterio method via kwargs).

Oracles: a literal numpy Catmull-Rom evaluator written independently
in this file, quadratic-reproduction (the kernel's order-3 accuracy),
gather==matmul-plan agreement on separable warps, and block nanmean
for the average downsampler."""

import numpy as np
import pytest

import jax.numpy as jnp

from nd_tpu.core import DataArray, Dataset
from nd_tpu.ops.interp import (axis_weights, map_coordinates,
                               matmul_resample)
from nd_tpu.testing import generate_test_dataset
from nd_tpu.warp import Reprojection


def _cr_1d(samples, x):
    """Literal Catmull-Rom interpolation of 1-d ``samples`` at ``x``
    (edge-clamped), written from the spline definition: the cubic
    through p1/p2 with tangents (p2-p0)/2 and (p3-p1)/2."""
    n = len(samples)
    i = int(np.floor(x))
    t = x - i
    p = [samples[min(max(i + k, 0), n - 1)] for k in (-1, 0, 1, 2)]
    m1 = (p[2] - p[0]) / 2.0
    m2 = (p[3] - p[1]) / 2.0
    return ((2 * t ** 3 - 3 * t ** 2 + 1) * p[1]
            + (t ** 3 - 2 * t ** 2 + t) * m1
            + (-2 * t ** 3 + 3 * t ** 2) * p[2]
            + (t ** 3 - t ** 2) * m2)


def test_cubic_matches_literal_catmull_rom():
    rng = np.random.RandomState(0)
    v = rng.rand(1, 12, 15)
    rows = np.array([3.3, 5.0, 7.75])
    cols = np.array([2.6, 9.25, 11.0])
    out = np.asarray(map_coordinates(v, rows, cols, method='cubic'))
    for k, (rr, cc) in enumerate(zip(rows, cols)):
        # separable 2-d Catmull-Rom: interpolate each of the 4 rows
        # along x, then across them along y
        i = int(np.floor(rr))
        col_vals = [_cr_1d(v[0, min(max(i + a, 0), 11)], cc)
                    for a in (-1, 0, 1, 2)]
        expect = _cr_1d(np.asarray(col_vals), 1.0 + (rr - i))
        np.testing.assert_allclose(out[0, k], expect, rtol=1e-12)


def test_cubic_reproduces_quadratics_and_identity():
    y, x = np.mgrid[0:16, 0:20].astype(np.float64)
    quad = 2.0 + 0.3 * x + 0.1 * y + 0.05 * x * y + 0.02 * x * x
    rows = np.array([4.5, 7.25, 9.9])
    cols = np.array([5.5, 10.75, 3.2])
    out = np.asarray(map_coordinates(quad[None], rows, cols,
                                     method='cubic'))[0]
    expect = 2.0 + 0.3 * cols + 0.1 * rows + 0.05 * cols * rows \
        + 0.02 * cols * cols
    np.testing.assert_allclose(out, expect, rtol=1e-10)
    # exact at integer coordinates
    same = np.asarray(map_coordinates(quad[None], np.array([3.0]),
                                      np.array([7.0]),
                                      method='cubic'))[0]
    np.testing.assert_allclose(same, quad[3, 7], rtol=1e-12)


def test_cubic_nan_window_and_out_of_range():
    v = np.ones((1, 8, 8))
    v[0, 4, 4] = np.nan
    # 4x4 window around (3.5, 3.5) touches (4, 4) -> NaN even though
    # its own cell (3, 3) block weights would be nonzero elsewhere
    out = np.asarray(map_coordinates(v, np.array([3.5, 1.0]),
                                     np.array([3.5, 1.0]),
                                     method='cubic'))[0]
    assert np.isnan(out[0]) and out[1] == 1.0
    oob = np.asarray(map_coordinates(v, np.array([-1.0]),
                                     np.array([2.0]),
                                     method='cubic'))[0]
    assert np.isnan(oob[0])


def test_cubic_plan_matches_gather_on_separable_warp():
    rng = np.random.RandomState(1)
    v = rng.rand(24, 30).astype(np.float32)
    v[5, 7] = np.nan
    rows_1d = np.linspace(0.0, 23.0, 17)
    cols_1d = np.linspace(0.0, 29.0, 21)
    R, C = np.meshgrid(rows_1d, cols_1d, indexing='ij')
    gathered = np.asarray(map_coordinates(v[None], R, C,
                                          method='cubic'))[0]
    wy, wym, vy = axis_weights(rows_1d, 24, 'cubic')
    wx, wxm, vx = axis_weights(cols_1d, 30, 'cubic')
    planned = np.asarray(matmul_resample(
        jnp.asarray(v), jnp.asarray(wy), jnp.asarray(wym),
        jnp.asarray(wx), jnp.asarray(wxm), jnp.asarray(vy),
        jnp.asarray(vx), np.float32(np.nan), expected=16.0))
    np.testing.assert_allclose(planned, gathered, atol=2e-6,
                               equal_nan=True)
    np.testing.assert_array_equal(np.isnan(planned),
                                  np.isnan(gathered))


def test_average_downsample_equals_block_nanmean():
    rng = np.random.RandomState(2)
    v = rng.rand(16, 16).astype(np.float32)
    v[rng.rand(16, 16) < 0.2] = np.nan
    # destination cells of width 4 source pixels, centered on the
    # 4x4 blocks: coords are the block centers in source pixels
    coords = np.array([1.5, 5.5, 9.5, 13.5])
    W, Wm, valid = axis_weights(coords, 16, 'average')
    assert valid.all()
    out = np.asarray(matmul_resample(
        jnp.asarray(v), jnp.asarray(W), jnp.asarray(Wm),
        jnp.asarray(W), jnp.asarray(Wm), jnp.asarray(valid),
        jnp.asarray(valid), np.float32(np.nan), expected=1.0,
        skipna=True))
    with np.errstate(all='ignore'):
        expect = np.nanmean(
            v.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
            .reshape(4, 4, 16), axis=-1)
    np.testing.assert_allclose(out, expect, atol=1e-6, equal_nan=True)


def test_reprojection_average_and_cubic_end_to_end():
    ds = generate_test_dataset(dims={'y': 32, 'x': 32, 'time': 2})
    from nd_tpu.warp import get_transform
    t = get_transform(ds)
    # downsample 4x with dst cells centered on the 4x4 source blocks
    # (source pixel = 4*j + 1.5): average == coarsen mean
    t4 = t * type(t)(4, 0, 1.5, 0, 4, 1.5)
    avg = Reprojection(crs='epsg:4326', transform=t4, width=8,
                       height=8, resampling='average').apply(ds)
    ref = ds.coarsen(y=4, x=4).mean()
    np.testing.assert_allclose(np.asarray(avg['C11'].values),
                               np.asarray(ref['C11'].values),
                               atol=1e-5)
    # cubic stays finite and close to bilinear on smooth data
    cub = Reprojection(crs='epsg:4326', transform=t4, width=8,
                       height=8, resampling='cubic').apply(ds)
    assert np.isfinite(np.asarray(cub['C11'].values)).all()


def test_average_curvilinear_raises():
    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 1})
    with pytest.raises(NotImplementedError):
        # geographic -> LAEA is curvilinear: no separable footprint
        Reprojection(crs='epsg:3035',
                     resampling='average').apply(ds)


def test_unknown_resampling_rejected():
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 1})
    with pytest.raises(ValueError) as ei:
        Reprojection(crs='epsg:4326',
                     resampling='bogus_method').apply(ds)
    # the message enumerates the full method set
    for m in ('cubic_spline', 'mode', 'med', 'rms'):
        assert m in str(ei.value)


def test_lanczos_constant_and_linear_reproduction():
    # the normalized window reproduces constants exactly and linear
    # ramps to high accuracy away from the edges
    v = np.full((1, 12, 12), 7.0)
    out = np.asarray(map_coordinates(v, np.array([5.3]),
                                     np.array([6.7]),
                                     method='lanczos'))[0]
    np.testing.assert_allclose(out, 7.0, rtol=1e-12)
    y, x = np.mgrid[0:16, 0:16].astype(np.float64)
    ramp = 2.0 * x + 0.5 * y
    got = np.asarray(map_coordinates(ramp[None], np.array([7.25]),
                                     np.array([8.6]),
                                     method='lanczos'))[0]
    np.testing.assert_allclose(got, 2.0 * 8.6 + 0.5 * 7.25, rtol=1e-3)


def test_lanczos_plan_matches_gather():
    rng = np.random.RandomState(4)
    v = rng.rand(20, 24).astype(np.float32)
    rows_1d = np.linspace(0.0, 19.0, 13)
    cols_1d = np.linspace(0.0, 23.0, 11)
    R, C = np.meshgrid(rows_1d, cols_1d, indexing='ij')
    gathered = np.asarray(map_coordinates(v[None], R, C,
                                          method='lanczos'))[0]
    wy, wym, vy = axis_weights(rows_1d, 20, 'lanczos')
    wx, wxm, vx = axis_weights(cols_1d, 24, 'lanczos')
    planned = np.asarray(matmul_resample(
        jnp.asarray(v), jnp.asarray(wy), jnp.asarray(wym),
        jnp.asarray(wx), jnp.asarray(wxm), jnp.asarray(vy),
        jnp.asarray(vx), np.float32(np.nan), expected=36.0))
    np.testing.assert_allclose(planned, gathered, atol=3e-6,
                               equal_nan=True)


def test_cubic_integer_promotion_roundtrip():
    rng = np.random.RandomState(3)
    v = rng.randint(0, 100, (1, 10, 10)).astype(np.int32)
    out = map_coordinates(v, np.array([2.0]), np.array([3.0]),
                          method='cubic')
    assert np.asarray(out)[0] == pytest.approx(v[0, 2, 3], abs=1e-4)


# ---------------------------------------------------------------------------
# round 4 (VERDICT item 4): footprint order statistics
# (mode/min/max/med/q1/q3/sum/rms) + cubic_spline
# ---------------------------------------------------------------------------

def _aligned_downsample(ds, factor):
    """Destination grid whose pixels exactly tile ``factor x factor``
    source blocks (footprint == coarsen blocks)."""
    from nd_tpu.crs.affine import Affine
    from nd_tpu.warp import get_crs, get_transform
    t = get_transform(ds)
    off = (factor - 1) / 2.0
    dstt = Affine(t.a * factor, 0, t.c + off * t.a,
                  0, t.e * factor, t.f + off * t.e)
    return dict(crs=get_crs(ds), transform=dstt,
                width=ds.sizes['x'] // factor,
                height=ds.sizes['y'] // factor)


def _footprint_fixture():
    rng = np.random.RandomState(7)
    ds = generate_test_dataset(dims={'y': 32, 'x': 40, 'time': 2},
                               extent=(10.0, 50.0, 14.0, 53.2))
    f = rng.normal(size=(32, 40, 2))
    f[3:6, 4:7, :] = np.nan          # a NaN pocket inside one block
    f[0:4, 0:4, 0] = np.nan          # one fully-NaN block in time 0
    ds['C11'] = (('y', 'x', 'time'), f)
    return ds, f


def test_footprint_stats_match_blocked_oracles():
    ds, f = _footprint_fixture()
    grid = _aligned_downsample(ds, 4)
    blocks = f.reshape(8, 4, 10, 4, 2)
    win = blocks.transpose(0, 2, 1, 3, 4).reshape(8, 10, 16, 2)
    import warnings
    oracles = {}
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')   # all-NaN slices are the point
        oracles['min'] = np.nanmin(win, axis=2)
        oracles['max'] = np.nanmax(win, axis=2)
        oracles['med'] = np.nanquantile(win, 0.5, axis=2)
        oracles['q1'] = np.nanquantile(win, 0.25, axis=2)
        oracles['q3'] = np.nanquantile(win, 0.75, axis=2)
        cnt = np.isfinite(win).sum(axis=2)
        oracles['sum'] = np.where(cnt > 0, np.nansum(win, axis=2),
                                  np.nan)
        oracles['rms'] = np.sqrt(np.where(
            cnt > 0, np.nansum(win ** 2, axis=2), np.nan)
            / np.maximum(cnt, 1))
    for stat, want in oracles.items():
        out = Reprojection(resampling=stat, **grid).apply(ds)
        got = np.asarray(out['C11'].values)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   equal_nan=True, err_msg=stat)
        # the fully-NaN block is NaN in time 0 only
        assert np.isnan(got[0, 0, 0]) and np.isfinite(got[0, 0, 1]), \
            stat


def test_mode_on_labels_equals_blocked_mode_oracle():
    # VERDICT r3 done-criterion: mode on an integer label cube equals
    # the blocked-mode oracle on aligned grids (ties -> smallest value,
    # the documented deterministic rule)
    rng = np.random.RandomState(3)
    ds = generate_test_dataset(dims={'y': 32, 'x': 40, 'time': 1},
                               extent=(10.0, 50.0, 14.0, 53.2))
    labels = rng.randint(0, 5, size=(32, 40)).astype(np.int32)
    ds['labels'] = (('y', 'x'), labels)
    grid = _aligned_downsample(ds, 4)
    out = Reprojection(resampling='mode', **grid).apply(ds)
    got = np.asarray(out['labels'].values)
    assert got.dtype == np.int32
    lb = labels.reshape(8, 4, 10, 4)
    for i in range(8):
        for j in range(10):
            vals, cnt = np.unique(lb[i, :, j, :], return_counts=True)
            want = vals[np.argmax(cnt)]   # unique sorts: first max ==
            assert got[i, j] == want      # smallest among the tied


def test_mode_tie_breaks_to_smallest():
    ds = generate_test_dataset(dims={'y': 4, 'x': 4, 'time': 1},
                               extent=(10.0, 50.0, 11.0, 51.0))
    labels = np.array([[9, 9, 2, 2],
                       [2, 9, 9, 2],
                       [5, 5, 7, 7],
                       [7, 5, 5, 7]], np.int64)
    ds['labels'] = (('y', 'x'), labels)
    grid = _aligned_downsample(ds, 4)
    out = Reprojection(resampling='mode', **grid).apply(ds)
    # 8x '9' vs 8x '2' in the top half... the full 4x4 block ties 4-4-4-4
    # between {2, 9, 5, 7} with counts {4+... }
    got = int(np.asarray(out['labels'].values)[0, 0])
    vals, cnt = np.unique(labels, return_counts=True)
    assert got == vals[np.argmax(cnt)] == 2


def test_footprint_nan_label_excluded_from_mode():
    ds = generate_test_dataset(dims={'y': 4, 'x': 4, 'time': 1},
                               extent=(10.0, 50.0, 11.0, 51.0))
    lab = np.full((4, 4), 3.0)
    lab[:3, :] = np.nan              # 12 NaN vs 4x value 3
    ds['labels'] = (('y', 'x'), lab)
    grid = _aligned_downsample(ds, 4)
    out = Reprojection(resampling='mode', **grid).apply(ds)
    assert float(np.asarray(out['labels'].values)[0, 0]) == 3.0


def test_footprint_curvilinear_raises():
    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 1})
    with pytest.raises(NotImplementedError):
        Reprojection(crs='epsg:3035', resampling='mode').apply(ds)


def test_footprint_span_cap_raises():
    ds = generate_test_dataset(dims={'y': 80, 'x': 80, 'time': 1},
                               extent=(10.0, 50.0, 14.0, 53.2))
    with pytest.raises(NotImplementedError):
        # 40x per axis -> 1600 contributors per pixel > the 1024 cap
        Reprojection(resampling='med',
                     **_aligned_downsample(ds, 40)).apply(ds)


def _bspline_1d(samples, x):
    """Literal cubic B-spline smoothing of 1-d ``samples`` at ``x``
    (edge-clamped), written from the basis definition B(t) on [0,2]."""
    def B(t):
        t = abs(t)
        if t < 1:
            return (4.0 - 6.0 * t * t + 3.0 * t ** 3) / 6.0
        if t < 2:
            return (2.0 - t) ** 3 / 6.0
        return 0.0
    n = len(samples)
    i = int(np.floor(x))
    return sum(samples[min(max(i + k, 0), n - 1)] * B(x - (i + k))
               for k in (-1, 0, 1, 2))


def test_cubic_spline_matches_literal_bspline():
    rng = np.random.RandomState(1)
    v = rng.rand(1, 12, 15)
    rows = np.array([3.3, 5.0, 7.75])
    cols = np.array([2.6, 9.25, 11.0])
    out = np.asarray(map_coordinates(v, rows, cols,
                                     method='cubic_spline'))
    for k, (rr, cc) in enumerate(zip(rows, cols)):
        i = int(np.floor(rr))
        col_vals = [_bspline_1d(v[0, min(max(i + a, 0), 11)], cc)
                    for a in (-1, 0, 1, 2)]
        expect = _bspline_1d(np.asarray(col_vals), 1.0 + (rr - i))
        np.testing.assert_allclose(out[0, k], expect, rtol=1e-12)


def test_cubic_spline_reproduces_constants_and_linears():
    # non-negative partition-of-unity taps: constants exact; linear
    # functions also reproduce (the cubic B-spline has approximation
    # order 4 but reproduces polynomials only up to degree 1 through
    # its quasi-interpolant — plain filtering reproduces affine)
    y, x = np.mgrid[0:16, 0:20].astype(np.float64)
    lin = 2.0 + 0.3 * x + 0.1 * y
    rows = np.array([4.5, 7.25, 9.9])
    cols = np.array([5.5, 10.75, 3.2])
    out = np.asarray(map_coordinates(lin[None], rows, cols,
                                     method='cubic_spline'))
    want = 2.0 + 0.3 * cols + 0.1 * rows
    np.testing.assert_allclose(out[0], want, rtol=1e-12)


def test_cubic_spline_plan_matches_gather():
    rng = np.random.RandomState(5)
    v = rng.rand(2, 16, 20).astype(np.float32)
    v[0, 5, 7] = np.nan
    rows1 = np.linspace(0.0, 15.0, 11)
    cols1 = np.linspace(0.0, 19.0, 13)
    rows = np.broadcast_to(rows1[:, None], (11, 13))
    cols = np.broadcast_to(cols1[None, :], (11, 13))
    gathered = np.asarray(map_coordinates(v, rows, cols,
                                          method='cubic_spline'))
    wy, wym, vy = axis_weights(rows1, 16, 'cubic_spline')
    wx, wxm, vx = axis_weights(cols1, 20, 'cubic_spline')
    planned = np.asarray(matmul_resample(
        v, jnp.asarray(wy), jnp.asarray(wym), jnp.asarray(wx),
        jnp.asarray(wxm), jnp.asarray(vy), jnp.asarray(vx),
        np.float32(np.nan), expected=16.0))
    np.testing.assert_allclose(planned, gathered, rtol=1e-5,
                               atol=1e-6, equal_nan=True)


def test_footprint_stats_on_integer_cube_restore_exactly():
    rng = np.random.RandomState(9)
    ds = generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 1},
                               extent=(10.0, 50.0, 12.0, 51.6))
    ints = rng.randint(-50, 50, size=(16, 16)).astype(np.int16)
    ds['v'] = (('y', 'x'), ints)
    grid = _aligned_downsample(ds, 4)
    blocks = ints.reshape(4, 4, 4, 4)
    win = np.moveaxis(blocks, 2, 1).reshape(4, 4, 16)
    for stat, oracle in [('min', win.min(axis=2)),
                         ('max', win.max(axis=2)),
                         ('sum', win.sum(axis=2))]:
        out = Reprojection(resampling=stat, **grid).apply(ds)
        got = np.asarray(out['v'].values)
        assert got.dtype == np.int16, stat
        np.testing.assert_array_equal(got, oracle.astype(np.int16),
                                      err_msg=stat)


def test_resample_algorithm_forwards_footprint_methods():
    """The Resample algorithm (and its accessor) accepts the full
    method surface — a mode-downsample of a label raster through the
    public resample API equals the blocked-mode oracle."""
    from nd_tpu.warp import Resample

    rng = np.random.RandomState(17)
    ds = generate_test_dataset(dims={'y': 32, 'x': 40, 'time': 1},
                               extent=(10.0, 50.0, 14.0, 53.2))
    labels = rng.randint(0, 4, size=(32, 40)).astype(np.int32)
    ds['labels'] = (('y', 'x'), labels)
    out = Resample(width=10, height=8, resampling='mode').apply(ds)
    got = np.asarray(out['labels'].values)
    assert got.dtype == np.int32 and got.shape == (8, 10)
    # oracle: Resample's own (corner-anchored) grid mapped to source
    # pixel coordinates, reduced with the footprint primitives (which
    # test_footprint_stats_* pin against blocked numpy oracles)
    from nd_tpu.ops.interp import footprint_axis, footprint_resample
    sx = np.asarray(ds.coords['x'].values)
    sy = np.asarray(ds.coords['y'].values)
    cx = (np.asarray(out.coords['x'].values) - sx[0]) \
        / (sx[1] - sx[0])
    cy = (np.asarray(out.coords['y'].values) - sy[0]) \
        / (sy[1] - sy[0])
    iy, my, vy = footprint_axis(cy, 32)
    ix, mx, vx = footprint_axis(cx, 40)
    want = np.asarray(footprint_resample(
        labels.astype(np.float64), iy, my, vy, ix, mx, vx,
        'mode', np.nan))
    np.testing.assert_array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_fuzz_footprint_stats_vs_literal_loop(seed):
    """Random non-integer downsample grids: the vectorized footprint
    reduction equals a literal per-destination-pixel numpy loop (same
    footprint definition, independent window extraction/reduction)."""
    from nd_tpu.ops.interp import footprint_axis, footprint_resample

    rng = np.random.RandomState(seed)
    H, W = rng.randint(20, 40), rng.randint(20, 40)
    v = rng.normal(size=(H, W))
    v[rng.rand(H, W) < 0.15] = np.nan
    sy = rng.uniform(1.5, 4.0)
    sx = rng.uniform(1.5, 4.0)
    ny, nx = int(H / sy) - 1, int(W / sx) - 1
    cy = rng.uniform(0, sy) + np.arange(ny) * sy
    cx = rng.uniform(0, sx) + np.arange(nx) * sx
    iy, my, vy = footprint_axis(cy, H)
    ix, mx, vx = footprint_axis(cx, W)

    def windows(i, j):
        lo_y = int(np.ceil(cy[i] - np.median(np.diff(cy)) / 2 - 1e-9))
        hi_y = int(np.floor(cy[i] + np.median(np.diff(cy)) / 2 - 1e-9))
        lo_x = int(np.ceil(cx[j] - np.median(np.diff(cx)) / 2 - 1e-9))
        hi_x = int(np.floor(cx[j] + np.median(np.diff(cx)) / 2 - 1e-9))
        if hi_y < lo_y:
            lo_y = hi_y = int(round(cy[i]))
        if hi_x < lo_x:
            lo_x = hi_x = int(round(cx[j]))
        ys = [y for y in range(lo_y, hi_y + 1) if 0 <= y < H]
        xs = [x for x in range(lo_x, hi_x + 1) if 0 <= x < W]
        return np.asarray([v[y, x] for y in ys for x in xs])

    import warnings
    for stat, red in [('min', np.nanmin), ('max', np.nanmax),
                      ('med', lambda a: np.nanquantile(a, 0.5)),
                      ('sum', np.nansum)]:
        got = np.asarray(footprint_resample(
            v, iy, my, vy, ix, mx, vx, stat, np.nan))
        for i in range(ny):
            for j in range(nx):
                win = windows(i, j)
                finite = win[np.isfinite(win)]
                if len(win) == 0 or len(finite) == 0:
                    assert np.isnan(got[i, j]), (stat, i, j)
                    continue
                with warnings.catch_warnings():
                    warnings.simplefilter('ignore')
                    want = red(win)
                np.testing.assert_allclose(got[i, j], want,
                                           rtol=1e-12, atol=1e-12,
                                           err_msg=str((stat, i, j)))


@pytest.mark.parametrize('seed', [5, 6])
def test_fuzz_cubic_spline_plan_vs_gather(seed):
    rng = np.random.RandomState(seed)
    H, W = rng.randint(16, 30), rng.randint(16, 30)
    v = rng.rand(H, W).astype(np.float32)
    v[rng.rand(H, W) < 0.05] = np.nan
    rows1 = np.sort(rng.uniform(0, H - 1, size=11))
    cols1 = np.sort(rng.uniform(0, W - 1, size=9))
    R = np.broadcast_to(rows1[:, None], (11, 9))
    C = np.broadcast_to(cols1[None, :], (11, 9))
    gathered = np.asarray(map_coordinates(v[None], R, C,
                                          method='cubic_spline'))[0]
    wy, wym, vy = axis_weights(rows1, H, 'cubic_spline')
    wx, wxm, vx = axis_weights(cols1, W, 'cubic_spline')
    planned = np.asarray(matmul_resample(
        jnp.asarray(v), jnp.asarray(wy), jnp.asarray(wym),
        jnp.asarray(wx), jnp.asarray(wxm), jnp.asarray(vy),
        jnp.asarray(vx), np.float32(np.nan), expected=16.0))
    np.testing.assert_allclose(planned, gathered, rtol=1e-4,
                               atol=1e-5, equal_nan=True)
