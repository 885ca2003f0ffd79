"""Gather-based resampling on device.

This is the TPU replacement for the GDAL warper the reference calls into
(``rasterio.warp.reproject``, /root/reference/nd/warp.py:758-767): the
destination grid is mapped to fractional source pixel coordinates (host
or device), and the values are gathered + interpolated on the TPU.
Nearest and bilinear modes with NaN nodata semantics (any out-of-range
target, or any NaN contributor, yields NaN).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ['map_coordinates', 'grid_from_transforms',
           'separable_coords', 'axis_weights', 'matmul_resample',
           'footprint_axis', 'footprint_resample', 'FOOTPRINT_STATS']


def _catmull_weights(t, xp=jnp):
    """Catmull-Rom (a = -0.5, the GDAL 'cubic' kernel) tap weights for
    offsets (-1, 0, 1, 2) at fraction ``t`` in [0, 1)."""
    w0 = ((-t + 2.0) * t - 1.0) * t * 0.5
    w1 = ((3.0 * t - 5.0) * t * t + 2.0) * 0.5
    w2 = ((-3.0 * t + 4.0) * t + 1.0) * t * 0.5
    w3 = (t - 1.0) * t * t * 0.5
    return (w0, w1, w2, w3)


def _bspline_weights(t, xp=jnp):
    """Cubic B-spline tap weights for offsets (-1, 0, 1, 2) at
    fraction ``t`` in [0, 1) — GDAL's 'cubicspline'. An approximating
    (smoothing) kernel: taps are non-negative and sum to 1, so
    constants reproduce exactly, but the surface does not pass through
    the samples."""
    u = 1.0 - t
    w0 = u * u * u / 6.0
    w1 = (3.0 * t * t * t - 6.0 * t * t + 4.0) / 6.0
    w2 = (3.0 * (u * u * u - 2.0 * u * u) + 4.0) / 6.0
    w3 = t * t * t / 6.0
    return (w0, w1, w2, w3)


_LANCZOS_A = 3   # GDAL's lanczos window (6x6 support)


def _lanczos_weights(t, xp=jnp):
    """Normalized Lanczos-3 tap weights for offsets (-2..3) at
    fraction ``t`` in [0, 1). GDAL normalizes the truncated window so
    constants reproduce exactly; so do we."""
    a = float(_LANCZOS_A)
    taps = []
    for off in range(-(_LANCZOS_A - 1), _LANCZOS_A + 1):
        x = t - off
        # sinc(x) * sinc(x/a) with the removable singularity at 0
        px = np.pi * x
        safe = xp.where(x == 0, 1.0, px)
        w = xp.where(
            x == 0, 1.0,
            a * xp.sin(safe) * xp.sin(safe / a) / (safe * safe))
        taps.append(w)
    total = taps[0]
    for w in taps[1:]:
        total = total + w
    return [w / total for w in taps]


def map_coordinates(values, rows, cols, method='bilinear', cval=np.nan):
    """Sample ``values`` at fractional pixel coordinates.

    Parameters
    ----------
    values : array (..., H, W)
        Source raster(s); leading dims are batched.
    rows, cols : arrays of identical shape S
        Fractional pixel coordinates to sample at.
    method : {'bilinear', 'nearest', 'cubic', 'lanczos'}
        'cubic' is the Catmull-Rom 4x4 kernel (GDAL's cubic),
        'lanczos' the normalized Lanczos-3 6x6 window — both
        edge-clamped like the batched translate kernels.
    cval : float
        Fill value for out-of-bounds samples (default NaN).

    Returns
    -------
    array (..., *S)
    """
    values = jnp.asarray(values)
    if method in ('bilinear', 'cubic', 'cubic_spline', 'lanczos') \
            and values.dtype.kind not in 'fc':
        # fractional weights need a float accumulator: integer
        # rasters would truncate the weights to 0/1 (and the default
        # NaN cval cannot be represented at all) — promote like
        # warp._reproject_da does
        values = values.astype(jnp.float32)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    H, W = values.shape[-2], values.shape[-1]
    batch_shape = values.shape[:-2]
    out_shape = rows.shape

    flat = values.reshape((-1, H, W))
    r = rows.reshape(-1)
    c = cols.reshape(-1)

    if method == 'nearest':
        ri = jnp.round(r).astype(jnp.int32)
        ci = jnp.round(c).astype(jnp.int32)
        valid = (ri >= 0) & (ri < H) & (ci >= 0) & (ci < W)
        ri = jnp.clip(ri, 0, H - 1)
        ci = jnp.clip(ci, 0, W - 1)
        out = flat[:, ri, ci]
        if jnp.issubdtype(out.dtype, jnp.floating) or \
                jnp.issubdtype(out.dtype, jnp.complexfloating):
            # +-inf source samples resolve to NaN (the framework-wide
            # contract: any non-finite touched contributor yields NaN
            # — keeps the gather and matmul paths identical)
            out = jnp.where(jnp.isinf(out),
                            jnp.asarray(np.nan, out.dtype), out)
            fill = jnp.asarray(cval, out.dtype)          # NaN is fine
        else:
            # integer rasters can't hold NaN; use 0 as the nodata
            # sentinel (the reference's int-nodata convention)
            try:
                is_nan = bool(np.isnan(cval))
            except (TypeError, ValueError):
                is_nan = False
            fill = jnp.asarray(0 if is_nan else cval, out.dtype)
        out = jnp.where(valid[None, :], out, fill)
    elif method == 'bilinear':
        # tolerate float rounding at the raster boundary (identity
        # warps must keep edge pixels valid)
        eps = 1e-6
        valid = (r >= -eps) & (r <= H - 1 + eps) & \
            (c >= -eps) & (c <= W - 1 + eps)
        r = jnp.clip(r, 0, H - 1)
        c = jnp.clip(c, 0, W - 1)
        r0 = jnp.floor(r)
        c0 = jnp.floor(c)
        fr = (r - r0)
        fc = (c - c0)
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)
        r0c = jnp.clip(r0i, 0, H - 1)
        r1c = jnp.clip(r0i + 1, 0, H - 1)
        c0c = jnp.clip(c0i, 0, W - 1)
        c1c = jnp.clip(c0i + 1, 0, W - 1)
        v00 = flat[:, r0c, c0c]
        v01 = flat[:, r0c, c1c]
        v10 = flat[:, r1c, c0c]
        v11 = flat[:, r1c, c1c]
        fr = fr[None, :].astype(v00.dtype)
        fc = fc[None, :].astype(v00.dtype)
        out = (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc
               + v10 * fr * (1 - fc) + v11 * fr * fc)
        # an inf contributor surfaces as inf (positive weight) or NaN
        # (0 * inf); collapse both to NaN so every path agrees that
        # non-finite contributors yield NaN
        out = jnp.where(jnp.isinf(out),
                        jnp.asarray(np.nan, out.dtype), out)
        out = jnp.where(valid[None, :], out,
                        jnp.asarray(cval, out.dtype))
    elif method in ('cubic', 'cubic_spline', 'lanczos'):
        eps = 1e-6
        valid = (r >= -eps) & (r <= H - 1 + eps) & \
            (c >= -eps) & (c <= W - 1 + eps)
        r = jnp.clip(r, 0, H - 1)
        c = jnp.clip(c, 0, W - 1)
        r0 = jnp.floor(r)
        c0 = jnp.floor(c)
        fr = (r - r0).astype(flat.dtype)
        fc = (c - c0).astype(flat.dtype)
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)
        if method == 'cubic':
            wr, wc = _catmull_weights(fr), _catmull_weights(fc)
            first = -1
        elif method == 'cubic_spline':
            wr, wc = _bspline_weights(fr), _bspline_weights(fc)
            first = -1
        else:
            wr, wc = _lanczos_weights(fr), _lanczos_weights(fc)
            first = -(_LANCZOS_A - 1)
        # IEEE does the NaN bookkeeping: 0 * NaN = NaN, so every
        # touched non-finite contributor poisons the sum even at a
        # zero tap weight — matching the matmul plan's
        # weight-independent contributor count
        acc = jnp.zeros(flat.shape[:1] + r.shape, flat.dtype)
        for a in range(len(wr)):
            ra = jnp.clip(r0i + (a + first), 0, H - 1)
            for bb in range(len(wc)):
                cb = jnp.clip(c0i + (bb + first), 0, W - 1)
                w = (wr[a] * wc[bb])[None, :]
                acc = acc + flat[:, ra, cb] * w
        out = jnp.where(jnp.isinf(acc),
                        jnp.asarray(np.nan, acc.dtype), acc)
        out = jnp.where(valid[None, :], out,
                        jnp.asarray(cval, out.dtype))
    else:
        raise ValueError('unknown method %r' % method)

    return out.reshape(batch_shape + out_shape)


def separable_coords(rows, cols, atol=1e-6):
    """Detect a separable warp: ``rows`` varies only along axis 0 and
    ``cols`` only along axis 1 (within ``atol`` source pixels).

    True for every axis-aligned affine warp (resampling, crops, grid
    changes) and for CRS pairs whose forward map factors per axis —
    e.g. geographic <-> Mercator/Plate-Carree, where X depends only on
    longitude and Y only on latitude. Returns ``(rows_1d, cols_1d)``
    host arrays, or None.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    r1 = rows[:, :1]
    c1 = cols[:1, :]
    if np.all(np.abs(rows - r1) <= atol) \
            and np.all(np.abs(cols - c1) <= atol):
        return r1[:, 0], c1[0]
    return None


def axis_weights(coords, size, method):
    """Per-axis interpolation operator for a separable resample.

    Returns ``(W, Wm, valid)``: ``W`` (n_dst, size) f32 interpolation
    weights (rows sum to 1), ``Wm`` the contributor-count matrix (an
    entry per touched source sample, weight-independent — zero-weight
    bilinear neighbours count, matching the gather path's NaN
    propagation), and ``valid`` the in-range mask along this axis.
    """
    coords = np.asarray(coords, np.float64)
    n = len(coords)
    W = np.zeros((n, size), np.float32)
    Wm = np.zeros((n, size), np.float32)
    rng = np.arange(n)
    if method == 'nearest':
        idx = np.round(coords).astype(np.int64)
        valid = (idx >= 0) & (idx < size)
        idxc = np.clip(idx, 0, size - 1)
        W[rng, idxc] = 1.0
        Wm[rng, idxc] = 1.0
        return W, Wm, valid
    eps = 1e-6
    valid = (coords >= -eps) & (coords <= size - 1 + eps)
    r = np.clip(coords, 0, size - 1)
    r0 = np.floor(r)
    r0i = r0.astype(np.int64)
    if method == 'bilinear':
        fr = (r - r0).astype(np.float32)
        r1i = np.minimum(r0i + 1, size - 1)
        np.add.at(W, (rng, r0i), 1.0 - fr)
        np.add.at(W, (rng, r1i), fr)
        np.add.at(Wm, (rng, r0i), 1.0)
        np.add.at(Wm, (rng, r1i), 1.0)
        return W, Wm, valid
    if method in ('cubic', 'cubic_spline', 'lanczos'):
        fr = r - r0
        if method == 'cubic':
            taps = _catmull_weights(fr, xp=np)
            first = -1
        elif method == 'cubic_spline':
            taps = _bspline_weights(fr, xp=np)
            first = -1
        else:
            taps = _lanczos_weights(fr, xp=np)
            first = -(_LANCZOS_A - 1)
        for a in range(len(taps)):
            idx = np.clip(r0i + (a + first), 0, size - 1)
            np.add.at(W, (rng, idx), np.asarray(taps[a], np.float32))
            np.add.at(Wm, (rng, idx), 1.0)
        return W, Wm, valid
    if method == 'average':
        # GDAL's downsampling average: uniform over the source samples
        # whose centers fall inside the destination cell's footprint
        # (footprint width = the coordinate step, i.e. the scale
        # factor), normalized by the in-bounds contributor count
        step = np.abs(np.diff(coords))
        s = max(1.0, float(np.median(step))) if len(step) else 1.0
        lo = np.ceil(coords - s / 2.0 - 1e-9).astype(np.int64)
        hi = np.floor(coords + s / 2.0 - 1e-9).astype(np.int64)
        # never an empty window: degenerate cells take the nearest
        empty = hi < lo
        near = np.round(coords).astype(np.int64)
        lo = np.where(empty, near, lo)
        hi = np.where(empty, near, hi)
        span = int((hi - lo).max()) + 1 if n else 1
        for off in range(span):
            idx = lo + off
            inside = (idx <= hi) & (idx >= 0) & (idx < size)
            np.add.at(W, (rng[inside], idx[inside]), 1.0)
            np.add.at(Wm, (rng[inside], idx[inside]), 1.0)
        counts = W.sum(axis=1)
        valid = valid & (counts > 0)
        counts = np.where(counts > 0, counts, 1.0)
        W /= counts[:, None]
        return W, Wm, valid
    raise ValueError('unknown method %r' % method)


def matmul_resample(values, wy, wym, wx, wxm, valid_y, valid_x, cval,
                    expected, skipna=False):
    """Separable resample as two MXU matmuls (TPU fast path).

    ``out[..., i, j] = sum_hw wy[i, h] * values[..., h, w] * wx[j, w]``
    with the gather path's semantics: out-of-range along either axis
    yields ``cval``; any non-finite touched source sample
    (``expected`` of them, counted via the weight-independent
    ``wym``/``wxm``) yields NaN. On TPU this replaces per-pixel
    gathers — which XLA lowers serially — with dense matmuls at
    ~10x the throughput for typical raster sizes.

    ``skipna=True`` (the 'average' method) switches to a NaN-skipping
    weighted mean instead: non-finite contributors drop out of the
    normalization (GDAL's average-over-valid), and a cell with no
    finite contributor is NaN.
    """
    from jax import lax

    V = jnp.asarray(values)
    finite = jnp.isfinite(V)
    Vs = jnp.where(finite, V, jnp.zeros((), V.dtype))
    hp = lax.Precision.HIGHEST     # full f32 (bf16 passes lose ~1e-3)
    num = jnp.einsum('ih,...hw,jw->...ij', wy, Vs, wx, precision=hp)
    in_range = valid_y[:, None] & valid_x[None, :]
    if skipna:
        den = jnp.einsum('ih,...hw,jw->...ij', wy,
                         finite.astype(wy.dtype), wx, precision=hp)
        out = num / jnp.where(den > 1e-12, den, 1.0)
        out = jnp.where(den > 1e-12, out,
                        jnp.asarray(np.nan, V.dtype))
    else:
        cnt = jnp.einsum('ih,...hw,jw->...ij', wym,
                         finite.astype(wym.dtype), wxm, precision=hp)
        out = jnp.where(cnt > expected - 0.5, num,
                        jnp.asarray(np.nan, V.dtype))
    return jnp.where(in_range, out, jnp.asarray(cval, V.dtype))


# ---------------------------------------------------------------------------
# Footprint (order-statistic) resampling — GDAL's mode / min / max /
# med / q1 / q3 / sum / rms for downsampling warps
# ---------------------------------------------------------------------------

FOOTPRINT_STATS = ('mode', 'min', 'max', 'med', 'q1', 'q3', 'sum',
                   'rms')

# contributors per destination pixel beyond this would sort/scan huge
# windows per pixel — a deliberate >32x-per-axis downsample should
# coarsen() first
FOOTPRINT_SPAN_CAP = 1024


def footprint_axis(coords, size, fallback_step=1.0):
    """Per-axis contributor plan for the footprint statistics.

    Same footprint model as 'average' (see ``axis_weights``): the
    source samples whose centers fall inside the destination cell,
    whose width is the coordinate step (the scale factor). Returns
    ``(idx, inside, valid)``: ``idx`` (n, span) clipped int32 source
    indices, ``inside`` (n, span) the contributor mask, ``valid`` (n,)
    the destination in-range mask. A single-pixel axis has no
    coordinate step to measure; ``fallback_step`` (the affine scale
    ratio) supplies the cell width then.
    """
    coords = np.asarray(coords, np.float64)
    n = len(coords)
    step = np.abs(np.diff(coords))
    s = max(1.0, float(np.median(step)) if len(step)
            else float(fallback_step))
    lo = np.ceil(coords - s / 2.0 - 1e-9).astype(np.int64)
    hi = np.floor(coords + s / 2.0 - 1e-9).astype(np.int64)
    empty = hi < lo
    near = np.round(coords).astype(np.int64)
    lo = np.where(empty, near, lo)
    hi = np.where(empty, near, hi)
    span = int((hi - lo).max()) + 1 if n else 1
    idx = lo[:, None] + np.arange(span)[None, :]
    inside = (idx <= hi[:, None]) & (idx >= 0) & (idx < size)
    valid = inside.any(axis=1)
    return (np.clip(idx, 0, size - 1).astype(np.int32), inside, valid)


def _masked_mode(win, ok):
    """Most frequent finite value per window (last axis); ties go to
    the smallest value. O(s) via run lengths on the sorted window —
    no s^2 equality matrix, no per-pixel scatter (TPU rule: masked
    broadcast-reductions and cumulative scans only)."""
    from jax import lax

    s = win.shape[-1]
    big = jnp.asarray(np.inf, win.dtype)
    ws = jnp.sort(jnp.where(ok, win, big), axis=-1)
    pos = jnp.arange(s, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.ones(ws.shape[:-1] + (1,), bool),
         ws[..., 1:] != ws[..., :-1]], axis=-1)
    # first index of each element's run (cummax of run-start marks)
    start = lax.cummax(jnp.where(new_run, pos, 0), axis=win.ndim - 1)
    # last index: reversed cummax trick on the run-end marks
    end_mark = jnp.concatenate(
        [new_run[..., 1:], jnp.ones(ws.shape[:-1] + (1,), bool)],
        axis=-1)
    rev = jnp.flip(jnp.where(end_mark, pos, s - 1), axis=-1)
    end = jnp.flip(lax.cummin(rev, axis=win.ndim - 1), axis=-1)
    length = jnp.where(jnp.isfinite(ws), end - start + 1, 0)
    # argmax returns the FIRST maximum — the smallest value, since the
    # window is sorted ascending; select with a one-hot reduce
    sel = (pos == jnp.argmax(length, axis=-1)[..., None])
    mode = jnp.sum(jnp.where(sel, ws, jnp.zeros((), ws.dtype)),
                   axis=-1)
    return jnp.where(ok.any(axis=-1), mode,
                     jnp.asarray(np.nan, ws.dtype))


def footprint_resample(values, idx_y, in_y, valid_y, idx_x, in_x,
                       valid_x, stat, cval):
    """Footprint resample: GDAL's order-statistic methods on the
    sample-center footprint model (separable warps only).

    Each destination pixel reduces its (span_y x span_x) contributor
    window with ``stat``, skipping non-finite contributors the way
    GDAL skips nodata. An in-range window with no finite contributor
    yields NaN; an out-of-range destination yields ``cval``. ``med``/
    ``q1``/``q3`` use linear quantile interpolation (numpy's default);
    ``mode`` resolves ties to the smallest value (deterministic, where
    GDAL's tie order is scan-dependent).
    """
    V = jnp.asarray(values)
    ny, sy = idx_y.shape
    nx, sx = idx_x.shape
    A = jnp.take(V, jnp.asarray(idx_y).reshape(-1), axis=-2)
    A = A.reshape(V.shape[:-2] + (ny, sy, V.shape[-1]))
    B = jnp.take(A, jnp.asarray(idx_x).reshape(-1), axis=-1)
    B = B.reshape(V.shape[:-2] + (ny, sy, nx, sx))
    B = jnp.moveaxis(B, -3, -2)                 # (..., ny, nx, sy, sx)
    win = B.reshape(V.shape[:-2] + (ny, nx, sy * sx))
    mask = (jnp.asarray(in_y)[:, None, :, None]
            & jnp.asarray(in_x)[None, :, None, :]).reshape(ny, nx,
                                                           sy * sx)
    ok = mask & jnp.isfinite(win)
    any_ok = ok.any(axis=-1)
    nanv = jnp.asarray(np.nan, V.dtype)
    if stat == 'mode':
        out = _masked_mode(win, ok)
    elif stat == 'min':
        out = jnp.min(jnp.where(ok, win, jnp.asarray(np.inf, V.dtype)),
                      axis=-1)
        out = jnp.where(any_ok, out, nanv)
    elif stat == 'max':
        out = jnp.max(jnp.where(ok, win,
                                jnp.asarray(-np.inf, V.dtype)),
                      axis=-1)
        out = jnp.where(any_ok, out, nanv)
    elif stat == 'sum':
        out = jnp.sum(jnp.where(ok, win, jnp.zeros((), V.dtype)),
                      axis=-1)
        out = jnp.where(any_ok, out, nanv)
    elif stat == 'rms':
        cnt = jnp.sum(ok, axis=-1)
        sq = jnp.sum(jnp.where(ok, win * win, jnp.zeros((), V.dtype)),
                     axis=-1)
        out = jnp.sqrt(sq / jnp.maximum(cnt, 1).astype(V.dtype))
        out = jnp.where(any_ok, out, nanv)
    elif stat in ('med', 'q1', 'q3'):
        q = {'med': 0.5, 'q1': 0.25, 'q3': 0.75}[stat]
        out = jnp.nanquantile(jnp.where(ok, win, nanv), q, axis=-1)
        out = out.astype(V.dtype)
    else:
        raise ValueError('unknown footprint stat %r' % (stat,))
    in_range = jnp.asarray(valid_y)[:, None] & jnp.asarray(valid_x)
    return jnp.where(in_range, out, jnp.asarray(cval, V.dtype))


def grid_from_transforms(dst_transform, dst_shape, src_transform,
                         src_crs=None, dst_crs=None, xp=jnp):
    """Fractional source-pixel coordinates for every destination pixel.

    Uses the framework's corner-grid convention: the coordinate of pixel
    (row, col) is ``transform * (col, row)``. CRS transforms run as pure
    array math (device-capable via ``nd_tpu.crs.transform_coords``).
    """
    from ..crs import transform_coords

    height, width = dst_shape
    jj = xp.arange(width, dtype=xp.float64 if xp is np else None)
    ii = xp.arange(height, dtype=xp.float64 if xp is np else None)
    J, I = xp.meshgrid(jj, ii)
    X = dst_transform.a * J + dst_transform.b * I + dst_transform.c
    Y = dst_transform.d * J + dst_transform.e * I + dst_transform.f

    if src_crs is not None and dst_crs is not None and \
            not (src_crs == dst_crs):
        X, Y = transform_coords(dst_crs, src_crs, X, Y, xp=xp)

    from ..crs.affine import Affine
    inv = ~src_transform if isinstance(src_transform, Affine) \
        else ~Affine(*src_transform)
    cols = inv.a * X + inv.b * Y + inv.c
    rows = inv.d * X + inv.e * Y + inv.f
    return rows, cols
