"""Complex-Wishart omnibus change detection (Conradsen et al. 2016) on
TPU.

Algorithmic redesign of the reference's per-pixel Cython loop
(/root/reference/nd/_change.pyx:224-287): instead of a data-dependent
``while`` per pixel under OpenMP, every pixel advances in lockstep
through a masked ``lax.while_loop``:

  1. per iteration, cumulative sums of the l-masked series give the
     statistics of every window [l, t] in one O(k) pass (t-space
     formulation — no gathers, no O(k^2) per-window reductions);
  2. the chi-square decision ``P(z) > alpha`` is equivalent to a
     z-threshold compare per window length (rho/f/omega2 depend only on
     length and looks), with the thresholds solved on the host in
     float64 — no incomplete-gamma on device;
  3. each active pixel jumps to its first significant change point; the
     loop runs at most ``k - 1`` iterations and exits early when no
     pixel is active (typical cubes: a handful of iterations).

The test statistic follows the reference exactly (dual-pol p=2):
z = -2 rho n (p k log k + log prod|det| - k log det(sum)), probability
P1 + omega2 (P2 - P1) with Pi = chi2-CDF — a change is flagged when the
probability exceeds ``alpha`` (_change.pyx:239-253). Negative
determinants produce NaN statistics exactly like ``log`` of a negative
product in C, and NaN never flags a change.

``change_detection_pallas`` (fast f32) and ``change_detection_hybrid``
(fast + float64-exact margin patching) build on the same formulation.
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .stats import chi2_cdf

__all__ = ['omnibus_probabilities', 'change_detection',
           'change_detection_hybrid', 'omnibus_z']

_P = 2.0  # dual-pol covariance matrices are 2x2


def omnibus_z(ts, n):
    """-2 rho logQ statistic over a full (k, 4) series (reference _z,
    /root/reference/nd/_change.pyx:46-77). For testing/inspection."""
    ts = jnp.asarray(ts)
    k = ts.shape[0]
    dets = ts[:, 0] * ts[:, 3] - ts[:, 1] ** 2 - ts[:, 2] ** 2
    sums = ts.sum(axis=0)
    det_of_sum = sums[0] * sums[3] - sums[1] ** 2 - sums[2] ** 2
    sign = jnp.prod(jnp.sign(dets))
    log_prod = jnp.sum(jnp.log(jnp.abs(dets)))
    log_prod = jnp.where(sign > 0, log_prod, jnp.nan)
    logQ = n * (_P * k * jnp.log(float(k)) + log_prod
                - k * jnp.log(det_of_sum))
    rho = 1 - (2 * _P ** 2 - 1) / (6 * (k - 1) * _P) \
        * (k / n - 1 / (n * k))
    return -2 * rho * logQ


def _window_probability(csum, logdet, negcnt, j, n, dtype):
    """Omnibus probability for windows of length ``j`` given interval
    sums. All arguments broadcast; ``j`` is a (possibly array) float."""
    c11, c12r, c12i, c22 = csum
    det_of_sum = c11 * c22 - c12r ** 2 - c12i ** 2
    k = j
    log_prod = jnp.where(negcnt % 2 == 0, logdet, jnp.nan)
    logQ = n * (_P * k * jnp.log(k) + log_prod
                - k * jnp.log(det_of_sum))
    rho = 1 - (2 * _P ** 2 - 1) / (6 * (k - 1) * _P) \
        * (k / n - 1 / (n * k))
    z = -2 * rho * logQ
    f = (k - 1) * _P ** 2
    omega2 = (_P ** 2 * (_P ** 2 - 1) / (24 * rho ** 2)
              * (k / n ** 2 - 1 / (n * k) ** 2)
              - _P ** 2 * (k - 1) / 4 * (1 - 1 / rho) ** 2)
    P1 = chi2_cdf(z, f)
    P2 = chi2_cdf(z, f + 4)
    return P1 + omega2 * (P2 - P1)


def omnibus_rho(j, n):
    """rho coefficient per window length (host-side, float64)."""
    j = np.asarray(j, np.float64)
    return 1 - (2 * _P ** 2 - 1) / (6 * (j - 1) * _P) \
        * (j / n - 1 / (n * j))


def omnibus_thresholds(k, n, alpha):
    """Per-window-length z-thresholds equivalent to ``P(z) > alpha``.

    The chi-square probability P(z) = P1 + omega2 (P2 - P1) depends on
    the pixel only through z: rho, f and omega2 are functions of the
    window length j and the look count n alone. The decision
    ``P(z) > alpha`` is therefore equivalent to ``z > z*(j)`` with the
    threshold solved once on the host in float64 — removing the
    incomplete-gamma evaluation from the device kernel entirely (it
    dominated the fused kernel's runtime) while making the decisions
    *more* accurate than f32 igamma.

    Returns an array of length k+1; entries j < 2 are +inf.
    """
    from scipy.stats import chi2 as _chi2
    out = np.full(k + 1, np.inf)
    for j in range(2, k + 1):
        rho = float(omnibus_rho(j, n))
        f = (j - 1) * _P ** 2
        omega2 = (_P ** 2 * (_P ** 2 - 1) / (24 * rho ** 2)
                  * (j / n ** 2 - 1 / (n * j) ** 2)
                  - _P ** 2 * (j - 1) / 4 * (1 - 1 / rho) ** 2)

        def prob(z):
            p1 = _chi2.cdf(z, f)
            p2 = _chi2.cdf(z, f + 4)
            return p1 + omega2 * (p2 - p1)

        lo, hi = 0.0, 1.0
        while prob(hi) <= alpha and hi < 1e12:
            hi *= 2
        if prob(hi) <= alpha:
            out[j] = np.inf
            continue
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if prob(mid) > alpha:
                hi = mid
            else:
                lo = mid
        out[j] = hi
    return out


def omnibus_probabilities(values, n=1):
    """Omnibus probability of the full series per pixel.

    values: (..., time, 4) -> probability (...,).
    """
    values = jnp.asarray(values)
    k = values.shape[-2]
    dets = (values[..., 0] * values[..., 3]
            - values[..., 1] ** 2 - values[..., 2] ** 2)
    csum = tuple(values[..., c].sum(axis=-1) for c in range(4))
    logdet = jnp.sum(jnp.log(jnp.abs(dets)), axis=-1)
    negcnt = jnp.sum((dets < 0).astype(jnp.int32), axis=-1)
    dtype = values.dtype
    return _window_probability(csum, logdet, negcnt,
                               jnp.asarray(float(k), dtype), float(n),
                               dtype)


@partial(jax.jit, static_argnames=('alpha', 'n', 'stat_dtype'))
def change_detection(values, alpha, n=1, stat_dtype='mixed'):
    """Iterative omnibus change-point detection.

    TPU note: the body is written entirely with broadcast compares and
    masked reductions — no gathers or scatters, which XLA lowers
    serially on TPU. Interval statistics over [l, l+j) are masked sums
    ``sum_t x[t] * (l <= t < l+j)``; the change flags are set with a
    one-hot comparison against the jump target.

    Parameters
    ----------
    values : array, shape (y, x, time, 4)
        Covariance channels [C11, C12.re, C12.im, C22] per time step
        (already multilooked with ``n`` looks).
    alpha : float
        Decision threshold on the chi-square probability.
    n : int
        Number of looks.
    stat_dtype : dtype or 'mixed', optional
        Statistic precision. The default 'mixed' accumulates channel
        sums in the input precision (the reference Cython kernel's own
        convention) and runs the determinant/log/decision math in
        float64 — reference-exact decisions at ~1.4x the full-f64
        speed. Pass float32 for maximum throughput (~1e-5 decision
        disagreement) or float64 to force everything wide.

    Returns
    -------
    bool array, shape (y, x, time)
        True where a change was detected at that time step.
    """
    values = jnp.asarray(values)
    if not jnp.issubdtype(values.dtype, jnp.floating):
        values = values.astype(jnp.float32)
    if stat_dtype in ('float32', jnp.float32):
        # fast mode: the fused Pallas kernel is bit-identical to the
        # f32 XLA path and ~2x faster (and compiles ~30x faster)
        from .change_pallas import (change_detection_pallas,
                                    supports_pallas)
        if supports_pallas():
            return change_detection_pallas(values, alpha, n=n)
    mixed = (stat_dtype == 'mixed')
    if mixed:
        # channel accumulation in the INPUT precision (the reference
        # Cython kernel declares its channel sums `floating`,
        # _change.pyx:53), determinant/log/statistic math in float64
        sdtype = values.dtype
        ldtype = jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 \
            else jnp.dtype(jnp.float32)
    else:
        try:
            sdtype = jnp.dtype(stat_dtype)
            if sdtype == jnp.float64 and not jax.config.jax_enable_x64:
                sdtype = jnp.float32
        except TypeError:
            sdtype = values.dtype
        ldtype = sdtype
    ny, nx, k, _ = values.shape
    nf = float(n)

    chans = [values[..., c].astype(sdtype) for c in range(4)]  # (y,x,k)
    dets = (chans[0] * chans[3] - chans[1] ** 2 - chans[2] ** 2)
    logdet_t = jnp.log(jnp.abs(dets).astype(ldtype))
    neg_t = (dets < 0).astype(sdtype)
    series = chans + [logdet_t, neg_t]  # per-channel dtypes preserved

    tt = jnp.arange(k)[None, None, :]                  # time index

    # Host-precomputed per-window-length thresholds: the chi-square
    # decision becomes a z-threshold compare (no igamma on device).
    z_thresh_table = omnibus_thresholds(k, n, float(alpha))

    # For the float64 statistic path, fold rho and the j*log(j) term
    # into the threshold as well:
    #   z > thresh  ⇔  -2·rho·logQ > thresh
    #               ⇔  n·log_prod − n·j·log(det_of_sum) < C_j,
    #   C_j = −thresh_j/(2·rho_j) − n·P·j·ln j          (host, f64)
    # Emulated float64 on TPU pays per operation; this removes the
    # per-element divisions (rho) and the second transcendental (ln j)
    # from the loop body. Valid whenever rho_j > 0 (true for p=2, n>=1).
    with np.errstate(divide='ignore', invalid='ignore'):
        _rho_tab = omnibus_rho(np.arange(k + 1), n)
    folded_table = np.full(k + 1, -np.inf)
    use_folded = ldtype == jnp.float64
    for j in range(2, k + 1):
        if np.isfinite(z_thresh_table[j]):
            if _rho_tab[j] <= 0:
                use_folded = False
                break
            folded_table[j] = (-z_thresh_table[j] / (2 * _rho_tab[j])
                               - n * _P * j * np.log(j))

    def cond(state):
        i, l, active, result = state
        return jnp.logical_and(i < k - 1, jnp.any(active))

    def body(state):
        i, l, active, result = state
        lc = l[..., None]                              # (y,x,1)
        ge_l = (tt >= lc)                              # (y,x,k)

        # t-space formulation: the window [l, t] (inclusive) has length
        # j_t = t - l + 1; its channel sums are cumulative sums of the
        # l-masked series — O(k) work per iteration instead of the
        # O(k^2) per-window reductions, and the global test is simply
        # the t = k-1 entry (no per-pixel indexing anywhere).
        def csum(x):
            return jnp.cumsum(x * ge_l.astype(x.dtype), axis=-1)

        c11 = csum(series[0]).astype(ldtype)
        c12r = csum(series[1]).astype(ldtype)
        c12i = csum(series[2]).astype(ldtype)
        c22 = csum(series[3]).astype(ldtype)
        logdet = csum(series[4])
        odd_neg = (csum(series[5]).astype(jnp.int32) % 2) == 1

        jt = (tt - lc + 1).astype(ldtype)              # window length
        det_of_sum = c11 * c22 - c12r ** 2 - c12i ** 2
        log_prod = jnp.where(odd_neg, jnp.nan, logdet)
        jt_i = tt - lc + 1                             # (y,x,k) int

        if use_folded:
            # folded form: one f64 log + fused multiply-compare per
            # element (rho, ln j and the threshold live in C_j)
            stat = nf * log_prod - (nf * jt) * jnp.log(det_of_sum)
            c_t = jnp.full(jt_i.shape, -jnp.inf, ldtype)
            for j in range(2, k + 1):
                cj = float(folded_table[j])
                if np.isfinite(cj):
                    c_t = jnp.where(jt_i == j, jnp.asarray(cj, ldtype),
                                    c_t)
            hit = jnp.logical_and(stat < c_t, tt >= lc + 1)  # j >= 2
        else:
            logQ = nf * (_P * jt * jnp.log(jt) + log_prod
                         - jt * jnp.log(det_of_sum))
            rho_t = 1 - (2 * _P ** 2 - 1) / (6 * (jt - 1) * _P) \
                * (jt / nf - 1 / (nf * jt))
            z = -2 * rho_t * logQ                      # (y,x,k)

            # per-length threshold shifted into t-space: accumulate the
            # small host table with scalar one-hot compares (no 4-D
            # temp)
            thresh_t = jnp.full(jt_i.shape, jnp.inf, ldtype)
            for j in range(2, k + 1):
                tj = float(z_thresh_table[j])
                if np.isfinite(tj):
                    thresh_t = jnp.where(jt_i == j,
                                         jnp.asarray(tj, ldtype),
                                         thresh_t)

            hit = jnp.logical_and(z > thresh_t, tt >= lc + 1)  # j >= 2

        # global test over ts[l:] is the t = k-1 entry
        active = jnp.logical_and(active, hit[..., k - 1])

        any_hit = jnp.any(hit, axis=-1)                # guaranteed when
        t_first = jnp.argmax(hit, axis=-1)             # active
        # change point at l + r = t_first; dry scans jump to k-1
        pos = jnp.where(any_hit, t_first, k - 1).astype(l.dtype)
        pos = jnp.maximum(pos, l + 1)

        set_mask = jnp.logical_and(active, any_hit)    # (y,x)
        upd = jnp.logical_and(tt == pos[..., None],
                              set_mask[..., None])
        result = jnp.logical_or(result, upd)

        l = jnp.where(active, pos, l)
        active = jnp.logical_and(active, l < k - 1)
        return (i + 1, l, active, result)

    init = (jnp.asarray(0),
            jnp.zeros((ny, nx), jnp.int32),
            jnp.ones((ny, nx), bool),
            jnp.zeros((ny, nx, k), bool))
    _, _, _, result = lax.while_loop(cond, body, init)
    return result


def change_detection_hybrid(values, alpha, n=1, margin_eps=1e-3,
                            nthreads=0, values_host=None,
                            return_device=False):
    """Exact change detection at fast-mode speed (TPU only).

    Runs the fused f32 Pallas kernel, which also reports each pixel's
    smallest relative decision margin |z - threshold|/|threshold| over
    every comparison its scan made. Pixels whose margin is below
    ``margin_eps`` — the only ones whose f32 decisions could differ
    from float64 (f32 z carries ~1e-6 relative error; the default
    margin keeps a ~1000x safety factor) — are recomputed exactly with
    the native float64 CPU kernel and patched in. Typical cubes flag a
    small fraction of pixels, so throughput is essentially the Pallas
    kernel's.

    Host-driven (not jittable); ``OmnibusTest`` uses it automatically
    on TPU.

    Parameters
    ----------
    values : array (y, x, time, 4)
        Device or host array; pass ``values_host`` alongside a device
        array to avoid a device->host copy for the patch step.
    return_device : bool, optional
        Return the (patched) device array instead of numpy.
    """
    from .change_pallas import change_detection_pallas, supports_pallas

    if not supports_pallas():
        out = change_detection(values, alpha=alpha, n=n)
        return out if return_device else np.asarray(out)

    if values_host is None and isinstance(values, np.ndarray):
        values_host = values
    values_dev = jnp.asarray(values, jnp.float32)
    k = values_dev.shape[2]

    packed, sus_packed, rest = _packed_fast_kernel(
        float(alpha), int(n), int(k), float(margin_eps))(values_dev)
    packed_np = np.asarray(packed)                # 1-4 B/pixel d2h
    sus_np = np.asarray(sus_packed)               # 1 bit/pixel d2h
    _, nbits = _flag_pack_dtype(k)
    nbits = min(k, nbits)
    ny, nx = packed_np.shape
    # unpackbits on the little-endian byte view is ~25x faster than
    # broadcast shift-and-mask for megapixel maps
    bytes_view = packed_np.astype(packed_np.dtype.newbyteorder('<'),
                                  copy=False).view(np.uint8) \
        .reshape(ny, nx, -1)
    result = np.unpackbits(bytes_view, axis=-1,
                           bitorder='little')[..., :nbits].astype(bool)
    if k > nbits:
        result = np.concatenate(
            [result, np.asarray(rest).astype(bool)], axis=-1)

    suspect = np.unpackbits(sus_np.astype(np.uint8), axis=-1,
                            bitorder='little').reshape(ny, -1)[:, :nx] \
        .astype(bool)
    n_suspect = int(suspect.sum())

    if n_suspect:
        if values_host is None:
            # pull the ORIGINAL (possibly f64) values, not the f32
            # kernel copy — the patch must be exact in input precision
            values_host = np.asarray(values)
        ys, xs = np.nonzero(suspect)
        series = np.asarray(values_host)[ys, xs].astype(np.float64)
        try:
            from .._native import change_detection_native
            patched = change_detection_native(
                series[:, None], alpha, n=n,
                nthreads=nthreads or min(8, n_suspect // 64 + 1))[:, 0]
        except Exception:
            # pure-python exact fallback (slow; native lib missing)
            patched = np.stack([
                _single_pixel_exact(series[i], alpha, n)
                for i in range(n_suspect)])
        result[ys, xs] = patched

    if return_device:
        return jnp.asarray(result)
    return result


def _flag_pack_dtype(k):
    """Smallest signed dtype whose positive range holds k flag bits."""
    if k <= 7:
        return jnp.int8, 7
    if k <= 15:
        return jnp.int16, 15
    return jnp.int32, 31


@functools.lru_cache(maxsize=32)
def _packed_fast_kernel(alpha, n, k, margin_eps):
    """Cached jit: Pallas fast kernel + on-device packing. The change
    flags cross the host link in the smallest dtype that holds k bits
    (1-4 bytes/pixel) and the margin test collapses to a bit-packed
    suspect mask (1 bit/pixel) — the float margins never leave HBM."""
    from .change_pallas import change_detection_pallas

    dtype, nbits = _flag_pack_dtype(k)

    @jax.jit
    def run(v):
        flags, margin = change_detection_pallas(v, alpha, n=n,
                                                return_margin=True)
        weights = jnp.asarray(2 ** np.arange(min(k, nbits)), dtype)
        # pin the accumulator dtype: x64 mode would promote the sum to
        # int64 and quadruple the d2h payload
        packed = jnp.sum(flags[..., :nbits].astype(dtype) * weights,
                         axis=-1, dtype=dtype)
        rest = flags[..., nbits:] if k > nbits else jnp.zeros((),
                                                              jnp.int8)
        # suspect = margin <= eps (NaN-inclusive), 8 pixels per byte
        suspect = ~(margin > jnp.float32(margin_eps))
        ny, nx = suspect.shape
        pad = (-nx) % 8
        if pad:
            suspect = jnp.pad(suspect, ((0, 0), (0, pad)))
        bits = jnp.asarray(2 ** np.arange(8), jnp.uint8)
        sus_packed = jnp.sum(
            suspect.reshape(ny, -1, 8).astype(jnp.uint8) * bits,
            axis=-1, dtype=jnp.uint8)
        return packed, sus_packed, rest

    return run


def _single_pixel_exact(ts, alpha, n):
    """Float64 exact scan for one pixel (patch-step fallback)."""
    k = ts.shape[0]
    thresholds = omnibus_thresholds(k, n, float(alpha))

    def z_of(l, j):
        seg = ts[l:l + j]
        dets = (seg[:, 0] * seg[:, 3] - seg[:, 1] ** 2
                - seg[:, 2] ** 2)
        s = seg.sum(axis=0)
        det_sum = s[0] * s[3] - s[1] ** 2 - s[2] ** 2
        with np.errstate(divide='ignore', invalid='ignore'):
            logp = np.sum(np.log(np.abs(dets)))
            if (dets < 0).sum() % 2 == 1:
                logp = np.nan
            logq = n * (_P * j * np.log(j) + logp
                        - j * np.log(det_sum))
        rho = float(omnibus_rho(j, n))
        return -2 * rho * logq

    result = np.zeros(k, dtype=bool)
    l = 0
    while True:
        if not (z_of(l, k - l) > thresholds[k - l]):
            break
        r = None
        for j in range(2, k - l + 1):
            r = j - 1
            if z_of(l, j) > thresholds[j]:
                result[l + r] = True
                break
        if r is None:
            break
        l += r
        if l >= k - 1:
            break
    return result
