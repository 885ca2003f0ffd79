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
           'change_detection_hybrid', 'change_detection_exact',
           'omnibus_z']

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


@partial(jax.jit, static_argnames=('alpha', 'n', 'stat_dtype',
                                   'unroll'))
def change_detection(values, alpha, n=1, stat_dtype='mixed',
                     unroll=False):
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
        disagreement) or float64 to force everything wide. The
        interval sums accumulate STRICTLY left-to-right (a lax.scan,
        not jnp.cumsum), so the decisions are a well-defined function
        of each pixel's series — bit-stable across batch shapes and
        backends, in the reference kernel's own add order — which is
        what makes 'mixed' usable as the exact-mode parity target.
    unroll : bool, optional
        Statically unroll the restart loop (k-1 rounds, no early
        exit). The body is a no-op for inactive pixels, so the result
        is identical; one straight-line XLA graph avoids the per-
        iteration launch overhead of ``while_loop``, which dominates
        on small pixel counts (the exact-mode patch rescan uses this).

    Returns
    -------
    bool array, shape (y, x, time)
        True where a change was detected at that time step.
    """
    values = jnp.asarray(values)
    if not jnp.issubdtype(values.dtype, jnp.floating):
        values = values.astype(jnp.float32)
    if stat_dtype in ('float32', jnp.float32):
        # fast mode: the fused Pallas kernel computes the same f32
        # decision rule ~2x faster (and compiles ~30x faster). Its
        # decisions agree with this XLA path everywhere both logs are
        # exact (CPU interpret tests assert equality); on real TPU the
        # kernel's _mlog is ~1e-7-accurate while the XLA path inherits
        # the builtin log's ~1e-4 absolute error, so rare
        # near-threshold pixels can differ — in the kernel's favor.
        from .change_pallas import (change_detection_pallas,
                                    supports_pallas)
        if supports_pallas(values.shape[2]):
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
    # (k, y, x) layout: the interval sums below accumulate with
    # lax.scan over the leading (time) axis, and everything downstream
    # is elementwise with time leading
    series = [jnp.moveaxis(a, -1, 0)
              for a in chans + [logdet_t, neg_t]]

    tt = jnp.arange(k)[:, None, None]                  # time index

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
        lc = l[None]                                   # (1,y,x)

        # t-space formulation: the window [l, t] (inclusive) has length
        # j_t = t - l + 1; its channel sums are cumulative sums of the
        # l-masked series — O(k) work per iteration instead of the
        # O(k^2) per-window reductions, and the global test is simply
        # the t = k-1 entry (no per-pixel indexing anywhere).
        #
        # The prefix sums accumulate with a SEQUENTIAL lax.scan, not
        # jnp.cumsum: XLA's cumsum lowering reassociates the f32 adds
        # differently per batch shape (measured on TPU: the same pixel
        # series decides differently inside a (128,512,k) cube than as
        # a gathered (N,128,k) row batch at knife-edge windows), which
        # made the 'mixed' decisions an ill-defined parity target —
        # the exact mode's f64 patch rescan (a gathered batch) could
        # disagree with the same call on the full cube. The scan's
        # left-to-right order is bit-stable across shapes and
        # backends, IS the reference kernel's own accumulation order
        # (/root/reference/nd/_change.pyx:53-77, sequential adds from
        # the anchor), and matches the Pallas kernels' running sums
        # exactly (masked entries add +0.0, which preserves the bits).
        def step(carry, xs_t):
            x11, x12r, x12i, x22, ld, ng, t = xs_t
            m = t >= l                                 # (y,x)
            new = (carry[0] + jnp.where(m, x11, sdtype.type(0)),
                   carry[1] + jnp.where(m, x12r, sdtype.type(0)),
                   carry[2] + jnp.where(m, x12i, sdtype.type(0)),
                   carry[3] + jnp.where(m, x22, sdtype.type(0)),
                   carry[4] + jnp.where(m, ld, ldtype.type(0)),
                   carry[5] + jnp.where(m, ng, sdtype.type(0)))
            return new, new

        init_sums = (jnp.zeros((ny, nx), sdtype),) * 4 \
            + (jnp.zeros((ny, nx), ldtype),
               jnp.zeros((ny, nx), sdtype))
        _, sums = lax.scan(step, init_sums,
                           tuple(series) + (jnp.arange(k),))
        c11 = sums[0].astype(ldtype)
        c12r = sums[1].astype(ldtype)
        c12i = sums[2].astype(ldtype)
        c22 = sums[3].astype(ldtype)
        logdet = sums[4]
        odd_neg = (sums[5].astype(jnp.int32) % 2) == 1

        jt = (tt - lc + 1).astype(ldtype)              # window length
        det_of_sum = c11 * c22 - c12r ** 2 - c12i ** 2
        log_prod = jnp.where(odd_neg, jnp.nan, logdet)
        jt_i = tt - lc + 1                             # (k,y,x) int

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
            z = -2 * rho_t * logQ                      # (k,y,x)

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
        active = jnp.logical_and(active, hit[k - 1])

        any_hit = jnp.any(hit, axis=0)                 # guaranteed when
        t_first = jnp.argmax(hit, axis=0)              # active
        # change point at l + r = t_first; dry scans jump to k-1
        pos = jnp.where(any_hit, t_first, k - 1).astype(l.dtype)
        pos = jnp.maximum(pos, l + 1)

        set_mask = jnp.logical_and(active, any_hit)    # (y,x)
        upd = jnp.logical_and(tt == pos[None],
                              set_mask[None])
        result = jnp.logical_or(result, upd)

        l = jnp.where(active, pos, l)
        active = jnp.logical_and(active, l < k - 1)
        return (i + 1, l, active, result)

    init = (jnp.asarray(0),
            jnp.zeros((ny, nx), jnp.int32),
            jnp.ones((ny, nx), bool),
            jnp.zeros((k, ny, nx), bool))
    if unroll:
        state = init
        for _ in range(max(k - 1, 0)):
            state = body(state)
        result = state[3]
    else:
        _, _, _, result = lax.while_loop(cond, body, init)
    return jnp.moveaxis(result, 0, -1)


def _compact_indices(mask, capacity):
    """Flat indices of the first ``capacity`` True entries of ``mask``.

    TPU-friendly replacement for ``jnp.flatnonzero(size=...)`` (whose
    sort-based lowering blows scoped VMEM on megapixel masks): the
    flat mask is viewed as (rows, 128) lanes; an in-lane cumulative
    count plus a per-row offset scan assigns every True entry a rank,
    and the entry of each target rank is located with a searchsorted
    over the (small) row offsets followed by one row-gather and a lane
    compare. Entries past the true count resolve to an arbitrary valid
    index (clamped) — callers that only ever *patch* with exact values
    need no masking. Also returns the total count.
    """
    flat = mask.ravel()
    npix = flat.shape[0]
    lanes = 128
    rows = -(-npix // lanes)
    padded = jnp.pad(flat, (0, rows * lanes - npix))
    m2 = padded.reshape(rows, lanes).astype(jnp.int32)
    within = jnp.cumsum(m2, axis=1)                # (rows, lanes)
    row_off = jnp.cumsum(within[:, -1])            # (rows,) inclusive
    count = row_off[-1]
    targets = jnp.arange(1, capacity + 1, dtype=row_off.dtype)
    # 'compare_all' fuses into one broadcast-compare + lane reduce;
    # the default 'scan' binary search runs log2(rows) sequential
    # gather rounds, which cost ~0.4 ms at the bench grid (measured
    # ~4x this formulation). Gate on the product staying VPU-cheap.
    method = 'compare_all' if capacity * rows <= (64 << 20) else 'scan'
    b = jnp.searchsorted(row_off, targets, side='left', method=method)
    b = jnp.minimum(b, rows - 1)
    prev = jnp.where(b > 0, row_off.at[jnp.maximum(b - 1, 0)].get(
        indices_are_sorted=True), 0)
    p = targets - prev                             # rank within row
    rows_w = within.at[b].get(indices_are_sorted=True)
    rows_m = m2.at[b].get(indices_are_sorted=True)
    hit = jnp.logical_and(rows_w == p[:, None],
                          rows_m == 1)             # (capacity, lanes)
    c = jnp.argmax(hit, axis=1)
    idx = jnp.minimum(b * lanes + c, npix - 1)
    return idx, count


def _patch_capacity(ny, nx, capacity=None):
    """Effective f64-rescan capacity: default 1/128 of the pixels
    (min 4096), rounded UP to a 128-lane multiple. This is the exact
    number of suspect rows the device rescan patches, so overflow
    checks must compare against this value (comparing against the
    pre-rounded request would needlessly discard an already-exact
    result for counts inside the rounding slack)."""
    if capacity is None:
        capacity = max(4096, (ny * nx) // 128)
    capacity = int(min(capacity, ny * nx))
    return -(-capacity // 128) * 128


def _capacity_ladder(k, capacity, npix):
    """Rescan capacities tried in order inside the jitted exact scan.

    Short series (fused kernel, exact threshold immediates) have tiny
    suspect counts — typically hundreds per megapixel — so they rescan
    at a SMALL base rung (~npix/256, min 2048) and only escalate to
    the requested capacity when the count overflows: the f64 patch
    scales linearly with its capacity, and paying the full requested
    size every call cost the exact mode ~25% of its runtime at the
    bench config (4.2 ms of 18 ms for a 16384-capacity rescan whose
    true suspect count was <1k). Long series run the sequential-scan
    kernel whose polynomial-fit margin widening makes the suspect
    fraction grow with k, so their base rung is the full requested
    capacity with a second rung at 4x (capped at the grid size).
    Overflowing the LAST rung still means "not exact" — callers
    compare the returned count against ``_capacity_ladder(...)[-1]``.
    """
    from .change_pallas import _K_MAX

    if k > _K_MAX:
        # long-k suspect fractions land anywhere in [1%, 15%] of the
        # grid (the f32 error bound grows with window length), and
        # the patch cost is gather-LATENCY-bound — proportional to
        # the rung, not the true count. Geometric rungs keep the paid
        # capacity within 2x of the need (r5: the k=200 bench cube's
        # 7.6k suspects paid a 16384-row gather off the [cap, 4cap]
        # ladder; the 2x middle rung halves that patch).
        caps = [capacity]
        for mult in (2, 4):
            wide = -(-min(mult * capacity, npix) // 128) * 128
            if wide > caps[-1]:
                caps.append(wide)
    else:
        # ~npix/512 fits the measured short-k suspect density with
        # ~2x headroom (bench cube: 1088 suspects per 1 Mpix at the
        # default margin_eps = 1e-4; the patch cost is gather-latency
        # bound, so the rung size is paid even when the true count is
        # smaller), with geometric 4x escalation rungs so a busier
        # cube pays ~its need instead of jumping straight to the full
        # requested capacity
        base = -(-min(capacity, max(2048, npix // 512)) // 128) * 128
        caps = [base]
        while caps[-1] < capacity:
            wide = -(-min(4 * caps[-1], capacity) // 128) * 128
            if wide <= caps[-1]:
                break
            caps.append(wide)
    return tuple(caps)


@partial(jax.jit, static_argnames=('alpha', 'n', 'margin_eps',
                                   'capacity', 'interpret'))
def _change_detection_exact_packed(values, alpha, n, margin_eps,
                                   capacity, interpret=False):
    """Jittable exact scan: fast Pallas pass + on-device f64 patching.

    Returns ``(packed, n_suspect)`` with ``packed`` the (P, y, x)
    int32 bit-packed change planes (see
    :func:`~nd_tpu.ops.change_pallas.unpack_flags`). ``packed`` equals
    the float64 'mixed' decisions whenever ``n_suspect`` fits the
    capacity ladder (``_capacity_ladder(k, capacity, ny*nx)[-1]``),
    executed entirely in HBM: suspect pixels are compacted with a
    fixed-size sort-free flatnonzero, re-scanned with the f64
    formulation on a lane-friendly (cap/128, 128) grid, bit-packed and
    scattered back as SCALARS into the packed planes (a row scatter of
    (cap, k) bools serializes ~3x slower on TPU). Patching a
    non-suspect pixel with its exact decision is a no-op, so the
    capacity fill entries need no masking.
    """
    from .change_pallas import (_K_MAX, _round_cap,
                                change_detection_pallas)

    values = jnp.asarray(values)
    ny, nx, k, _ = values.shape
    capacity = -(-capacity // 128) * 128        # lane-friendly rescan
    if k <= _K_MAX:
        # round-capped: pixels needing more restarts than the cap
        # land in the suspect rescan (margin = -inf), so the unrolled
        # round loop shrinks ~2x at the bench k with decisions
        # unchanged
        packed, margin = change_detection_pallas(  # (P, ny, nx) int32
            values, alpha, n=n, return_margin=True,
            return_packed=True, interpret=interpret,
            max_rounds=_round_cap(k))
    else:
        # long series: the sequential-scan kernel (O(k) passes, no
        # round cap — any pixel's full restart chain in one pass);
        # its polynomial-threshold fit error rides the margins, so
        # sub-margin pixels land in the same f64 rescan below
        from .change_scan_pallas import change_detection_scan
        packed, margin = change_detection_scan(
            values, alpha, n=n, return_packed=True,
            interpret=interpret)
    nplanes = packed.shape[0]
    suspect = ~(margin > jnp.float32(margin_eps))   # NaN-inclusive
    count = jnp.sum(suspect.astype(jnp.int32))

    def patch_at(cap):
        idx, _ = _compact_indices(suspect, cap)
        # The real suspect indices come out sorted and unique, but the
        # capacity-fill entries past `count` resolve to an arbitrary
        # (clamped) pixel and may repeat it — so sort the whole vector
        # (cheap at <=64k lanes) to make the indices_are_sorted hint
        # legal, and do NOT claim unique_indices (a false hint is
        # undefined behavior in XLA's gather/scatter lowering).
        # Duplicate fills are benign: each gathers the same series,
        # rescans to the same decision, and scatters the same value.
        idx = jnp.sort(idx)
        # 2-D indexing, NOT values.reshape(ny*nx, ...).at[idx]: the
        # flat view merges the (y, x) TILED dims, which XLA lowers as
        # a relayout copy of the whole cube before the gather —
        # measured 1.3 ms of the exact mode's 6.4 ms at the bench
        # config (~300 GB/s copy-engine pass over 192 MB) for a
        # gather whose true payload is <1 MB. Row-major flat idx
        # sorted => (iy, ix) sorted lexicographically, so the hint
        # stays legal.
        iy_idx = idx // nx
        ix_idx = idx - iy_idx * nx
        series = values.at[iy_idx, ix_idx].get(
            indices_are_sorted=True)
        # (cap,) rows rescanned as a (cap/128, 128) grid: a (cap, 1)
        # grid would put the 128-lane axis on a size-1 dimension and
        # waste >10x
        series = series.reshape(cap // 128, 128, k, 4)
        # unroll only at short k: the straight-line graph beats the
        # while_loop's per-iteration launch overhead on the small
        # rescan grid, but its node count is O(k^2) — at the
        # long-series ceiling that one-time remote compile costs
        # minutes, the very blowup the round cap existed to avoid
        patched = change_detection(series, alpha, n=n,
                                   stat_dtype='mixed',
                                   unroll=(k <= _K_MAX))
        patched = patched.reshape(cap, k)
        out_planes = []
        for pp in range(nplanes):
            nb = min(31, k - 31 * pp)
            weights = jnp.asarray(2 ** np.arange(nb), jnp.int32)
            rows_packed = jnp.sum(
                patched[:, 31 * pp:31 * pp + nb].astype(jnp.int32)
                * weights, axis=-1, dtype=jnp.int32)
            # 2-D scatter for the same reason as the gather above
            # (ravel() of the (ny, nx) plane would relayout it twice)
            out_planes.append(
                packed[pp].at[iy_idx, ix_idx].set(
                    rows_packed, indices_are_sorted=True))
        return jnp.stack(out_planes)

    # Capacity ladder: suspect counts vary orders of magnitude —
    # hundreds per megapixel at short k (exact threshold immediates),
    # growing with k under the long-series kernel's fitted thresholds
    # (~1.3% at k=56, ~12% at k=200 on the bench cubes) — so a static
    # capacity either overpays every call or overflows long ones.
    # Patch at the base rung, and only when the count overflows take a
    # lax.cond branch that patches at the wider rung — the data picks
    # its own rescan size at runtime with no host round-trip, and a
    # rung is paid only when it is actually taken.
    caps = _capacity_ladder(k, capacity, ny * nx)

    def rung(i):
        # nested lax.cond chain over the (short) rung list: the data
        # picks the smallest capacity that fits its suspect count, so
        # the gather-latency-bound patch never pays more than ~2x the
        # need; overflow of the LAST rung still means "not exact"
        # (callers compare count against caps[-1])
        if i == len(caps) - 1:
            return patch_at(caps[i])
        return lax.cond(count <= caps[i],
                        lambda: patch_at(caps[i]),
                        lambda: rung(i + 1))

    packed = rung(0)
    return packed, count


@partial(jax.jit, static_argnames=('alpha', 'n', 'margin_eps',
                                   'capacity', 'interpret'))
def _change_detection_exact_core(values, alpha, n, margin_eps,
                                 capacity, interpret=False):
    """Boolean-flag view of :func:`_change_detection_exact_packed`."""
    from .change_pallas import unpack_flags

    k = values.shape[2]
    packed, count = _change_detection_exact_packed(
        values, alpha, n, margin_eps, capacity, interpret=interpret)
    return unpack_flags(packed, k), count


def change_detection_exact(values, alpha, n=1, margin_eps=1e-4,
                           capacity=None, interpret=False):
    """Exact change detection, fully device-resident (TPU).

    Same decisions as ``change_detection(..., stat_dtype='mixed')`` at
    nearly the fast f32 Pallas kernel's throughput: the fused kernel
    reports each pixel's smallest relative decision margin, and only
    the pixels whose margin is below ``margin_eps`` — the only ones
    whose f32 decisions could differ from float64 — are re-scanned on
    device in float64 via a fixed-capacity gather/rescan/scatter.

    The reported margins are already NET of a conservative per-pixel
    f32 error bound: the kernels subtract a determinant-conditioning
    term (64x safety on unit roundoff), a per-_mlog-evaluation term
    (1e-5 per log vs the ~6e-8 measured error) and, for long series,
    the threshold polynomial's bounded fit error — so ``margin_eps``
    guards only against that bound itself being violated. The default
    1e-4 retains ~100x the raw f32 relative error of z on top of the
    subtracted bound; every bench run re-verifies exact == mixed == 0
    mismatches under it. No
    host transfer happens unless the suspect count overflows
    ``capacity`` (default 1/128 of the pixels, min 4096, rounded up to
    a 128-lane multiple), in which case the full-grid 'mixed' scan
    runs instead.

    Requires jax x64 (the default here) for the float64 rescan; with
    ``ND_TPU_X64=0`` the rescan math degrades to f32 — use
    :func:`change_detection_hybrid`, which host-patches in that
    configuration.
    """
    from .change_pallas import supports_pallas_rescan

    if not (supports_pallas_rescan(np.shape(values)[2], n, alpha)
            or interpret):
        return change_detection(values, alpha=alpha, n=n,
                                stat_dtype='mixed')
    if not jax.config.jax_enable_x64:
        # a function named 'exact' must not quietly rescan in f32:
        # without x64 the device rescan degrades, so take the XLA
        # 'mixed' path whose scan dtype honors the f64 contract as
        # closely as this configuration allows (hybrid's host-patch
        # covers the truly-exact need, see change_detection_hybrid)
        return change_detection(values, alpha=alpha, n=n,
                                stat_dtype='mixed')
    values = jnp.asarray(values)
    if not jnp.issubdtype(values.dtype, jnp.floating):
        values = values.astype(jnp.float32)
    ny, nx = values.shape[:2]
    capacity = _patch_capacity(ny, nx, capacity)

    cap_max = _capacity_ladder(np.shape(values)[2], capacity,
                               ny * nx)[-1]

    def pallas_path(v):
        flags, count = _change_detection_exact_core(
            v, float(alpha), int(n), float(margin_eps), capacity,
            interpret=interpret)
        # the overflow check is also the launch probe: int(count)
        # blocks until the whole computation lands, so an async Pallas
        # launch failure surfaces right here inside the guard's try —
        # one tunnel round-trip instead of count-fetch + probe-fetch
        # (each costs ~25-40 ms of pure latency on tunneled backends)
        if int(count) > cap_max:   # rare
            return change_detection(v, alpha=alpha, n=n,
                                    stat_dtype='mixed')
        return flags

    def xla_path(v):
        return change_detection(v, alpha=alpha, n=n,
                                stat_dtype='mixed')

    from .pallas_guard import run_with_fallback
    return run_with_fallback(pallas_path, xla_path, values,
                             probe=False, name='change-exact')


def change_detection_hybrid(values, alpha, n=1, margin_eps=1e-4,
                            nthreads=0, values_host=None,
                            return_device=False, capacity=None):
    """Fail-safe wrapper: a transient Pallas launch failure inside
    :func:`_change_detection_hybrid` (the round-1 bench died on one)
    degrades to the numerically-exact XLA 'mixed' scan instead of
    propagating — the host transfers inside the impl surface async
    launch errors inside the guard, whose strike counter also feeds
    the session-wide Pallas circuit breaker."""
    from .pallas_guard import run_with_fallback

    def pallas_path(_):
        return _change_detection_hybrid(
            values, alpha, n=n, margin_eps=margin_eps,
            nthreads=nthreads, values_host=values_host,
            return_device=return_device, capacity=capacity)

    def xla_path(_):
        out = change_detection(jnp.asarray(values), alpha=alpha, n=n,
                               stat_dtype='mixed')
        return out if return_device else np.asarray(out)

    # probe=False: the impl's own host transfers already synchronize
    return run_with_fallback(pallas_path, xla_path, None,
                             probe=False, name='change-hybrid')


def _change_detection_hybrid(values, alpha, n=1, margin_eps=1e-4,
                             nthreads=0, values_host=None,
                             return_device=False, capacity=None):
    """Exact change detection at fast-mode speed (TPU only).

    Runs the fused f32 Pallas kernel, which also reports each pixel's
    smallest relative decision margin |z - threshold|/|threshold| over
    every comparison its scan made. Pixels whose margin is below
    ``margin_eps`` — the only ones whose f32 decisions could differ
    from float64 — are re-scanned ON DEVICE in
    float64 (fixed-capacity gather/rescan/scatter, see
    :func:`change_detection_exact`), and the boolean map crosses the
    host link bit-packed in the smallest dtype that holds k bits
    (1-4 B/pixel). Typical cubes flag a small fraction of pixels, so
    throughput is essentially the Pallas kernel's. Should the suspect
    count ever overflow the patch capacity (default 1/128 of the
    pixels), the full-grid float64 'mixed' scan runs instead — the
    result is exact either way.

    Host-driven (not jittable); ``OmnibusTest`` uses it automatically
    on TPU. With jax x64 disabled (``ND_TPU_X64=0``) the patch step
    runs on the host with the native f64 kernel instead (the device
    rescan cannot hold float64 then); ``nthreads``/``values_host``
    apply to that path.

    Parameters
    ----------
    values : array (y, x, time, 4)
        Device or host array.
    return_device : bool, optional
        Return the (patched) device array instead of numpy.
    """
    from .change_pallas import (_K_MAX, change_detection_pallas,
                                supports_pallas_rescan)

    if not supports_pallas_rescan(np.shape(values)[2], n, alpha):
        out = change_detection(values, alpha=alpha, n=n)
        return out if return_device else np.asarray(out)

    if not jax.config.jax_enable_x64:
        # Device float64 is unavailable (ND_TPU_X64=0): the on-device
        # rescan would silently degrade to f32, so patch near-margin
        # pixels on the HOST with the native f64 kernel instead —
        # exactness must not depend on the jax precision config.
        if values_host is None:
            values_host = values if isinstance(values, np.ndarray) \
                else np.asarray(values)
        values_dev = jnp.asarray(values, jnp.float32)
        k_host = values_dev.shape[2]
        if k_host <= _K_MAX:
            from .change_pallas import _round_cap
            flags, margin = change_detection_pallas(
                values_dev, alpha, n=n, return_margin=True,
                max_rounds=_round_cap(k_host))
        else:
            from .change_scan_pallas import change_detection_scan
            flags, margin = change_detection_scan(
                values_dev, alpha, n=n)
        result = np.array(flags)        # writable copy (asarray views
                                        # of device buffers are RO)
        suspect = ~(np.asarray(margin) > margin_eps)
        ys, xs = np.nonzero(suspect)
        if len(ys):
            series = np.asarray(values_host)[ys, xs] \
                .astype(np.float64)
            try:
                from .._native import change_detection_native
                patched = change_detection_native(
                    series[:, None], alpha, n=n,
                    nthreads=nthreads or min(8, len(ys) // 64 + 1)
                )[:, 0]
            except Exception:   # native lib missing: pure-python
                patched = np.stack([
                    _single_pixel_exact(series[i], alpha, n)
                    for i in range(len(ys))])
            result[ys, xs] = patched
        return jnp.asarray(result) if return_device else result

    del nthreads, values_host  # device-patched; kept for API compat

    if return_device:
        return change_detection_exact(values, alpha, n=n,
                                      margin_eps=margin_eps,
                                      capacity=capacity)

    values_dev = jnp.asarray(values)
    if not jnp.issubdtype(values_dev.dtype, jnp.floating):
        values_dev = values_dev.astype(jnp.float32)
    ny, nx, k, _ = values_dev.shape
    capacity = _patch_capacity(ny, nx, capacity)

    packed, count = _packed_exact_kernel(
        float(alpha), int(n), int(k), float(margin_eps),
        capacity)(values_dev)
    packed_np = np.asarray(packed)            # (P, ny, nx), 1-4 B/pix
    cap_max = _capacity_ladder(k, capacity, ny * nx)[-1]
    if int(count) > cap_max:                      # rare; exact rerun
        return np.asarray(change_detection(values_dev, alpha=alpha,
                                           n=n, stat_dtype='mixed'))
    # unpackbits on the little-endian byte view is ~25x faster than
    # broadcast shift-and-mask for megapixel maps
    parts = []
    for pp in range(packed_np.shape[0]):
        nb = min(31, k - 31 * pp)
        plane = packed_np[pp]
        bytes_view = plane.astype(plane.dtype.newbyteorder('<'),
                                  copy=False).view(np.uint8) \
            .reshape(ny, nx, -1)
        parts.append(np.unpackbits(bytes_view, axis=-1,
                                   bitorder='little')[..., :nb])
    return np.concatenate(parts, axis=-1).astype(bool) \
        if len(parts) > 1 else parts[0].astype(bool)


def _flag_pack_dtype(k):
    """Smallest signed dtype holding one packed plane (<=31 bits) of k
    flag bits."""
    if k <= 7:
        return jnp.int8, 7
    if k <= 15:
        return jnp.int16, 15
    return jnp.int32, 31


@functools.lru_cache(maxsize=32)
def _packed_exact_kernel(alpha, n, k, margin_eps, capacity):
    """Cached jit: exact device scan delivering the kernel's native
    bit-packed planes, downcast to the smallest dtype that holds the
    plane's bits (1-4 bytes/pixel over the host link); the suspect
    count rides along so the caller can detect capacity overflow."""
    dtype, _ = _flag_pack_dtype(k)

    @jax.jit
    def run(v):
        packed, count = _change_detection_exact_packed(
            v, alpha, n, margin_eps, capacity)
        return packed.astype(dtype), count

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
