"""Fused Pallas TPU kernel for omnibus change detection (fast f32 mode).

One grid step loads a (k, 4, TY, TX) covariance tile into VMEM and runs
the ENTIRE iterative change-point scan on-chip: the restart loop is
statically unrolled (k-1 rounds with per-pixel masking — cheap on VMEM-
resident data; long series cap the rounds and escape through the
suspect margins, see ``max_rounds``), interval statistics use the
t-space cumulative formulation of ``nd_tpu.ops.change`` and the
chi-square decisions are host-precomputed z-threshold immediates. HBM traffic is one tile read +
one boolean tile write, versus one full set of (y, x, k) temporaries
per round for the XLA path.

Float32 statistics: decisions can disagree with the f64 reference at
the ~1e-5 rate (see ops.change 'mixed' mode for the exact default).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .change import omnibus_thresholds

__all__ = ['change_detection_pallas', 'unpack_flags',
           'supports_pallas', 'supports_pallas_rescan']

_TY = 16
_TX = 128
_P = 2.0


# The kernel statically unrolls the restart-scan rounds, so its graph
# is O(k^2) in the series length: past ~this many time steps XLA
# compile time explodes (minutes on remote-compile backends) while the
# while_loop 'mixed' XLA path stays O(k) and remains the better choice.
_K_MAX = 48

# Longer series remain Pallas-eligible for the margin-tracking callers
# (exact / hybrid modes) through the SEQUENTIAL-SCAN kernel
# (``change_scan_pallas``): three O(k) passes with carried running
# sums — no round cap, no O(k^2) graph — whose VMEM model caps at
# k = 256 (must equal ``change_scan_pallas.K_SCAN_MAX``; pinned by a
# test). ``max_rounds`` below still serves this module's own
# round-capped variant for direct callers.
_K_RESCAN_MAX = 256


def supports_pallas(k=None):
    """True when the fused TPU kernel applies (optionally: to a series
    of length ``k`` — long stacks fall back to the XLA scan, whose
    compile time does not grow quadratically)."""
    from .pallas_guard import pallas_disabled
    if jax.default_backend() != 'tpu' or pltpu is None \
            or pallas_disabled():
        return False
    return k is None or k <= _K_MAX


def _round_cap(k):
    """Unrolled restart rounds for the exact mode's fused short-k pass.

    A pixel consumes one round per detected change point, so almost
    every pixel of a real change map finishes within a handful of
    restarts — yet the uncapped kernel unrolls k-1 rounds of O(k)
    vector work each, all paid by every pixel. Exact-mode callers can
    cap the rounds because the overflow escape is already load-bearing
    there: a pixel still active at the cap gets margin = -inf and its
    FULL row is replaced by the f64 rescan (same contract the long-k
    round cap used; the capacity ladder absorbs the extra suspects,
    and a ladder overflow still falls back to the full-grid mixed
    scan). Fast-mode (no-margin) callers must NOT cap — they have no
    escape. k//4 keeps the suspect tail negligible on busier maps;
    the floor of 4 is measured (r5, bench cube): caps 3-6 leave the
    suspect count IDENTICAL (no pixel there needs a fourth restart)
    while each extra round costs ~0.45 ms, so 6 -> 4 cut the fused
    margin pass 3.28 -> 2.13 ms with decisions unchanged — a busier
    cube's capped pixels ride the ladder's escalation rungs instead.
    """
    return min(k - 1, max(4, k // 4))


def supports_pallas_rescan(k=None, n=None, alpha=None):
    """True when a fused kernel applies for a caller that rescans
    suspect pixels (exact / hybrid modes): short series use this
    module's round kernel, longer ones the sequential-scan kernel
    (``change_scan_pallas``) up to ``_K_RESCAN_MAX`` time steps.

    With ``n``/``alpha`` also given, long series additionally require
    the scan kernel's folded threshold tables to be feasible for that
    parameterization (``scan_tables`` is cached, so this is a cheap
    host check) — infeasible combinations route to the XLA path
    instead of raising from inside the kernel wrapper."""
    if not (supports_pallas() and (k is None or k <= _K_RESCAN_MAX)):
        return False
    if k is not None and k > _K_MAX and n is not None \
            and alpha is not None:
        from .change_scan_pallas import scan_tables
        return scan_tables(int(k), int(n), float(alpha)) is not None
    return True


def _mlog(x):
    """Accurate f32 natural log (TPU's builtin log has ~1.05e-4
    ABSOLUTE error — measured, both XLA and Mosaic lowerings — which
    would dominate the change statistic's error bound and triple the
    exact-mode suspect count).

    Decomposes x = m * 2^e by bit twiddling (m in [sqrt(1/2), sqrt(2))
    after centering, so |t| <= 3-2*sqrt(2) ~ 0.1716) and evaluates
    ln m = 2*atanh(t), t = (m-1)/(m+1) with a short odd polynomial:
    max error ~1 ulp (~6e-8 absolute for |ln x| < 1). Non-normal inputs
    (0, subnormals, inf, NaN, negatives) defer to the builtin.
    """
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = jax.lax.shift_right_logical(
        xi, jnp.int32(23)) - jnp.int32(127)            # biased exp
    m = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_or(jax.lax.bitwise_and(xi, jnp.int32(0x007fffff)),
                           jnp.int32(0x3f800000)), jnp.float32)  # [1, 2)
    # center: m in [sqrt(2)/2, sqrt(2)) keeps |t| small
    big = m > jnp.float32(1.4142135)
    m = jnp.where(big, m * jnp.float32(0.5), m)
    ef = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    # atanh(t)/t = 1 + t^2/3 + t^4/5 + t^6/7 + t^8/9  (|t|<=0.1716:
    # next term t^10/11 < 3e-9)
    p = jnp.float32(1 / 9.0)
    p = p * t2 + jnp.float32(1 / 7.0)
    p = p * t2 + jnp.float32(1 / 5.0)
    p = p * t2 + jnp.float32(1 / 3.0)
    p = p * t2 + jnp.float32(1.0)
    # ln 2 split hi/lo: hi has 9 mantissa bits, so ef*hi is EXACT in
    # f32 for |e| < 2^14; the residual rides in the small term
    res = (ef * jnp.float32(0.693359375)
           + (2.0 * t * p + ef * jnp.float32(-2.121944400546905e-04)))
    normal = jnp.logical_and(x >= jnp.float32(1.17549435e-38),
                             x < jnp.float32(np.inf))
    return jnp.where(normal, res, jnp.log(x))


def _kernel(in_ref, out_ref, margin_ref, l_ref, active_ref, *, k, nf,
            thresholds, with_margin, rounds=None):
    """in_ref (k, 4, TY, TX) f32 -> out_ref (P, TY, TX) int32
    BIT-PACKED change flags (bit t%31 of plane t//31 = flag at time t;
    P = ceil(k/31)) and margin_ref (TY, TX): the smallest relative
    |z - threshold| (minus the f32 error bound) over every comparison
    the pixel's scan actually made — pixels with tiny margins are the
    only ones whose f32 decisions could differ from float64 (consumed
    by the exact mode). Packing in-kernel removes the k-plane one-hot
    flag update from the round loop and cuts the HBM write k-fold;
    margin work is skipped entirely when ``with_margin`` is False."""
    nplanes = (k + 30) // 31
    dtype = jnp.float32
    tile = in_ref[:]                               # (k, 4, TY, TX)
    ty, tx = tile.shape[2], tile.shape[3]

    c11_t = tile[:, 0]
    c12r_t = tile[:, 1]
    c12i_t = tile[:, 2]
    c22_t = tile[:, 3]
    dets = c11_t * c22_t - c12r_t ** 2 - c12i_t ** 2
    logdet_t = _mlog(jnp.abs(dets))
    neg_t = (dets < 0).astype(dtype)

    # determinant conditioning (for the margin error bound): the f32
    # error of log|det| is ~cond * u with cond = (|products|)/|det| —
    # near-cancelling determinants make z arbitrarily inaccurate no
    # matter how far it sits from the threshold, so the margin must
    # carry this term (and a sign flip of a tiny det turns log into
    # NaN in one precision but not the other).
    if with_margin:
        prods_t = (jnp.abs(c11_t * c22_t) + c12r_t ** 2 + c12i_t ** 2)
        cond_t = jnp.minimum(
            prods_t / jnp.maximum(jnp.abs(dets), jnp.float32(1e-37)),
            jnp.float32(1e18))
        # sign of det_t is within f32 rounding of zero (the sum of
        # these flags over a window also drives sign_uncertain below)
        uncertain_t = (jnp.abs(dets)
                       < jnp.float32(64 * 1.2e-7) * prods_t) \
            .astype(dtype)

    # All index arithmetic stays in float32: Mosaic's vector argmax /
    # int reductions don't lower, f32 compares and min-reduces do, and
    # f32 is exact for indices < 2^24.
    tt = jax.lax.broadcasted_iota(jnp.int32, (k, ty, tx), 0) \
        * jnp.float32(1.0)

    out_ref[:] = jnp.zeros((nplanes, ty, tx), jnp.int32)
    margin_ref[:] = jnp.full((ty, tx), jnp.float32(np.inf))
    l_ref[:] = jnp.zeros((ty, tx), jnp.float32)
    active_ref[:] = jnp.ones((ty, tx), jnp.float32)

    # Folded per-window-length immediates (host f64): the decision
    #   z = -2·rho(j)·n·(P·j·ln j + log_prod − j·ln det_sum) > thr(j)
    # is, since rho(j) > 0 for p = 2 and n >= 1, equivalent to
    #   s := n·log_prod − n·j·ln det_sum  <  C(j),
    #   C(j) = −thr(j)/(2·rho(j)) − n·P·j·ln j
    # so the kernel evaluates ONE log per element-round and no
    # divisions. The margin stays in z-threshold-relative units via
    # the scale S(j) = 2·rho(j)/max(|thr(j)|, 1):
    #   |z − thr| / max(|thr|, 1) = |s − C(j)| · S(j).
    from .change import omnibus_rho
    with np.errstate(divide='ignore', invalid='ignore'):
        _rho = omnibus_rho(np.arange(k + 1), nf)
    c_tab, s_tab = [], []
    for j in range(k + 1):
        if j >= 2 and np.isfinite(thresholds[j]):
            c_tab.append(np.float32(
                -thresholds[j] / (2 * _rho[j])
                - nf * _P * j * np.log(j)))
            s_tab.append(np.float32(
                2 * _rho[j] / max(abs(thresholds[j]), 1.0)))
        else:
            c_tab.append(np.float32(-np.inf))   # never hits
            s_tab.append(np.float32(0.0))

    # A pixel consumes one round per detected change point (a round
    # whose global test fails to reject deactivates it), so most pixels
    # finish in a handful of rounds; ``rounds < k - 1`` bounds the
    # unrolled graph for long series, with still-active pixels forced
    # into the suspect set below for the caller's exact rescan.
    if rounds is None:
        rounds = k - 1
    # Aux planes share one packed cumulative chain below: stacking is
    # round-invariant, so it happens once (the channel planes already
    # live packed as the input tile).
    aux_planes = [logdet_t, neg_t]
    if with_margin:
        aux_planes += [cond_t, uncertain_t]
    aux_t = jnp.stack(aux_planes, axis=1)          # (k, A, ty, tx)

    for _round in range(rounds):
        l = l_ref[:]
        active = active_ref[:] > 0
        ge_l = tt >= l[None]                       # (k, ty, tx)

        # cumulative sums from l along t (static unrolled adds) over
        # PACKED (k, C, ty, tx) stacks: one 4-wide chain for the
        # channels and one 2-4-wide chain for the aux planes run the
        # same adds in the same order as six/eight separate chains
        # (bit-identical), but Mosaic pays ~one pass per add instead
        # of one per add per plane — the chains are this kernel's
        # dominant pass count (measured r5: 3.2 -> 2.6 ms at the
        # bench config from this packing alone)
        def cum(x):
            x = jnp.where(ge_l[:, None], x, 0.0)
            rows = [x[0]]
            for t in range(1, k):
                rows.append(rows[-1] + x[t])
            return jnp.stack(rows)

        cumt = cum(tile)                           # (k, 4, ty, tx)
        cuma = cum(aux_t)                          # (k, A, ty, tx)
        c11 = cumt[:, 0]
        c12r = cumt[:, 1]
        c12i = cumt[:, 2]
        c22 = cumt[:, 3]
        logdet = cuma[:, 0]
        negsum = cuma[:, 1]
        if with_margin:
            conds = cuma[:, 2]
            uncert = cuma[:, 3]
        # odd parity without integer casts
        odd_neg = (negsum - 2.0 * jnp.floor(negsum * 0.5)) > 0.5

        jt = tt - l[None] + 1.0                    # window length, f32
        det_of_sum = c11 * c22 - c12r ** 2 - c12i ** 2
        log_prod = jnp.where(odd_neg, jnp.nan, logdet)
        s = nf * log_prod - (nf * jt) * _mlog(det_of_sum)

        c_t = jnp.full((k, ty, tx), np.float32(-np.inf), dtype)
        s_t = jnp.zeros((k, ty, tx), dtype)
        for j in range(2, k + 1):
            if np.isfinite(c_tab[j]):
                c_t = jnp.where(jt == float(j), c_tab[j], c_t)
                s_t = jnp.where(jt == float(j), s_tab[j], s_t)

        hit = jnp.logical_and(s < c_t, tt >= l[None] + 1.0)

        # decision margin: min over the windows this (still-active)
        # pixel actually evaluated of the z-relative distance
        # |s − C(j)|·S(j) MINUS a first-order f32 error bound on s:
        #   |Δs| ≲ n·[(Σ cond_t + j·cond_sum)·u + (j+1)·LOG_ERR]
        # The first term is determinant cancellation (cond =
        # products/|det| amplifies both f32 arithmetic and the f32
        # rounding of f64 inputs; u carries a 64x safety factor). The
        # second covers the ~1-2 ulp absolute error of _mlog (the
        # TPU's BUILTIN f32 log has ~1.05e-4 absolute error — measured
        # on v5e for both the XLA and Mosaic lowerings — which would
        # triple the suspect count), hitting j+1 log evaluations per
        # window. A NaN s (negative determinant product) is a hard
        # decision UNLESS the offending determinant's sign is itself
        # within f32 rounding of zero — those windows force the pixel
        # suspect.
        if with_margin:
            det_prods = (jnp.abs(c11 * c22) + c12r ** 2 + c12i ** 2)
            cond_sum = jnp.minimum(
                det_prods / jnp.maximum(jnp.abs(det_of_sum),
                                        jnp.float32(1e-37)),
                jnp.float32(1e18))
            serr = (nf * ((conds + jt * cond_sum)
                          * jnp.float32(64 * 1.2e-7)
                          + (jt + 1.0) * jnp.float32(1e-5)))
            sign_uncertain = jnp.logical_or(
                uncert > 0.5,
                jnp.abs(det_of_sum)
                < jnp.float32(64 * 1.2e-7) * det_prods)
            rel = (jnp.abs(s - c_t) - serr) * s_t
            rel = jnp.where(jnp.isfinite(s), rel,
                            jnp.where(sign_uncertain,
                                      jnp.float32(-np.inf),
                                      jnp.float32(np.inf)))
            rel = jnp.where(
                jnp.logical_and(tt >= l[None] + 1.0,
                                jnp.isfinite(c_t)),
                rel, jnp.float32(np.inf))
            round_margin = jnp.min(rel, axis=0)
            margin_ref[:] = jnp.where(active,
                                      jnp.minimum(margin_ref[:],
                                                  round_margin),
                                      margin_ref[:])

        active = jnp.logical_and(active, hit[k - 1])

        # first hit = min-reduce of masked f32 indices (no argmax);
        # any-hit falls out of the same reduction (no bool reduce)
        t_first = jnp.min(jnp.where(hit, tt, jnp.float32(1e9)),
                          axis=0)
        any_hit = t_first < jnp.float32(1e8)
        pos = jnp.where(any_hit, t_first, jnp.float32(k - 1))
        pos = jnp.maximum(pos, l + 1.0)

        set_mask = jnp.logical_and(active, any_hit)
        # accumulate the flag BIT: pos strictly increases round over
        # round for a pixel, so each bit is added at most once and the
        # int32 adds are exact
        pos_i = pos.astype(jnp.int32)
        for pp in range(nplanes):
            amt = jnp.clip(pos_i - jnp.int32(31 * pp), jnp.int32(0),
                           jnp.int32(30))
            inplane = jnp.logical_and(pos_i >= jnp.int32(31 * pp),
                                      pos_i < jnp.int32(31 * (pp + 1)))
            add = jnp.where(jnp.logical_and(set_mask, inplane),
                            jax.lax.shift_left(jnp.int32(1), amt),
                            jnp.int32(0))
            out_ref[pp] = out_ref[pp] + add

        l = jnp.where(active, pos, l)
        active = jnp.logical_and(active, l < k - 1)
        l_ref[:] = l
        active_ref[:] = jnp.where(active, jnp.float32(1.0),
                                  jnp.float32(0.0))

    if with_margin and rounds < k - 1:
        # Round-capped run: a pixel still active after ``rounds``
        # restarts may have undetected change points, so its packed
        # flags are incomplete — force it into the suspect set (margin
        # below any finite eps); the caller's rescan REPLACES suspect
        # pixels' full rows with exact decisions.
        margin_ref[:] = jnp.where(active_ref[:] > 0,
                                  jnp.float32(-np.inf), margin_ref[:])


def unpack_flags(packed, k):
    """(P, ..., ny, nx) int32 bit-packed planes -> (..., ny, nx, k)
    bool (bit t%31 of plane t//31 = flag at time t).

    The bit extraction broadcasts over a LEADING time axis — (k, ...,
    ny, nx), minor dim ny/nx — and transposes once at the end. The
    obvious trailing-axis broadcast (packed[..., None] >> shifts)
    makes every elementwise op's minor dimension k, wasting the
    128-wide vector lanes ~10x at typical k (measured on TPU: 2.77 ms
    vs 0.9 ms for a (1024, 1024, 12) unpack)."""
    packed = jnp.asarray(packed)
    parts = []
    for pp in range((k + 30) // 31):
        nb = min(31, k - 31 * pp)
        shifts = jnp.arange(nb, dtype=jnp.int32).reshape(
            (nb,) + (1,) * (packed.ndim - 1))
        parts.append(
            (jnp.right_shift(packed[pp][None], shifts)
             & jnp.int32(1)) > 0)
    stacked = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
        else parts[0]
    return jnp.moveaxis(stacked, 0, -1)


def change_detection_pallas(values, alpha, n=1, interpret=False,
                            return_margin=False, return_packed=False,
                            max_rounds=None):
    """Fast (f32) omnibus change detection as a fused Pallas kernel.

    Same decision rule as :func:`nd_tpu.ops.change.change_detection`
    with float32 statistics. values: (y, x, time, 4) -> (y, x, time)
    bool — or, with ``return_packed``, the raw (P, y, x) int32
    bit-packed planes the kernel produces (P = ceil(k/31); see
    :func:`unpack_flags`). Margin tracking costs ~20% kernel time and
    is only compiled in when ``return_margin`` is set.

    ``max_rounds`` caps the unrolled restart rounds (long series:
    graph is O(rounds * k) instead of O(k^2)). A pixel still active
    after the cap has incomplete flags and is folded into the suspect
    margins (margin = -inf), so a rescan-capable caller is REQUIRED:
    ``max_rounds`` below ``k - 1`` demands ``return_margin``.
    """
    values = jnp.asarray(values, jnp.float32)
    ny, nx, k, _ = values.shape
    rounds = k - 1 if max_rounds is None else int(min(k - 1,
                                                      max_rounds))
    if rounds < k - 1 and not return_margin:
        raise ValueError(
            'max_rounds < k-1 caps the scan before every pixel can '
            'finish; the overflow escape rides the suspect margins, '
            'so return_margin=True is required')
    nplanes = (k + 30) // 31
    thresholds = omnibus_thresholds(k, n, float(alpha))

    data = jnp.transpose(values, (2, 3, 0, 1))     # (k, 4, y, x)
    # long series halve the row tile: the (k, 4, ty, tx) input tile
    # plus six (k, ty, tx) cumulative temps must stay within VMEM
    ty_cap = _TY if k <= _K_MAX else 8
    ty = min(ty_cap, max(8, int(np.ceil(ny / 8)) * 8))
    tx = _TX
    ny_pad = int(np.ceil(ny / ty)) * ty
    nx_pad = int(np.ceil(nx / tx)) * tx
    data = jnp.pad(data, ((0, 0), (0, 0), (0, ny_pad - ny),
                          (0, nx_pad - nx)), mode='edge')
    grid = (ny_pad // ty, nx_pad // tx)

    kernel = functools.partial(_kernel, k=k, nf=float(n),
                               thresholds=thresholds,
                               with_margin=bool(return_margin),
                               rounds=rounds)

    # Without return_margin the margin plane lives as VMEM SCRATCH —
    # the kernel body is identical (it still initializes margin_ref;
    # pallas passes outputs before scratch, and margin is the first
    # scratch entry, so the positional signature is unchanged) but the
    # (ny, nx) f32 HBM write disappears, halving the fast path's
    # output traffic for k <= 31.
    packed_shape = jax.ShapeDtypeStruct((nplanes, ny_pad, nx_pad),
                                        jnp.int32)
    packed_spec = pl.BlockSpec((nplanes, ty, tx),
                               lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM)
    margin_spec = pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((ty, tx), jnp.float32) for _ in range(2)]
    if return_margin:
        out_shape = (packed_shape,
                     jax.ShapeDtypeStruct((ny_pad, nx_pad),
                                          jnp.float32))
        out_specs = (packed_spec, margin_spec)
    else:
        out_shape = (packed_shape,)
        out_specs = (packed_spec,)
        scratch = [pltpu.VMEM((ty, tx), jnp.float32)] + scratch

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec((k, 4, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(data)

    packed = outs[0][:, :ny, :nx]
    result = packed if return_packed else unpack_flags(packed, k)
    if return_margin:
        return result, outs[1][:ny, :nx]
    return result
