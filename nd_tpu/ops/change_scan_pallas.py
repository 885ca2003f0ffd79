"""Sequential-scan Pallas TPU kernel for LONG-series omnibus change
detection (the margin/rescan path for k > ~48 time steps).

The round-based fused kernel (``change_pallas``) re-evaluates every
window from the current anchor each restart round: its per-round
threshold table build is O(k^2) element work and the unrolled graph is
O(rounds * k^2) — a 31x per-sample cliff at k = 56 and a hard escape to
the XLA scan past k = 128 (the round 2 verdict's "long-series omnibus
cliff"). This kernel removes the round structure entirely with three
O(k) passes over the VMEM-resident tile, exploiting the fact that the
iterative scan's restart chain advances MONOTONICALLY in time
(reference semantics: /root/reference/nd/_change.pyx:224-287 — detect
the first significant window from the anchor, restart there):

  pass A (forward)   builds the UNGATED tentative restart chain with
                     carried per-pixel running sums that reset at each
                     detected change — the same left-to-right adds from
                     the anchor as the reference scan, so segment
                     statistics are bit-identical; thresholds come from
                     a host-fitted polynomial in the window length
                     (O(1) per step — no O(k) table broadcast), whose
                     exact per-integer-j f32 evaluation error is
                     measured on the host and folded into the decision
                     margin;
  pass B (backward)  evaluates every anchor's GLOBAL test (the window
                     [t, k-1]) from carried suffix sums — the window
                     length k - t is STATIC per step, so the folded
                     threshold is an exact host float64 immediate;
  pass C (forward)   commits the tentative flags under the scan's
                     gating rule — flag i+1 is kept iff the global
                     tests of anchors 0, t_1, ..., t_i all reject — a
                     cumulative AND with O(1) work per step.

Decision margins cover every comparison the gated scan makes (window
compares while alive, global tests at reached anchors) minus the f32
error bound of the as-computed statistic PLUS the polynomial fit
error, so the caller's float64 rescan of sub-margin pixels reproduces
the 'mixed' oracle exactly — the same contract as the round-based
kernel, now at any series length that fits VMEM (k <= 256) with an
O(k) compile graph.
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

from .change import omnibus_rho, omnibus_thresholds
from .change_pallas import _mlog

__all__ = ['change_detection_scan', 'scan_tables', 'K_SCAN_MAX']

_P = 2.0
# VMEM bound: the (k, 4, ty, tx) tile plus five (k, ty, tx) pass
# planes (logdet, tentative flags, window margins, global hits, global
# margins) = 36*k*ty*tx bytes must fit the ~12 MB budget at the
# smallest (8, 128) tile -> k <= ~340; the cap below keeps headroom
# for the register slabs and the unrolled per-step temps.
K_SCAN_MAX = 256
_VMEM_BUDGET = 11 << 20

_U64 = 64 * 1.2e-7       # f32 rounding with the margin safety factor
_LOG_ERR = 1e-5          # absolute _mlog error bound (per evaluation)


def _horner_f32(coefs, z):
    """Evaluate ``sum coefs[i] * z**i`` highest-order-first (works for
    numpy f32 host simulation and jnp tracers alike)."""
    acc = coefs[-1]
    for c in coefs[-2::-1]:
        acc = acc * z + c
    return acc


def _sim_f32(coefs, j, k, scale=1.0):
    """Host replica of the kernel's f32 threshold evaluation at integer
    window length ``j`` (Horner in float32; the kernel may contract
    mul+add into FMA, which only REDUCES rounding — the caller still
    applies a safety factor)."""
    za = np.float32(2.0 / (k - 2))
    zb = np.float32(-1.0 - 4.0 / (k - 2))
    z = np.float32(j) * za + zb
    acc = np.float32(coefs[-1])
    for c in coefs[-2::-1]:
        acc = np.float32(np.float32(acc * z) + np.float32(c))
    return np.float32(acc * np.float32(scale))


@functools.lru_cache(maxsize=64)
def scan_tables(k, n, alpha):
    """Host-side threshold preparation for the scan kernel.

    Returns ``None`` when the folded form is infeasible (non-finite
    thresholds or rho <= 0 anywhere) — callers keep the XLA path then.
    Otherwise a dict with:

    c_coefs / s_coefs : tuple of f32
        Polynomial coefficients (lowest order first) in the scaled
        window length z = 2(j-2)/(k-2) - 1 for the folded threshold
        C(j) = -thr(j)/(2 rho(j)) - n P j ln j and the margin scale
        S(j) = 2 rho(j) / max(|thr(j)|, 1).
    c_err : float
        Absolute bound on |f32-evaluated C_poly(j) - exact C(j)| over
        every integer j in [2, k], x4 safety — added to the statistic's
        f32 error bound so the margin covers the fit.
    s_scale : float
        Final multiplier for the S polynomial chosen so its f32
        evaluation never EXCEEDS the exact S(j) (margins must only
        shrink under approximation, never grow).
    cg_tab / sg_tab : tuple of float
        The exact folded threshold / margin scale per window length for
        the pass-B global tests (f64 immediates; -inf / 0 when the
        threshold is non-finite, which never fires).
    """
    thr = omnibus_thresholds(k, n, float(alpha))
    with np.errstate(divide='ignore', invalid='ignore'):
        rho = omnibus_rho(np.arange(k + 1), n)
    js = np.arange(2, k + 1, dtype=np.float64)
    if not np.all(np.isfinite(thr[2:])) or not np.all(rho[2:] > 0):
        return None
    c_exact = (-thr[2:] / (2 * rho[2:])
               - n * _P * js * np.log(js))
    s_exact = 2 * rho[2:] / np.maximum(np.abs(thr[2:]), 1.0)

    z = 2 * (js - 2) / (k - 2) - 1
    npts = len(js)

    def fit(vals):
        best = None
        for deg in range(4, min(14, npts - 1) + 1):
            cf = np.polynomial.polynomial.polyfit(z, vals, deg)
            got = np.array([_sim_f32(cf, j, k) for j in js],
                           np.float64)
            err = np.abs(got - vals).max()
            if best is None or err < best[1]:
                best = (cf, err)
        return best

    c_coefs, c_fit_err = fit(c_exact)
    s_coefs, _ = fit(s_exact)
    s_got = np.array([_sim_f32(s_coefs, j, k) for j in js], np.float64)
    if s_got.min() <= 0:
        return None
    # deflate S so the f32 evaluation is <= exact everywhere (with an
    # extra 1e-4 slack for FMA-contraction differences on device)
    s_scale = float((s_exact / s_got).min()) * (1.0 - 1e-4)
    s_chk = np.array([_sim_f32(s_coefs, j, k, s_scale) for j in js],
                     np.float64)
    if s_chk.min() <= 0 or (s_chk > s_exact).any():
        return None
    c_err = 4.0 * float(c_fit_err) + 1e-6

    cg = np.full(k + 1, -np.inf)
    sg = np.zeros(k + 1)
    cg[2:] = c_exact
    sg[2:] = s_exact
    return {
        'c_coefs': tuple(float(c) for c in c_coefs),
        's_coefs': tuple(float(c) for c in s_coefs),
        'c_err': c_err,
        's_scale': s_scale,
        'cg_tab': tuple(float(c) for c in cg),
        'sg_tab': tuple(float(c) for c in sg),
    }


def _scan_kernel(in_ref, out_ref, margin_ref,
                 logdet_s, tent_s, rel_a_s, ghit_s, rel_b_s,
                 r11, r12r, r12i, r22, rlog, rneg, rcond, runc, rj,
                 *, k, nf, tabs):
    """(k, 4, ty, tx) f32 tile -> bit-packed change planes + margin.

    Three unrolled O(k) passes (chain / global gates / commit) with all
    carried per-pixel state in (ty, tx) scratch refs so each step's
    temporaries die at the ref stores (flat Mosaic VMEM stack)."""
    ty, tx = in_ref.shape[2], in_ref.shape[3]
    nplanes = (k + 30) // 31
    f32 = jnp.float32
    inf = f32(np.inf)

    c_coefs = [f32(c) for c in tabs['c_coefs']]
    s_coefs = [f32(c) for c in tabs['s_coefs']]
    s_scale = f32(tabs['s_scale'])
    c_err = f32(tabs['c_err'])
    za = f32(2.0 / (k - 2))
    zb = f32(-1.0 - 4.0 / (k - 2))

    def chan(t):
        return (in_ref[t, 0], in_ref[t, 1], in_ref[t, 2], in_ref[t, 3])

    def det_terms(x11, x12r, x12i, x22):
        det = x11 * x22 - x12r ** 2 - x12i ** 2
        prods = jnp.abs(x11 * x22) + x12r ** 2 + x12i ** 2
        return det, prods

    def elem_extras(det, prods):
        cond = jnp.minimum(prods / jnp.maximum(jnp.abs(det),
                                               f32(1e-37)), f32(1e18))
        neg = (det < 0).astype(f32)
        unc = (jnp.abs(det) < f32(_U64) * prods).astype(f32)
        return cond, neg, unc

    # ---- precompute log|det_t| once (shared by passes A and B) ------
    for t in range(k):
        det, _ = det_terms(*chan(t))
        logdet_s[t] = _mlog(jnp.abs(det))

    def window_stat(a11, a12r, a12i, a22, alog, aneg, acond, aunc, j):
        """Statistic, f32 error bound and sign-uncertainty of the
        window whose accumulated sums are ``a*`` and length is ``j``
        (per-pixel array or static float)."""
        det_sum, det_prods = det_terms(a11, a12r, a12i, a22)
        odd = (aneg - 2.0 * jnp.floor(aneg * 0.5)) > 0.5
        log_prod = jnp.where(odd, jnp.nan, alog)
        s = nf * log_prod - (nf * j) * _mlog(det_sum)
        cond_sum = jnp.minimum(
            det_prods / jnp.maximum(jnp.abs(det_sum), f32(1e-37)),
            f32(1e18))
        serr = nf * ((acond + j * cond_sum) * f32(_U64)
                     + (j + 1.0) * f32(_LOG_ERR))
        sign_unc = jnp.logical_or(
            aunc > 0.5,
            jnp.abs(det_sum) < f32(_U64) * det_prods)
        return s, serr, sign_unc

    def rel_of(s, c, serr, scale, sign_unc):
        rel = (jnp.abs(s - c) - serr) * scale
        return jnp.where(jnp.isfinite(s), rel,
                         jnp.where(sign_unc, -inf, inf))

    # ---- pass A: tentative restart chain (forward) -------------------
    x11, x12r, x12i, x22 = chan(0)
    det0, prods0 = det_terms(x11, x12r, x12i, x22)
    cond0, neg0, unc0 = elem_extras(det0, prods0)
    r11[:] = x11
    r12r[:] = x12r
    r12i[:] = x12i
    r22[:] = x22
    rlog[:] = logdet_s[0]
    rneg[:] = neg0
    rcond[:] = cond0
    runc[:] = unc0
    rj[:] = jnp.ones((ty, tx), f32)
    tent_s[0] = jnp.zeros((ty, tx), f32)
    rel_a_s[0] = jnp.full((ty, tx), inf)

    for t in range(1, k):
        x11, x12r, x12i, x22 = chan(t)
        det_t, prods_t = det_terms(x11, x12r, x12i, x22)
        cond_t, neg_t, unc_t = elem_extras(det_t, prods_t)
        a11 = r11[:] + x11
        a12r = r12r[:] + x12r
        a12i = r12i[:] + x12i
        a22 = r22[:] + x22
        alog = rlog[:] + logdet_s[t]
        aneg = rneg[:] + neg_t
        acond = rcond[:] + cond_t
        aunc = runc[:] + unc_t
        j = rj[:] + 1.0                     # >= 2 at every step here

        s, serr, sign_unc = window_stat(a11, a12r, a12i, a22, alog,
                                        aneg, acond, aunc, j)
        z = j * za + zb
        c = _horner_f32(c_coefs, z)
        scale = _horner_f32(s_coefs, z) * s_scale
        hit = s < c                         # NaN never hits
        tent_s[t] = jnp.where(hit, f32(1.0), f32(0.0))
        rel_a_s[t] = rel_of(s, c, serr + c_err, scale, sign_unc)

        # restart the segment at t where a change was detected (the
        # new window INCLUDES x[t], reference semantics)
        r11[:] = jnp.where(hit, x11, a11)
        r12r[:] = jnp.where(hit, x12r, a12r)
        r12i[:] = jnp.where(hit, x12i, a12i)
        r22[:] = jnp.where(hit, x22, a22)
        rlog[:] = jnp.where(hit, logdet_s[t], alog)
        rneg[:] = jnp.where(hit, neg_t, aneg)
        rcond[:] = jnp.where(hit, cond_t, acond)
        runc[:] = jnp.where(hit, unc_t, aunc)
        rj[:] = jnp.where(hit, f32(1.0), j)

    # ---- pass B: global tests per anchor (backward, static j) --------
    x11, x12r, x12i, x22 = chan(k - 1)
    detl, prodsl = det_terms(x11, x12r, x12i, x22)
    condl, negl, uncl = elem_extras(detl, prodsl)
    r11[:] = x11
    r12r[:] = x12r
    r12i[:] = x12i
    r22[:] = x22
    rlog[:] = logdet_s[k - 1]
    rneg[:] = negl
    rcond[:] = condl
    runc[:] = uncl
    ghit_s[k - 1] = jnp.zeros((ty, tx), f32)   # l = k-1 ends the scan
    rel_b_s[k - 1] = jnp.full((ty, tx), inf)

    for t in range(k - 2, -1, -1):
        x11, x12r, x12i, x22 = chan(t)
        det_t, prods_t = det_terms(x11, x12r, x12i, x22)
        cond_t, neg_t, unc_t = elem_extras(det_t, prods_t)
        a11 = r11[:] + x11
        a12r = r12r[:] + x12r
        a12i = r12i[:] + x12i
        a22 = r22[:] + x22
        alog = rlog[:] + logdet_s[t]
        aneg = rneg[:] + neg_t
        acond = rcond[:] + cond_t
        aunc = runc[:] + unc_t
        r11[:] = a11
        r12r[:] = a12r
        r12i[:] = a12i
        r22[:] = a22
        rlog[:] = alog
        rneg[:] = aneg
        rcond[:] = acond
        runc[:] = aunc

        jg = k - t                              # STATIC window length
        cg = tabs['cg_tab'][jg]
        if not np.isfinite(cg):                 # threshold unbounded:
            ghit_s[t] = jnp.zeros((ty, tx), f32)   # never rejects
            rel_b_s[t] = jnp.full((ty, tx), inf)
            continue
        s, serr, sign_unc = window_stat(a11, a12r, a12i, a22, alog,
                                        aneg, acond, aunc,
                                        f32(float(jg)))
        hit = s < f32(cg)
        ghit_s[t] = jnp.where(hit, f32(1.0), f32(0.0))
        rel_b_s[t] = rel_of(s, f32(cg), serr,
                            f32(tabs['sg_tab'][jg]), sign_unc)

    # ---- pass C: commit under the cumulative global gate --------------
    out_ref[:] = jnp.zeros((nplanes, ty, tx), jnp.int32)
    # anchor 0's global test is always evaluated: it both gates the
    # first flag and contributes its margin unconditionally
    margin_ref[:] = rel_b_s[0]
    alive_f = ghit_s[0]                       # reuse rj as alive reg
    rj[:] = alive_f
    for t in range(1, k):
        alive = rj[:] > 0.5
        margin_ref[:] = jnp.minimum(
            margin_ref[:], jnp.where(alive, rel_a_s[t], inf))
        commit = jnp.logical_and(alive, tent_s[t] > 0.5)
        pp = t // 31
        out_ref[pp] = out_ref[pp] + jnp.where(
            commit, jnp.int32(1 << (t % 31)), jnp.int32(0))
        # the scan reaches anchor t iff it committed a flag there; its
        # global test G(t) then gates every later flag
        margin_ref[:] = jnp.minimum(
            margin_ref[:], jnp.where(commit, rel_b_s[t], inf))
        rj[:] = jnp.where(commit, ghit_s[t], rj[:])


def change_detection_scan(values, alpha, n=1, interpret=False,
                          return_packed=False):
    """Long-series omnibus change detection as a sequential-scan fused
    kernel (margin-carrying; serves the exact/hybrid rescan callers).

    Same decision semantics as
    :func:`nd_tpu.ops.change.change_detection` with float32 statistics
    and polynomial-approximated interior thresholds, where the
    approximation error is folded into the reported margin — pixels
    whose margin exceeds ``margin_eps`` are guaranteed to carry the
    float64 'mixed' decisions, exactly like the round-based kernel's
    contract (the callers rescan the rest).

    values: (y, x, time, 4) -> ``(flags_or_packed, margin)`` with
    flags (y, x, time) bool (or the (P, y, x) int32 bit-packed planes
    when ``return_packed``) and margin (y, x) float32.

    Raises ``ValueError`` for series longer than ``K_SCAN_MAX`` or
    parameterizations whose folded thresholds are infeasible (callers
    catch via their XLA fallback).
    """
    from .change_pallas import unpack_flags

    values = jnp.asarray(values, jnp.float32)
    ny, nx, k, _ = values.shape
    if k < 3:
        raise ValueError('scan kernel needs k >= 3')
    if k > K_SCAN_MAX:
        raise ValueError('series too long for the scan kernel '
                         '(k=%d > %d)' % (k, K_SCAN_MAX))
    tabs = scan_tables(k, int(n), float(alpha))
    if tabs is None:
        raise ValueError('folded thresholds infeasible for '
                         '(k=%d, n=%s, alpha=%s)' % (k, n, alpha))
    nplanes = (k + 30) // 31

    data = jnp.transpose(values, (2, 3, 0, 1))      # (k, 4, y, x)
    # tile chooser: 36*k*ty*tx bytes of tile + pass planes
    ty, tx = 8, 128
    for cand_ty, cand_tx in ((32, 512), (16, 512), (16, 256),
                             (8, 256), (8, 128)):
        if 36 * k * cand_ty * cand_tx <= _VMEM_BUDGET:
            ty, tx = cand_ty, cand_tx
            break
    ty = min(ty, max(8, int(np.ceil(ny / 8)) * 8))
    tx = min(tx, max(128, int(np.ceil(nx / 128)) * 128))
    ny_pad = int(np.ceil(ny / ty)) * ty
    nx_pad = int(np.ceil(nx / tx)) * tx
    data = jnp.pad(data, ((0, 0), (0, 0), (0, ny_pad - ny),
                          (0, nx_pad - nx)), mode='edge')
    grid = (ny_pad // ty, nx_pad // tx)

    kernel = functools.partial(_scan_kernel, k=k, nf=float(n),
                               tabs=tabs)
    plane = pltpu.VMEM((k, ty, tx), jnp.float32)
    reg = pltpu.VMEM((ty, tx), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nplanes, ny_pad, nx_pad),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((ny_pad, nx_pad),
                                        jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((k, 4, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((nplanes, ty, tx),
                                lambda i, j: (i * 0, i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[plane] * 5 + [reg] * 9,
        interpret=interpret,
    )(data)

    packed = outs[0][:, :ny, :nx]
    margin = outs[1][:ny, :nx]
    result = packed if return_packed else unpack_flags(packed, k)
    return result, margin
