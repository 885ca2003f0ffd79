"""Complex-Wishart omnibus change detection (Conradsen et al. 2016) on
TPU.

Algorithmic redesign of the reference's per-pixel Cython loop
(/root/reference/nd/_change.pyx:224-287): instead of a data-dependent
``while`` per pixel under OpenMP, every pixel advances in lockstep
through a masked ``lax.while_loop``:

  1. prefix sums over time of the covariance channels, of log|det| and
     of the det-sign count make every interval statistic O(1);
  2. each iteration evaluates, for ALL pixels at their current restart
     point ``l``, the global omnibus test over ``ts[l:]`` and all
     marginal tests ``ts[l:l+j]`` vectorized over ``j``;
  3. each active pixel jumps to its first significant change point; the
     loop runs at most ``k - 1`` iterations and exits early when no
     pixel is active (typical cubes: a handful of iterations).

The test statistic follows the reference exactly (dual-pol p=2):
z = -2 rho n (p k log k + log prod|det| - k log det(sum)), probability
P1 + omega2 (P2 - P1) with Pi = chi2-CDF — a change is flagged when the
probability exceeds ``alpha`` (_change.pyx:239-253). Negative
determinants produce NaN statistics exactly like ``log`` of a negative
product in C, and NaN never flags a change.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .stats import chi2_cdf

__all__ = ['omnibus_probabilities', 'change_detection', 'omnibus_z']

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


@partial(jax.jit, static_argnames=('n',))
def change_detection(values, alpha, n=1):
    """Iterative omnibus change-point detection.

    Parameters
    ----------
    values : array, shape (y, x, time, 4)
        Covariance channels [C11, C12.re, C12.im, C22] per time step
        (already multilooked with ``n`` looks).
    alpha : float
        Decision threshold on the chi-square probability.
    n : int
        Number of looks.

    Returns
    -------
    bool array, shape (y, x, time)
        True where a change was detected at that time step.
    """
    values = jnp.asarray(values)
    if not jnp.issubdtype(values.dtype, jnp.floating):
        values = values.astype(jnp.float32)
    dtype = values.dtype
    ny, nx, k, _ = values.shape
    nf = float(n)

    # ---- prefix sums over time (one extra leading zero) ----------------
    def _prefix(x):
        return jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype),
             jnp.cumsum(x, axis=-1)], axis=-1)

    chans = [ _prefix(values[..., c]) for c in range(4) ]          # (y,x,k+1)
    dets = (values[..., 0] * values[..., 3]
            - values[..., 1] ** 2 - values[..., 2] ** 2)
    logdet_p = _prefix(jnp.log(jnp.abs(dets)))
    negcnt_p = _prefix((dets < 0).astype(dtype))

    jj = jnp.arange(k + 1)                                        # window len
    jf = jj.astype(dtype)

    def _gather(prefix, idx):
        # prefix: (y,x,k+1); idx: (y,x,k+1) int -> same shape gather
        return jnp.take_along_axis(prefix, idx, axis=-1)

    def cond(state):
        i, l, active, result = state
        return jnp.logical_and(i < k - 1, jnp.any(active))

    def body(state):
        i, l, active, result = state
        lc = l[..., None]                                         # (y,x,1)
        hi = jnp.clip(lc + jj[None, None, :], 0, k)               # (y,x,k+1)
        lo = jnp.broadcast_to(lc, hi.shape)
        csum = tuple(_gather(c, hi) - _gather(c, lo) for c in chans)
        logdet = _gather(logdet_p, hi) - _gather(logdet_p, lo)
        negcnt = (_gather(negcnt_p, hi)
                  - _gather(negcnt_p, lo)).astype(jnp.int32)

        probs = _window_probability(csum, logdet, negcnt,
                                    jf[None, None, :], nf, dtype)
        # (y,x,k+1): probs[..., j] = omnibus over ts[l:l+j]

        rem = k - l                                               # (y,x)
        # global test: window length = k - l
        p_glob = jnp.take_along_axis(probs, rem[..., None],
                                     axis=-1)[..., 0]
        active = jnp.logical_and(active, p_glob > alpha)

        # marginal tests: first j in [2, k-l] with prob > alpha
        valid = jnp.logical_and(jj[None, None, :] >= 2,
                                jj[None, None, :] <= rem[..., None])
        hit = jnp.logical_and(probs > alpha, valid)
        any_hit = jnp.any(hit, axis=-1)
        j_first = jnp.argmax(hit, axis=-1)                        # first True
        # r = j - 1 on a hit; k - l - 1 when the scan comes up dry
        r = jnp.where(any_hit, j_first - 1, rem - 1)
        r = jnp.maximum(r, 1).astype(l.dtype)

        set_mask = jnp.logical_and(active, any_hit)               # (y,x)
        pos = jnp.clip(l + r, 0, k - 1)
        upd = jnp.zeros_like(result).at[
            jnp.arange(ny)[:, None], jnp.arange(nx)[None, :], pos
        ].set(set_mask)
        result = jnp.logical_or(result, upd)

        l = jnp.where(active, l + r, l)
        active = jnp.logical_and(active, l < k - 1)
        return (i + 1, l, active, result)

    init = (jnp.asarray(0),
            jnp.zeros((ny, nx), jnp.int32),
            jnp.ones((ny, nx), bool),
            jnp.zeros((ny, nx, k), bool))
    _, _, _, result = lax.while_loop(cond, body, init)
    return result
