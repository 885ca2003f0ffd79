"""Fused Pallas TPU kernel for omnibus change detection (fast f32 mode).

One grid step loads a (k, 4, TY, TX) covariance tile into VMEM and runs
the ENTIRE iterative change-point scan on-chip: the restart loop is
fully unrolled (k-1 rounds with per-pixel masking — cheap on VMEM-
resident data), interval statistics use the t-space cumulative
formulation of ``nd_tpu.ops.change`` and the chi-square decisions are
host-precomputed z-threshold immediates. HBM traffic is one tile read +
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

__all__ = ['change_detection_pallas', 'supports_pallas']

_TY = 16
_TX = 128
_P = 2.0


def supports_pallas():
    return jax.default_backend() == 'tpu' and pltpu is not None


def _kernel(in_ref, out_ref, margin_ref, l_ref, active_ref, *, k, nf,
            thresholds):
    """in_ref (k, 4, TY, TX) f32 -> out_ref (k, TY, TX) flags and
    margin_ref (TY, TX): the smallest relative |z - threshold| over
    every comparison the pixel's scan actually made — pixels with tiny
    margins are the only ones whose f32 decisions could differ from
    float64 (consumed by the hybrid exact mode)."""
    dtype = jnp.float32
    tile = in_ref[:]                               # (k, 4, TY, TX)
    ty, tx = tile.shape[2], tile.shape[3]

    c11_t = tile[:, 0]
    c12r_t = tile[:, 1]
    c12i_t = tile[:, 2]
    c22_t = tile[:, 3]
    dets = c11_t * c22_t - c12r_t ** 2 - c12i_t ** 2
    logdet_t = jnp.log(jnp.abs(dets))
    neg_t = (dets < 0).astype(dtype)

    # All index arithmetic stays in float32: Mosaic's vector argmax /
    # int reductions don't lower, f32 compares and min-reduces do, and
    # f32 is exact for indices < 2^24.
    tt = jax.lax.broadcasted_iota(jnp.int32, (k, ty, tx), 0) \
        * jnp.float32(1.0)

    out_ref[:] = jnp.zeros((k, ty, tx), jnp.float32)
    margin_ref[:] = jnp.full((ty, tx), jnp.float32(np.inf))
    l_ref[:] = jnp.zeros((ty, tx), jnp.float32)
    active_ref[:] = jnp.ones((ty, tx), jnp.float32)

    # thresholds per window length (host f64 immediates); inf -> never
    thr = [np.float32(thresholds[j]) if np.isfinite(thresholds[j])
           else np.float32(np.inf) for j in range(k + 1)]

    for _round in range(k - 1):
        l = l_ref[:]
        active = active_ref[:] > 0
        ge_l = tt >= l[None]                       # (k, ty, tx)

        # cumulative sums from l along t (static unrolled adds)
        def cum(x):
            x = jnp.where(ge_l, x, 0.0)
            rows = [x[0]]
            for t in range(1, k):
                rows.append(rows[-1] + x[t])
            return jnp.stack(rows)

        c11 = cum(c11_t)
        c12r = cum(c12r_t)
        c12i = cum(c12i_t)
        c22 = cum(c22_t)
        logdet = cum(logdet_t)
        negsum = cum(neg_t)
        # odd parity without integer casts
        odd_neg = (negsum - 2.0 * jnp.floor(negsum * 0.5)) > 0.5

        jt = tt - l[None] + 1.0                    # window length, f32
        det_of_sum = c11 * c22 - c12r ** 2 - c12i ** 2
        log_prod = jnp.where(odd_neg, jnp.nan, logdet)
        logQ = nf * (_P * jt * jnp.log(jt) + log_prod
                     - jt * jnp.log(det_of_sum))
        rho = 1 - (2 * _P ** 2 - 1) / (6 * (jt - 1) * _P) \
            * (jt / nf - 1 / (nf * jt))
        z = -2 * rho * logQ

        thresh = jnp.full((k, ty, tx), np.float32(np.inf), dtype)
        for j in range(2, k + 1):
            if np.isfinite(thr[j]):
                thresh = jnp.where(jt == float(j), thr[j], thresh)

        hit = jnp.logical_and(z > thresh, tt >= l[None] + 1.0)

        # decision margin: min relative |z - thresh| over the windows
        # this (still-active) pixel actually evaluated. NaN z counts as
        # a hard decision (NaN is sign-exact), so it keeps margin inf.
        rel = jnp.abs(z - thresh) / jnp.maximum(jnp.abs(thresh), 1.0)
        rel = jnp.where(
            jnp.logical_and(tt >= l[None] + 1.0,
                            jnp.logical_and(jnp.isfinite(thresh),
                                            jnp.isfinite(z))),
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
        upd = jnp.logical_and(tt == pos[None], set_mask[None])
        out_ref[:] = jnp.maximum(out_ref[:],
                                 jnp.where(upd, jnp.float32(1.0),
                                           jnp.float32(0.0)))

        l = jnp.where(active, pos, l)
        active = jnp.logical_and(active, l < k - 1)
        l_ref[:] = l
        active_ref[:] = jnp.where(active, jnp.float32(1.0),
                                  jnp.float32(0.0))


def change_detection_pallas(values, alpha, n=1, interpret=False,
                            return_margin=False):
    """Fast (f32) omnibus change detection as a fused Pallas kernel.

    Same decision rule as :func:`nd_tpu.ops.change.change_detection`
    with float32 statistics. values: (y, x, time, 4) -> (y, x, time)
    bool.
    """
    values = jnp.asarray(values, jnp.float32)
    ny, nx, k, _ = values.shape
    thresholds = omnibus_thresholds(k, n, float(alpha))

    data = jnp.transpose(values, (2, 3, 0, 1))     # (k, 4, y, x)
    ty = min(_TY, max(8, int(np.ceil(ny / 8)) * 8))
    tx = _TX
    ny_pad = int(np.ceil(ny / ty)) * ty
    nx_pad = int(np.ceil(nx / tx)) * tx
    data = jnp.pad(data, ((0, 0), (0, 0), (0, ny_pad - ny),
                          (0, nx_pad - nx)), mode='edge')
    grid = (ny_pad // ty, nx_pad // tx)

    kernel = functools.partial(_kernel, k=k, nf=float(n),
                               thresholds=thresholds)

    out, margin = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, ny_pad, nx_pad), jnp.float32),
            jax.ShapeDtypeStruct((ny_pad, nx_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((k, 4, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((k, ty, tx), lambda i, j: (i * 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ty, tx), jnp.float32),
            pltpu.VMEM((ty, tx), jnp.float32),
        ],
        interpret=interpret,
    )(data)

    out = out[:, :ny, :nx]
    result = jnp.transpose(out, (1, 2, 0)) > 0.5
    if return_margin:
        return result, margin[:ny, :nx]
    return result
