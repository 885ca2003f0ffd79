"""Non-local means denoising on TPU.

Algorithmic redesign of the reference's Cython kernel
(/root/reference/nd/_filters.pyx:320-420 ``_pixelwise_nlmeans_3d``): the
reference loops per pixel over neighborhood x patch x variables —
O(N * |r-box| * |f-box| * V) scalar work. Here each neighborhood offset
contributes one vectorized pass (shifted squared-difference + sliding
patch sum via ``lax.reduce_window``), which is O(N * |r-box|) array work
that XLA fuses and tiles onto the VPU — while producing the *same*
numbers: 'reflect' (edge-excluding) boundary like the reference's
``_idx`` (_filters.pyx:15-40), weight
``exp(-max(dsq - 2 sigma^2, 0)/h^2)``, self-weight = max weight (or the
``n_eff`` effective-sample-size solution, _filters.pyx:297-314).

The scan over offsets keeps the compiled program small for large
neighborhoods; weights and accumulators stay resident in registers/VMEM
across the fused loop body.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['nlmeans', 'find_weight_vectorized']


def find_weight_vectorized(weight_sum, sq_weight_sum, n, xp=jnp):
    """Self-weight w such that the effective sample size equals n.

    Vectorized version of the reference's ``find_weight``
    (_filters.pyx:297-314). Pixels with no solution
    (n - 1 > weight_sum^2 / sq_weight_sum) yield NaN instead of raising.
    """
    disc = (n * weight_sum * weight_sum - n * n * sq_weight_sum
            + n * sq_weight_sum)
    rt = xp.sqrt(disc)
    return (weight_sum + rt) / (n - 1)


def nlmeans(arr, r, f, sigma, h, n_eff=-1.0):
    """Non-local means over a 4-D ``(d0, d1, d2, var)`` array.

    Parameters
    ----------
    arr : array, shape (d0, d1, d2, nvars)
        Input data. Filtering runs over the first three dims jointly
        across all variables; set ``r[i] = 0`` to skip a dim.
    r : sequence of 3 ints
        Neighborhood radius per dim.
    f : sequence of 3 ints
        Patch radius per dim.
    sigma, h : float
        Noise standard deviation and filtering strength.
    n_eff : float, optional
        Effective sample size; -1 disables (default).
    """
    arr = jnp.asarray(arr)
    if arr.ndim != 4:
        raise ValueError('nlmeans expects a 4-D (d0, d1, d2, var) array')
    r = tuple(int(v) for v in r)
    f = tuple(int(v) for v in f)
    dtype = arr.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
        arr = arr.astype(jnp.float32)
        dtype = arr.dtype

    D = arr.shape[:3]
    nvars = arr.shape[3]
    pad = tuple(ri + fi for ri, fi in zip(r, f))
    dsq_norm = np.float64(nvars * np.prod([2 * fi + 1 for fi in f]))

    # 'reflect' (edge-excluding) padding — matches _idx in the reference.
    # Guard: jnp.pad 'reflect' requires pad < dim size.
    for i in range(3):
        if pad[i] >= D[i] and pad[i] > 0:
            raise ValueError(
                'r + f (%d) must be smaller than dim %d size (%d)'
                % (pad[i], i, D[i]))
    P = jnp.pad(arr, [(p, p) for p in pad] + [(0, 0)], mode='reflect')

    offsets = np.array(
        [off for off in itertools.product(
            *[range(-ri, ri + 1) for ri in r]) if off != (0, 0, 0)],
        dtype=np.int32)

    if len(offsets) == 0:
        # degenerate neighborhood: identity (self weight 1)
        return arr

    fwin = tuple(2 * fi + 1 for fi in f)
    two_sigma2 = jnp.asarray(2.0 * float(sigma) ** 2, dtype)
    inv_h2 = jnp.asarray(1.0 / float(h) ** 2, dtype)

    # Region of P needed for patch sums: [pad - f, pad + D + f)
    base_lo = tuple(pi - fi for pi, fi in zip(pad, f))
    ext_shape = tuple(d + 2 * fi for d, fi in zip(D, f))

    A1 = lax.dynamic_slice(
        P, (base_lo[0], base_lo[1], base_lo[2], 0),
        ext_shape + (nvars,))

    def body(carry, off):
        wsum, wsq, wmax, out = carry
        zero_i = jnp.zeros((), off.dtype)
        # shifted extended block for patch distances
        A2 = lax.dynamic_slice(
            P, (base_lo[0] + off[0], base_lo[1] + off[1],
                base_lo[2] + off[2], zero_i), ext_shape + (nvars,))
        sq = jnp.sum((A1 - A2) ** 2, axis=-1)
        patch = lax.reduce_window(sq, jnp.array(0, sq.dtype), lax.add,
                                  fwin, (1, 1, 1), 'VALID')
        dsq = patch / jnp.asarray(dsq_norm, patch.dtype)
        w = jnp.exp(-jnp.maximum(dsq - two_sigma2, 0) * inv_h2)
        # shifted center values for the weighted average
        vals = lax.dynamic_slice(
            P, (pad[0] + off[0], pad[1] + off[1], pad[2] + off[2],
                zero_i), D + (nvars,))
        return ((wsum + w, wsq + w * w, jnp.maximum(wmax, w),
                 out + w[..., None] * vals), None)

    center = lax.dynamic_slice(P, (pad[0], pad[1], pad[2], 0),
                               D + (nvars,))
    # derive the init from the data so the carry keeps the same
    # device-varying type as the body outputs under shard_map
    zero = center[..., 0] * 0
    init = (zero, zero, zero, center * 0)
    (wsum, wsq, wmax, out), _ = lax.scan(body, init, jnp.asarray(offsets))

    if n_eff < 0:
        w_self = jnp.where(wmax == 0, jnp.asarray(1, dtype), wmax)
    else:
        w_self = find_weight_vectorized(wsum, wsq,
                                        jnp.asarray(n_eff, dtype))
    total = wsum + w_self
    out = (out + w_self[..., None] * center) / total[..., None]
    return out
