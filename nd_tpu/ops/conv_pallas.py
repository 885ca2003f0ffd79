"""Fused Pallas TPU kernel for separable convolutions.

The XLA shift-add path (`ops.conv._conv_core`) is numerically ideal
but its composition costs several HBM round trips per call: the
boundary-pad copy, then one read+write per filtered axis. For the
bandwidth-bound small-tap filters (boxcar, Gaussian) that caps the
measured rate at a few percent of the HBM roofline. This kernel runs
the whole separable stack in ONE pass: each grid step DMAs a halo
tile into VMEM, applies every axis's taps as unrolled static-slice
shift-adds (pure VPU work), and writes the finished tile once — HBM
traffic drops to pad copy + one read + one write.

Numerics are identical to the shift-add path: float32 adds/multiplies
of the same factor taps in the same order (uniform taps sum first and
scale once, like `_shift_add_valid`).

Layout: batch axes are collapsed into the tile's untiled LEADING
axis; filtered axis 0 rides the sublanes, filtered axis 1 the
128-wide lanes.
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

__all__ = ['separable_convolve_pallas', 'rowfused_convolve',
           'padless_convolve', 'supports_pallas']

_TX = 512
_VMEM_BUDGET = 12 << 20    # scoped-VMEM budget per grid step (the
#                            Mosaic limit is 16 MB; headroom for
#                            regalloc spills and the DMA semaphore)
# Taps per axis the fused kernel admits. The accumulation chain is
# unrolled values (shared with ops.conv._shift_add_valid), and Mosaic
# stack-allocates unrolled temps — keep the count conservative and
# route longer kernels to the XLA path.
_MAX_TAPS = 16


def _halo(lo, hi, align):
    return int(np.ceil(max(lo, hi) / align)) * align if (lo or hi) \
        else 0


def _live_tile_bytes(b, n2, pads, kcounts, ty, tx):
    """Scoped-VMEM model for ONE grid step of the fused kernel:
    DMA'd input scratch + the unrolled shift-add temps of the largest
    single axis pass + ~2 output-tile temps. Mosaic keeps each pass's
    whole unrolled chain live on the VMEM stack, one pass at a time —
    validated against a measured OOM (a 13-tap y-pass on a (32, 1024)
    tile of a 12-deep stack allocated 28.04 MB; this model predicts
    28.7). The earlier input-only budget ignored the per-tap temps and
    admitted exactly that compile failure."""
    h0 = _halo(*pads[0], 4)
    h1 = _halo(*pads[1], 64)
    lo2, hi2 = pads[2]
    k0, k1, k2 = kcounts
    scr = (n2 + lo2 + hi2) * b * (ty + 2 * h0) * (tx + 2 * h1) * 4
    pass2 = k2 * n2 * b * (ty + 2 * h0) * (tx + 2 * h1) * 4 \
        if k2 > 1 else 0
    pass0 = k0 * n2 * b * ty * (tx + 2 * h1) * 4 if k0 > 1 else 0
    pass1 = k1 * n2 * b * ty * tx * 4 if k1 > 1 else 0
    out = n2 * b * ty * tx * 4
    return scr + max(pass2, pass0, pass1) + 2 * out


def supports_pallas():
    from .pallas_guard import pallas_disabled
    return jax.default_backend() == 'tpu' and pltpu is not None \
        and not pallas_disabled()


def _apply_taps(x, taps, axis, lo, halo, out_len):
    """VALID shift-add of ``taps`` along ``axis`` of the VMEM array
    ``x`` whose filtered extent carries an aligned halo of ``halo``
    on each side (output pixel o reads window starting at
    ``halo - lo + o``). The numerics ARE ops.conv._shift_add_valid —
    the fused/XLA bit-parity contract hangs on them staying one
    function."""
    from .conv import _shift_add_valid
    start = halo - lo
    key = [slice(None)] * x.ndim
    key[axis] = slice(start, start + out_len + len(taps) - 1)
    return _shift_add_valid(x[tuple(key)], taps, axis)


def _kernel(scratch, out_ref, *, taps2, lo2, taps0, lo0, taps1, lo1,
            h0, h1, nt, ty, tx):
    """One (nt+k2-1, B, ty+2h0, tx+2h1) VMEM tile ->
    (nt, B, ty, tx) output. The leading (temporal) axis carries an
    exact halo (no tiling constraint); y/x carry aligned rings."""
    x = scratch[:]
    if taps2 is not None:
        x = _apply_taps(x, taps2, 0, lo2, lo2, nt)
    if taps0 is not None:
        x = _apply_taps(x, taps0, 2, lo0, h0, ty)
    else:
        x = x[:, :, h0:h0 + ty, :]
    if taps1 is not None:
        x = _apply_taps(x, taps1, 3, lo1, h1, tx)
    else:
        x = x[:, :, :, h1:h1 + tx]
    out_ref[:] = x


def separable_convolve_pallas(arr, taps_by_axis, mode='reflect',
                              cval=0.0, interpret=False):
    """Fused separable VALID-correlation with scipy's origin padding.

    Parameters
    ----------
    arr : jax array, ndim >= 2, float32
        The filtered axes must be within {0, 1, 2} (axis 2 needs
        ndim >= 3); all other axes are batched.
    taps_by_axis : list of (axis, taps)
        ``taps`` are the already-FLIPPED 1-d weights (the caller
        implements true convolution by flipping, exactly like
        ``ops.conv.convolve``). Output pixel ``o`` reads the window
        ``[o - (k-1)//2, o + k//2]`` of the input, i.e. the input is
        padded ``((k-1)//2, k//2)``.
    mode, cval :
        numpy.pad boundary mode for the global edges.

    Returns an array of ``arr``'s shape.
    """
    arr = jnp.asarray(arr)
    if arr.dtype != jnp.float32:
        raise ValueError('float32 only')
    if arr.ndim < 2:
        raise ValueError('need at least 2 dims')
    taps = {int(ax): np.asarray(t, np.float64)
            for ax, t in taps_by_axis if np.shape(t)[0] > 1}
    if not taps or any(ax not in (0, 1, 2) for ax in taps):
        raise ValueError('filtered axes must be within {0, 1, 2}')
    if 2 in taps and arr.ndim < 3:
        raise ValueError('axis 2 taps need ndim >= 3')
    if any(len(t) > _MAX_TAPS for t in taps.values()):
        raise ValueError('too many taps')

    shape = arr.shape
    n0, n1 = shape[0], shape[1]
    nt = shape[2] if arr.ndim > 2 else 1

    # layout (d0, d1, d2, *batch) -> (T, B, d0, d1): the (possibly
    # filtered) d2 axis leads the tile untiled with an exact halo,
    # the remaining batch collapses next to it, d0 rides sublanes and
    # d1 the 128-wide lanes
    batch_shape = shape[3:] if arr.ndim > 2 else ()
    b = int(np.prod(batch_shape)) if batch_shape else 1
    data = arr.reshape(n0, n1, nt, b)
    data = jnp.transpose(data, (2, 3, 0, 1))

    # scipy origin padding per filtered axis (flipped taps)
    pads = {}
    for ax in (0, 1, 2):
        if ax in taps:
            k = len(taps[ax])
            pads[ax] = ((k - 1) // 2, k // 2)
        else:
            pads[ax] = (0, 0)
    lo0, hi0 = pads[0]
    lo1, hi1 = pads[1]
    lo2, hi2 = pads[2]

    # aligned halos (Mosaic DMA slices respect the (8, 128) tiling;
    # the leading axes are untiled, so the temporal halo is exact)
    h0 = _halo(lo0, hi0, 4)
    h1 = _halo(lo1, hi1, 64)

    # boundary pad (the true edge condition) — THE boundary-fill
    # helper, never a re-derivation (parallel/engine.py:32 explains
    # why the mapping must not diverge from convolve's own)
    from .conv import pad_reflect
    data = pad_reflect(data, ((lo2, hi2), (0, 0), (lo0, hi0),
                              (lo1, hi1)), mode, cval)

    # ... tile geometry within the VMEM budget, then the alignment
    # ring + trailing grid padding (dead data, outputs dropped).
    # Grid extents are rounded to 64 (rows) / 128 (lanes) so ragged
    # eager shapes bucket into shared executables like the XLA
    # path's _SHAPE_BUCKET; ty is a divisor of 64 so the tile grid
    # fits the bucketed extent exactly.
    tx = min(_TX, max(128, int(np.ceil(n1 / 128)) * 128))
    kcounts = (len(taps.get(0, ())), len(taps.get(1, ())),
               len(taps.get(2, ())))

    def tile_bytes(t_y, t_x):
        return _live_tile_bytes(b, nt, pads, kcounts, t_y, t_x)

    while tx > 128 and tile_bytes(8, tx) > _VMEM_BUDGET:
        tx -= 128
    ty = 64
    while ty > 8 and tile_bytes(ty, tx) > _VMEM_BUDGET:
        ty //= 2
    ny_pad = int(np.ceil(n0 / 64)) * 64
    nx_pad = int(np.ceil(n1 / tx)) * tx
    data = jnp.pad(
        data, ((0, 0), (0, 0),
               (h0 - lo0, h0 - hi0 + ny_pad - n0),
               (h1 - lo1, h1 - hi1 + nx_pad - n1)), mode='edge')

    grid = (ny_pad // ty, nx_pad // tx)
    kernel = functools.partial(
        _kernel,
        taps2=taps.get(2), lo2=lo2,
        taps0=taps.get(0), lo0=lo0,
        taps1=taps.get(1), lo1=lo1,
        h0=h0, h1=h1, nt=nt, ty=ty, tx=tx)

    def dma_kernel(hbm_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, :,
                       pl.ds(i * ty, ty + 2 * h0),
                       pl.ds(j * tx, tx + 2 * h1)],
            scratch, sem)
        cp.start()
        cp.wait()
        kernel(scratch, out_ref)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt, b, ny_pad, nx_pad),
                                       jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nt, b, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt + lo2 + hi2, b, ty + 2 * h0,
                        tx + 2 * h1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(data)

    out = out[:, :, :n0, :n1]
    out = jnp.transpose(out, (2, 3, 0, 1))
    return out.reshape(shape)


_ROWFUSED_BUDGET = 15 << 20


def _rowfused_geometry(n0, n1, nt, b, k0, k1, lo0, hi0):
    """(ty, tc) for the row-fused kernel, or None when no admissible
    geometry exists. The x axis is never tiled (full-width rows kill
    the x halo and its duplicated DMA traffic); VMEM is modeled as the
    double-buffered (tc, b, ty + 2h0, nx_in) input scratch plus ~3
    row-slab working sets — Mosaic retires each unrolled tap's temps
    at the ref store, so the TAP COUNT does not enter. Calibrated
    against the measured Mosaic allocator on the bench cube
    (1024x1024x12x4), where the compiler's own OOM reports pin the
    coefficients: 3-tap (64, tc=3) allocates 16.82 MiB (fails the
    16 MiB scoped limit), 13-tap (64, tc=2) allocates 24.93 MiB
    (fails), 3-tap (64, tc=2) and 13-tap (32, tc<=2) build and run
    (boxcar 1195 -> 1488 Mpix/s, gaussian 747 -> ~1266). The fit
    live = scr + 1.15 row + 0.27 (k0+k1) row reproduces both OOM
    sizes to ~1%; the 15 MiB budget leaves regalloc slack under the
    16 MiB hardware limit."""
    h0 = _halo(lo0, hi0, 4)
    nx_in = int(np.ceil((int(np.ceil(n1 / 128)) * 128
                         + 2 * ((k1 - 1) if k1 else 0)) / 128)) * 128

    def live(ty, tc):
        scr = 2 * tc * b * (ty + 2 * h0) * nx_in * 4
        row = tc * b * ty * nx_in * 4
        return scr + 1.15 * row + 0.27 * (k0 + k1) * row

    best = None
    for ty in (64, 32, 16, 8):
        if ty > max(8, int(np.ceil(n0 / 8)) * 8):
            continue
        for tc in (4, 3, 2, 1):
            if tc > nt:
                continue
            if live(ty, tc) > _ROWFUSED_BUDGET:
                continue
            # fewest grid steps (biggest tiles) wins, but geometries
            # whose unrolled tap-temp stack stays small are preferred
            # outright — measured: the 3-tap boxcar is fastest at the
            # biggest admissible tile ((64, 2): 1438 vs (64, 1): 1192
            # Mpix/s), while the 13-tap gaussian DEGRADES at big
            # tiles ((32, 1): 1266 vs (64, 1): 1048 — the ~8 MB temp
            # stack starves the double-buffered DMA of VMEM)
            row = tc * b * ty * nx_in * 4
            heavy = 0.27 * (k0 + k1) * row > 4.5e6
            steps = (int(np.ceil(n0 / ty)) * int(np.ceil(nt / tc)))
            key = (heavy, steps, -ty)
            if best is None or key < best[0]:
                best = (key, ty, tc)
    return None if best is None else (best[1], best[2])


def rowfused_convolve(arr, taps_by_axis, mode='reflect', cval=0.0,
                      ty=None, tc=None, interpret=False):
    """Row-fused separable VALID-correlation over axes {0, 1} with
    scipy's origin padding — the bandwidth-optimal variant of
    :func:`separable_convolve_pallas` for spatial-only filters.

    Design (measured on-chip: 3x3 boxcar 1195 -> 1528 Mpix/s, ~75% of
    this device's empirical streaming ceiling):

    - x (axis 1) is never tiled: full-width rows mean no x halo, so no
      duplicated DMA traffic along the fast axis;
    - ONE combined boundary pad: the true edge pad, the alignment
      ring, and the trailing grid padding are a single ``jnp.pad``
      (every supported mode yields values at distance d from the edge
      that are independent of the total pad width, so widening is
      self-consistent; the extra ring feeds only dropped outputs) —
      one HBM round trip instead of two;
    - the grid walks (t-chunks, y-tiles) with double-buffered manual
      DMA so the next tile streams in behind the VPU;
    - tap passes accumulate in VMEM refs (``acc[:] = acc[:] + ...``),
      the same add order and uniform-tap scaling as
      ``ops.conv._shift_add_valid``; uniform (boxcar) taps are
      bit-identical to the XLA path, weighted taps may differ by
      ~1-2 ulp where the compiler contracts the per-tap multiply-add
      into an FMA (the value-semantics XLA chain fuses differently).

    ``taps_by_axis``: (axis, FLIPPED taps) with axes within {0, 1}.
    """
    arr = jnp.asarray(arr)
    shape = arr.shape
    n0, n1 = shape[0], shape[1]
    nt = shape[2] if arr.ndim > 2 else 1
    b = int(np.prod(shape[3:])) if arr.ndim > 3 else 1
    taps = {int(ax): np.asarray(t, np.float64)
            for ax, t in taps_by_axis}
    if any(ax not in (0, 1) for ax in taps):
        raise ValueError('row-fused kernel filters axes {0, 1} only')
    t0 = taps.get(0)
    t1 = taps.get(1)
    lo0, hi0 = ((len(t0) - 1) // 2, len(t0) // 2) if t0 is not None \
        else (0, 0)
    lo1, hi1 = ((len(t1) - 1) // 2, len(t1) // 2) if t1 is not None \
        else (0, 0)
    if ty is None or tc is None:
        geom = _rowfused_geometry(n0, n1, nt, b,
                                  len(t0) if t0 is not None else 0,
                                  len(t1) if t1 is not None else 0,
                                  lo0, hi0)
        if geom is None:
            raise ValueError('no admissible row-fused geometry')
        ty, tc = geom
    h0 = _halo(lo0, hi0, 4)

    data = arr.reshape(n0, n1, nt, b)
    data = jnp.transpose(data, (2, 3, 0, 1))       # (t, B, y, x)

    ny_pad = int(np.ceil(n0 / ty)) * ty
    wout = int(np.ceil(n1 / 128)) * 128
    nx_in = int(np.ceil((wout + lo1 + hi1) / 128)) * 128
    nt_pad = int(np.ceil(nt / tc)) * tc
    from .conv import _SCIPY_TO_NP_PAD, pad_reflect
    combined = ((0, nt_pad - nt), (0, 0),
                (h0, h0 + ny_pad - n0),
                (lo1, nx_in - n1 - lo1))
    limited = _SCIPY_TO_NP_PAD[mode] in ('symmetric', 'reflect',
                                         'wrap')
    if not limited or (nt_pad - nt <= nt
                       and max(h0, h0 + ny_pad - n0) <= n0
                       and max(lo1, nx_in - n1 - lo1) <= n1):
        # ONE pad: every supported mode's values at distance d from
        # the edge are independent of the total pad width, so the
        # widened ring is self-consistent and the extra rows/columns
        # feed only dropped outputs
        data = pad_reflect(data, combined, mode, cval)
    else:
        # narrow extents: true boundary pad first (within the mode's
        # width limit — the caller checked lo/hi <= extent), then the
        # dead alignment/grid ring as unlimited edge padding
        data = pad_reflect(data, ((0, 0), (0, 0), (lo0, hi0),
                                  (lo1, hi1)), mode, cval)
        data = jnp.pad(
            data, ((0, nt_pad - nt), (0, 0),
                   (h0 - lo0, h0 - hi0 + ny_pad - n0),
                   (0, nx_in - n1 - lo1 - hi1)), mode='edge')

    gy = ny_pad // ty
    gt = nt_pad // tc
    n_steps = gt * gy
    i32 = np.int32

    uniform0 = t0 is not None and bool(np.allclose(t0, t0[0]))
    uniform1 = t1 is not None and bool(np.allclose(t1, t1[0]))

    def compute(scr, out_ref, acc):
        if t0 is not None:
            st = h0 - lo0
            k = len(t0)
            acc[:] = scr[:, :, st:st + ty, :] if uniform0 \
                else scr[:, :, st:st + ty, :] * jnp.float32(t0[0])
            for i in range(1, k):
                term = scr[:, :, st + i:st + i + ty, :]
                acc[:] = acc[:] + (term if uniform0
                                   else term * jnp.float32(t0[i]))
            if uniform0 and t0[0] != 1.0:
                acc[:] = acc[:] * jnp.float32(t0[0])
            srcx = acc
            xoff = 0
        else:
            srcx = scr
            xoff = h0          # no y pass: read past the aligned ring
        if t1 is not None:
            k = len(t1)
            first = srcx[:, :, xoff:xoff + ty, 0:wout]
            out_ref[:] = first if uniform1 \
                else first * jnp.float32(t1[0])
            for i in range(1, k):
                term = srcx[:, :, xoff:xoff + ty, i:i + wout]
                out_ref[:] = out_ref[:] + (term if uniform1
                                           else term
                                           * jnp.float32(t1[i]))
            if uniform1 and t1[0] != 1.0:
                out_ref[:] = out_ref[:] * jnp.float32(t1[0])
        else:
            out_ref[:] = srcx[:, :, xoff:xoff + ty, 0:wout]

    def dma_kernel(hbm_ref, out_ref, scratch, acc, sems):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, i32(2))

        def start(gg, sl):
            it = gg // i32(gy)
            iy = jax.lax.rem(gg, i32(gy))
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(it * tc, tc), :,
                           pl.ds(iy * ty, ty + 2 * h0), :],
                scratch.at[sl], sems.at[sl]).start()

        @pl.when(g == 0)
        def _():
            start(g, slot)

        @pl.when(g + 1 < n_steps)
        def _():
            start(g + i32(1), jax.lax.rem(g + i32(1), i32(2)))

        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, ty + 2 * h0), :],
            scratch.at[slot], sems.at[slot]).wait()
        compute(scratch.at[slot], out_ref, acc)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt_pad, b, ny_pad, wout),
                                       jnp.float32),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tc, b, ty, wout),
            lambda g: (g // i32(gy), g * 0,
                       jax.lax.rem(g, i32(gy)), g * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tc, b, ty + 2 * h0, nx_in), jnp.float32),
            pltpu.VMEM((tc, b, ty, nx_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data)
    out = out[:nt, :, :n0, :n1]
    out = jnp.transpose(out, (2, 3, 0, 1))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Padless kernel: zero prep passes
# ---------------------------------------------------------------------------
#
# Round-5 profiling (tools/exp notes + /tmp probes, measured on-chip):
# the row-fused kernel's pallas_call alone streams the bench cube in
# ~0.72 ms (~17.4 Gpix/s), but its end-to-end rate was 5.4 Gpix/s —
# the other 1.5 ms was the reflect-pad materialization (jnp.pad
# 'reflect'/'edge' lowers as per-axis concat+flip passes, ~1.7 ms for
# the 114 MB padded cube, vs 0.73 ms for a single-pass zero pad) plus
# the layout round trips it forces around the custom call. This
# variant eliminates the prep pass entirely:
#
# - the input is consumed UNPADDED; each y-slab DMA window is shifted
#   inward at the grid edges (three static-shape branches — first /
#   interior / last slab), so every start index is provably 8-aligned;
# - the y boundary halo is built by TINY VMEM row copies inside the
#   edge slabs (the mirror/symmetric/nearest source rows are already
#   resident in the slab — no extra DMA, no semaphore juggling);
# - x taps apply as pltpu.roll lane rotations (full-width rows, no x
#   pad); the lo1/hi1 wrapped edge columns are then rebuilt per column
#   from the y-passed slab with mode-correct indexing.
#
# Measured (1024x1024x12x4 cube): boxcar 3x3 5.45 -> 18.4 Gpix/s
# (~590 GB/s by the 32 B/pix model = ~84% of the DMA-through probe's
# streaming-kernel ceiling), gaussian 13-tap 3.7 -> 4.2 Gpix/s; full
# parity vs the XLA shift-add path (gaussian bit-exact, boxcar <=1e-6
# from the per-axis uniform rescale order).

_PADLESS_MODES = ('reflect', 'mirror', 'nearest', 'constant')


def _edge_src(j, n, mode):
    """In-range source index replacing out-of-range position ``j``
    under the scipy boundary mode (None => constant fill)."""
    if mode == 'reflect':        # symmetric: -1 -> 0, n -> n-1
        return (-j - 1) if j < 0 else (2 * n - 1 - j)
    if mode == 'mirror':         # reflect101: -1 -> 1, n -> n-2
        return -j if j < 0 else (2 * n - 2 - j)
    if mode == 'nearest':
        return 0 if j < 0 else (n - 1)
    return None                  # 'constant'


def _padless_geometry(n0, n1, nt, b, k0, k1):
    """(ty, tc) for the padless kernel, or None when inadmissible.

    Requirements: 128-lane-aligned width, a ty that divides n0 with
    n0 >= ty + 2*h0, and the Mosaic scoped-VMEM fit. The live-bytes
    model is calibrated against the compiler's own allocator reports
    on the bench cube (see _PADLESS_TEMP_*): the measured OOM/OK
    boundary sits between boxcar (64,1)+(96? n/a) OK / (128,1) OOM at
    16.5 MiB and gaussian-13 (32,2) OK — sliced y-taps hold their
    whole unrolled sum live while rolled x-taps retire per step."""
    if n1 % 128 != 0 or n0 < 8:
        return None
    h0 = int(np.ceil(max((k0 - 1) // 2, k0 // 2) / 8)) * 8 if k0 \
        else 0

    def live(ty, tc):
        win = ty + 2 * h0
        scr = 2 * tc * b * win * n1 * 4
        row = tc * b * ty * n1 * 4
        return scr + (_PADLESS_TEMP_BASE
                      + _PADLESS_TEMP_SLICE * k0
                      + _PADLESS_TEMP_ROLL * k1) * row

    best = None
    for ty in (128, 64, 32, 16, 8):
        if n0 % ty != 0 or n0 < ty + 2 * h0:
            continue
        for tc in (2, 1):
            if nt % tc != 0:
                continue
            if live(ty, tc) > _PADLESS_BUDGET:
                continue
            steps = (n0 // ty) * (nt // tc)
            key = (steps, -ty)
            if best is None or key < best[0]:
                best = (key, ty, tc)
    return None if best is None else (best[1], best[2])


# live-temp model coefficients (rows of tc*b*ty*n1*4 bytes) — fitted
# to the Mosaic allocator's OOM reports on the bench cube: boxcar
# (128,1) allocates 16.5 MiB (scr 4.72 + X => X = 5.62 rows at
# k0=k1=3), gaussian-13 (32,2) builds and runs. Sliced y-taps keep
# the whole unrolled sum tree live (coefficient per tap), rolled
# x-taps retire at each accumulate.
_PADLESS_TEMP_BASE = 2.1
_PADLESS_TEMP_SLICE = 0.85
_PADLESS_TEMP_ROLL = 0.33
_PADLESS_BUDGET = 15 << 20


def padless_convolve(arr, taps_by_axis, mode='reflect', cval=0.0,
                     ty=None, tc=None, interpret=False):
    """Zero-prep-pass separable VALID-correlation over axes {0, 1}
    with scipy origin padding — the fastest conv variant (see the
    design note above). ``taps_by_axis``: (axis, FLIPPED taps) with
    axes within {0, 1}; input must satisfy ``_padless_geometry``.
    """
    arr = jnp.asarray(arr)
    shape = arr.shape
    n0, n1 = shape[0], shape[1]
    nt = shape[2] if arr.ndim > 2 else 1
    b = int(np.prod(shape[3:])) if arr.ndim > 3 else 1
    taps = {int(ax): np.asarray(t, np.float64)
            for ax, t in taps_by_axis}
    if any(ax not in (0, 1) for ax in taps):
        raise ValueError('padless kernel filters axes {0, 1} only')
    if mode not in _PADLESS_MODES:
        raise ValueError('unsupported boundary mode %r' % mode)
    t0 = taps.get(0)
    t1 = taps.get(1)
    k0 = len(t0) if t0 is not None else 0
    k1 = len(t1) if t1 is not None else 0
    lo0, hi0 = ((k0 - 1) // 2, k0 // 2) if k0 else (0, 0)
    lo1, hi1 = ((k1 - 1) // 2, k1 // 2) if k1 else (0, 0)
    if ty is None or tc is None:
        geom = _padless_geometry(n0, n1, nt, b, k0, k1)
        if geom is None:
            raise ValueError('no admissible padless geometry')
        ty, tc = geom
    h0 = int(np.ceil(max(lo0, hi0) / 8)) * 8 if k0 else 0
    win = ty + 2 * h0
    gy = n0 // ty
    gt = nt // tc
    n_steps = gt * gy
    i32 = np.int32
    cval_f = float(cval)   # python scalar: a jnp scalar would be a
    #                        captured constant inside the kernel

    uniform0 = k0 and bool(np.allclose(t0, t0[0]))
    uniform1 = k1 and bool(np.allclose(t1, t1[0]))

    data = arr.reshape(n0, n1, nt, b)
    data = jnp.transpose(data, (2, 3, 0, 1))       # (t, B, y, x)

    def compute(scr, out_ref, iy):
        if k0:
            # y halo on edge slabs: boundary rows are rebuilt from
            # rows already resident in the slab (VMEM row copies;
            # 'constant' writes the fill value)
            @pl.when(iy == 0)
            def _():
                for m in range(1, lo0 + 1):
                    src = _edge_src(-m, n0, mode)
                    if src is None:
                        scr[:, :, h0 - m, :] = jnp.full(
                            (tc, b, n1), cval_f, jnp.float32)
                    else:
                        scr[:, :, h0 - m, :] = scr[:, :, h0 + src, :]

            @pl.when(iy == gy - 1)
            def _():
                base = n0 - ty - h0 if gy > 1 else -h0
                for m in range(hi0):
                    src = _edge_src(n0 + m, n0, mode)
                    if src is None:
                        scr[:, :, ty + h0 + m, :] = jnp.full(
                            (tc, b, n1), cval_f, jnp.float32)
                    else:
                        scr[:, :, ty + h0 + m, :] = \
                            scr[:, :, src - base, :]
            st = h0 - lo0
            x = scr[:, :, st:st + ty + k0 - 1, :]
            acc = None
            for i in range(k0):
                term = x[:, :, i:i + ty, :]
                if not uniform0:
                    term = term * jnp.float32(t0[i])
                acc = term if acc is None else acc + term
            if uniform0 and t0[0] != 1.0:
                acc = acc * jnp.float32(t0[0])
            x = acc
        else:
            x = scr[:, :, h0:h0 + ty, :]
        if k1:
            acc = None
            for j in range(k1):
                sh = (lo1 - j) % n1
                term = pltpu.roll(x, jnp.int32(sh), 3) if sh else x
                if not uniform1:
                    term = term * jnp.float32(t1[j])
                acc = term if acc is None else acc + term
            if uniform1 and t1[0] != 1.0:
                acc = acc * jnp.float32(t1[0])
            out_ref[:] = acc

            # Wrapped edge columns: rebuilt as ONE strip per side — a
            # (k-1+L)-lane source extension (out-of-range lanes are
            # single-column slices gathered into one concat, interior
            # is one slice) followed by k tap-FMAs on the L-wide
            # strip, in the same per-column add order as the main
            # pass. The previous per-COLUMN rebuild ran k ops per
            # column on width-1 slabs (~2·k·(k//2) tiny Mosaic ops);
            # at 13 taps that cost 1.39 ms of the gaussian's 3.0 ms
            # at the bench cube (measured r5 ablation).
            def _ext_cols(p_lo, p_hi):
                cols = []
                for p in range(p_lo, p_hi + 1):
                    src = _edge_src(p, n1, mode)
                    cols.append(
                        jnp.full((tc, b, ty, 1), cval_f, jnp.float32)
                        if src is None
                        else x[:, :, :, src:src + 1])
                return cols

            def _edge_fix(c0, width):
                p0 = c0 - lo1
                p1 = c0 + width - 1 + hi1
                pieces = _ext_cols(p0, -1) if p0 < 0 else []
                pieces.append(x[:, :, :, max(p0, 0):min(p1 + 1, n1)])
                if p1 >= n1:
                    pieces += _ext_cols(n1, p1)
                xe = jnp.concatenate(pieces, axis=-1) \
                    if len(pieces) > 1 else pieces[0]
                strip = None
                for j in range(k1):
                    term = xe[:, :, :, j:j + width]
                    if not uniform1:
                        term = term * jnp.float32(t1[j])
                    strip = term if strip is None else strip + term
                if uniform1 and t1[0] != 1.0:
                    strip = strip * jnp.float32(t1[0])
                out_ref[:, :, :, c0:c0 + width] = strip

            if lo1:
                _edge_fix(0, lo1)
            if hi1:
                _edge_fix(n1 - hi1, hi1)
        else:
            out_ref[:] = x

    def dma_kernel(hbm_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, i32(2))

        def start(gg, sl):
            it = gg // i32(gy)
            iy = jax.lax.rem(gg, i32(gy))
            if h0 == 0:
                idx = pl.multiple_of(iy * ty, 8)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(idx, win), :],
                    scratch.at[sl], sems.at[sl]).start()
                return

            @pl.when(iy == 0)
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(0, ty + h0), :],
                    scratch.at[sl, :, :, pl.ds(h0, ty + h0), :],
                    sems.at[sl]).start()

            @pl.when(jnp.logical_and(iy > 0, iy < gy - 1))
            def _():
                idx = pl.multiple_of(iy * ty - h0, 8)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(idx, win), :],
                    scratch.at[sl], sems.at[sl]).start()

            @pl.when(jnp.logical_and(iy == gy - 1, iy > 0))
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(n0 - ty - h0, ty + h0), :],
                    scratch.at[sl, :, :, pl.ds(0, ty + h0), :],
                    sems.at[sl]).start()

        def wait(gg, sl):
            if h0 == 0:
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, win), :],
                    scratch.at[sl], sems.at[sl]).wait()
                return
            iy = jax.lax.rem(gg, i32(gy))
            interior = jnp.logical_and(iy > 0, iy < gy - 1)

            @pl.when(interior)
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, win), :],
                    scratch.at[sl], sems.at[sl]).wait()

            @pl.when(jnp.logical_not(interior))
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, tc), :,
                               pl.ds(0, ty + h0), :],
                    scratch.at[sl, :, :, pl.ds(0, ty + h0), :],
                    sems.at[sl]).wait()

        @pl.when(g == 0)
        def _():
            start(g, slot)

        @pl.when(g + 1 < n_steps)
        def _():
            start(g + i32(1), jax.lax.rem(g + i32(1), i32(2)))

        wait(g, slot)
        compute(scratch.at[slot], out_ref, jax.lax.rem(g, i32(gy)))

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt, b, n0, n1), jnp.float32),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tc, b, ty, n1),
            lambda g: (g // i32(gy), g * 0,
                       jax.lax.rem(g, i32(gy)), g * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tc, b, win, n1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data)
    out = jnp.transpose(out, (2, 3, 0, 1))
    return out.reshape(shape)


def _rowfused_applicable(arr, active, mode):
    """(ty, tc) when the row-fused kernel admits this call, else
    None: spatial-only taps and an admissible VMEM geometry."""
    shp = np.shape(arr)
    if any(ax not in (0, 1) for ax, _ in active):
        return None
    n0, n1 = shp[0], shp[1]
    nt = shp[2] if len(shp) > 2 else 1
    b = int(np.prod(shp[3:])) if len(shp) > 3 else 1
    kc = {ax: len(t) for ax, t in active}
    lo0, hi0 = (((kc[0] - 1) // 2, kc[0] // 2) if 0 in kc
                else (0, 0))
    return _rowfused_geometry(n0, n1, nt, b, kc.get(0, 0),
                              kc.get(1, 0), lo0, hi0)


def try_fused_separable(arr, taps_by_axis, mode, cval,
                        interpret=False):
    """The fused kernel when it applies, else None (caller keeps its
    XLA path). ``taps_by_axis``: (axis, FLIPPED taps) pairs."""
    if not (supports_pallas() or interpret):
        return None
    if not isinstance(arr, jax.Array) and not interpret:
        return None
    if jnp.asarray(arr).dtype != jnp.float32 or np.ndim(arr) < 2:
        return None
    if any(s == 0 for s in np.shape(arr)):
        return None            # empty arrays: XLA returns them as-is
    active = []
    scale = 1.0   # length-1 factors carry the kernel's scale (see
    #               _separable_factors: facs[0] holds k.flat[0] for
    #               uniform kernels) — fold it into a real tap vector
    for ax, t in taps_by_axis:
        t = np.asarray(t, np.float64)
        if t.shape[0] > 1:
            active.append((int(ax), t))
        else:
            scale *= float(t[0]) if t.shape[0] else 1.0
    if not active:
        return None
    if scale != 1.0:
        ax0, t0 = active[0]
        active[0] = (ax0, t0 * scale)
    if any(ax not in (0, 1, 2) for ax, _ in active) \
            or any(len(t) > _MAX_TAPS for _, t in active):
        return None
    if any(ax == 2 for ax, _ in active) and np.ndim(arr) < 3:
        return None
    if len({ax for ax, _ in active}) != len(active):
        return None            # repeated axis: keep sequential passes
    from .conv import _SCIPY_TO_NP_PAD
    if mode not in _SCIPY_TO_NP_PAD:
        return None
    # jnp.pad('wrap'/'symmetric'/...) needs pad <= extent
    for ax, t in active:
        k = len(t)
        if max((k - 1) // 2, k // 2) > np.shape(arr)[ax]:
            return None

    # VMEM floor: the collapsed batch axis rides every tile whole, so
    # a deep stack can exceed the ~16 MB Mosaic limit at the smallest
    # tile already — a hard compile failure under jit (the guard is
    # inert while tracing) and strike-then-session-disable eagerly.
    # Bail to the XLA path before that can happen.
    pads = {0: (0, 0), 1: (0, 0), 2: (0, 0)}
    for ax, t in active:
        k = len(t)
        pads[ax] = ((k - 1) // 2, k // 2)
    shp = np.shape(arr)
    n2 = shp[2] if len(shp) > 2 else 1
    b = int(np.prod(shp[3:])) if len(shp) > 3 else 1
    kc = {ax: len(t) for ax, t in active}
    kcounts = (kc.get(0, 0), kc.get(1, 0), kc.get(2, 0))
    if _live_tile_bytes(b, n2, pads, kcounts, 8, 128) > _VMEM_BUDGET:
        return None

    pad_geom = None
    if mode in _PADLESS_MODES \
            and all(ax in (0, 1) for ax, _ in active):
        kc = {ax: len(t) for ax, t in active}
        pad_geom = _padless_geometry(
            shp[0], shp[1], n2, b, kc.get(0, 0), kc.get(1, 0))
    if pad_geom is not None:
        # padless variant: no prep pass at all (see design note) —
        # measured 3.4x the padded row-fused boxcar
        def pallas_path(a):
            return padless_convolve(a, active, mode=mode, cval=cval,
                                    ty=pad_geom[0], tc=pad_geom[1],
                                    interpret=interpret)
    elif (geom := _rowfused_applicable(arr, active, mode)) \
            is not None:
        # bandwidth-optimal row-fused variant (spatial-only taps)
        def pallas_path(a):
            return rowfused_convolve(a, active, mode=mode, cval=cval,
                                     ty=geom[0], tc=geom[1],
                                     interpret=interpret)
    else:
        def pallas_path(a):
            return separable_convolve_pallas(a, active, mode=mode,
                                             cval=cval,
                                             interpret=interpret)

    from .pallas_guard import run_with_fallback

    def xla_path(a):
        from .conv import _shift_add_valid, pad_reflect
        pad_width = [(0, 0)] * np.ndim(a)
        for ax, t in active:
            pad_width[ax] = pads[ax]
        out = pad_reflect(jnp.asarray(a), pad_width, mode, cval)
        for ax, t in active:
            out = _shift_add_valid(out, t, ax)
        return out

    return run_with_fallback(pallas_path, xla_path, arr,
                             name='sepconv')
