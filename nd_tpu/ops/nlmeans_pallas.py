"""Fused Pallas TPU kernels for non-local means (2-D and 3-D windows).

The XLA formulation (nd_tpu/ops/nlmeans.py) re-reads and re-writes the
weight/output accumulators from HBM once per neighborhood offset; these
kernels keep the entire accumulation in VMEM: each grid step DMAs one
(t + 2pt, v, TY + 2py, TX + 2px) halo tile, unrolls the offset loop
on-chip and writes the finished (t, v, TY, TX) output tile once — HBM
traffic drops from O(offsets x cube) to ~2 x cube.

The temporal axis rides the tile's LEADING (untiled) axis and is fully
VMEM-resident, so a temporal radius (the reference's 3-D filtering,
_filters.pyx up to 3 dims) is just more static offset slices — the
spatial kernel is the rt = ft = 0 special case of the same body.

Numerics are identical to the XLA/oracle path: reflect (edge-excluding)
boundary, weight exp(-max(dsq - 2 sigma^2, 0)/h^2), self-weight = max
weight or the n_eff solution.

Layout note: the tile is laid out (t, v, y, x) so the x axis rides the
128-wide lanes and y the sublanes; all offset/patch shifts are static
slices on VMEM arrays (pure VPU work, no gathers).
"""

from __future__ import annotations

import functools
import itertools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ['nlmeans_pallas', 'nlmeans_spatial_pallas',
           'supports_pallas']

_TY = 16
_TX = 512
_VMEM_NL_BUDGET = 12 << 20   # scoped-VMEM budget per grid step


def supports_pallas():
    from .pallas_guard import pallas_disabled
    return jax.default_backend() == 'tpu' and pltpu is not None \
        and not pallas_disabled()


def _live_tile_bytes(nt, nv, p_t, hp_y, hp_x, ty, tx, n_pairs):
    """Scoped-VMEM model for ONE grid step: the DMA'd input tile, ONE
    variable-free extended slab retained per unrolled pair iteration
    (Mosaic stack-allocates across the unrolled offset loop even with
    ref-based accumulators — measured: at r=2/f=2 a 16x512 tile [model
    16.1 MB] fails remote compile while 8x512 [10.7] and 16x256 [9.3]
    build, exactly the 12 MB budget's prediction), plus the weight /
    accumulator slabs and the output tile. The round-2 chooser scaled
    the budget by 1/n_offsets, which over-shrank r=2/f=2 to an 8x128
    tile whose 4x halo read overhead was the `nlmeans_r2` regression
    (400 vs ~500 Mpix/s at the widest admissible tiles)."""
    ext = (nt + 2 * p_t) * (ty + 2 * hp_y) * (tx + 2 * hp_x) * 4
    out_slab = nt * ty * tx * 4
    return ext * nv + n_pairs * ext + 7 * out_slab + nv * out_slab


def fits_vmem(shape, r, f):
    """Whether the fused kernel fits VMEM at the smallest tile
    (ty=8, tx=128). The (t + 2pt, v, ...) input tile and the per-t
    accumulators ride every tile whole — a deep stack can exceed the
    ~16 MB Mosaic limit no matter how the spatial tile shrinks, which
    would be a hard compile failure under jit (the runtime guard is
    inert while tracing). Callers route to the XLA scan when this
    returns False."""
    ny, nx, nt, nv = shape
    p_t = int(r[2]) + int(f[2])
    if p_t == 0:
        # spatial windows ride the padless or row-fused kernel, whose
        # t-chunked grids never need the whole t axis resident
        n_pairs_sp = max(((2 * int(r[0]) + 1)
                          * (2 * int(r[1]) + 1) - 1) // 2, 1)
        p_ysp = int(r[0]) + int(f[0])
        p_xsp = int(r[1]) + int(f[1])
        if _padless_nl_geometry(ny, nx, nt, nv, p_ysp, p_xsp,
                                n_pairs_sp) is not None:
            return True
        if _rowfused_geometry(ny, nx, nt, nv, p_ysp, p_xsp,
                              n_pairs_sp) is not None:
            return True
    hp_y = int(np.ceil((int(r[0]) + int(f[0])) / 4)) * 4
    hp_x = int(np.ceil((int(r[1]) + int(f[1])) / 64)) * 64
    n_pairs = max(((2 * int(r[2]) + 1) * (2 * int(r[0]) + 1)
                   * (2 * int(r[1]) + 1) - 1) // 2, 1)
    return _live_tile_bytes(nt, nv, p_t, hp_y, hp_x, 8, 128,
                            n_pairs) <= _VMEM_NL_BUDGET


def _kernel(refs, out_ref, *, rt, ry, rx, ft, fy, fx, sigma, h, n_eff,
            nvars, dsq_norm, halo=None):
    """One (t+2pt, v, TY+2hp, TX+2hp) tile -> (t, v, TY, TX) output.

    ``refs`` = (tile, wsum, wsq, wmax) VMEM refs; ``halo`` is the
    (possibly alignment-rounded) y/x tile halo — the kernel only reads
    within r+f of the output region. The temporal halo ``pt = rt+ft``
    is exact (the leading axis has no tiling constraint).
    """
    p_y, p_x = halo if halo is not None else (ry + fy, rx + fx)
    p_t = rt + ft
    in_ref, wsum_ref, wsq_ref, wmax_ref = refs
    shape = in_ref.shape                  # (t+2pt, v, TY+2py, TX+2px)
    dtype = in_ref.dtype
    tt = shape[0] - 2 * p_t
    ty = shape[2] - 2 * p_y
    tx = shape[3] - 2 * p_x

    two_sigma2 = jnp.asarray(2.0 * sigma * sigma, dtype)
    inv_h2 = jnp.asarray(1.0 / (h * h), dtype)
    inv_norm = jnp.asarray(1.0 / dsq_norm, dtype)

    wsum_ref[:] = jnp.zeros(wsum_ref.shape, dtype)
    if n_eff >= 0:
        wsq_ref[:] = jnp.zeros(wsq_ref.shape, dtype)
    else:
        wmax_ref[:] = jnp.zeros(wmax_ref.shape, dtype)
    out_ref[:] = jnp.zeros(out_ref.shape, dtype)

    # Unrolled offset loop with ref-based accumulators: each
    # iteration's temporaries die at the ref store, keeping the Mosaic
    # VMEM stack flat. Patch distances are symmetric —
    # dsq(p, p+D) == dsq(q, q-D) at q = p+D — so each unordered offset
    # pair is computed once over a D-extended window and reused for
    # both directions, halving the dominant sq/patch work.
    half = [(dt, dy, dx) for dt, dy, dx in
            itertools.product(range(-rt, rt + 1), range(-ry, ry + 1),
                              range(-rx, rx + 1))
            if (dt, dy, dx) > (0, 0, 0)]
    for dt, dy, dx in half:
        # the "left" pixel q of each evaluated pair (q, q+D) ranges
        # over o (forward) and o-D (backward): per axis
        # [-max(d,0), extent - min(d,0))
        et0 = -max(dt, 0)
        et1 = -min(dt, 0)
        ey0 = -max(dy, 0)
        ey1 = -min(dy, 0)
        ex0 = -max(dx, 0)
        ex1 = -min(dx, 0)
        # per-variable accumulation: each v's difference temp is one
        # variable-free slab instead of the full (t, v, y, x) slice
        # pair, cutting the iteration's live VMEM ~4x (wider tiles
        # become admissible) at identical numerics up to f32 add order
        sq = None
        for v in range(nvars):
            d = (in_ref[p_t + et0 - ft:p_t + tt + et1 + ft, v,
                        p_y + ey0 - fy:p_y + ty + ey1 + fy,
                        p_x + ex0 - fx:p_x + tx + ex1 + fx]
                 - in_ref[p_t + et0 + dt - ft:
                          p_t + tt + et1 + dt + ft, v,
                          p_y + ey0 + dy - fy:p_y + ty + ey1 + dy + fy,
                          p_x + ex0 + dx - fx:p_x + tx + ex1 + dx + fx])
            sq = d * d if sq is None else sq + d * d
        # patch sum over the (2f+1) window per axis: separable static
        # shifts
        ht = tt + et1 - et0
        acc_t = sq[0:ht]
        for u in range(1, 2 * ft + 1):
            acc_t = acc_t + sq[u:u + ht]
        hy = ty + ey1 - ey0
        acc_y = acc_t[:, 0:hy, :]
        for u in range(1, 2 * fy + 1):
            acc_y = acc_y + acc_t[:, u:u + hy, :]
        hx = tx + ex1 - ex0
        patch = acc_y[:, :, 0:hx]
        for v in range(1, 2 * fx + 1):
            patch = patch + acc_y[:, :, v:v + hx]
        # patch[s, r, c] = dsq between pixels (et0+s, ey0+r, ex0+c)
        # and the (dt, dy, dx)-shifted pixel, in tile-output coords.
        # The weight transform is elementwise, so evaluating it ONCE
        # on the extended plane and slicing per direction is
        # bit-identical to per-direction exp at ~half the exp work
        # (the extended extent exceeds the tile by |d|/tile per axis).
        w_ext = jnp.exp(-jnp.maximum(patch * inv_norm - two_sigma2, 0)
                        * inv_h2)
        w_fwd = w_ext[-et0:tt - et0, -ey0:ty - ey0, -ex0:tx - ex0]
        w_bwd = w_ext[-et0 - dt:tt - et0 - dt,
                      -ey0 - dy:ty - ey0 - dy,
                      -ex0 - dx:tx - ex0 - dx]
        # per-direction accumulation (two r5 experiments fused both
        # directions into one RMW per ref to halve the VMEM slab
        # passes — measured on-chip ~2-7% SLOWER both times, before
        # and after the single-exp restructure, so Mosaic already
        # coalesces these)
        for ddt, ddy, ddx, w in ((dt, dy, dx, w_fwd),
                                 (-dt, -dy, -dx, w_bwd)):
            wsum_ref[:] = wsum_ref[:] + w
            # exactly one of wsq/wmax feeds the self-weight: wsq only
            # through the n_eff quadratic, wmax only as the default
            # self-weight — the other accumulator is dead for the
            # static config, so its per-pair RMW is skipped entirely
            if n_eff >= 0:
                wsq_ref[:] = wsq_ref[:] + w * w
            else:
                wmax_ref[:] = jnp.maximum(wmax_ref[:], w)
            for v in range(nvars):
                out_ref[:, v] = out_ref[:, v] \
                    + w * in_ref[p_t + ddt:p_t + ddt + tt, v,
                                 p_y + ddy:p_y + ddy + ty,
                                 p_x + ddx:p_x + ddx + tx]

    wsum = wsum_ref[:]
    if n_eff < 0:
        wmax = wmax_ref[:]
        w_self = jnp.where(wmax == 0, jnp.asarray(1, dtype), wmax)
    else:
        from .nlmeans import find_weight_vectorized
        w_self = find_weight_vectorized(wsum, wsq_ref[:],
                                        jnp.asarray(n_eff, dtype),
                                        xp=jnp)

    inv_total = 1.0 / (wsum + w_self)
    for v in range(nvars):
        center = in_ref[p_t:p_t + tt, v, p_y:p_y + ty, p_x:p_x + tx]
        out_ref[:, v] = (out_ref[:, v] + w_self * center) * inv_total


def _rowfused_geometry(ny, nx, nt, nv, p_y, p_x, n_pairs):
    """(ty, tc, h_y, wout, nx_in) for the row-fused spatial kernel, or
    None — the SINGLE source of the rounding/halo formulas, so the
    VMEM admission model and the kernel's actual scratch allocation
    can never disagree.

    x is never tiled (full-width rows kill the per-tile x-halo DMA
    duplication: at r=2/f=2 the old 8x512 tiling re-read 2.0x in y and
    1.25x in x; full-width ty=64 rows read 1.125x in each). The t axis
    is gridded instead of VMEM-resident — legal because the spatial
    kernel has no temporal taps — which is what frees the VMEM for
    tall row slabs. Live-bytes model per grid step: the double-
    buffered (tc, v, ty + 2h, nx_in) input scratch, one variable-free
    extended slab retained per unrolled offset pair (same Mosaic
    behavior the tiled chooser was calibrated against), and the 3 + v
    accumulator/output row slabs."""
    h_y = int(np.ceil(p_y / 4)) * 4
    wout = int(np.ceil(nx / 128)) * 128
    nx_in = int(np.ceil((wout + 2 * p_x) / 128)) * 128

    def live(ty, tc):
        scr = 2 * tc * nv * (ty + 2 * h_y) * nx_in * 4
        ext = tc * (ty + 2 * h_y) * nx_in * 4
        row = tc * ty * nx_in * 4
        return scr + n_pairs * ext + (3 + nv) * row + 1.15 * row

    best = None
    for ty in (64, 32, 16, 8):
        if ty > max(8, int(np.ceil(ny / 8)) * 8):
            continue
        for tc in (2, 1):
            if tc > nt:
                continue
            if live(ty, tc) > _VMEM_NL_BUDGET:
                continue
            steps = (int(np.ceil(ny / ty)) * int(np.ceil(nt / tc)))
            key = (steps, -ty)
            if best is None or key < best[0]:
                best = (key, ty, tc)
    return None if best is None else (best[1], best[2], h_y, wout,
                                      nx_in)


def _nlmeans_rowfused(arr, r, f, sigma, h, n_eff, geom,
                      interpret=False):
    """Row-fused spatial NLMeans: full-width rows, (t-chunk, y-tile)
    grid, ONE combined reflect pad, double-buffered DMA. Numerically
    identical to the tiled kernel (same ``_kernel`` body, same
    accumulation order)."""
    ry, rx = int(r[0]), int(r[1])
    fy, fx = int(f[0]), int(f[1])
    p_y, p_x = ry + fy, rx + fx
    ty, tc, h_y, wout, nx_in = geom    # one source: _rowfused_geometry
    arr = jnp.asarray(arr)
    if arr.dtype != jnp.float32:
        arr = arr.astype(jnp.float32)
    ny, nx, nt, nv = arr.shape
    dtype = arr.dtype
    dsq_norm = float(nv * (2 * fy + 1) * (2 * fx + 1))

    h_x = (nx_in - wout) // 2          # >= p_x by construction
    ny_pad = int(np.ceil(ny / ty)) * ty
    nt_pad = int(np.ceil(nt / tc)) * tc

    data = jnp.transpose(arr, (2, 3, 0, 1))        # (t, v, y, x)
    widths = ((0, nt_pad - nt), (0, 0),
              (h_y, h_y + ny_pad - ny),
              (h_x, nx_in - nx - h_x))
    if max(h_y, h_y + ny_pad - ny) <= ny - 1 \
            and max(h_x, nx_in - nx - h_x) <= nx - 1:
        # ONE pad: reflect values at distance d from the edge are
        # independent of the pad width, so the alignment/grid ring is
        # self-consistent (only values within p of the edge are ever
        # read for kept outputs; the rest feed dropped rows)
        data = jnp.pad(data, widths, mode='reflect')
    else:
        # narrow extents: true reflect ring first, then dead edge fill
        data = jnp.pad(data, ((0, 0), (0, 0), (p_y, p_y),
                              (p_x, p_x)), mode='reflect')
        data = jnp.pad(
            data, ((0, nt_pad - nt), (0, 0),
                   (h_y - p_y, h_y - p_y + ny_pad - ny),
                   (h_x - p_x, nx_in - nx - h_x - p_x)), mode='edge')

    gy = ny_pad // ty
    gt = nt_pad // tc
    n_steps = gt * gy
    i32 = np.int32

    kernel = functools.partial(
        _kernel, rt=0, ry=ry, rx=rx, ft=0, fy=fy, fx=fx,
        sigma=float(sigma), h=float(h), n_eff=float(n_eff), nvars=nv,
        dsq_norm=dsq_norm, halo=(h_y, h_x))

    def dma_kernel(hbm_ref, out_ref, scratch, wsum_s, wsq_s, wmax_s,
                   sems):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, i32(2))

        def start(gg, sl):
            it = gg // i32(gy)
            iy = jax.lax.rem(gg, i32(gy))
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(it * tc, tc), :,
                           pl.ds(iy * ty, ty + 2 * h_y), :],
                scratch.at[sl], sems.at[sl]).start()

        @pl.when(g == 0)
        def _():
            start(g, slot)

        @pl.when(g + 1 < n_steps)
        def _():
            start(g + i32(1), jax.lax.rem(g + i32(1), i32(2)))

        pltpu.make_async_copy(
            hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, ty + 2 * h_y), :],
            scratch.at[slot], sems.at[slot]).wait()
        kernel((scratch.at[slot], wsum_s, wsq_s, wmax_s), out_ref)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt_pad, nv, ny_pad, wout),
                                       dtype),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tc, nv, ty, wout),
            lambda g: (g // i32(gy), g * 0,
                       jax.lax.rem(g, i32(gy)), g * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tc, nv, ty + 2 * h_y, nx_in), dtype),
            pltpu.VMEM((tc, ty, wout), dtype),
            pltpu.VMEM((tc, ty, wout), dtype),
            pltpu.VMEM((tc, ty, wout), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data)
    out = out[:nt, :, :ny, :nx]
    return jnp.transpose(out, (2, 3, 0, 1))


def _padless_nl_geometry(ny, nx, nt, nv, p_y, p_x, n_pairs):
    """(ty, tc, h_y, h_x) for the padless spatial NLMeans, or None.

    Same live-bytes model as :func:`_rowfused_geometry` but with the
    padless constraints: 128-lane-aligned width (the DMA writes the
    scratch interior at lane offset h_x = 128), a ty dividing ny, and
    8-aligned row halos (clamped edge-slab DMA starts must be provably
    8-aligned)."""
    if nx % 128 != 0:
        return None
    h_y = int(np.ceil(p_y / 8)) * 8
    h_x = 128
    nx_in = nx + 2 * h_x

    def live(ty, tc):
        scr = 2 * tc * nv * (ty + 2 * h_y) * nx_in * 4
        ext = tc * (ty + 2 * h_y) * nx_in * 4
        row = tc * ty * nx_in * 4
        return scr + n_pairs * ext + (3 + nv) * row + 1.15 * row

    best = None
    for ty in (64, 32, 16, 8):
        if ny % ty != 0 or ny < ty + 2 * h_y:
            continue
        for tc in (2, 1):
            if nt % tc != 0:
                continue
            if live(ty, tc) > _VMEM_NL_BUDGET:
                continue
            steps = (ny // ty) * (nt // tc)
            key = (steps, -ty)
            if best is None or key < best[0]:
                best = (key, ty, tc)
    return None if best is None else (best[1], best[2], h_y, h_x)


def _nlmeans_padless(arr, r, f, sigma, h, n_eff, geom,
                     interpret=False):
    """Padless spatial NLMeans: no prep pass at all (the conv padless
    treatment, see ops/conv_pallas.py's design note — on this cube
    class the multi-pass reflect pad materialization cost ~1.5 ms at
    ~35% of the r=1 runtime). The input is consumed unpadded; edge
    slabs shift their DMA window inward and rebuild the reflect
    (edge-excluding, numpy 'reflect') boundary with tiny VMEM
    row/lane copies before the shared :func:`_kernel` body runs."""
    ry, rx = int(r[0]), int(r[1])
    fy, fx = int(f[0]), int(f[1])
    p_y, p_x = ry + fy, rx + fx
    ty, tc, h_y, h_x = geom
    arr = jnp.asarray(arr)
    if arr.dtype != jnp.float32:
        arr = arr.astype(jnp.float32)
    ny, nx, nt, nv = arr.shape
    dtype = arr.dtype
    dsq_norm = float(nv * (2 * fy + 1) * (2 * fx + 1))
    win = ty + 2 * h_y
    nx_in = nx + 2 * h_x
    gy = ny // ty
    gt = nt // tc
    n_steps = gt * gy
    i32 = np.int32

    data = jnp.transpose(arr, (2, 3, 0, 1))        # (t, v, y, x)

    kernel = functools.partial(
        _kernel, rt=0, ry=ry, rx=rx, ft=0, fy=fy, fx=fx,
        sigma=float(sigma), h=float(h), n_eff=float(n_eff), nvars=nv,
        dsq_norm=dsq_norm, halo=(h_y, h_x))

    def fill_edges(scr, iy):
        # y boundary rows on the edge slabs (numpy 'reflect' is
        # edge-excluding: row -m -> m, row ny-1+m -> ny-1-m); the
        # source rows are already resident in the slab
        @pl.when(iy == 0)
        def _():
            for m in range(1, p_y + 1):
                scr[:, :, h_y - m, :] = scr[:, :, h_y + m, :]

        @pl.when(iy == gy - 1)
        def _():
            # last slab holds global rows [ny - ty - h_y, ny) at
            # offsets [0, ty + h_y)
            top = ty + h_y - 1                 # global row ny-1
            for m in range(1, p_y + 1):
                scr[:, :, top + m, :] = scr[:, :, top - m, :]
        # x boundary columns, every slab (after the y fill so the
        # corners pick up both reflections, like sequential jnp.pad).
        # Each side is ONE concat of the reversed interior columns +
        # one p_x-wide store instead of p_x single-lane copy pairs
        # (the per-column loop ran 4*p_x tiny Mosaic ops per grid
        # step — the conv edge rebuild's cost class, r5); sources are
        # all interior columns, so the batched store reads the same
        # values the sequential loop did.
        if p_x == 1:
            scr[:, :, :, h_x - 1] = scr[:, :, :, h_x + 1]
            scr[:, :, :, h_x + nx] = scr[:, :, :, h_x + nx - 2]
        else:
            left = jnp.concatenate(
                [scr[:, :, :, h_x + m:h_x + m + 1]
                 for m in range(p_x, 0, -1)], axis=-1)
            scr[:, :, :, h_x - p_x:h_x] = left
            right = jnp.concatenate(
                [scr[:, :, :, h_x + nx - 1 - m:h_x + nx - m]
                 for m in range(1, p_x + 1)], axis=-1)
            scr[:, :, :, h_x + nx:h_x + nx + p_x] = right

    def dma_kernel(hbm_ref, out_ref, scratch, wsum_s, wsq_s, wmax_s,
                   sems):
        g = pl.program_id(0)
        slot = jax.lax.rem(g, i32(2))

        def start(gg, sl):
            it = gg // i32(gy)
            iy = jax.lax.rem(gg, i32(gy))

            @pl.when(iy == 0)
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(0, ty + h_y), :],
                    scratch.at[sl, :, :, pl.ds(h_y, ty + h_y),
                               pl.ds(h_x, nx)],
                    sems.at[sl]).start()

            @pl.when(jnp.logical_and(iy > 0, iy < gy - 1))
            def _():
                idx = pl.multiple_of(iy * ty - h_y, 8)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(idx, win), :],
                    scratch.at[sl, :, :, :, pl.ds(h_x, nx)],
                    sems.at[sl]).start()

            @pl.when(jnp.logical_and(iy == gy - 1, iy > 0))
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(it * tc, tc), :,
                               pl.ds(ny - ty - h_y, ty + h_y), :],
                    scratch.at[sl, :, :, pl.ds(0, ty + h_y),
                               pl.ds(h_x, nx)],
                    sems.at[sl]).start()

        def wait(gg, sl):
            iy = jax.lax.rem(gg, i32(gy))
            interior = jnp.logical_and(iy > 0, iy < gy - 1)

            @pl.when(interior)
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, win), :],
                    scratch.at[sl, :, :, :, pl.ds(h_x, nx)],
                    sems.at[sl]).wait()

            @pl.when(jnp.logical_not(interior))
            def _():
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, tc), :, pl.ds(0, ty + h_y), :],
                    scratch.at[sl, :, :, pl.ds(0, ty + h_y),
                               pl.ds(h_x, nx)],
                    sems.at[sl]).wait()

        @pl.when(g == 0)
        def _():
            start(g, slot)

        @pl.when(g + 1 < n_steps)
        def _():
            start(g + i32(1), jax.lax.rem(g + i32(1), i32(2)))

        wait(g, slot)
        iy = jax.lax.rem(g, i32(gy))
        fill_edges(scratch.at[slot], iy)
        kernel((scratch.at[slot], wsum_s, wsq_s, wmax_s), out_ref)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt, nv, ny, nx), dtype),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tc, nv, ty, nx),
            lambda g: (g // i32(gy), g * 0,
                       jax.lax.rem(g, i32(gy)), g * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tc, nv, win, nx_in), dtype),
            pltpu.VMEM((tc, ty, nx), dtype),
            pltpu.VMEM((tc, ty, nx), dtype),
            pltpu.VMEM((tc, ty, nx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(data)
    return jnp.transpose(out, (2, 3, 0, 1))


def nlmeans_pallas(arr, r, f, sigma, h, n_eff=-1.0, interpret=False):
    """NLMeans of a (d0, d1, d2, var) array with a full 3-D window.

    Parameters match :func:`nd_tpu.ops.nlmeans.nlmeans`: ``r`` and
    ``f`` are per-axis (d0, d1, d2) radii/patch half-widths; axes with
    ``r == 0`` and ``f == 0`` are batched. Like that kernel, ``r + f``
    must be smaller than each filtered extent, and an empty
    neighborhood (``r == (0, 0, 0)``) is the identity. Computation is
    float32 (the TPU fast path); other input dtypes are cast.

    Layout: d0 rides sublanes, d1 rides the 128-wide lanes, d2 is the
    tile's leading axis (fully VMEM-resident, exact ``r2+f2`` halo).
    """
    ry, rx, rt = int(r[0]), int(r[1]), int(r[2])
    fy, fx, ft = int(f[0]), int(f[1]), int(f[2])
    p_y = ry + fy
    p_x = rx + fx
    p_t = rt + ft

    arr = jnp.asarray(arr)
    if arr.dtype != jnp.float32:
        arr = arr.astype(jnp.float32)
    ny, nx, nt, nv = arr.shape
    for name, ext, pad in (('dim 0', ny, p_y), ('dim 1', nx, p_x),
                           ('dim 2', nt, p_t)):
        if pad >= ext:
            raise ValueError(
                'r + f (%d) must be smaller than %s size (%d)'
                % (pad, name, ext))
    if ry == 0 and rx == 0 and rt == 0:
        return arr                      # no neighbors: identity

    if rt == 0 and ft == 0:
        # spatial windows: padless first (no prep pass at all), then
        # the row-fused kernel (one combined pad) whenever a geometry
        # fits — gridding t frees the VMEM the tiled kernel spends
        # keeping it resident, and full-width tall rows cut the halo
        # read amplification ~2x at production radii
        n_pairs_sp = max(((2 * ry + 1) * (2 * rx + 1) - 1) // 2, 1)
        pgeom = _padless_nl_geometry(ny, nx, nt, nv, p_y, p_x,
                                     n_pairs_sp)
        if pgeom is not None:
            return _nlmeans_padless(arr, (ry, rx), (fy, fx), sigma,
                                    h, n_eff, pgeom,
                                    interpret=interpret)
        geom = _rowfused_geometry(ny, nx, nt, nv, p_y, p_x,
                                  n_pairs_sp)
        if geom is not None:
            return _nlmeans_rowfused(arr, (ry, rx), (fy, fx), sigma,
                                     h, n_eff, geom,
                                     interpret=interpret)

    # Mosaic DMA slices must respect the (8, 128) tiling: round the
    # halo up so the window extents stay aligned; the extra ring is
    # dead data the kernel never reads. The leading (t) axis is
    # untiled, so its halo is exact.
    hp_y = int(np.ceil(p_y / 4)) * 4
    hp_x = int(np.ceil(p_x / 64)) * 64
    dtype = arr.dtype
    dsq_norm = float(nv * (2 * ft + 1) * (2 * fy + 1) * (2 * fx + 1))

    # (y, x, t, v) -> (t, v, y, x): x on lanes, y on sublanes
    data = jnp.transpose(arr, (2, 3, 0, 1))

    # reflect halo (the kernel's true boundary condition) ...
    data = jnp.pad(data, ((p_t, p_t), (0, 0), (p_y, p_y),
                          (p_x, p_x)), mode='reflect')
    # ... alignment ring + trailing grid padding (outputs dropped).
    # Wider tiles amortize the 64-column alignment halo; shrink the
    # tile while the per-grid-step live-bytes model exceeds the VMEM
    # budget.
    tx = min(_TX, max(128, int(np.ceil(nx / 128)) * 128))
    ty = min(_TY, max(8, int(np.ceil(ny / 8)) * 8))

    n_pairs = max(
        ((2 * rt + 1) * (2 * ry + 1) * (2 * rx + 1) - 1) // 2, 1)

    def live_bytes():
        return _live_tile_bytes(nt, nv, p_t, hp_y, hp_x, ty, tx,
                                n_pairs)

    while tx > 128 and live_bytes() > _VMEM_NL_BUDGET:
        tx -= 128
    while ty > 8 and live_bytes() > _VMEM_NL_BUDGET:
        ty -= 8
    ny_pad = int(np.ceil(ny / ty)) * ty
    nx_pad = int(np.ceil(nx / tx)) * tx
    data = jnp.pad(
        data, ((0, 0), (0, 0),
               (hp_y - p_y, hp_y - p_y + ny_pad - ny),
               (hp_x - p_x, hp_x - p_x + nx_pad - nx)), mode='edge')

    grid = (ny_pad // ty, nx_pad // tx)

    kernel = functools.partial(
        _kernel, rt=rt, ry=ry, rx=rx, ft=ft, fy=fy, fx=fx,
        sigma=float(sigma), h=float(h), n_eff=float(n_eff), nvars=nv,
        dsq_norm=dsq_norm, halo=(hp_y, hp_x))

    # Overlapping halo windows can't be expressed with a blocked
    # BlockSpec, so the padded array stays in ANY/HBM and each grid step
    # DMAs its (tile + halo) window into VMEM scratch explicitly.
    def dma_kernel(hbm_ref, out_ref, scratch, wsum_s, wsq_s, wmax_s,
                   sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, :,
                       pl.ds(i * ty, ty + 2 * hp_y),
                       pl.ds(j * tx, tx + 2 * hp_x)],
            scratch, sem)
        cp.start()
        cp.wait()
        kernel((scratch, wsum_s, wsq_s, wmax_s), out_ref)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt, nv, ny_pad, nx_pad), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nt, nv, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt + 2 * p_t, nv, ty + 2 * hp_y,
                        tx + 2 * hp_x), dtype),
            pltpu.VMEM((nt, ty, tx), dtype),
            pltpu.VMEM((nt, ty, tx), dtype),
            pltpu.VMEM((nt, ty, tx), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(data)

    out = out[:, :, :ny, :nx]
    return jnp.transpose(out, (2, 3, 0, 1))


def nlmeans_spatial_pallas(arr, r, f, sigma, h, n_eff=-1.0,
                           interpret=False):
    """Spatial NLMeans of a (d0, d1, d2, var) array where the filter
    runs over (d0, d1) and d2/var are batched — the layout produced by
    NLMeansFilter with dims=('y', 'x'). The ``r2 = f2 = 0`` case of
    :func:`nlmeans_pallas`.
    """
    return nlmeans_pallas(arr, (int(r[0]), int(r[1]), 0),
                          (int(f[0]), int(f[1]), 0), sigma, h,
                          n_eff=n_eff, interpret=interpret)
