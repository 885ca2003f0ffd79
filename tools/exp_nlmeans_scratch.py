"""Experiment: does routing the per-pair big temporaries through ONE
explicit VMEM scratch slab flatten the Mosaic stack (which currently
retains one extended slab per unrolled offset pair, pinning r=2/f=2 to
8x512 / 16x256 tiles)?  If yes, wider tiles become admissible and the
halo-read overhead drops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_nlmeans_scratch.py
"""
import functools
import itertools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import nd_tpu  # noqa
from nd_tpu.ops.nlmeans_pallas import nlmeans_spatial_pallas


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return out


def _time_loop(kernel, x, reps=10, best_of=3):
    @jax.jit
    def run(x, eps):
        def body(i, carry):
            out = kernel(carry)
            dep = jnp.asarray(out).ravel()[0].astype(carry.dtype)
            return carry + eps * dep
        return lax.fori_loop(0, reps, body, x)

    eps = jnp.zeros((), x.dtype)
    _sync(run(x, eps))
    ts = []
    for _ in range(best_of):
        t0 = time.perf_counter()
        _sync(run(x, eps))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def _kernel_scratch(refs, out_ref, *, ry, rx, fy, fx, sigma, h,
                    nvars, dsq_norm, halo):
    """Spatial NLMeans tile kernel with the pair loop's big temps
    routed through TWO reusable scratch slabs (sq + patch) instead of
    per-iteration SSA temps."""
    p_y, p_x = halo
    in_ref, wsum_ref, wsq_ref, wmax_ref, sq_ref, acc_ref = refs
    shape = in_ref.shape                  # (t, v, TY+2py, TX+2px)
    dtype = in_ref.dtype
    tt = shape[0]
    ty = shape[2] - 2 * p_y
    tx = shape[3] - 2 * p_x

    two_sigma2 = jnp.asarray(2.0 * sigma * sigma, dtype)
    inv_h2 = jnp.asarray(1.0 / (h * h), dtype)
    inv_norm = jnp.asarray(1.0 / dsq_norm, dtype)

    wsum_ref[:] = jnp.zeros(wsum_ref.shape, dtype)
    wsq_ref[:] = jnp.zeros(wsq_ref.shape, dtype)
    wmax_ref[:] = jnp.zeros(wmax_ref.shape, dtype)
    out_ref[:] = jnp.zeros(out_ref.shape, dtype)

    half = [(dy, dx) for dy, dx in
            itertools.product(range(-ry, ry + 1), range(-rx, rx + 1))
            if (dy, dx) > (0, 0)]
    ey_max = ty + 2 * (ry + fy)
    ex_max = tx + 2 * (rx + fx)
    for dy, dx in half:
        ey0 = -max(dy, 0)
        ey1 = -min(dy, 0)
        ex0 = -max(dx, 0)
        ex1 = -min(dx, 0)
        hy_e = ty + ey1 - ey0 + 2 * fy
        hx_e = tx + ex1 - ex0 + 2 * fx
        # squared channel differences into the shared scratch slab
        sq_ref[:, :hy_e, :hx_e] = jnp.zeros((tt, hy_e, hx_e), dtype)
        for v in range(nvars):
            d = (in_ref[:, v,
                        p_y + ey0 - fy:p_y + ty + ey1 + fy,
                        p_x + ex0 - fx:p_x + tx + ex1 + fx]
                 - in_ref[:, v,
                          p_y + ey0 + dy - fy:p_y + ty + ey1 + dy + fy,
                          p_x + ex0 + dx - fx:p_x + tx + ex1 + dx + fx])
            sq_ref[:, :hy_e, :hx_e] = sq_ref[:, :hy_e, :hx_e] + d * d
        # separable patch sums via the second scratch slab
        hy = ty + ey1 - ey0
        acc = sq_ref[:, 0:hy, :hx_e]
        for u in range(1, 2 * fy + 1):
            acc = acc + sq_ref[:, u:u + hy, :hx_e]
        acc_ref[:, :hy, :hx_e] = acc
        hx = tx + ex1 - ex0
        patch = acc_ref[:, :hy, 0:hx]
        for u in range(1, 2 * fx + 1):
            patch = patch + acc_ref[:, :hy, u:u + hx]
        sq_ref[:, :hy, :hx] = patch
        for ddy, ddx, (sy, sx) in (
                (dy, dx, (-ey0, -ex0)),
                (-dy, -dx, (-ey0 - dy, -ex0 - dx))):
            dsq = sq_ref[:, sy:sy + ty, sx:sx + tx] * inv_norm
            w = jnp.exp(-jnp.maximum(dsq - two_sigma2, 0) * inv_h2)
            wsum_ref[:] = wsum_ref[:] + w
            wsq_ref[:] = wsq_ref[:] + w * w
            wmax_ref[:] = jnp.maximum(wmax_ref[:], w)
            for v in range(nvars):
                out_ref[:, v] = out_ref[:, v] \
                    + w * in_ref[:, v,
                                 p_y + ddy:p_y + ddy + ty,
                                 p_x + ddx:p_x + ddx + tx]

    wsum = wsum_ref[:]
    wmax = wmax_ref[:]
    w_self = jnp.where(wmax == 0, jnp.asarray(1, dtype), wmax)
    inv_total = 1.0 / (wsum + w_self)
    for v in range(nvars):
        center = in_ref[:, v, p_y:p_y + ty, p_x:p_x + tx]
        out_ref[:, v] = (out_ref[:, v] + w_self * center) * inv_total


def nlmeans_scratch(arr, r, f, sigma, h, ty, tx):
    ry, rx = int(r[0]), int(r[1])
    fy, fx = int(f[0]), int(f[1])
    p_y, p_x = ry + fy, rx + fx
    arr = jnp.asarray(arr, jnp.float32)
    ny, nx, nt, nv = arr.shape
    hp_y = int(np.ceil(p_y / 4)) * 4
    hp_x = int(np.ceil(p_x / 64)) * 64
    dsq_norm = float(nv * (2 * fy + 1) * (2 * fx + 1))
    data = jnp.transpose(arr, (2, 3, 0, 1))
    data = jnp.pad(data, ((0, 0), (0, 0), (p_y, p_y), (p_x, p_x)),
                   mode='reflect')
    ny_pad = int(np.ceil(ny / ty)) * ty
    nx_pad = int(np.ceil(nx / tx)) * tx
    data = jnp.pad(
        data, ((0, 0), (0, 0),
               (hp_y - p_y, hp_y - p_y + ny_pad - ny),
               (hp_x - p_x, hp_x - p_x + nx_pad - nx)), mode='edge')
    grid = (ny_pad // ty, nx_pad // tx)
    kernel = functools.partial(
        _kernel_scratch, ry=ry, rx=rx, fy=fy, fx=fx,
        sigma=float(sigma), h=float(h), nvars=nv, dsq_norm=dsq_norm,
        halo=(hp_y, hp_x))

    def dma_kernel(hbm_ref, out_ref, scratch, wsum_s, wsq_s, wmax_s,
                   sq_s, acc_s, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, :,
                       pl.ds(i * ty, ty + 2 * hp_y),
                       pl.ds(j * tx, tx + 2 * hp_x)],
            scratch, sem)
        cp.start()
        cp.wait()
        kernel((scratch, wsum_s, wsq_s, wmax_s, sq_s, acc_s), out_ref)

    out = pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((nt, nv, ny_pad, nx_pad),
                                       jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nt, nv, ty, tx),
                               lambda i, j: (i * 0, j * 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, nv, ty + 2 * hp_y, tx + 2 * hp_x),
                       jnp.float32),
            pltpu.VMEM((nt, ty, tx), jnp.float32),
            pltpu.VMEM((nt, ty, tx), jnp.float32),
            pltpu.VMEM((nt, ty, tx), jnp.float32),
            pltpu.VMEM((nt, ty + 2 * (ry + fy), tx + 2 * (rx + fx)),
                       jnp.float32),
            pltpu.VMEM((nt, ty + 2 * (ry + fy), tx + 2 * (rx + fx)),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(data)
    out = out[:, :, :ny, :nx]
    return jnp.transpose(out, (2, 3, 0, 1))


if __name__ == '__main__':
    NY, NX, K = 1024, 1024, 12
    rng = np.random.RandomState(0)
    cube = jnp.asarray(rng.rand(NY, NX, K, 4).astype(np.float32))
    mpix = NY * NX * K / 1e6
    sigma, h = 2.0, 3.0

    # baseline current kernel
    t = _time_loop(lambda x: nlmeans_spatial_pallas(
        x, (2, 2), (2, 2), sigma, h, -1.0), cube, reps=4)
    print('current r2f2         : %.2f ms %.1f Mpix/s'
          % (t * 1e3, mpix / t), flush=True)

    ref = np.asarray(nlmeans_spatial_pallas(cube, (2, 2), (2, 2),
                                            sigma, h, -1.0))

    for (ty, tx) in ((8, 512), (16, 512), (16, 1024), (32, 512),
                     (8, 1024)):
        try:
            t = _time_loop(lambda x, ty=ty, tx=tx: nlmeans_scratch(
                x, (2, 2), (2, 2), sigma, h, ty, tx), cube, reps=4)
            got = np.asarray(nlmeans_scratch(cube, (2, 2), (2, 2),
                                             sigma, h, ty, tx))
            err = float(np.nanmax(np.abs(got - ref)))
            print('scratch r2f2 %2dx%-4d : %.2f ms %.1f Mpix/s  err %.1e'
                  % (ty, tx, t * 1e3, mpix / t, err), flush=True)
        except Exception as e:
            print('scratch r2f2 %2dx%-4d : FAIL %s'
                  % (ty, tx, str(e).splitlines()[0][:120]), flush=True)
