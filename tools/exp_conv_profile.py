"""Scratch experiment: where does the fused separable conv spend time?

Measures on the real chip, all with bench._time_loop (fori_loop inside
one jit, eps-chained):
  stream_add      — streaming HBM ceiling (read N + write N)
  transpose       — one-way (y,x,tc)->(tc,y,x) relayout
  pad_only        — pad_reflect on kernel-layout data
  boxcar_full     — the shipped convolve() path
  pallas_direct   — separable_convolve_pallas (transpose+pads+kernel)
  kernel_only     — just the pallas_call on pre-laid-out data
  kernel_refacc   — variant: ref-accumulator passes, big tile
  kernel_dbuf     — variant: + double-buffered DMA
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from bench import _time_loop, _make_cube  # noqa: E402

cube = _make_cube(1024, 1024, 12)
x = jnp.asarray(cube)  # (1024,1024,12,4) f32, 192 MiB
mpix = 1024 * 1024 * 12 / 1e6
nbytes = x.size * 4
print('backend:', jax.default_backend(), flush=True)

results = {}


def rep(name, t, traffic=2 * nbytes):
    r = {'ms': round(t * 1e3, 2), 'mpix_s': round(mpix / t, 1),
         'gbps_minimal': round(traffic / t / 1e9, 1)}
    results[name] = r
    print(f'{name:18s} {r}', flush=True)


t, _ = _time_loop(lambda a: a + jnp.float32(1.0), x)
rep('stream_add', t)

t, _ = _time_loop(
    lambda a: jnp.transpose(a.reshape(1024, 1024, 48), (2, 0, 1)), x)
rep('transpose', t)

from nd_tpu.ops.conv import convolve, pad_reflect  # noqa: E402

xt = jnp.transpose(x.reshape(1024, 1024, 48), (2, 0, 1))
xt = xt.reshape(12, 4, 1024, 1024)
t, _ = _time_loop(
    lambda a: pad_reflect(a, ((0, 0), (0, 0), (4, 4), (64, 64)),
                          'reflect', 0.0), xt)
rep('pad_only', t)

k3 = jnp.ones((3, 3), jnp.float32) / 9
t, _ = _time_loop(lambda a: convolve(a, k3, axes=(0, 1)), x)
rep('boxcar_full', t)

from nd_tpu.ops.conv_pallas import separable_convolve_pallas  # noqa

taps = [(0, np.ones(3) / 3.0), (1, np.ones(3) / 3.0)]
t, _ = _time_loop(lambda a: separable_convolve_pallas(a, taps), x)
rep('pallas_direct', t)

# ---- kernel-only: same geometry the shipped kernel picks for this
# shape (nt=12, b=4, 3x3 taps -> h0=4, h1=64, ty=16, tx=512) ----------
NT, B, N0, N1 = 12, 4, 1024, 1024
H0, H1 = 4, 64
TY, TX = 16, 512
T3 = np.ones(3) / 3.0

pre = pad_reflect(xt, ((0, 0), (0, 0), (1, 1), (1, 1)), 'reflect', 0.0)
pre = jnp.pad(pre, ((0, 0), (0, 0), (H0 - 1, H0 - 1),
                    (H1 - 1, H1 - 1)), mode='edge')
print('pre shape', pre.shape, flush=True)


def shift_add(xv, taps_, axis, start, out_len):
    acc = None
    for i, w in enumerate(taps_):
        key = [slice(None)] * xv.ndim
        key[axis] = slice(start + i, start + i + out_len)
        term = xv[tuple(key)]
        acc = term if acc is None else acc + term
    return acc * jnp.float32(taps_[0])


def kern_current(scratch, out_ref, *, ty, tx):
    xv = scratch[:]
    xv = shift_add(xv, T3, 2, H0 - 1, ty)
    xv = shift_add(xv, T3, 3, H1 - 1, tx)
    out_ref[:] = xv


def run_kernel(data, ty, tx, kern, nslots=1):
    grid_y, grid_x = N0 // ty, N1 // tx

    def dma_kernel(hbm_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, :, pl.ds(i * ty, ty + 2 * H0),
                       pl.ds(j * tx, tx + 2 * H1)], scratch, sem)
        cp.start()
        cp.wait()
        kern(scratch, out_ref, ty=ty, tx=tx)

    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((NT, B, N0, N1), jnp.float32),
        grid=(grid_y, grid_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NT, B, ty, tx),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, B, ty + 2 * H0, tx + 2 * H1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(data)


t, _ = _time_loop(lambda a: run_kernel(a, TY, TX, kern_current), pre)
rep('kernel_only_16x512', t)


# ---- variant: ref-accumulator passes, bigger tile -------------------
def kern_refacc(scratch, out_ref, acc_ref, *, ty, tx):
    # pass 0 (rows): accumulate into acc_ref, then pass 1 (lanes)
    acc_ref[:] = scratch[:, :, H0 - 1:H0 - 1 + ty, :] * jnp.float32(0)
    for i in range(3):
        acc_ref[:] = acc_ref[:] + scratch[:, :, H0 - 1 + i:H0 - 1 + i + ty, :]
    accx = None
    for i in range(3):
        termv = acc_ref[:, :, :, H1 - 1 + i:H1 - 1 + i + tx]
        accx = termv if accx is None else accx + termv
    out_ref[:] = accx * jnp.float32(T3[0] * T3[0])


def run_refacc(data, ty, tx):
    grid_y, grid_x = N0 // ty, N1 // tx

    def dma_kernel(hbm_ref, out_ref, scratch, acc, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, :, pl.ds(i * ty, ty + 2 * H0),
                       pl.ds(j * tx, tx + 2 * H1)], scratch, sem)
        cp.start()
        cp.wait()
        kern_refacc(scratch, out_ref, acc, ty=ty, tx=tx)

    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((NT, B, N0, N1), jnp.float32),
        grid=(grid_y, grid_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NT, B, ty, tx),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NT, B, ty + 2 * H0, tx + 2 * H1), jnp.float32),
            pltpu.VMEM((NT, B, ty, tx + 2 * H1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(data)


t, out_ref_acc = _time_loop(lambda a: run_refacc(a, 64, 512), pre)
rep('kernel_refacc_64x512', t)

# parity vs current
a_cur = np.asarray(run_kernel(pre, TY, TX, kern_current))
a_ra = np.asarray(run_refacc(pre, 64, 512))
print('refacc max|diff|', np.abs(a_cur - a_ra).max(), flush=True)


# ---- variant: double-buffered DMA, 1-D grid -------------------------
def run_dbuf(data, ty, tx):
    grid_y, grid_x = N0 // ty, N1 // tx
    n = grid_y * grid_x

    def dma_kernel(hbm_ref, out_ref, scratch, acc, sems):
        g = pl.program_id(0)
        slot = lax.rem(g, 2)

        def start(gg, sl):
            i = gg // grid_x
            j = lax.rem(gg, grid_x)
            pltpu.make_async_copy(
                hbm_ref.at[:, :, pl.ds(i * ty, ty + 2 * H0),
                           pl.ds(j * tx, tx + 2 * H1)],
                scratch.at[sl], sems.at[sl]).start()

        @pl.when(g == 0)
        def _():
            start(0, 0)

        @pl.when(g + 1 < n)
        def _():
            start(g + 1, lax.rem(g + 1, 2))

        pltpu.make_async_copy(
            hbm_ref.at[:, :, pl.ds(0, ty + 2 * H0),
                       pl.ds(0, tx + 2 * H1)],
            scratch.at[slot], sems.at[slot]).wait()
        kern_refacc(scratch.at[slot], out_ref, acc, ty=ty, tx=tx)

    return pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((NT, B, N0, N1), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (NT, B, ty, tx),
            lambda g: (0, 0, g // grid_x, lax.rem(g, grid_x)),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NT, B, ty + 2 * H0, tx + 2 * H1),
                       jnp.float32),
            pltpu.VMEM((NT, B, ty, tx + 2 * H1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(data)


try:
    t, _ = _time_loop(lambda a: run_dbuf(a, 32, 512), pre)
    rep('kernel_dbuf_32x512', t)
    a_db = np.asarray(run_dbuf(pre, 32, 512))
    print('dbuf max|diff|', np.abs(a_cur - a_db).max(), flush=True)
except Exception as e:
    print('dbuf FAILED:', str(e)[:500], flush=True)

print('RESULTS', results, flush=True)
