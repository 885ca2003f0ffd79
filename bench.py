#!/usr/bin/env python
"""Benchmark harness.

Measures the framework's headline metric (BASELINE.json): Mpix/s/chip
for NLMeans + OmnibusTest on a synthetic Sentinel-1 C2 cube, with
change-map parity against the native single-core reference
implementation. ``vs_baseline`` is the speedup of the TPU path over the
single-core CPU baseline (target: >= 50x).

Methodology: per-chip throughput is measured with each kernel repeated
inside ONE jit via lax.fori_loop (with a traced-epsilon data dependency
so XLA re-executes every iteration) — on tunneled backends each
dispatch costs tens of ms of host-link latency that says nothing about
the chip. Single-dispatch wall-clock figures are reported alongside in
``detail`` (``*_wall_mpix_s``) for transparency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Extra per-config throughputs are reported in "detail".
"""

import json
import os
import time

import numpy as np


def _make_cube(ny, nx, k, seed=0):
    """Synthetic S1 dual-pol C2 covariance cube (f32, PSD per pixel)."""
    rng = np.random.RandomState(seed)
    c11 = np.abs(rng.normal(1.0, 0.25, size=(ny, nx, k))) + 0.3
    c22 = np.abs(rng.normal(1.0, 0.25, size=(ny, nx, k))) + 0.3
    # |c12|^2 < c11*c22 keeps determinants positive
    mag = 0.4 * np.sqrt(c11 * c22) * rng.uniform(0, 1, size=(ny, nx, k))
    phase = rng.uniform(0, 2 * np.pi, size=(ny, nx, k))
    c12r = mag * np.cos(phase)
    c12i = mag * np.sin(phase)
    # abrupt backscatter change half-way through the series
    c11[:, :, k // 2:] *= 2.5
    c22[:, :, k // 2:] *= 2.5
    cube = np.stack([c11, c12r, c12i, c22], axis=-1)
    return cube.astype(np.float32)


def _sync(out):
    """Force completion: fetch one element to the host (some remote
    backends treat block_until_ready as a no-op)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return out


def _time(fn, *args, reps=4, warmup=1):
    import jax
    for _ in range(warmup):
        out = _sync(fn(*args))
    # queue all reps, then drain with ONE barrier: the single device
    # stream executes launches in order, so syncing every leaf of the
    # LAST result covers all earlier reps — each extra sync is a pure
    # ~25 ms tunnel round trip that would inflate the figure
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for leaf in jax.tree_util.tree_leaves(outs[-1]):
        np.asarray(leaf.ravel()[:1])
    return (time.perf_counter() - t0) / reps, outs[-1]


# labels of configs whose _time_loop differential collapsed to the
# single-count fallback (which folds the fixed ~25 ms dispatch RTT back
# in) — surfaced in detail['timing_slope_fallback'] so a degraded
# measurement is distinguishable from a clean one (ADVICE r4)
_SLOPE_FALLBACKS = []


def _time_loop(kernel, x, reps=10, best_of=1, chain='row', label=None):
    """Device throughput: run ``kernel`` inside ONE jit via a
    traced-count loop, timed DIFFERENTIALLY at two trip counts.

    A dispatch + 1-element sync on the tunneled backend costs a FIXED
    ~25 ms round trip (measured this round: the sync fetch alone is
    ~27 ms), so any single-trip-count figure folds that constant into
    the rate — at reps=10 it inflated every per-iteration time by
    ~2.5 ms, which understated fast kernels up to ~7x (coregistration:
    283 "measured" vs ~1900 Mpix/s true — VERDICT r3 item 2's gap was
    mostly this artifact). Timing the SAME compiled loop at ``reps``
    and ``4*reps`` and taking the slope cancels the fixed cost
    exactly:  t = (T(4N) - T(N)) / (3N).  The trip count is a traced
    argument (lax.while_loop semantics), so both timings share one
    executable.

    A traced epsilon (0.0 at runtime) chains each iteration's output
    into the next input, forcing re-execution without changing values —
    XLA cannot fold ``eps * f(out)`` because eps is a runtime argument.
    ``chain`` picks how the dependency feeds back (measured on-chip):

    - 'row' (default): one leading-axis row of the carry is updated in
      place (dynamic_update_slice on the loop carry aliases), so the
      chain costs O(row) — the honest choice for OPAQUE kernels
      (Pallas, matmul warps), whose full-array chain otherwise adds a
      read+write of the whole input per iteration (boxcar: 4332 ->
      5450 Mpix/s reported once the artificial pass is gone; a real
      pipeline's next op reads the previous op's OUTPUT, it does not
      re-stream the input).
    - 'eps': full-array ``carry + eps*dep`` — for ELEMENTWISE bodies
      (the ceiling probes), where XLA fuses the chain into the body
      at zero extra traffic while the row update would add a pass.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x, eps, n):
        def body(i, carry):
            out = kernel(carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            dep = jnp.asarray(leaf).ravel()[0].astype(carry.dtype)
            if chain == 'eps':
                return carry + eps * dep
            row = lax.dynamic_slice_in_dim(carry, 0, 1, 0) \
                + eps * dep
            return lax.dynamic_update_slice_in_dim(carry, row, 0, 0)
        return lax.fori_loop(0, n, body, x)

    eps = jnp.zeros((), x.dtype)
    n_lo = jnp.asarray(reps, jnp.int32)
    n_hi = jnp.asarray(4 * reps, jnp.int32)
    _sync(run(x, eps, n_lo))             # compile + warm
    # best_of > 1 for fields that swing with harness load (VERDICT r3
    # item 10): per-count minima are the least-contended samples, and
    # the slope of minima is robust to one-sided noise
    lo, hi = [], []
    out = None
    for _ in range(max(1, best_of)):
        t0 = time.perf_counter()
        _sync(run(x, eps, n_lo))
        lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = run(x, eps, n_hi)
        _sync(out)
        hi.append(time.perf_counter() - t0)
    slope = (min(hi) - min(lo)) / (3 * reps)
    if slope <= 0:                       # noise swamped the lo sample:
        for _ in range(2):               # retry before degrading
            t0 = time.perf_counter()
            _sync(run(x, eps, n_lo))
            lo.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = run(x, eps, n_hi)
            _sync(out)
            hi.append(time.perf_counter() - t0)
        slope = (min(hi) - min(lo)) / (3 * reps)
    if slope <= 0:                       # still degraded: fall back to
        slope = min(hi) / (4 * reps)     # single-count (RTT folded in)
        _SLOPE_FALLBACKS.append(label or 'unlabeled')
    return slope, out


# TPU v5e single-chip peaks (public figures: 197 TFLOP/s bf16 MXU,
# ~one-quarter of that for f32 inputs, 819 GB/s HBM bandwidth)
_V5E_HBM_GBPS = 819.0
_V5E_BF16_TFLOPS = 197.0
_V5E_F32_TFLOPS = 49.0

# measured on THIS device at bench time (see _measure_device_peaks):
# the dev chip is a virtualized slice whose streaming bandwidth is far
# below the v5e paper figure (66 GB/s measured vs 819), so percentages
# against the paper peak wildly understate how close a kernel is to
# what this silicon can actually do
_MEASURED = {'hbm_gbps': None, 'vpu_tflops': None, 'dma_gbps': None}


def _measure_dma_through(detail, cube_d, time_loop):
    """DMA-through ceiling (VERDICT r4 item 3): a Pallas kernel doing
    exactly what the streaming kernels do — double-buffered manual
    DMA of row slabs into VMEM scratch, a trivial VPU op, VMEM out
    block — as the corroborated ceiling those kernels actually face
    (XLA's fused elementwise streams ride a different engine; r4
    showed data-movement lowerings top out ~330-440 GB/s on this chip
    while fused streams hit 600+, leaving the conv kernels' true
    bound unmeasured)."""
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import jax
        import jax.numpy as jnp

        flat = cube_d.reshape(-1, 1024)
        M, N = flat.shape
        ty = 512
        if M % ty:
            return
        g = M // ty
        i32 = np.int32

        def kern(hbm_ref, out_ref, scratch, sems):
            gi = pl.program_id(0)
            slot = jax.lax.rem(gi, i32(2))

            def start(gg, sl):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(gg * ty, ty), :],
                    scratch.at[sl], sems.at[sl]).start()

            @pl.when(gi == 0)
            def _():
                start(gi, slot)

            @pl.when(gi + 1 < g)
            def _():
                start(gi + i32(1), jax.lax.rem(gi + i32(1), i32(2)))

            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(0, ty), :],
                scratch.at[slot], sems.at[slot]).wait()
            out_ref[:] = scratch[slot] + jnp.float32(1.0)

        def probe(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                grid=(g,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((ty, N),
                                       lambda gi: (gi, gi * 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, ty, N), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )(x)

        t = time_loop(probe, flat, label='dma_probe')[0]
        nbytes = flat.size * 4
        _MEASURED['dma_gbps'] = 2 * nbytes / t / 1e9
        detail['device_dma_gbps_measured'] = round(
            _MEASURED['dma_gbps'], 1)
    except Exception as e:
        detail.setdefault('errors', {})['peak_dma'] = str(e)[:200]


def _measure_device_peaks(detail, cube_d, time_loop):
    """Empirical single-chip ceilings, measured with the same
    fori-loop methodology as every kernel — each with TWO independent
    probes (VERDICT r3 item 1: every per-kernel percentage leans on
    these; an uncorroborated microbenchmark can silently over- or
    under-state the silicon).

    HBM: two DISTINCT fused elementwise streams — (a) add, (b)
    compare-select (maximum) — corroborate the streaming ceiling (a
    probe artifact would have to bite two different op classes the
    same way), and a pure-copy roll is recorded as an informational
    LOWER bound: measured, every data-movement lowering (roll/flip,
    any axis, any rotation) tops out at ~330-440 GB/s on this chip
    while fused elementwise streams ~600+ — copies take a different
    path than compute streams, so the copy probe corroborates
    direction but is excluded from the disagreement flag. VPU:
    independent-FMA-chain probes at several (chains, depth, block)
    geometries; the ceiling is the max, and the geometry sweep
    doubles as a saturation check. A >20% disagreement within a
    probe pair is flagged in ``peak_probe_disagreement`` so a
    regressing probe can't silently re-anchor every percentage."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    nbytes = cube_d.size * cube_d.dtype.itemsize
    hbm_add = hbm_max = hbm_copy = None
    try:
        t = time_loop(lambda a: a + jnp.float32(1.0), cube_d,
              chain='eps')[0]
        hbm_add = 2 * nbytes / t / 1e9
        detail['device_hbm_gbps_measured_add'] = round(hbm_add, 1)
    except Exception as e:
        detail.setdefault('errors', {})['peak_hbm'] = str(e)[:200]
    try:
        t = time_loop(lambda a: jnp.maximum(a, jnp.float32(0.5)),
                      cube_d, chain='eps')[0]
        hbm_max = 2 * nbytes / t / 1e9
        detail['device_hbm_gbps_measured_max'] = round(hbm_max, 1)
    except Exception as e:
        detail.setdefault('errors', {})['peak_hbm_max'] = str(e)[:200]
    try:
        reps = 10

        @jax.jit
        def copy_loop(x, n):
            def body(i, c):
                # roll = slice + slice + concat: read N, write N. The
                # result is the carry and each iteration rotates
                # further, so neither DCE nor invariant hoisting can
                # fold it — no epsilon chain needed (an extra `+ eps`
                # pass would double the traffic the model divides by).
                return jnp.roll(c, 1, axis=0)
            return lax.fori_loop(0, n, body, x)

        n_lo = jnp.asarray(reps, jnp.int32)
        n_hi = jnp.asarray(4 * reps, jnp.int32)
        _sync(copy_loop(cube_d, n_lo))
        t0 = time.perf_counter()
        _sync(copy_loop(cube_d, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(copy_loop(cube_d, n_hi))
        t_hi = time.perf_counter() - t0
        # differential: the fixed dispatch+sync round trip cancels
        t = (t_hi - t_lo) / (3 * reps)
        if t <= 0:
            t = t_hi / (4 * reps)
        hbm_copy = 2 * nbytes / t / 1e9
        # informational lower bound (copy engines, not the compute
        # stream) — recorded, excluded from the disagreement pair
        detail['device_hbm_gbps_measured_copy'] = round(hbm_copy, 1)
    except Exception as e:
        detail.setdefault('errors', {})['peak_hbm_copy'] = str(e)[:200]
    if hbm_add or hbm_max:
        # a probe ABOVE the paper roofline is physically impossible
        # (r4: a poisoned compare-select probe returned 1197.5 GB/s =
        # 146% of the 819 GB/s v5e peak and max() silently re-anchored
        # every percentage by it) — reject it rather than clamp, so
        # the surviving corroborated probe carries the ceiling
        pair = [v for v in (hbm_add, hbm_max) if v]
        sane = [v for v in pair if v <= 1.05 * _V5E_HBM_GBPS]
        if len(sane) < len(pair):
            detail.setdefault('peak_probe_rejected', {})['hbm'] = [
                round(v, 1) for v in pair if v not in sane]
        if len(sane) == 2 and abs(sane[0] - sane[1]) / max(sane) > 0.2:
            detail.setdefault('peak_probe_disagreement', {})['hbm'] = \
                [round(v, 1) for v in sane]
            # uncorroborated: the conservative member anchors
            sane = [min(sane)]
        if sane:
            _MEASURED['hbm_gbps'] = min(max(sane), _V5E_HBM_GBPS)
            detail['device_hbm_gbps_measured'] = round(
                _MEASURED['hbm_gbps'], 1)

    # chain='row' calibration: the kernel configs rely on XLA aliasing
    # the loop carry for the one-row dynamic_update_slice chain. The
    # probe body mirrors the real pattern — the kernel CONSUMES the
    # carry and produces a separate (here: tiny) output, after which
    # the carry's buffer is dead and the row update can go in place.
    # (An identity body would be the wrong probe: returning the carry
    # itself keeps its buffer live and FORCES a copy — measured 0.63
    # ms, exactly one full-cube read+write — a worst case no kernel
    # config hits.) ~0 when aliased; a full-cube pass when some
    # future XLA declines, in which case every kernel rate silently
    # re-inherits the old full-pass artifact: flag it instead.
    try:
        t = time_loop(lambda a: a[:1] * jnp.float32(1.0), cube_d,
                      reps=20, label='chain_row_probe')[0]
        detail['chain_row_overhead_ms'] = round(t * 1e3, 4)
        if _MEASURED['hbm_gbps']:
            stream_ms = 2 * nbytes / (_MEASURED['hbm_gbps'] * 1e9) \
                * 1e3
            if t * 1e3 > 0.25 * stream_ms:
                # one transient stall (harness load on the 1-core box)
                # must not condemn every kernel rate: re-measure once
                # and keep the better sample before flagging
                t = min(t, time_loop(
                    lambda a: a[:1] * jnp.float32(1.0), cube_d,
                    reps=20, label='chain_row_probe_retry')[0])
                detail['chain_row_overhead_ms'] = round(t * 1e3, 4)
            if t * 1e3 > 0.25 * stream_ms:
                detail.setdefault('peak_probe_disagreement', {})[
                    'chain_row_not_aliased'] = round(t * 1e3, 3)
    except Exception as e:
        detail.setdefault('errors', {})['chain_row'] = str(e)[:200]

    vpu_runs = {}
    c = jnp.float32(1.0000001)
    d = jnp.float32(1e-9)
    for chains, depth, shape in ((8, 16, (512, 1024)),
                                 (16, 64, (512, 1024)),
                                 (32, 64, (1024, 1024)),
                                 (64, 64, (1024, 1024)),
                                 (128, 64, (1024, 1024))):
        try:
            blk = jnp.ones(shape, jnp.float32)

            def fma(a, chains=chains, depth=depth):
                accs = [a + jnp.float32(i) for i in range(chains)]
                for _ in range(depth):
                    accs = [x * c + d for x in accs]
                out = accs[0]
                for x in accs[1:]:
                    out = out + x
                return out
            t = time_loop(fma, blk, reps=100, chain='eps')[0]
            fl = (chains * depth * 2 + chains - 1) * blk.size
            vpu_runs['%dx%d' % (chains, depth)] = fl / t / 1e12
        except Exception as e:
            detail.setdefault('errors', {})[
                'peak_vpu_%dx%d' % (chains, depth)] = str(e)[:200]
    if vpu_runs:
        # consensus estimator (r4: a lone 8x16 rung at 5.32 TFLOP/s
        # was picked as the max while the four saturated geometries
        # agreed at ~4.3-4.5): the ceiling is the max of the probes
        # within 20% of the ladder's median — a single outlier rung,
        # high or low, cannot re-anchor the percentages — clamped to
        # the f32 paper roofline
        vals = sorted(vpu_runs.values())
        med = vals[len(vals) // 2]
        plateau = [v for v in vals if abs(v - med) <= 0.2 * med]
        outliers = [v for v in vals if v not in plateau]
        if outliers:
            detail.setdefault('peak_probe_rejected', {})['vpu'] = [
                round(v, 2) for v in outliers]
        _MEASURED['vpu_tflops'] = min(max(plateau), _V5E_F32_TFLOPS)
        detail['device_vpu_tflops_measured'] = round(
            _MEASURED['vpu_tflops'], 2)
        detail['device_vpu_tflops_probes'] = {
            k: round(v, 2) for k, v in vpu_runs.items()}
        # saturation check: the top two consensus rungs must agree —
        # if the biggest geometry is still pulling ahead of the
        # runner-up by >20%, the measured ceiling is a lower bound,
        # not the silicon
        if len(plateau) > 1 and \
                (plateau[-1] - plateau[-2]) / plateau[-1] > 0.2:
            detail.setdefault('peak_probe_disagreement', {})[
                'vpu_unsaturated'] = [round(v, 2)
                                      for v in plateau[-2:]]


def _roofline(detail, key, bytes_per_pix, flops_per_pix=None,
              peak_tflops=_V5E_F32_TFLOPS, mxu=False):
    """Annotate ``detail[key+'_mpix_s']`` with achieved HBM GB/s and
    FLOP/s against the v5e paper peaks AND the peaks measured on this
    device at bench time, using the documented minimal-traffic /
    arithmetic models (docs/performance.md#roofline). 'pix' is one
    (y, x, time) sample of the 4-channel f32 cube."""
    rate = detail.get(key + '_mpix_s')
    if not rate:
        return
    gbps = rate / 1e3 * bytes_per_pix
    detail[key + '_hbm_gbps'] = round(gbps, 1)
    detail[key + '_pct_hbm_roofline'] = round(
        100.0 * gbps / _V5E_HBM_GBPS, 2)
    if _MEASURED['hbm_gbps']:
        detail[key + '_pct_measured_hbm'] = round(
            100.0 * gbps / _MEASURED['hbm_gbps'], 1)
    if _MEASURED['dma_gbps']:
        # the ceiling a DMA-in/compute/DMA-out Pallas kernel actually
        # faces (r4 item 3) — the honest denominator for the
        # streaming kernels
        detail[key + '_pct_measured_dma'] = round(
            100.0 * gbps / _MEASURED['dma_gbps'], 1)
    if flops_per_pix:
        gflops = rate / 1e3 * flops_per_pix
        detail[key + '_gflops'] = round(gflops, 1)
        detail[key + '_pct_compute_roofline'] = round(
            100.0 * gflops / (peak_tflops * 1e3), 2)
        if _MEASURED['vpu_tflops'] and not mxu:
            # an MXU workload (dense matmuls) measured against the
            # VPU ceiling reads >100% and means nothing — r5 recorded
            # 694% for the separable warp; MXU kernels report only
            # the paper-peak percentage above
            detail[key + '_pct_measured_vpu'] = round(
                100.0 * gflops / (_MEASURED['vpu_tflops'] * 1e3), 1)


def _resilient(detail, name, fn, fallback=None):
    """Run ``fn()`` with one retry; on repeated failure run
    ``fallback()``. Returns (result, used_fallback) — (None, False)
    only if every attempt incl. the fallback failed. A transient TPU
    INTERNAL error voided round 1's headline; no single config may
    take the whole bench down again."""
    errs = detail.setdefault('errors', {})
    _log('config %s ...' % name)
    for attempt in range(2):
        try:
            out = fn(), False
            _log('config %s done' % name)
            return out
        except Exception as e:  # noqa: BLE001 — bench must survive
            errs[name + ('_retry' if attempt else '')] = \
                str(e).splitlines()[0][:300]
    if fallback is not None:
        try:
            return fallback(), True
        except Exception as e:
            errs[name + '_fallback'] = str(e).splitlines()[0][:300]
    return None, False


def _log(msg):
    """Progress note. stdout must stay ONE JSON line; stderr is free."""
    import sys
    print('[bench] %s' % msg, file=sys.stderr, flush=True)


def _wait_for_backend():
    """Make sure the accelerator actually answers before committing to
    it — or fall back to CPU, loudly.

    The tunneled TPU service can hang a bare ``jax.devices()`` call
    indefinitely when it is down (observed: >5 min with zero CPU); a
    bench that hangs forever is worse than round 1's crash, because
    the driver records nothing at all. Probe device initialization in
    a SUBPROCESS (a hung in-process init can never be cancelled) with
    a per-attempt timeout, retrying until ``ND_TPU_BENCH_DEVICE_WAIT``
    seconds (default 1800) have elapsed. Only then degrade to CPU —
    the numbers will be poor, but honest and diagnosable via the
    ``backend_degraded`` detail flag.

    Returns None (accelerator answered, or was never requested) or a
    string explaining the degradation.
    """
    import subprocess
    import sys

    plat = os.environ.get('JAX_PLATFORMS', '').strip().lower()
    if plat == 'cpu':
        return None          # CPU init cannot hang
    # (an empty JAX_PLATFORMS auto-selects — if an accelerator plugin
    # is registered it carries the same hang risk, so probe it too)
    deadline = float(os.environ.get('ND_TPU_BENCH_DEVICE_WAIT', 1800))
    probe_timeout = float(
        os.environ.get('ND_TPU_BENCH_DEVICE_PROBE_TIMEOUT', 150))
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, '-c',
                 'import jax; d = jax.devices(); '
                 'print(d[0].platform)'],
                capture_output=True, timeout=probe_timeout, text=True)
            if out.returncode == 0 and out.stdout.strip():
                if attempt > 1:
                    _log('backend answered on attempt %d (%.0f s)'
                         % (attempt, time.monotonic() - t0))
                return None
            reason = (out.stderr or out.stdout or '').strip() \
                .splitlines()[-1:] or ['no output']
            _log('device probe attempt %d failed: %s'
                 % (attempt, reason[0][:200]))
        except subprocess.TimeoutExpired:
            _log('device probe attempt %d timed out after %.0f s'
                 % (attempt, probe_timeout))
        except Exception as e:  # pragma: no cover
            _log('device probe attempt %d errored: %s'
                 % (attempt, str(e)[:200]))
        waited = time.monotonic() - t0
        if waited >= deadline:
            import jax
            jax.config.update('jax_platforms', 'cpu')
            msg = ('accelerator unreachable after %.0f s '
                   '(%d probe attempts); running on CPU'
                   % (waited, attempt))
            _log(msg)
            return msg
        time.sleep(min(30, max(1, deadline - waited)))


def main():
    import os

    degraded = _wait_for_backend()

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated bench runs skip the
    # (minutes-long) remote TPU compiles
    try:
        cache_dir = os.environ.get(
            'ND_TPU_COMPILE_CACHE',
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass

    import nd_tpu  # noqa: F401
    from nd_tpu.ops.change import change_detection
    from nd_tpu.ops.conv import convolve
    from nd_tpu.ops.nlmeans import nlmeans

    backend = jax.default_backend()
    on_accel = backend != 'cpu'

    # ---- benchmark cube ------------------------------------------------
    NY, NX, K = (1024, 1024, 12) if on_accel else (256, 256, 8)
    cube = _make_cube(NY, NX, K)
    mpix = NY * NX * K / 1e6
    cube_d = jnp.asarray(cube)

    detail = {'backend': backend, 'shape': [NY, NX, K]}
    if degraded:
        detail['backend_degraded'] = degraded

    # empirical ceilings of THIS chip (streaming HBM GB/s, VPU f32
    # TFLOP/s) — every kernel reports its percentage of both the v5e
    # paper peaks and these measured ones
    _resilient(detail, 'device_peaks',
               lambda: _measure_device_peaks(detail, cube_d, _time_loop))
    # a fired probe flag means the measured anchors are suspect: every
    # *_pct_measured_* field below inherits it — say so once, loudly,
    # instead of letting the percentages read as clean (VERDICT r4)
    if 'peak_probe_disagreement' in detail:
        detail['measured_pct_unanchored'] = sorted(
            detail['peak_probe_disagreement'])
    if on_accel:
        _resilient(detail, 'device_dma',
                   lambda: _measure_dma_through(detail, cube_d,
                                                _time_loop))

    # ---- NLMeans (r=1, f=1 spatial, joint over 4 channels) -------------
    r = (1, 1, 0)
    f = (1, 1, 0)
    sigma, h = 2.0, 3.0

    nl_in = cube_d  # (y, x, t, 4)

    from nd_tpu.ops.nlmeans_pallas import (
        nlmeans_spatial_pallas, supports_pallas as nlmeans_has_pallas)
    use_pallas = nlmeans_has_pallas()

    def run_nlmeans_pallas(x):
        return nlmeans_spatial_pallas(x, r[:2], f[:2], sigma, h, -1.0)

    def run_nlmeans_xla(x):
        return nlmeans(x, r, f, sigma, h, -1.0)

    run_nlmeans = run_nlmeans_pallas if use_pallas else run_nlmeans_xla
    res, fb = _resilient(
        detail, 'nlmeans', lambda: _time_loop(run_nlmeans, nl_in, label='nlmeans'),
        fallback=((lambda: _time_loop(run_nlmeans_xla, nl_in, label='nlmeans_xla_fb'))
                  if use_pallas else None))
    if fb:
        run_nlmeans = run_nlmeans_xla
    t_nl = res[0] if res else None
    detail['nlmeans_kernel'] = 'pallas' if (use_pallas and not fb) \
        else 'xla'
    if t_nl:
        detail['nlmeans_mpix_s'] = round(mpix / t_nl, 2)
    res, _ = _resilient(detail, 'nlmeans_wall',
                        lambda: _time(jax.jit(run_nlmeans), nl_in))
    if res:
        detail['nlmeans_wall_mpix_s'] = round(mpix / res[0], 2)
    # roofline model: 32 B/pix HBM (4-channel f32 in+out, VMEM-fused
    # accumulators); ~34 VPU flops per offset per pixel (shared-pair
    # patch distances, exp weight, 4-channel accumulation)
    n_off = (2 * r[0] + 1) * (2 * r[1] + 1) - 1
    _roofline(detail, 'nlmeans', 32,
              n_off * (3.0 * 4 / 2 + 2 * (f[0] + f[1]) + 12
                       + 2 * 4 + 4))

    # ---- NLMeans at a production despeckling radius (r=2, f=2) ---------
    # (the reference's single-core cost grows ~15x over r=1 here; the
    # Pallas kernel's VMEM-fused offsets keep the device rate within
    # ~10% of the r=1 figure)
    def run_nl_r2_pallas(x):
        return nlmeans_spatial_pallas(x, (2, 2), (2, 2), sigma, h, -1.0)

    def run_nl_r2_xla(x):
        return nlmeans(x, (2, 2, 0), (2, 2, 0), sigma, h, -1.0)

    run_nl_r2 = run_nl_r2_pallas if use_pallas else run_nl_r2_xla
    res, fb_r2 = _resilient(
        detail, 'nlmeans_r2', lambda: _time_loop(run_nl_r2, nl_in, label='nlmeans_r2'),
        fallback=((lambda: _time_loop(run_nl_r2_xla, nl_in, label='nlmeans_r2_xla_fb'))
                  if use_pallas else None))
    if res:
        detail['nlmeans_r2_mpix_s'] = round(mpix / res[0], 2)
        # record WHICH kernel produced the number (a silent XLA
        # fallback must never masquerade as a Pallas rate)
        detail['nlmeans_kernel_r2'] = 'pallas' \
            if (use_pallas and not fb_r2) else 'xla'

    # ---- Omnibus change detection --------------------------------------
    alpha = 0.99
    looks = 9

    # exact decisions, device-resident: fused f32 Pallas scan + on-
    # device float64 re-scan of the few near-margin pixels (identical
    # to the full-grid f64 'mixed' map whenever the suspect count fits
    # the patch capacity — verified below via the parity check)
    from nd_tpu.ops.change import (_change_detection_exact_core,
                                   change_detection_hybrid)
    from nd_tpu.ops.change_pallas import (
        supports_pallas as change_has_pallas)

    cap = max(8192, NY * NX // 64)

    def run_omnibus_exact(x):
        flags, _ = _change_detection_exact_core(
            x, alpha, looks, 1e-4, cap)
        return flags

    def run_omnibus_mixed(x):
        return change_detection(x, alpha=alpha, n=looks,
                                stat_dtype='mixed')

    use_change_pallas = change_has_pallas()
    run_omnibus = run_omnibus_exact if use_change_pallas \
        else run_omnibus_mixed
    res, fb = _resilient(
        detail, 'omnibus', lambda: _time_loop(run_omnibus, cube_d, label='omnibus'),
        fallback=((lambda: _time_loop(run_omnibus_mixed, cube_d,
                                      label='omnibus_mixed_fb'))
                  if use_change_pallas else None))
    if fb:
        run_omnibus = run_omnibus_mixed
        use_change_pallas = False
    t_om = res[0] if res else None
    detail['omnibus_kernel'] = 'pallas-exact-device' \
        if use_change_pallas else 'xla-mixed'
    if t_om:
        detail['omnibus_mpix_s'] = round(mpix / t_om, 2)
    change_map = None
    res, _ = _resilient(detail, 'omnibus_wall',
                        lambda: _time(jax.jit(run_omnibus), cube_d))
    if res:
        detail['omnibus_wall_mpix_s'] = round(mpix / res[0], 2)
        change_map = _sync(res[1])
    # roofline model: 16 B/pix in + bit-packed flag planes out
    # (4*ceil(k/31) B per (y,x) column); ~35 flops per scan element
    # (channel cumsums, determinant, series log, folded compare) at a
    # typical 3 restart rounds
    _roofline(detail, 'omnibus',
              16 + 4.0 * ((K + 30) // 31) / K, 35 * 3)

    if use_change_pallas:
        # stage split of the exact mode (VERDICT r4 item 4): time the
        # pipeline at increasing prefixes with the same differential
        # loop; successive differences attribute the exact-vs-fast gap
        # to its stages. Published so the ratio can be judged as
        # headroom or pinned cost (r5 profiling: the patch is
        # dominated by TPU row-gather latency — ~320 ns per suspect
        # row — and the compaction's lane-cumsum, not by the f64
        # rescan itself, which is ~0.25 ms).
        def stage_split():
            from nd_tpu.ops.change import _compact_indices
            from nd_tpu.ops.change_pallas import (_round_cap,
                                                  change_detection_pallas)
            cap0 = 2048

            def fast_margin(x):
                return change_detection_pallas(
                    x, alpha, n=looks, return_margin=True,
                    return_packed=True, max_rounds=_round_cap(K))

            def plus_compact(x):
                packed, margin = fast_margin(x)
                suspect = ~(margin > jnp.float32(1e-4))
                idx, cnt = _compact_indices(suspect, cap0)
                return jnp.sort(idx), cnt

            def plus_gather(x):
                idx, cnt = plus_compact(x)
                iy = idx // NX
                ix = idx - iy * NX
                return x.at[iy, ix].get(indices_are_sorted=True)

            ts = {}
            for nm, fn in (('fast_margin_pack', fast_margin),
                           ('compact_sort', plus_compact),
                           ('gather', plus_gather)):
                ts[nm] = _time_loop(fn, cube_d,
                                    label='split_' + nm)[0]
            split = {
                'fast_margin_pack_ms': round(
                    ts['fast_margin_pack'] * 1e3, 3),
                'compact_sort_ms': round(
                    (ts['compact_sort']
                     - ts['fast_margin_pack']) * 1e3, 3),
                'gather_ms': round(
                    (ts['gather'] - ts['compact_sort']) * 1e3, 3),
            }
            if t_om:
                split['rescan_scatter_unpack_ms'] = round(
                    (t_om - ts['gather']) * 1e3, 3)
            return split
        res, _ = _resilient(detail, 'omnibus_stage_split', stage_split)
        if res:
            detail['omnibus_stage_split'] = res

        # Wall-style exact-vs-fast gap (queued reps, ONE barrier): the
        # loop figures above embed a ~0.55 ms relayout that only the
        # exact config pays — inside the timing loop XLA folds the
        # Pallas operand transpose into the loop-carry layout (making
        # the fast pass transpose-free) and the rescan's series gather
        # then relayouts the whole cube back. A standalone dispatch
        # pins the parameter to the default layout, both configs pay
        # the same transpose, and the true exact overhead is the
        # compact+gather+rescan work alone — measured r5: 0.81 ms gap,
        # exact/fast wall ratio 0.85 (vs 0.69 by the loop figures).
        def wall_gap():
            def wall(fn, reps=32):
                f = jax.jit(fn)
                _sync(f(cube_d))
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    outs = [f(cube_d) for _ in range(reps)]
                    _sync(outs[-1])
                    best = min(best,
                               (time.perf_counter() - t0) / reps)
                return best
            tf = wall(lambda x: change_detection(
                x, alpha=alpha, n=looks, stat_dtype='float32'))
            te = wall(run_omnibus_exact)
            return {'omnibus_exact_wall_gap_ms':
                    round((te - tf) * 1e3, 3),
                    'omnibus_exact_wall_ratio': round(tf / te, 3)}
        res, _ = _resilient(detail, 'omnibus_wall_gap', wall_gap)
        if res:
            detail.update(res)

        # the long-series scan KERNEL alone (packed output, no
        # rescan): the k=200 exact-core figure is patch-dominated;
        # this pins where the kernel itself stands (r5 sweep: tile
        # (8, 256) 20.0 vs old chooser's (16, 256) 8.9 Gpix/s at
        # k=56)
        def scan_kernel_only():
            from nd_tpu.ops.change_scan_pallas import (
                change_detection_scan, scan_tables)
            if scan_tables(200, looks, alpha) is None:
                raise RuntimeError('k=200 tables infeasible')
            cube_l = jnp.asarray(_make_cube(128, 512, 200, seed=2))
            _sync(cube_l)
            t = _time_loop(
                lambda x: change_detection_scan(
                    x, alpha, n=looks, return_packed=True)[0],
                cube_l, label='scan_kernel_k200')[0]
            return round(128 * 512 * 200 / 1e6 / t, 2)
        res, _ = _resilient(detail, 'omnibus_scan_kernel',
                            scan_kernel_only)
        if res:
            detail['omnibus_scan_kernel_k200_mpix_s'] = res

        # suspect-count sanity: overflow would mean the timed kernel's
        # patch pass was short — surface it next to the parity figure
        def suspects():
            _, n_suspect = _change_detection_exact_core(
                cube_d, alpha, looks, 1e-4, cap)
            return int(n_suspect)
        res, _ = _resilient(detail, 'omnibus_suspects', suspects)
        if res is not None:
            detail['omnibus_suspect_pixels'] = res
            detail['omnibus_patch_capacity'] = cap

        # full-grid f64 'mixed' XLA path, reported for reference
        res, _ = _resilient(
            detail, 'omnibus_mixed',
            lambda: _time_loop(run_omnibus_mixed, cube_d,
                               label='omnibus_mixed'))
        if res:
            detail['omnibus_mixed_mpix_s'] = round(mpix / res[0], 2)

        # hybrid mode (exact device scan + bit-packed host delivery —
        # what OmnibusTest uses on TPU); includes its host transfers
        # (the hybrid wrapper itself retries + degrades on a Pallas
        # launch failure, so this times whatever path survived)
        def hybrid():
            change_detection_hybrid(cube_d, alpha=alpha, n=looks)
            ts = []
            for _ in range(3):           # best-of-3: tunnel-facing
                t0 = time.perf_counter()
                change_detection_hybrid(cube_d, alpha=alpha, n=looks)
                ts.append(time.perf_counter() - t0)
            detail['omnibus_hybrid_samples_s'] = [round(t, 4)
                                                  for t in ts]
            return min(ts)
        res, _ = _resilient(detail, 'omnibus_hybrid', hybrid)
        if res:
            detail['omnibus_hybrid_mpix_s'] = round(mpix / res, 2)

        # fast (f32 Pallas) mode, reported separately
        def run_omnibus_fast(x):
            return change_detection(x, alpha=alpha, n=looks,
                                    stat_dtype='float32')
        res, _ = _resilient(
            detail, 'omnibus_fast',
            lambda: _time_loop(run_omnibus_fast, cube_d,
                               label='omnibus_fast'))
        if res:
            detail['omnibus_fast_mpix_s'] = round(mpix / res[0], 2)
            t_fast = res[0]

            # spec-driven headline choice: BASELINE's bar is change-map
            # parity <= 1e-5, not bit-exactness. If the fast f32
            # kernel's FULL-GRID mismatch vs the exact decisions is
            # within that bar (measured, on this data), it carries the
            # headline; otherwise the exact kernel keeps it. Both
            # rates are reported either way.
            def fast_vs_exact():
                fm = run_omnibus_fast(cube_d)
                em = run_omnibus(cube_d)
                # reduce on device: one scalar crosses the tunnel,
                # not two full boolean maps
                return float(np.asarray(
                    jnp.mean((fm != em).astype(jnp.float32))))
            rate, _ = _resilient(detail, 'omnibus_fast_parity',
                                 fast_vs_exact)
            if rate is not None:
                detail['omnibus_fast_vs_exact_mismatch'] = rate
                if rate <= 1e-5 and t_om and t_fast < t_om:
                    t_om = t_fast
                    detail['omnibus_headline_kernel'] = \
                        'pallas-fast-f32 (parity %.1e <= 1e-5)' % rate
                    res, _ = _resilient(
                        detail, 'omnibus_fast_wall',
                        lambda: _time(jax.jit(run_omnibus_fast),
                                      cube_d))
                    if res:
                        change_map = _sync(res[1])

    # ---- long series (k > 48): round-capped kernel + exact rescan ------
    # (the unrolled Pallas graph is O(k^2); past 48 steps the exact
    # mode caps the rounds and folds overflow pixels into the suspect
    # rescan — this config records that the long-k path holds device
    # speed instead of dropping to the O(k) XLA scan)
    if on_accel:
        from nd_tpu.ops.change import (change_detection_exact,
                                       _change_detection_exact_core,
                                       _patch_capacity)
        from nd_tpu.ops.change_pallas import supports_pallas_rescan
        for KL, tag, lny, lnx in ((56, 'omnibus_long', 256, 512),
                                  (200, 'omnibus_k200', 128, 512)):
            if not supports_pallas_rescan(KL, looks, alpha):
                continue
            cube_long = jnp.asarray(_make_cube(lny, lnx, KL, seed=2))
            # drain the (async) 100+ MB device_put before any timed
            # window: over the ~26 MB/s dev tunnel the upload takes
            # seconds, and an unsynced warm call lets the timed sync
            # absorb its tail (recorded 8 Mpix/s for a call that
            # measures ~120 Mpix/s with the input resident)
            _sync(cube_long)
            mpix_long = lny * lnx * KL / 1e6

            def long_series(cube_long=cube_long):
                _sync(change_detection_exact(cube_long, alpha,
                                             n=looks))     # warm
                t0 = time.perf_counter()
                out = change_detection_exact(cube_long, alpha,
                                             n=looks)
                _sync(out)
                return time.perf_counter() - t0
            res, _ = _resilient(detail, tag, long_series)
            if res:
                detail[tag + '_k'] = KL
                detail[tag + '_mpix_s'] = round(mpix_long / res, 2)

            # device-resident rate (like the short-k 'omnibus' entry):
            # fori_loop-repeated exact core inside ONE jit, so the
            # figure reflects the chip, not the per-dispatch tunnel
            # latency that dominates the small e2e cube above
            cap_long = _patch_capacity(lny, lnx)

            def run_exact_long(x, cap_long=cap_long):
                flags, _ = _change_detection_exact_core(
                    x, alpha, looks, 1e-4, cap_long)
                return flags

            res, _ = _resilient(
                detail, tag + '_device',
                lambda: _time_loop(run_exact_long, cube_long,
                                   label=tag + '_device'))
            if res:
                detail[tag + '_device_mpix_s'] = \
                    round(mpix_long / res[0], 2)
                _roofline(detail, tag + '_device',
                          16 + 4.0 * ((KL + 30) // 31) / KL, 35 * 3)

            # parity vs the f64 'mixed' oracle + the suspect count
            # (an overflowed rescan would silently retime the full
            # f64 scan — surface it next to the rate)
            def long_parity(cube_long=cube_long, KL=KL,
                            lny=lny, lnx=lnx):
                exact = change_detection_exact(cube_long, alpha,
                                               n=looks)
                ref = change_detection(cube_long, alpha=alpha,
                                       n=looks, stat_dtype='mixed')
                mism = float(np.asarray(jnp.mean(
                    (exact != ref).astype(jnp.float32))))
                _, n_sus = _change_detection_exact_core(
                    cube_long, alpha, looks, 1e-4,
                    _patch_capacity(lny, lnx))
                return mism, int(n_sus)
            res, _ = _resilient(detail, tag + '_parity', long_parity)
            if res is not None:
                detail[tag + '_mismatch_vs_mixed'] = res[0]
                detail[tag + '_suspects'] = res[1]

    # ---- secondary configs ---------------------------------------------
    k3 = jnp.ones((3, 3), jnp.float32) / 9

    def run_boxcar(x):
        return convolve(x, k3, axes=(0, 1), mode='reflect')

    res, _ = _resilient(detail, 'boxcar',
                        lambda: _time_loop(run_boxcar, cube_d,
                                           label='boxcar'))
    if res:
        detail['boxcar_mpix_s'] = round(mpix / res[0], 2)
    # 4 channels f32 in+out; 9 MACs per channel
    _roofline(detail, 'boxcar', 32, 4 * 9 * 2)

    from nd_tpu.ops.conv import gaussian_kernel1d, separable_convolve
    g1 = jnp.asarray(gaussian_kernel1d(1.5), jnp.float32)

    def run_gauss(x):
        return separable_convolve(x, [g1, g1], axes=(0, 1))

    res, _ = _resilient(detail, 'gaussian',
                        lambda: _time_loop(run_gauss, cube_d,
                                           label='gaussian'))
    if res:
        detail['gaussian_mpix_s'] = round(mpix / res[0], 2)
    # separable: 2 passes of len(g1) MACs over 4 channels
    _roofline(detail, 'gaussian', 32, 4 * 2 * int(g1.shape[0]) * 2)

    # ---- reprojection (warp config) ------------------------------------
    try:
        from nd_tpu.testing import generate_test_dataset
        from nd_tpu.warp import Reprojection
        wds = generate_test_dataset(
            dims={'y': NY // 2, 'x': NX // 2, 'time': 4})
        for v in list(wds.data_vars):
            # device-resident input: in chained pipelines the cube is
            # already in HBM from the previous op
            wds[v] = (wds[v].dims,
                      jnp.asarray(wds[v].values.astype(np.float32)))
        proj = Reprojection(crs='epsg:3395')
        _sync(proj.apply(wds)['C11'].data)   # compile + grid cache
        reps = 8
        t_samples = []
        for _ in range(2):                   # best-of-2 groups of 8
            t0 = time.perf_counter()
            outs = [proj.apply(wds) for _ in range(reps)]
            # one barrier: in-order device stream, every var of the
            # last rep (earlier reps complete before it)
            for v in outs[-1].data_vars:
                _sync(outs[-1][v].data)
            t_samples.append((time.perf_counter() - t0) / reps)
        t_rp = min(t_samples)
        wp = (NY // 2) * (NX // 2) * 4 * 4 / 1e6
        detail['reproject_mpix_s'] = round(wp / t_rp, 2)
        detail['reproject_samples_s'] = [round(t, 4)
                                         for t in t_samples]

        # device kernel rate (chained in one jit like the other
        # kernels; the wall figure above is dominated by per-call
        # host-link latency on tunneled dev hosts): the separable
        # epsg:4326->3395 warp runs as two MXU matmuls
        from nd_tpu import warp as _warp
        from nd_tpu.crs import CRS
        try:
            hw = (NY // 2, NX // 2)
            plan = _warp._cached_plan(
                tuple(np.asarray(outs[-1].attrs['transform']))[:6], hw,
                tuple(np.asarray(wds.attrs['transform']))[:6],
                CRS.from_user_input('epsg:4326').to_proj4(),
                CRS.from_user_input('epsg:3395').to_proj4(),
                hw, 'bilinear', '<f4')
        except Exception as e:
            detail['reproject_device_error'] = str(e)
            plan = None
        if plan is not None:
            from nd_tpu.ops.interp import matmul_resample
            stacked = jnp.stack(
                [jnp.asarray(wds[v].data) for v in wds.data_vars])
            stacked = jnp.moveaxis(stacked, -1, 1).reshape(
                -1, hw[0], hw[1])

            def run_warp(x):
                # nan_to_num: the chained-loop epsilon dependency reads
                # out[0], which must stay finite across iterations
                return jnp.nan_to_num(matmul_resample(
                    x, *plan[:6], jnp.float32(np.nan), plan[6]))

            t_rd, _ = _time_loop(run_warp, stacked,
                                 label='reproject_device')
            detail['reproject_device_mpix_s'] = round(wp / t_rd, 2)
            # separable warp = two dense MXU matmuls: ~2*(h+w) MAC
            # flops per output sample, ~12 B/pix HBM (src re-read +
            # intermediate + dst)
            _roofline(detail, 'reproject_device', 12,
                      2 * 2 * (hw[0] + hw[1]), mxu=True)
    except Exception as e:  # pragma: no cover
        detail['reproject_error'] = str(e)

    # ---- coregistration (batched phase correlation + translate) --------
    def bench_coreg():
        from nd_tpu.testing import generate_test_dataset
        from nd_tpu.warp import Coregistration

        cds = generate_test_dataset(dims={'y': 512, 'x': 512,
                                          'time': 8})
        for v in list(cds.data_vars):
            cds[v] = (cds[v].dims, cds[v].values.astype(np.float32))
        coreg = Coregistration(reference=0, upsampling=10)
        coreg.apply(cds)                              # warm compiles
        ts = []
        for _ in range(3):                            # best-of-3
            t0 = time.perf_counter()
            coreg.apply(cds)
            ts.append(time.perf_counter() - t0)
        detail['coregister_samples_s'] = [round(t, 4) for t in ts]
        return 512 * 512 * 8 * 4 / 1e6 / min(ts)
    res, _ = _resilient(detail, 'coregister', bench_coreg)
    if res:
        detail['coregister_mpix_s'] = round(res, 2)

    # device-resident kernel rate (VERDICT r2 item 8): registration +
    # translation on data already in HBM, chained in one jit like the
    # other kernels — judged apart from the 40 MB/s dev tunnel that
    # dominates the end-to-end figure above
    def bench_coreg_device():
        from nd_tpu.ops.fft import (_device_fft_ok,
                                    _pcc_batch_device_impl,
                                    _translate_batch_device)
        if not _device_fft_ok():
            raise RuntimeError('device FFT unavailable')
        kf, hy, hx = 8, 512, 512
        ser = jnp.asarray(
            _make_cube(hy, hx, kf, seed=5)[..., 0]
            .transpose(2, 0, 1))                       # (k, y, x)

        def coreg_dev(x):
            shifts = _pcc_batch_device_impl(x, x[0], 10, 'phase')
            return _translate_batch_device(
                x, jnp.flip(shifts, axis=1).astype(x.dtype))

        # reps=16: the kernel is ~1 ms/iter, so the differential's lo
        # sample needs enough trips to rise clear of timer noise
        t, _ = _time_loop(coreg_dev, ser, reps=16, best_of=3,
                          label='coregister_device')
        return kf * hy * hx / 1e6 / t
    res, _ = _resilient(detail, 'coregister_device',
                        bench_coreg_device)
    if res:
        detail['coregister_device_mpix_s'] = round(res, 2)
        # FFT-traffic model (VERDICT r4 item 9): the registration
        # pipeline is FFT passes, not a single stream, so its honest
        # HBM denominator counts every materialized pass. Per (y, x)
        # sample of one time step (f32 in, c64 half-spectrum of
        # relative width hs = (nx/2+1)/nx):
        #   fwd rfft2 axis-1:  4 B read + 8*hs B write
        #   fwd rfft2 axis-0:  2 * 8*hs B   (c64 in+out)
        #   cross-power:       3 * 8*hs B   (read XY + ref, write)
        #   irfft2 axis-0:     2 * 8*hs B
        #   irfft2 axis-1:     8*hs B + 4 B (c64 in, f32 corr out)
        #   argmax reduce:     4 B read
        #   translate:         4 B read + 4 B write (taps in VMEM)
        # Refinement (upsampled-DFT matmuls + Fourier-shift phase
        # ramps) touches only a (2*up+1)^2 window -> negligible HBM.
        import math as _math
        hy = hx = 512
        hs = (hx // 2 + 1) / hx
        c = 8.0 * hs
        bytes_pix = (4 + c) + 2 * c + 3 * c + 2 * c + (c + 4) \
            + 4 + (4 + 4)
        # FLOPs: 3 full 2-D transforms at 5 N log2 N + cross-power
        # normalize (~10) + 4-tap separable translate (2 axes x 4
        # MACs x 2)
        flops_pix = 3 * 5 * _math.log2(hy * hx) + 10 + 2 * 4 * 2
        detail['coregister_device_model'] = {
            'hbm_bytes_per_pix': round(bytes_pix, 1),
            'flops_per_pix': round(flops_pix, 1),
            'terms': 'rfft2(4+%.1f) + axis0(%.1f) + xpow(%.1f) + '
                     'irfft2(%.1f+%.1f+4) + argmax(4) + translate(8)'
                     % (c, 2 * c, 3 * c, 2 * c, c),
        }
        _roofline(detail, 'coregister_device', bytes_pix, flops_pix)

    # registration parity (VERDICT r3 item 2): known alias-free
    # subpixel shifts recovered by the device kernel, worst error in
    # pixels (bound: 1/upsample_factor + Fourier-shift leakage)
    def coreg_parity():
        # the JITTED wrapper: on the tunneled backend several complex
        # primitives are UNIMPLEMENTED when dispatched eagerly but
        # compile fine (measured: the eager impl call dies, the jitted
        # one runs)
        from nd_tpu.ops.fft import _device_fft_ok, _pcc_batch_device
        if not _device_fft_ok():
            raise RuntimeError('device FFT unavailable')
        rng = np.random.RandomState(9)
        base = rng.rand(512, 512)
        F = np.fft.fft2(base)
        F[40:-39, :] = 0
        F[:, 40:-39] = 0                 # bandlimit: alias-free shift
        true = np.array([[1.3, -2.7], [-0.4, 0.8],
                         [3.25, 1.75], [0.0, 0.0]])
        fy = np.fft.fftfreq(512)[:, None]
        fx = np.fft.fftfreq(512)[None, :]
        srcs = np.stack([
            np.real(np.fft.ifft2(
                F * np.exp(-2j * np.pi * (fy * dy + fx * dx))))
            for dy, dx in true]).astype(np.float32)
        ref = np.real(np.fft.ifft2(F)).astype(np.float32)
        import jax.numpy as jnp
        dev = np.asarray(_pcc_batch_device(
            jnp.asarray(srcs), jnp.asarray(ref), 10, 'phase'))
        return float(np.abs(dev - true).max())
    res, _ = _resilient(detail, 'coregister_parity', coreg_parity)
    if res is not None:
        detail['coregister_shift_err_px'] = round(res, 4)

    # ---- tiling config: tile -> filter each tile -> auto_merge ----------
    _log('config tile_pipeline ...')
    # (BASELINE.json's "Reprojection + tiling.tile/merge" out-of-core
    # config; the filesystem round-trip dominates, mirroring how the
    # reference streams larger-than-memory cubes through NetCDF tiles)
    try:
        import shutil
        import tempfile

        from nd_tpu.filters import BoxcarFilter
        from nd_tpu.testing import generate_test_dataset
        from nd_tpu.tiling import auto_merge, map_over_tiles, tile

        # production-shaped out-of-core job: a 2048^2 x 4 x 4-channel
        # cube (268 MB f32) in 512^2-chunk tiles — big enough that the
        # streaming pipeline's throughput, not per-tile Python
        # overhead, sets the rate
        TY, TX, TK = (2048, 2048, 4) if on_accel else (512, 512, 4)
        tchunk = TY // 4
        tds = generate_test_dataset(dims={'y': TY, 'x': TX,
                                          'time': TK})
        for v in list(tds.data_vars):
            tds[v] = (tds[v].dims, tds[v].values.astype(np.float32))
        tdir = tempfile.mkdtemp(prefix='nd_tpu_bench_tiles_')
        flt = BoxcarFilter(w=3)
        try:
            # warm the tile-shaped executable (other configs exclude
            # compile via their warmup rep too)
            warm = tds.isel(y=slice(0, tchunk + 1),
                            x=slice(0, tchunk + 1))
            np.asarray(flt.apply(warm)['C11'].data)
            # Best of 3: the config moves ~0.8 GB through the
            # filesystem, so a burst of kernel writeback throttling
            # (often left over from whatever ran before the bench) can
            # stall one rep by 10x — and the shared 1-core dev box
            # adds scheduler noise on top (36.6 Mpix/s quiet vs 16
            # measured under load with 2 reps). Throughput capability
            # is the best sustained rate; os.sync() drains foreign
            # dirty pages outside the timed window.
            t_tl = None
            for _rep in range(3):
                for old in os.listdir(tdir):
                    os.unlink(os.path.join(tdir, old))
                try:
                    os.sync()
                except Exception:
                    pass
                t0 = time.perf_counter()
                tile(tds, tdir, chunks={'y': tchunk, 'x': tchunk},
                     buffer=1)
                merged = map_over_tiles(
                    os.path.join(tdir, '*.nc'), flt.apply, merge=True,
                    compute=True, max_workers=8)
                dt = time.perf_counter() - t0
                t_tl = dt if t_tl is None else min(t_tl, dt)
            tp = TY * TX * TK * 4 / 1e6
            detail['tile_pipeline_mpix_s'] = round(tp / t_tl, 2)
            detail['tile_pipeline_mb'] = round(TY * TX * TK * 4 * 4
                                               / 1e6)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
    except Exception as e:  # pragma: no cover
        detail['tile_pipeline_error'] = str(e)

    # ---- flagship pipeline forward (multilook + omnibus, one jit) ------
    _log('config pipeline_forward ...')
    try:
        from nd_tpu.models import SARChangePipeline
        pipe = SARChangePipeline(ml=3, n=1, alpha=0.99)

        def run_pipeline(x):
            return pipe.forward(x)

        t_pl, _ = _time_loop(run_pipeline, cube_d, reps=4,
                             label='pipeline_forward')
        detail['pipeline_forward_mpix_s'] = round(mpix / t_pl, 2)
    except Exception as e:  # pragma: no cover
        detail['pipeline_error'] = str(e)

    # ---- headline: NLMeans + Omnibus combined --------------------------
    # survive partial failure: with one headline kernel missing, report
    # the other alone (annotated); never print a JSON without a value
    if t_nl and t_om:
        combined_mpix_s = mpix * 2 / (t_nl + t_om)
    elif t_nl or t_om:
        combined_mpix_s = mpix / (t_nl or t_om)
        detail['headline_partial'] = 'nlmeans' if t_nl else 'omnibus'
    else:
        combined_mpix_s = None

    # ---- single-core CPU baseline (native C++ kernels) -----------------
    _log('config cpu_baseline ...')
    base_mpix_s = None
    parity = None
    try:
        from nd_tpu._native import (change_detection_native,
                                    nlmeans_native)
        by, bx = (128, 128)
        small = cube[:by, :bx]
        small_mpix = by * bx * K / 1e6

        contig = np.ascontiguousarray(small)
        t_nl_cpu = None
        for _ in range(3):               # best-of-3: wall-clock on the
            t0 = time.perf_counter()     # loaded 1-core box swings 2x
            nlmeans_native(contig, r, f, sigma, h, -1.0, nthreads=1)
            dt = time.perf_counter() - t0
            t_nl_cpu = dt if t_nl_cpu is None else min(t_nl_cpu, dt)

        t_om_cpu = None
        for _ in range(3):
            t0 = time.perf_counter()
            change_cpu = change_detection_native(small, alpha, n=looks,
                                                 nthreads=1)
            dt = time.perf_counter() - t0
            t_om_cpu = dt if t_om_cpu is None else min(t_om_cpu, dt)

        base_mpix_s = small_mpix * 2 / (t_nl_cpu + t_om_cpu)
        detail['cpu_1core_mpix_s'] = round(base_mpix_s, 3)

        # parity: boolean change map vs native reference
        if change_map is not None:
            sub = np.asarray(change_map)[:by, :bx]
            parity = float((sub != change_cpu).mean())
            detail['change_map_mismatch_rate'] = parity
    except Exception as e:  # pragma: no cover
        detail['baseline_error'] = str(e)

    vs_baseline = (combined_mpix_s / base_mpix_s) \
        if (base_mpix_s and combined_mpix_s) else None

    if _SLOPE_FALLBACKS:
        detail['timing_slope_fallback'] = _SLOPE_FALLBACKS[:20]
    if backend == 'cpu':
        # _time/_time_loop sync only the last rep, which is exact on
        # the single in-order accelerator stream but can understate
        # time on a backend that overlaps independent dispatches
        detail['timing_single_stream_assumption'] = (
            'non-TPU backend: last-rep sync assumes in-order '
            'execution')

    result = {
        'metric': 'Mpix/s/chip: NLMeans + OmnibusTest on S1 cube; '
                  'change-map parity <=1e-5',
        'value': round(combined_mpix_s, 2) if combined_mpix_s
        else None,
        'unit': 'Mpix/s',
        'vs_baseline': round(vs_baseline, 1) if vs_baseline else None,
        'detail': detail,
    }
    print(json.dumps(result))

    # the driver archives only the LAST 2000 chars of stdout, and the
    # full line above is far longer than that — r3/r4 artifacts lost
    # the headline to its own detail dict. End stdout with one compact
    # (<1500 chars) self-contained JSON object carrying the north-star
    # number, the flagship per-kernel rates, both measured ceilings,
    # parity, and every fired flag.
    flags = sorted(detail.get('peak_probe_disagreement', {}))
    if _SLOPE_FALLBACKS:
        flags.append('timing_slope_fallback')
    if degraded:
        flags.append('backend_degraded')
    summary_keys = (
        'nlmeans_mpix_s', 'nlmeans_r2_mpix_s', 'omnibus_mpix_s',
        'omnibus_fast_mpix_s', 'omnibus_long_device_mpix_s',
        'omnibus_k200_device_mpix_s', 'boxcar_mpix_s',
        'gaussian_mpix_s', 'reproject_device_mpix_s',
        'coregister_device_mpix_s', 'tile_pipeline_mpix_s',
        'pipeline_forward_mpix_s', 'device_hbm_gbps_measured',
        'device_dma_gbps_measured', 'device_vpu_tflops_measured',
        'change_map_mismatch_rate', 'omnibus_fast_vs_exact_mismatch',
        'omnibus_exact_wall_ratio', 'coregister_shift_err_px',
        'cpu_1core_mpix_s')
    compact = {
        'metric': result['metric'],
        'value': result['value'],
        'unit': 'Mpix/s',
        'vs_baseline': result['vs_baseline'],
        'summary': {k: detail[k] for k in summary_keys
                    if k in detail},
        'flags': flags,
        'error_keys': sorted(detail.get('errors', {}))[:10],
        'backend': backend,
    }
    line = json.dumps(compact)
    if len(line) > 1500:                 # hard bound: never truncate
        compact.pop('error_keys', None)
        line = json.dumps(compact)
    print(line)
    return result


def _hard_exit(code):
    """Exit with a DETERMINISTIC status: results are already printed
    and flushed; a background placement probe blocked on a loaded
    remote service must not turn a finished run into a hang or a
    teardown abort (BENCH_r01 was voided by exactly one stray rc)."""
    import sys
    sys.stdout.flush()
    sys.stderr.flush()
    try:
        from nd_tpu.ops.conv import _placement
        _placement._join_probe(timeout=15.0)
    except Exception:
        pass
    os._exit(code)


if __name__ == '__main__':
    try:
        main()
    except Exception as exc:   # last-resort: emit a parsable line
        print(json.dumps({
            'metric': 'Mpix/s/chip: NLMeans + OmnibusTest on S1 cube; '
                      'change-map parity <=1e-5',
            'value': None, 'unit': 'Mpix/s', 'vs_baseline': None,
            'detail': {'fatal': str(exc).splitlines()[0][:500]}}))
        _hard_exit(1)
    _hard_exit(0)
