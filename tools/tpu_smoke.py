#!/usr/bin/env python
"""TPU smoke suite: exercises every Pallas kernel and the matmul warp
on the REAL chip at tiny cached shapes and records a JSON artifact
(``TPUTEST_r{N}.json``) so the fused kernels are gated by a recorded
test run, not only by the benchmark (VERDICT round-1 item 4).

Checks (all small shapes, executables cached across runs):
  1. nlmeans: fused Pallas tile kernel == XLA offset-scan == numpy
     oracle (tests/reference_impls.py)
  2. change detection: exact device path (Pallas scan + f64 patch) ==
     XLA 'mixed' scan == native C++ reference
  3. fast f32 Pallas change kernel: decision agreement with 'mixed'
     away from the decision margin; 3b. long series (k > 48): the
     sequential-scan kernel + rescan reproduces 'mixed' exactly,
     incl. a burst column with many change points
  4. warp: separable matmul resample == gather sampler
  5. Pallas runtime guard: a simulated launch failure degrades to XLA
     with identical output on-device

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(out_path=None):
    t_start = time.time()
    import jax
    jax.config.update(
        'jax_compilation_cache_dir',
        os.environ.get('ND_TPU_COMPILE_CACHE',
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), '.jax_cache')))
    import jax.numpy as jnp

    import nd_tpu  # noqa: F401

    results = {'backend': jax.default_backend(),
               'checks': {}, 'ok': True}

    def record(name, fn):
        t0 = time.time()
        try:
            detail = fn() or {}
            results['checks'][name] = {
                'ok': True, 'seconds': round(time.time() - t0, 2),
                **detail}
        except Exception as e:  # noqa: BLE001 — artifact must emerge
            results['checks'][name] = {
                'ok': False, 'seconds': round(time.time() - t0, 2),
                'error': '%s: %s' % (type(e).__name__,
                                     str(e).splitlines()[0][:300])}
            results['ok'] = False

    on_tpu = jax.default_backend() == 'tpu'
    results['tpu'] = on_tpu

    rng = np.random.RandomState(0)

    # -- 1. NLMeans: pallas == xla == oracle ----------------------------
    def check_nlmeans():
        from nd_tpu.ops.nlmeans import nlmeans
        from nd_tpu.ops.nlmeans_pallas import (nlmeans_spatial_pallas,
                                               supports_pallas)
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), 'tests'))
        from reference_impls import nlmeans_oracle

        arr = rng.rand(24, 40, 2, 3).astype(np.float32)
        r, f, sigma, h = (1, 1, 0), (1, 1, 0), 0.8, 1.1
        oracle = nlmeans_oracle(arr, r, f, sigma, h, -1.0)
        xla = np.asarray(nlmeans(jnp.asarray(arr), r, f, sigma, h,
                                 -1.0))
        err_xla = float(np.abs(xla - oracle).max())
        detail = {'xla_vs_oracle_max_err': err_xla,
                  'pallas': bool(supports_pallas())}
        assert err_xla < 2e-5, err_xla
        if supports_pallas():
            pal = np.asarray(nlmeans_spatial_pallas(
                jnp.asarray(arr), r[:2], f[:2], sigma, h, -1.0))
            err_pal = float(np.abs(pal - oracle).max())
            detail['pallas_vs_oracle_max_err'] = err_pal
            assert err_pal < 2e-5, err_pal
            # full 3-D window (temporal radius): generalized kernel
            from nd_tpu.ops.nlmeans_pallas import nlmeans_pallas
            arr3 = rng.rand(24, 40, 5, 3).astype(np.float32)
            r3, f3 = (1, 1, 1), (1, 1, 1)
            xla3 = np.asarray(nlmeans(jnp.asarray(arr3), r3, f3,
                                      sigma, h, -1.0))
            pal3 = np.asarray(nlmeans_pallas(jnp.asarray(arr3), r3,
                                             f3, sigma, h, -1.0))
            err_3d = float(np.abs(pal3 - xla3).max())
            detail['pallas3d_vs_xla_max_err'] = err_3d
            assert err_3d < 2e-5, err_3d
        return detail

    record('nlmeans_parity', check_nlmeans)

    # -- 2. change: exact device == mixed == native ---------------------
    def check_change_exact():
        from nd_tpu.ops.change import (change_detection,
                                       change_detection_exact)
        vals = np.abs(rng.normal(1, 0.25, (16, 128, 8, 4))) \
            .astype(np.float32)
        vals[..., 1] *= 0.2
        vals[..., 2] *= 0.2
        vals[:, :, 4:, 0] *= 3.0
        mixed = np.asarray(change_detection(jnp.asarray(vals),
                                            alpha=0.99, n=9,
                                            stat_dtype='mixed'))
        exact = np.asarray(change_detection_exact(jnp.asarray(vals),
                                                  alpha=0.99, n=9))
        mism = float((exact != mixed).mean())
        detail = {'exact_vs_mixed_mismatch': mism,
                  'changes_found': int(mixed.sum())}
        assert mism == 0.0, mism
        assert mixed.any()
        try:
            from nd_tpu._native import change_detection_native
            native = change_detection_native(vals.astype(np.float64),
                                             0.99, n=9, nthreads=1)
            nm = float((mixed != native).mean())
            detail['mixed_vs_native_mismatch'] = nm
            assert nm == 0.0, nm
        except ImportError:
            detail['native'] = 'unavailable'
        return detail

    record('change_exact_parity', check_change_exact)

    # -- 3. fast f32 kernel: margin-aware agreement ---------------------
    def check_change_fast():
        from nd_tpu.ops.change import change_detection
        from nd_tpu.ops.change_pallas import (change_detection_pallas,
                                              supports_pallas)
        if not supports_pallas(8):
            return {'skipped': 'no pallas'}
        vals = np.abs(rng.normal(1, 0.25, (16, 128, 8, 4))) \
            .astype(np.float32)
        vals[..., 1] *= 0.2
        vals[..., 2] *= 0.2
        vals[:, :, 4:, 0] *= 3.0
        flags, margin = change_detection_pallas(
            jnp.asarray(vals), 0.99, n=9, return_margin=True)
        mixed = np.asarray(change_detection(jnp.asarray(vals),
                                            alpha=0.99, n=9,
                                            stat_dtype='mixed'))
        safe = np.asarray(margin) > 3e-4
        mism = float((np.asarray(flags) != mixed)[safe].mean())
        assert mism == 0.0, mism
        return {'fast_vs_mixed_mismatch_off_margin': mism,
                'near_margin_pixels': int((~safe).sum())}

    record('change_fast_margin', check_change_fast)

    # -- 3b. long series: sequential-scan kernel + rescan == mixed ------
    def check_change_long_series():
        from nd_tpu.ops.change import (change_detection,
                                       change_detection_exact)
        from nd_tpu.ops.change_pallas import (_K_MAX,
                                              supports_pallas_rescan)
        k = _K_MAX + 8
        if not supports_pallas_rescan(k):
            return {'skipped': 'no pallas'}
        vals = np.abs(rng.normal(1, 0.25, (8, 128, k, 4))) \
            .astype(np.float32)
        vals[..., 1] *= 0.2
        vals[..., 2] *= 0.2
        vals[:, :, k // 2:, 0] *= 3.0
        # one column with many change points: the scan kernel resolves
        # its full restart chain in one pass and must match exactly
        t = np.arange(k)
        burst = np.where((t // 3) % 2 == 0, 1.0, 6.0) \
            .astype(np.float32)
        vals[:, 0, :, 0] = burst
        vals[:, 0, :, 3] = burst
        vals[:, 0, :, 1] = 0.05
        vals[:, 0, :, 2] = 0.03
        mixed = np.asarray(change_detection(jnp.asarray(vals),
                                            alpha=0.99, n=9,
                                            stat_dtype='mixed'))
        exact = np.asarray(change_detection_exact(jnp.asarray(vals),
                                                  alpha=0.99, n=9))
        mism = float((exact != mixed).mean())
        assert mism == 0.0, mism
        assert int(mixed[:, 0].sum()) >= 8 * 6   # the burst column
        return {'k': k, 'long_exact_vs_mixed_mismatch': mism,
                'burst_changes': int(mixed[:, 0].sum())}

    record('change_long_series', check_change_long_series)

    # -- 3c. fused separable conv == XLA shift-add ----------------------
    def check_fused_sepconv():
        from nd_tpu.ops.conv import convolve
        from nd_tpu.ops.conv_pallas import (supports_pallas,
                                            try_fused_separable)
        if not supports_pallas():
            return {'skipped': 'no pallas'}
        a = jnp.asarray(rng.rand(96, 200, 3, 2).astype(np.float32))
        k = np.ones((3, 3), np.float64) / 9
        fused = try_fused_separable(
            a, [(0, np.ones(3) / 3), (1, np.ones(3) / 3)],
            'reflect', 0.0)
        assert fused is not None
        # reference: the pure XLA composition (pad + shift-add)
        import nd_tpu.ops.conv_pallas as cpal
        orig = cpal.supports_pallas
        cpal.supports_pallas = lambda: False
        try:
            ref = convolve(a, k, axes=(0, 1), mode='reflect')
        finally:
            cpal.supports_pallas = orig
        err = float(jnp.max(jnp.abs(fused - ref)))
        assert err < 2e-6, err
        # gaussian (asymmetric-length taps exercise the halo ring)
        from nd_tpu.ops.conv import gaussian_kernel1d
        g = gaussian_kernel1d(1.5)
        fused_g = try_fused_separable(
            a, [(0, np.flip(g)), (1, np.flip(g))], 'reflect', 0.0)
        cpal.supports_pallas = lambda: False
        try:
            from nd_tpu.ops.conv import separable_convolve
            ref_g = separable_convolve(a, [g, g], axes=(0, 1))
        finally:
            cpal.supports_pallas = orig
        err_g = float(jnp.max(jnp.abs(fused_g - ref_g)))
        assert err_g < 2e-6, err_g
        # spatio-temporal (3-axis) window: temporal taps ride the
        # tile's leading axis in the same pass
        gt = gaussian_kernel1d(0.8)
        fused_3 = try_fused_separable(
            a, [(0, np.flip(g)), (1, np.flip(g)), (2, np.flip(gt))],
            'reflect', 0.0)
        cpal.supports_pallas = lambda: False
        try:
            ref_3 = separable_convolve(a, [g, g, gt], axes=(0, 1, 2))
        finally:
            cpal.supports_pallas = orig
        err_3 = float(jnp.max(jnp.abs(fused_3 - ref_3)))
        assert err_3 < 1e-5, err_3
        return {'boxcar_max_err': err, 'gaussian_max_err': err_g,
                'spatiotemporal_max_err': err_3}

    record('fused_sepconv_parity', check_fused_sepconv)

    # -- 4. warp: matmul path == gather path ----------------------------
    def check_warp():
        from nd_tpu.ops.interp import (axis_weights, map_coordinates,
                                       matmul_resample)
        src = rng.rand(40, 56).astype(np.float32)
        rows = np.linspace(2.3, 36.7, 32)
        cols = np.linspace(1.1, 52.9, 48)
        wy, wym, vy = axis_weights(rows, 40, 'bilinear')
        wx, wxm, vx = axis_weights(cols, 56, 'bilinear')
        mm = np.asarray(matmul_resample(
            jnp.asarray(src[None]), jnp.asarray(wy),
            jnp.asarray(wym), jnp.asarray(wx), jnp.asarray(wxm),
            jnp.asarray(vy), jnp.asarray(vx),
            jnp.float32(np.nan), 4.0))[0]
        rr, cc = np.meshgrid(rows, cols, indexing='ij')
        gather = np.asarray(map_coordinates(
            jnp.asarray(src), jnp.asarray(rr), jnp.asarray(cc),
            method='bilinear', cval=np.nan))
        err = float(np.nanmax(np.abs(mm - gather)))
        nan_match = bool((np.isnan(mm) == np.isnan(gather)).all())
        assert err < 1e-5 and nan_match, (err, nan_match)
        return {'matmul_vs_gather_max_err': err,
                'nan_pattern_match': nan_match}

    record('warp_matmul_parity', check_warp)

    # -- 5. runtime guard degrades on-device ----------------------------
    def check_guard():
        import jax as _jax

        from nd_tpu.ops.pallas_guard import (reset_pallas_strikes,
                                             run_with_fallback)
        reset_pallas_strikes()
        x = jnp.asarray(rng.rand(8, 128).astype(np.float32))

        def boom(v):
            raise _jax.errors.JaxRuntimeError(
                'INTERNAL: TPU backend error (simulated)')

        def xla(v):
            return v * 2

        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            out = run_with_fallback(boom, xla, x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(x) * 2)
        reset_pallas_strikes()
        return {}

    record('pallas_guard_fallback', check_guard)

    results['total_seconds'] = round(time.time() - t_start, 1)
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, 'w') as fh:
            fh.write(line + '\n')
    return 0 if results['ok'] else 1


if __name__ == '__main__':
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
