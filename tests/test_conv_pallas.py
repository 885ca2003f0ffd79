"""Fused separable-convolution Pallas kernel (interpret mode on CPU;
the same code path runs compiled on TPU — tools/tpu_smoke.py gates it
on hardware)."""

import functools

import numpy as np
import pytest
from scipy import ndimage

from nd_tpu.ops.conv_pallas import (separable_convolve_pallas,
                                    try_fused_separable)


@pytest.mark.parametrize('shape', [(33, 47), (16, 130, 3),
                                   (20, 24, 5, 4)])
@pytest.mark.parametrize('mode', ['reflect', 'mirror', 'nearest',
                                  'constant', 'wrap'])
def test_fused_separable_matches_scipy(shape, mode):
    modes = ['reflect', 'mirror', 'nearest', 'constant', 'wrap']
    rng = np.random.RandomState(1000 * sum(shape)
                                + modes.index(mode))
    a = rng.rand(*shape).astype(np.float32)
    k0 = rng.rand(5)
    k1 = rng.rand(4)               # even tap count: asymmetric halo
    cval = 0.7 if mode == 'constant' else 0.0
    kk = np.multiply.outer(k0, k1)
    ref = ndimage.convolve(
        a.astype(np.float64),
        kk.reshape(kk.shape + (1,) * (a.ndim - 2)), mode=mode,
        cval=cval)
    got = np.asarray(separable_convolve_pallas(
        a, [(0, np.flip(k0)), (1, np.flip(k1))], mode=mode,
        cval=cval, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_fused_single_axis_and_uniform():
    rng = np.random.RandomState(3)
    a = rng.rand(14, 40, 2).astype(np.float32)
    k = rng.rand(5)
    ref = ndimage.convolve1d(a.astype(np.float64), k, axis=1,
                             mode='reflect')
    got = np.asarray(separable_convolve_pallas(
        a, [(1, np.flip(k))], mode='reflect', interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    k3 = np.ones(3) / 3            # uniform: sum-then-scale path
    ref = ndimage.convolve1d(ndimage.convolve1d(
        a.astype(np.float64), k3, axis=0, mode='reflect'), k3,
        axis=1, mode='reflect')
    got = np.asarray(separable_convolve_pallas(
        a, [(0, k3), (1, k3)], mode='reflect', interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize('shape,ks,mode', [
    ((20, 24, 6), (3, 3, 3), 'reflect'),      # full 3-D window
    ((16, 130, 5, 2), (5, 4, 3), 'nearest'),  # batch + even taps
    ((10, 14, 8, 3), (3, 1, 7), 'wrap'),      # no axis-1 taps
    ((12, 16, 7), (1, 3, 5), 'constant'),     # no axis-0 taps
])
def test_fused_three_axis_matches_scipy(shape, ks, mode):
    """Spatio-temporal separable kernels (BASELINE's SST configs) run
    the temporal taps on the tile's leading axis in the same pass."""
    rng = np.random.RandomState(sum(shape) + sum(ks))
    a = rng.rand(*shape).astype(np.float32)
    k0, k1, k2 = [rng.rand(n) for n in ks]
    cval = 0.4 if mode == 'constant' else 0.0
    kk = np.multiply.outer(np.multiply.outer(k0, k1), k2)
    ref = ndimage.convolve(
        a.astype(np.float64),
        kk.reshape(kk.shape + (1,) * (a.ndim - 3)), mode=mode,
        cval=cval)
    taps = [(i, np.flip(k)) for i, k in [(0, k0), (1, k1), (2, k2)]
            if len(k) > 1]
    scale = np.prod([k[0] for k in (k0, k1, k2) if len(k) == 1])
    taps[0] = (taps[0][0], taps[0][1] * scale)
    got = np.asarray(separable_convolve_pallas(
        a, taps, mode=mode, cval=cval, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_separable_three_axis_dispatch(monkeypatch):
    """GaussianFilter-style separable_convolve over (y, x, time)
    routes all three axes through ONE fused call."""
    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import gaussian_kernel1d, separable_convolve

    rng = np.random.RandomState(9)
    a = jnp.asarray(rng.rand(24, 30, 8, 2).astype(np.float32))
    g = gaussian_kernel1d(1.0)
    gt = gaussian_kernel1d(0.8)
    ref = np.asarray(separable_convolve(a, [g, g, gt],
                                        axes=(0, 1, 2)))

    calls = []
    orig = cpal.separable_convolve_pallas

    def spy(arr, taps, **kw):
        calls.append(sorted(ax for ax, _ in taps))
        kw['interpret'] = True
        return orig(arr, taps, **kw)

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    monkeypatch.setattr(cpal, 'separable_convolve_pallas', spy)
    got = np.asarray(separable_convolve(a, [g, g, gt],
                                        axes=(0, 1, 2)))
    assert calls == [[0, 1, 2]]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_try_fused_folds_length1_factor_scale():
    """A (1, 3) kernel factorizes to [scale], [taps]; the scale must
    survive (length-1 factors are not simply droppable)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(4)
    a = rng.rand(12, 30).astype(np.float32)
    taps = np.array([0.2, 0.5, 0.3])
    ref = ndimage.convolve1d(a.astype(np.float64), 2.0 * taps[::-1],
                             axis=1, mode='reflect')
    got = try_fused_separable(
        jnp.asarray(a), [(0, np.array([2.0])), (1, taps)],
        'reflect', 0.0, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5,
                               atol=2e-6)


def test_convolve_dispatch_uses_fused_kernel(monkeypatch):
    """convolve() on a device f32 array with a separable kernel
    routes through the fused kernel and matches the XLA result."""
    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import convolve

    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(32, 40, 3, 2).astype(np.float32))
    k = np.ones((3, 3), np.float64) / 9

    ref = np.asarray(convolve(a, k, axes=(0, 1), mode='reflect'))

    calls = []
    orig = cpal.rowfused_convolve

    def spy(arr, taps, **kw):
        calls.append([ax for ax, _ in taps])
        kw['interpret'] = True
        return orig(arr, taps, **kw)

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    monkeypatch.setattr(cpal, 'rowfused_convolve', spy)
    got = np.asarray(convolve(a, k, axes=(0, 1), mode='reflect'))
    assert calls == [[0, 1]]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_separable_convolve_dispatch_uses_fused_kernel(monkeypatch):
    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import (gaussian_kernel1d,
                                 separable_convolve)

    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.rand(24, 36, 4).astype(np.float32))
    g = gaussian_kernel1d(1.2)

    ref = np.asarray(separable_convolve(a, [g, g], axes=(0, 1)))

    calls = []
    orig = cpal.rowfused_convolve

    def spy(arr, taps, **kw):
        calls.append([ax for ax, _ in taps])
        kw['interpret'] = True
        return orig(arr, taps, **kw)

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    monkeypatch.setattr(cpal, 'rowfused_convolve', spy)
    got = np.asarray(separable_convolve(a, [g, g], axes=(0, 1)))
    assert calls == [[0, 1]]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_fused_gate_rejects_empty_and_oversized_batch(monkeypatch):
    """Empty arrays and batch stacks whose minimum tile already
    exceeds VMEM must fall through to the XLA path (returning None),
    never reach pallas_call."""
    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import convolve

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    taps = [(0, np.ones(3) / 3), (1, np.ones(3) / 3)]
    # zero-size batch axis: the fused path used to ZeroDivisionError
    empty = jnp.zeros((8, 130, 0), jnp.float32)
    assert try_fused_separable(empty, taps, 'reflect', 0.0) is None
    out = convolve(empty, np.ones((3, 3)) / 9, axes=(0, 1))
    assert out.shape == (8, 130, 0)
    # collapsed batch too deep for the smallest tile
    deep = jnp.zeros((8, 128, 256, 4), jnp.float32)
    assert try_fused_separable(deep, taps, 'reflect', 0.0) is None


def test_fused_dispatch_inside_jit_with_jnp_kernel(monkeypatch):
    """The bench path: convolve/separable_convolve called INSIDE jit
    with a concrete jnp kernel must still take the fused path (the
    flipped kernel is a tracer there; factorization reads the
    pre-flip concrete values)."""
    import jax
    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import (convolve, gaussian_kernel1d,
                                 separable_convolve)

    rng = np.random.RandomState(8)
    a = jnp.asarray(rng.rand(40, 48, 3, 2).astype(np.float32))
    k3 = jnp.ones((3, 3), jnp.float32) / 9
    g1 = jnp.asarray(gaussian_kernel1d(1.1), jnp.float32)

    ref = np.asarray(jax.jit(
        lambda x: convolve(x, k3, axes=(0, 1), mode='reflect'))(a))
    ref_g = np.asarray(jax.jit(
        lambda x: separable_convolve(x, [g1, g1], axes=(0, 1)))(a))

    calls = []
    orig = cpal.rowfused_convolve

    def spy(arr, taps, **kw):
        calls.append([ax for ax, _ in taps])
        kw['interpret'] = True
        return orig(arr, taps, **kw)

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    monkeypatch.setattr(cpal, 'rowfused_convolve', spy)
    got = np.asarray(jax.jit(
        lambda x: convolve(x, k3, axes=(0, 1), mode='reflect'))(a))
    got_g = np.asarray(jax.jit(
        lambda x: separable_convolve(x, [g1, g1], axes=(0, 1)))(a))
    assert calls == [[0, 1], [0, 1]], calls
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-6, atol=1e-7)


def test_fused_kernel_failure_degrades_to_xla(monkeypatch):
    """A raising Pallas launch falls back to the identical XLA
    shift-add path through the shared guard."""
    import warnings

    import jax.numpy as jnp

    import nd_tpu.ops.conv_pallas as cpal
    from nd_tpu.ops.conv import convolve
    from nd_tpu.ops.pallas_guard import reset_pallas_strikes

    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.rand(16, 24).astype(np.float32))
    k = np.ones((3, 3), np.float64) / 9
    ref = np.asarray(convolve(a, k, axes=(0, 1)))

    import jax as _jax

    def boom(*args, **kw):
        raise _jax.errors.JaxRuntimeError('INTERNAL: TPU backend '
                                          'error (simulated)')

    monkeypatch.setattr(cpal, 'supports_pallas', lambda: True)
    monkeypatch.setattr(cpal, 'separable_convolve_pallas', boom)
    monkeypatch.setattr(cpal, 'rowfused_convolve', boom)
    reset_pallas_strikes()
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        got = np.asarray(convolve(a, k, axes=(0, 1)))
    reset_pallas_strikes()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_vmem_model_covers_the_measured_gaussian_oom():
    """Regression: the 13-tap gaussian over a (1024, 1024, 12) cube
    OOM'd Mosaic's 16 MB VMEM stack (28.04 MB measured) because the
    tile chooser budgeted only the DMA'd input tile, not the unrolled
    shift-add temps. The live-bytes model must (a) reproduce the
    measured failure at the tile the old chooser picked and (b) admit
    a tile under budget for the same kernel."""
    from nd_tpu.ops.conv_pallas import (_VMEM_BUDGET, _halo,
                                        _live_tile_bytes)
    pads = {0: (6, 6), 1: (6, 6), 2: (0, 0)}
    kcounts = (13, 13, 0)
    # the old chooser picked (ty=32, tx=1024): Mosaic allocated
    # 28.04 MB there — the model must flag it
    old = _live_tile_bytes(1, 12, pads, kcounts, 32, 1024)
    assert old > 16 << 20
    assert abs(old - 28.04e6) / 28.04e6 < 0.15   # tracks the measurement
    # the chooser's loop (tx by -128 at ty=8, then ty halving) must
    # land on an admissible tile
    tx = 1024
    while tx > 128 and _live_tile_bytes(1, 12, pads, kcounts, 8, tx) \
            > _VMEM_BUDGET:
        tx -= 128
    ty = 64
    while ty > 8 and _live_tile_bytes(1, 12, pads, kcounts, ty, tx) \
            > _VMEM_BUDGET:
        ty //= 2
    assert _live_tile_bytes(1, 12, pads, kcounts, ty, tx) \
        <= _VMEM_BUDGET
    assert tx >= 128 and ty >= 8
    # small kernels keep their big tiles: 3-tap boxcar on the same
    # cube still admits a (>=32, 1024) tile (perf guard)
    pads3 = {0: (1, 1), 1: (1, 1), 2: (0, 0)}
    assert _live_tile_bytes(1, 12, pads3, (3, 3, 0), 32, 1024) \
        <= _VMEM_BUDGET


def test_gaussian_13tap_fused_interpret_parity():
    """The exact kernel family that OOM'd on the chip, at a reduced
    spatial extent: the fused Pallas path (interpret) must equal the
    XLA shift-add composition bit-for-bit."""
    from nd_tpu.ops.conv import gaussian_kernel1d
    from nd_tpu.ops.conv_pallas import try_fused_separable
    g = np.asarray(gaussian_kernel1d(1.5), np.float32)[::-1]
    rng = np.random.RandomState(0)
    import jax.numpy as jnp
    cube = jnp.asarray(rng.rand(48, 160, 12).astype(np.float32))
    out = try_fused_separable(cube, [(0, g), (1, g)], 'reflect', 0.0,
                              interpret=True)
    assert out is not None
    from nd_tpu.ops.conv import _shift_add_valid, pad_reflect
    ref = pad_reflect(cube, ((6, 6), (6, 6), (0, 0)), 'reflect', 0.0)
    ref = _shift_add_valid(ref, g, 0)
    ref = _shift_add_valid(ref, g, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_rowfused_parity_matrix():
    """Row-fused kernel vs the XLA shift-add oracle across modes,
    weighted/uniform taps, single-axis cases, and shapes that exercise
    BOTH pad strategies (the combined single pad and the narrow-extent
    two-step fallback)."""
    import jax.numpy as jnp

    from nd_tpu.ops.conv import (_shift_add_valid, gaussian_kernel1d,
                                 pad_reflect)
    from nd_tpu.ops.conv_pallas import (_rowfused_applicable,
                                        rowfused_convolve)

    rng = np.random.RandomState(0)
    g13 = np.asarray(gaussian_kernel1d(1.5))[::-1]
    cases = [
        ((40, 137, 5, 3), [(0, np.ones(3) / 3), (1, np.ones(3) / 3)],
         'reflect'),                      # narrow x: two-step pad
        ((40, 137, 5, 3), [(0, np.array([.2, .5, .3])),
                           (1, np.array([.1, .6, .3]))], 'mirror'),
        ((33, 70, 4), [(1, np.ones(5) / 5)], 'nearest'),
        ((64, 128), [(0, np.array([.25, .5, .25]))], 'wrap'),
        ((17, 257, 3), [(0, np.array([.3, .4, .3])),
                        (1, np.ones(7) / 7)], 'constant'),
        ((96, 300, 2, 2), [(0, g13), (1, g13)], 'reflect'),  # 13-tap
    ]
    for shape, taps, mode in cases:
        x = rng.rand(*shape).astype(np.float32)
        active = [(ax, np.asarray(t, np.float64)) for ax, t in taps]
        geom = _rowfused_applicable(x, active, mode)
        assert geom is not None, (shape, taps)
        got = np.asarray(rowfused_convolve(
            jnp.asarray(x), active, mode=mode, ty=geom[0],
            tc=geom[1], interpret=True))
        pad_width = [(0, 0)] * x.ndim
        for ax, t in active:
            k = len(t)
            pad_width[ax] = ((k - 1) // 2, k // 2)
        ref = pad_reflect(jnp.asarray(x), pad_width, mode, 0.0)
        for ax, t in active:
            ref = _shift_add_valid(ref, t, ax)
        # uniform taps are bit-exact; weighted may differ by ~1-2 ulp
        # of FMA contraction
        np.testing.assert_allclose(got, np.asarray(ref), rtol=3e-7,
                                   atol=3e-7)


def test_nlmeans_chooser_regression_r2f2():
    """The r=2/f=2 bench-cube geometry must stay at wide tiles (the
    round-2 inverse-offset budget picked 8x128, whose 4x halo read
    overhead was the nlmeans_r2 regression) while staying inside the
    pair-aware VMEM model that matches the measured Mosaic
    compile/fail boundary."""
    from nd_tpu.ops.nlmeans_pallas import (_VMEM_NL_BUDGET,
                                           _live_tile_bytes)
    # bench cube: (1024, 1024, 12, 4), r=2, f=2 -> p=4, hp=(4, 64),
    # 12 unordered offset pairs
    args = dict(nt=12, nv=4, p_t=0, hp_y=4, hp_x=64, n_pairs=12)
    # measured on-chip: 16x512 fails remote compile, 16x256/8x512 build
    assert _live_tile_bytes(ty=16, tx=512, **args) > _VMEM_NL_BUDGET
    assert _live_tile_bytes(ty=16, tx=256, **args) <= _VMEM_NL_BUDGET
    assert _live_tile_bytes(ty=8, tx=512, **args) <= _VMEM_NL_BUDGET
    # r=1 headline keeps its 16x512 tile
    assert _live_tile_bytes(ty=16, tx=512, nt=12, nv=4, p_t=0,
                            hp_y=4, hp_x=64, n_pairs=4) \
        <= _VMEM_NL_BUDGET


def test_padless_parity_matrix():
    """Padless kernel vs the XLA shift-add oracle: every supported
    mode, uniform/weighted taps, single-axis cases, edge slabs on both
    boundaries, 13-tap gaussian, and a batchless 2-D input."""
    import jax.numpy as jnp

    from nd_tpu.ops.conv import (_shift_add_valid, gaussian_kernel1d,
                                 pad_reflect)
    from nd_tpu.ops.conv_pallas import (_padless_geometry,
                                        padless_convolve)

    rng = np.random.RandomState(3)
    g13 = np.asarray(gaussian_kernel1d(1.5))[::-1]
    cases = [
        ((64, 128, 5, 3), [(0, np.ones(3) / 3), (1, np.ones(3) / 3)],
         'reflect'),
        ((64, 128, 5, 3), [(0, np.array([.2, .5, .3])),
                           (1, np.array([.1, .6, .3]))], 'mirror'),
        ((40, 256, 4), [(1, np.ones(5) / 5)], 'nearest'),
        ((64, 128), [(0, np.array([.25, .5, .25]))], 'constant'),
        ((48, 128, 3), [(0, np.array([.3, .4, .3])),
                        (1, np.ones(7) / 7)], 'constant'),
        ((96, 128, 2, 2), [(0, g13), (1, g13)], 'reflect'),
        ((64, 128, 2), [(0, np.ones(4) / 4), (1, np.ones(2) / 2)],
         'mirror'),                         # even taps: lo != hi
    ]
    for shape, taps, mode in cases:
        x = rng.rand(*shape).astype(np.float32)
        active = [(ax, np.asarray(t, np.float64)) for ax, t in taps]
        n2 = shape[2] if len(shape) > 2 else 1
        b = int(np.prod(shape[3:])) if len(shape) > 3 else 1
        kc = {ax: len(t) for ax, t in active}
        geom = _padless_geometry(shape[0], shape[1], n2, b,
                                 kc.get(0, 0), kc.get(1, 0))
        assert geom is not None, (shape, taps)
        got = np.asarray(padless_convolve(
            jnp.asarray(x), active, mode=mode, cval=0.25,
            ty=geom[0], tc=geom[1], interpret=True))
        pad_width = [(0, 0)] * x.ndim
        for ax, t in active:
            k = len(t)
            pad_width[ax] = ((k - 1) // 2, k // 2)
        ref = pad_reflect(jnp.asarray(x), pad_width, mode, 0.25)
        for ax, t in active:
            ref = _shift_add_valid(ref, t, ax)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=3e-7,
                                   atol=3e-7, err_msg=str((shape,
                                                           mode)))


def test_padless_geometry_rejects():
    from nd_tpu.ops.conv_pallas import _padless_geometry
    # ragged width -> inadmissible
    assert _padless_geometry(64, 137, 4, 3, 3, 3) is None
    # no ty divides 100 with enough halo headroom... 100 % ty != 0
    # for every candidate
    assert _padless_geometry(100, 128, 4, 3, 3, 3) is None
    # admissible bench-like case picks a wide tile
    geom = _padless_geometry(1024, 1024, 12, 4, 3, 3)
    assert geom is not None and geom[0] >= 32
