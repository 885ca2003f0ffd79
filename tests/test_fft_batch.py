"""Batched registration (VERDICT round-1 item 5): one phase-correlation
pass over all time steps + one jitted translate over the stacked cube,
replacing the O(k*V) per-step host loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from nd_tpu.ops.fft import (phase_cross_correlation,
                            phase_cross_correlation_batch, translate,
                            translate_batch)


def _shifted_stack(seed=0, n=4, h=48, w=56):
    rng = np.random.RandomState(seed)
    base = rng.rand(h + 16, w + 16)
    # smooth the noise so subpixel interpolation is meaningful
    k = np.ones((5, 5)) / 25
    from scipy.ndimage import convolve
    base = convolve(base, k)
    shifts = [(0, 0), (2, -3), (-1, 4), (3, 2)][:n]
    imgs = np.stack([base[8 - dy:8 - dy + h, 8 - dx:8 - dx + w]
                     for dy, dx in shifts])
    return imgs, np.array(shifts, float)


def test_batch_matches_single_image_calls():
    imgs, _ = _shifted_stack()
    ref = imgs[0]
    batch = np.asarray(phase_cross_correlation_batch(
        imgs, ref, upsample_factor=10))
    for i in range(len(imgs)):
        single = np.asarray(phase_cross_correlation(
            imgs[i], ref, upsample_factor=10))
        np.testing.assert_allclose(batch[i], single, atol=1e-9)


def test_batch_recovers_known_shifts():
    imgs, true = _shifted_stack()
    est = np.asarray(phase_cross_correlation_batch(
        imgs, imgs[0], upsample_factor=20))
    # convention (same as the single-image function, asserted above):
    # est is the (row, col) displacement of src's content vs ref
    np.testing.assert_allclose(est, true, atol=0.25)


def test_translate_batch_matches_translate_interior():
    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 40, 44)
    trans = np.array([[0.0, 0.0], [1.5, -2.25], [-0.75, 3.0]])
    out = np.asarray(translate_batch(jnp.asarray(imgs),
                                     jnp.asarray(trans)))
    for i in range(3):
        ref = np.asarray(translate(jnp.asarray(imgs[i]),
                                   tuple(trans[i])))
        # the batched kernel clamps the combined (integer+tap) index
        # in one step, the static kernel in two — identical except on
        # the outermost border ring
        np.testing.assert_allclose(out[i][5:-5, 5:-5],
                                   ref[5:-5, 5:-5], atol=1e-10)


def test_translate_batch_host_twin_matches_device():
    from nd_tpu.ops.fft import (_shift_axis_cubic_host,
                                _translate_batch_device)
    rng = np.random.RandomState(4)
    imgs = rng.rand(3, 36, 40)
    trans = np.array([[0.5, -1.75], [2.0, 0.0], [-3.25, 1.5]])
    dev = np.asarray(_translate_batch_device(
        jnp.asarray(imgs), jnp.asarray(trans)))
    host = _shift_axis_cubic_host(
        _shift_axis_cubic_host(imgs, trans[:, 0], 2),
        trans[:, 1], 1)
    np.testing.assert_allclose(host, dev, atol=1e-12)


def test_translate_batch_zero_shift_is_identity():
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 24, 28)
    out = np.asarray(translate_batch(jnp.asarray(imgs),
                                     jnp.zeros((2, 2))))
    np.testing.assert_allclose(out, imgs, atol=1e-12)


def test_coregistration_residual_shift_below_02px():
    from nd_tpu.ops.fft import fourier_shift
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Coregistration

    ds = generate_test_dataset(dims={'y': 64, 'x': 64, 'time': 4})
    # subpixel registration needs band-limited content: a smoothed
    # base frame, then known fractional shifts injected per time step
    rng = np.random.RandomState(7)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.rand(64, 64), 2.5)
    shifts = [(0.0, 0.0), (1.5, -2.0), (-2.5, 0.5), (3.0, 3.0)]
    frames = np.stack([
        np.asarray(fourier_shift(base, (dy, dx)))
        for dy, dx in shifts])
    for v in list(ds.data_vars):
        ds[v] = (('time', 'y', 'x'), frames.copy())

    out = Coregistration(reference=0, upsampling=50).apply(ds)
    for t in range(1, 4):
        res = np.asarray(phase_cross_correlation(
            jnp.asarray(out['C11'].transpose(
                'time', 'y', 'x').values[t]),
            jnp.asarray(out['C11'].transpose(
                'time', 'y', 'x').values[0]),
            upsample_factor=50))
        assert np.abs(res).max() <= 0.2, (t, res)


def test_device_pcc_matches_host_path():
    """The jitted rfft-based device registration path reproduces the
    host path's shifts (same peak, same subpixel refinement)."""
    import jax.numpy as jnp
    from nd_tpu.ops.fft import (_pcc_batch_device_impl,
                                phase_cross_correlation_batch)
    rng = np.random.RandomState(11)
    ref = rng.rand(48, 64).astype(np.float32)
    # integer + subpixel shifted copies
    srcs = np.stack([np.roll(ref, (3, -5), axis=(0, 1)),
                     np.roll(ref, (-7, 2), axis=(0, 1)),
                     ref])
    host = np.asarray(phase_cross_correlation_batch(
        srcs, ref, upsample_factor=10))
    dev = np.asarray(_pcc_batch_device_impl(
        jnp.asarray(srcs), jnp.asarray(ref), 10, 'phase'))
    np.testing.assert_allclose(dev, host, atol=1e-3)
    np.testing.assert_allclose(host[0], [3, -5], atol=0.11)
    np.testing.assert_allclose(host[1], [-7, 2], atol=0.11)

    # odd extents exercise both parities of the Hermitian completion
    # (the refinement rebuilds the full spectrum from the rfft half)
    ref_o = rng.rand(47, 63).astype(np.float32)
    srcs_o = np.stack([np.roll(ref_o, (4, -6), axis=(0, 1)), ref_o])
    host_o = np.asarray(phase_cross_correlation_batch(
        srcs_o, ref_o, upsample_factor=10))
    dev_o = np.asarray(_pcc_batch_device_impl(
        jnp.asarray(srcs_o), jnp.asarray(ref_o), 10, 'phase'))
    np.testing.assert_allclose(dev_o, host_o, atol=1e-3)
    np.testing.assert_allclose(host_o[0], [4, -6], atol=0.11)
