"""FFT-based image registration on device.

Replaces the reference's use of
``skimage.registration.phase_cross_correlation``
(/root/reference/nd/warp.py:1150) with a jnp.fft implementation
including the single-step upsampled-DFT subpixel refinement
(Guizar-Sicairos et al. 2008).
"""

from __future__ import annotations

import numpy as np

import jax

import jax.numpy as jnp

__all__ = ['phase_cross_correlation', 'fourier_shift', 'translate']


def _upsampled_dft(data, upsampled_region_size, upsample_factor,
                   axis_offsets, xp=jnp):
    """Matrix-multiply DFT on an upsampled grid around a region."""
    im2pi = 1j * 2 * np.pi
    dim_properties = list(zip(data.shape, upsampled_region_size,
                              axis_offsets))
    for (n_items, ups_size, ax_offset) in dim_properties[::-1]:
        kernel = ((xp.arange(ups_size) - ax_offset)[:, None]
                  * xp.fft.fftfreq(n_items, upsample_factor))
        kernel = xp.exp(-im2pi * kernel)
        data = xp.tensordot(kernel, data, axes=(1, -1))
    return data


def _fft_xp():
    """Array module for the registration FFTs: jnp when the default
    backend can lower an FFT, numpy otherwise. TPU backends commonly
    can't (UNIMPLEMENTED) — the reference runs skimage's FFTs on the
    host too (warp.py:1150), and registration is O(HW log HW) on tiny
    reference frames, so the host path costs nothing at cube scale."""
    return np if jax.default_backend() == 'tpu' else jnp


def phase_cross_correlation(src, ref, upsample_factor=1,
                            normalization='phase'):
    """Estimate the translation between two images.

    Returns the (row, col) shift that must be applied to ``src`` to
    register it onto ``ref`` — same convention (and same default
    ``normalization='phase'``, i.e. the cross-power spectrum is
    whitened before the inverse transform) as skimage >= 0.19, which
    the reference calls at warp.py:1150. Phase normalization is what
    keeps registration robust when low-frequency energy dominates —
    e.g. a smooth brightness gradient across the scene. Pass
    ``normalization=None`` for plain cross-correlation.
    """
    xp = _fft_xp()
    src = xp.asarray(np.asarray(src))
    ref = xp.asarray(np.asarray(ref))
    src_f = xp.fft.fft2(src)
    ref_f = xp.fft.fft2(ref)
    image_product = src_f * xp.conj(ref_f)
    if normalization == 'phase':
        eps = np.finfo(np.dtype(str(image_product.real.dtype))).eps
        image_product = image_product / xp.maximum(
            xp.abs(image_product), 100 * eps)
    elif normalization is not None:
        raise ValueError('unknown normalization %r' % normalization)
    cross_correlation = xp.fft.ifft2(image_product)
    A = xp.abs(cross_correlation)
    maxima = xp.unravel_index(xp.argmax(A), A.shape)
    shape = src.shape
    midpoints = xp.asarray([int(np.fix(s / 2)) for s in shape])
    shifts = xp.stack([m.astype(xp.float64) for m in maxima])
    shifts = xp.where(shifts > midpoints,
                      shifts - xp.asarray(shape, shifts.dtype),
                      shifts)

    if upsample_factor > 1:
        # refine around the integer peak with an upsampled DFT
        upsample_factor = float(upsample_factor)
        upsampled_region_size = int(np.ceil(upsample_factor * 1.5))
        dftshift = np.fix(upsampled_region_size / 2.0)
        shifts = xp.round(shifts * upsample_factor) / upsample_factor
        sample_region_offset = dftshift - shifts * upsample_factor
        correlation = _upsampled_dft(
            xp.conj(image_product),
            [upsampled_region_size] * 2,
            upsample_factor, sample_region_offset, xp=xp).conj()
        A = xp.abs(correlation)
        maxima = xp.unravel_index(xp.argmax(A), A.shape)
        maxima = xp.stack([m.astype(xp.float64) for m in maxima]) \
            - dftshift
        shifts = shifts + maxima / upsample_factor

    return jnp.asarray(np.asarray(shifts))


def fourier_shift(img, shift):
    """Shift an image by (row, col) via the Fourier shift theorem.
    Runs on the host when the device backend has no FFT."""
    xp = _fft_xp()
    img = xp.asarray(np.asarray(img))
    f = xp.fft.fft2(img)
    fy = xp.fft.fftfreq(img.shape[0])[:, None]
    fx = xp.fft.fftfreq(img.shape[1])[None, :]
    phase = xp.exp(-2j * np.pi * (shift[0] * fy + shift[1] * fx))
    return jnp.asarray(np.asarray(xp.real(xp.fft.ifft2(f * phase))))


def _catmull_rom_taps(t):
    """4-tap Catmull-Rom weights for fractional offset t in [0, 1)."""
    t = float(t)
    return np.array([
        (-t ** 3 + 2 * t ** 2 - t) / 2,
        (3 * t ** 3 - 5 * t ** 2 + 2) / 2,
        (-3 * t ** 3 + 4 * t ** 2 + t) / 2,
        (t ** 3 - t ** 2) / 2,
    ])


def _shift_axis_cubic(img, shift, axis):
    """Shift one axis by a constant amount with cubic interpolation.

    A pure translation has the same fractional phase everywhere, so
    the cubic resampling reduces to an integer shift + separable 4-tap
    convolution — no gathers (which lower poorly on TPU).
    """
    n = int(np.floor(shift))
    t = float(shift) - n
    size = img.shape[axis]

    # integer part: slice with edge padding
    pad = [(0, 0)] * img.ndim
    if n >= 0:
        pad[axis] = (0, n)
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(n, n + size)
    else:
        pad[axis] = (-n, 0)
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(0, size)
    shifted = jnp.pad(img, pad, mode='edge')[tuple(sl)]

    if t == 0.0:
        return shifted
    # fractional part: taps at offsets [-1, 0, 1, 2]
    taps = _catmull_rom_taps(t)
    padded = jnp.pad(shifted, [(1, 2) if i == axis else (0, 0)
                               for i in range(img.ndim)], mode='edge')
    out = jnp.zeros_like(shifted)
    for k in range(4):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(k, k + size)
        out = out + jnp.asarray(taps[k], img.dtype) * padded[tuple(sl)]
    return out


def translate(img, translation, method='cubic'):
    """Resample ``img`` shifted by ``translation = (dx, dy)``.

    output[i, j] = input[i + dy, j + dx] — matching
    ``skimage.transform.warp(img, AffineTransform(translation))``.
    'cubic' (default, Catmull-Rom — the reference coregisters with
    order-3 interpolation) runs as a separable 4-tap convolution;
    'bilinear'/'nearest' fall back to the gather sampler. In the
    gather modes, out-of-frame and non-finite source pixels (the
    sampler's framework-wide contract maps inf contributors to NaN)
    fill with 0.
    """
    img = jnp.asarray(img)
    if method == 'cubic':
        out = _shift_axis_cubic(img, float(translation[1]), img.ndim - 2)
        out = _shift_axis_cubic(out, float(translation[0]), img.ndim - 1)
        return out
    from .interp import map_coordinates
    H, W = img.shape[-2:]
    ii = jnp.arange(H, dtype=jnp.float64)[:, None] + translation[1]
    jj = jnp.arange(W, dtype=jnp.float64)[None, :] + translation[0]
    rows = jnp.broadcast_to(ii, (H, W))
    cols = jnp.broadcast_to(jj, (H, W))
    out = map_coordinates(img, rows, cols, method=method, cval=np.nan)
    return jnp.nan_to_num(out, nan=0.0)
