"""N-dimensional convolution on TPU via XLA, with scipy-compatible edge
handling.

Replaces the reference's delegation to ``scipy.ndimage.convolve`` /
``gaussian_filter`` (/root/reference/nd/filters.py:256-267, 365-378)
with device kernels:

  - edge mode 'reflect' here matches scipy.ndimage's default 'reflect'
    (= numpy.pad 'symmetric': the edge sample is repeated),
  - the kernel is flipped before correlation (true convolution), exactly
    like scipy.ndimage.convolve,
  - arbitrary subsets of axes are filtered; all other axes are batched.

Everything is jit-compatible; shapes are static.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['convolve', 'separable_convolve', 'gaussian_kernel1d',
           'uniform_sums', 'pad_reflect']

# Filtered-axis sizes are rounded up to a multiple of this before the
# device convolution (and cropped after): distinct ragged shapes then
# share compiled executables. 64 divides the TPU lane/sublane tiles and
# keeps the worst-case compute overhead small.
_SHAPE_BUCKET = 64

_SCIPY_TO_NP_PAD = {
    'reflect': 'symmetric',   # scipy.ndimage 'reflect' repeats the edge
    'mirror': 'reflect',      # scipy.ndimage 'mirror' excludes the edge
    'nearest': 'edge',
    'wrap': 'wrap',
    'constant': 'constant',
}


def pad_reflect(arr, pad_width, mode='reflect', cval=0.0):
    """Pad with scipy.ndimage edge-mode names."""
    np_mode = _SCIPY_TO_NP_PAD[mode]
    kwargs = {'constant_values': cval} if np_mode == 'constant' else {}
    return jnp.pad(arr, pad_width, mode=np_mode, **kwargs)


def _conv_valid(arr, kernel, axes):
    """'valid' correlation of ``arr`` with ``kernel`` over ``axes``.

    All other axes are treated as batch. ``kernel`` has ``len(axes)``
    dims.
    """
    ndim = arr.ndim
    axes = tuple(axes)
    other = tuple(i for i in range(ndim) if i not in axes)
    perm = other + axes
    a = jnp.transpose(arr, perm)
    batch_shape = a.shape[:len(other)]
    spatial_shape = a.shape[len(other):]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    a = a.reshape((B, 1) + spatial_shape)

    k = kernel.reshape((1, 1) + kernel.shape).astype(a.dtype)
    dn = lax.conv_dimension_numbers(
        a.shape, k.shape,
        ('NC' + ''.join(chr(ord('0') + i) for i in range(len(axes))),
         'IO' + ''.join(chr(ord('0') + i) for i in range(len(axes))),
         'NC' + ''.join(chr(ord('0') + i) for i in range(len(axes)))))
    out = lax.conv_general_dilated(
        a, k, window_strides=(1,) * len(axes), padding='VALID',
        dimension_numbers=dn,
        preferred_element_type=a.dtype)
    out_spatial = out.shape[2:]
    out = out.reshape(batch_shape + out_spatial)
    inv_perm = np.argsort(perm)
    return jnp.transpose(out, inv_perm)


def convolve(arr, kernel, axes=None, mode='reflect', cval=0.0):
    """Convolve ``arr`` with ``kernel`` along ``axes``.

    Matches ``scipy.ndimage.convolve`` semantics (kernel flip, origin at
    ``size // 2``, default 'reflect' boundary) on the TPU.

    Parameters
    ----------
    arr : array (numpy or jax)
    kernel : array with ``len(axes)`` dims
    axes : tuple of int, optional
        Axes to filter (default: all).
    mode : str, optional
        scipy.ndimage boundary mode (default 'reflect').
    """
    arr = jnp.asarray(arr)
    kernel = jnp.asarray(kernel)
    if axes is None:
        axes = tuple(range(arr.ndim))
    axes = tuple(int(a) % arr.ndim for a in axes)
    if kernel.ndim != len(axes):
        raise ValueError('kernel must have one dim per filtered axis')

    if jnp.iscomplexobj(arr):
        re = convolve(arr.real, kernel, axes, mode, cval)
        im = convolve(arr.imag, kernel, axes, mode, cval)
        return re + 1j * im

    # scipy convolve flips the kernel (true convolution)
    kernel = jnp.flip(kernel, axis=tuple(range(kernel.ndim)))

    # Pad so output size == input size with scipy's origin convention
    # (origin at size//2 before the flip).
    pad_width = [(0, 0)] * arr.ndim
    for ax, ks in zip(axes, kernel.shape):
        pad_width[ax] = ((ks - 1) // 2, ks // 2)
    padded = pad_reflect(arr, pad_width, mode, cval)

    # Shape bucketing: round the filtered axes up to a multiple of
    # ``_SHAPE_BUCKET`` with zeros and crop the output back. The kept
    # output positions' windows span only real (boundary-padded)
    # samples, so results are unchanged — but ragged shapes (tile
    # grids with halos, odd edge tiles) now share one compiled
    # executable instead of paying a fresh XLA compile each (minutes
    # per shape on remote-compile backends).
    # round the LOGICAL size (not the halo-padded one): an aligned
    # input stays exactly as-is, and every size in the same 64-window
    # maps to the same executable
    trail = [(0, (-arr.shape[ax]) % _SHAPE_BUCKET) if ax in axes
             else (0, 0) for ax in range(arr.ndim)]
    if any(t for _, t in trail):
        bucketed = jnp.pad(padded, trail)
        out = _conv_valid(bucketed, kernel, axes)
        return out[tuple(slice(0, arr.shape[ax]) for ax in
                         range(arr.ndim))]
    return _conv_valid(padded, kernel, axes)


def gaussian_kernel1d(sigma, truncate=4.0, radius=None):
    """The exact 1-d kernel scipy.ndimage.gaussian_filter uses."""
    if radius is None:
        radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    if sigma == 0:
        phi = (x == 0).astype(np.float64)
    else:
        phi = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return phi / phi.sum()


def separable_convolve(arr, kernels, axes, mode='reflect', cval=0.0):
    """Apply a sequence of 1-d kernels along the given axes."""
    out = jnp.asarray(arr)
    for ax, k in zip(axes, kernels):
        k = jnp.asarray(k)
        if k.shape[0] == 1:
            continue
        out = convolve(out, k, axes=(ax,), mode=mode, cval=cval)
    return out


def uniform_sums(arr, sizes, axes):
    """Sliding-window sums ('valid') over the given axes.

    Used by the NLMeans patch-distance accumulation; implemented with
    ``lax.reduce_window`` which XLA lowers to an efficient TPU scan.
    """
    arr = jnp.asarray(arr)
    window = [1] * arr.ndim
    for ax, s in zip(axes, sizes):
        window[ax] = int(s)
    return lax.reduce_window(arr, jnp.array(0, arr.dtype), lax.add,
                             tuple(window), (1,) * arr.ndim, 'VALID')
