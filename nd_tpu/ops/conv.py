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


def _shift_add_valid(arr, weights, axis):
    """'valid' correlation with a 1-d tap vector as unrolled
    shifted adds — pure VPU work.

    On TPU this beats ``conv_general_dilated`` twice over: measured
    1.8x faster for a 3-tap window (XLA fuses the adds into one
    bandwidth-bound pass), and full-f32 accurate — the TPU conv
    lowering multiplies in bf16 (~3e-3 absolute error on O(1) data,
    measured), while these are f32 VPU adds.
    """
    weights = np.asarray(weights, np.float64)
    n_out = arr.shape[axis] - len(weights) + 1
    uniform = np.allclose(weights, weights[0])

    def sl(i):
        key = [slice(None)] * arr.ndim
        key[axis] = slice(i, i + n_out)
        return arr[tuple(key)]

    out = None
    for i, w in enumerate(weights.tolist()):
        term = sl(i) if uniform \
            else sl(i) * jnp.asarray(w, arr.dtype)
        out = term if out is None else out + term
    if uniform and weights[0] != 1.0:
        out = out * jnp.asarray(weights[0], arr.dtype)
    return out


def _separable_factors(kernel):
    """1-d factors of a separable (rank-1) kernel, or None.

    The factors reproduce the kernel's outer product; 2-d kernels are
    tested via SVD, higher ranks only for the uniform (boxcar) case.
    """
    k = np.asarray(kernel, np.float64)
    if k.ndim == 1:
        return [k]
    if np.allclose(k, k.flat[0]):
        facs = [np.ones(n) for n in k.shape]
        facs[0] = facs[0] * k.flat[0]
        return facs
    if k.ndim == 2:
        u, s, vt = np.linalg.svd(k)
        if len(s) > 1 and s[1] <= 1e-7 * max(s[0], 1e-300):
            return [u[:, 0] * np.sqrt(s[0]), vt[0] * np.sqrt(s[0])]
    return None


_MAX_SHIFT_TAPS = 32


def _conv_core(padded, kernel, axes):
    """VALID filtering of ``padded`` along ``axes``: factorized
    shift-add for separable kernels (small tap counts), the general
    XLA convolution otherwise. ``kernel`` is already flipped."""
    try:
        k_np = np.asarray(kernel)
    except Exception:       # traced (data-dependent) kernel
        return _conv_valid(padded, kernel, axes)
    factors = _separable_factors(k_np)
    if factors is not None and \
            all(len(f) <= _MAX_SHIFT_TAPS for f in factors):
        out = padded
        for ax, fac in zip(axes, factors):
            if len(fac) == 1:
                out = out * jnp.asarray(float(fac[0]), out.dtype)
            else:
                out = _shift_add_valid(out, fac, ax)
        return out
    return _conv_valid(padded, kernel, axes)


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


class _HostDevicePlacement:
    """Cost-based placement for host-resident convolutions.

    On accelerator backends a host-input conv pays the full
    host->device->host round trip; on tunneled dev hosts (~40 MB/s
    measured) that costs ~20x the host compute itself, while on
    PCIe-attached production hosts the device wins for large tiles.
    Instead of guessing, measure: the first large host-input call runs
    on the device (timed, sync-inclusive), the second on the host
    (scipy.ndimage — the numerics our conv is parity-tested against),
    then traffic follows the faster path, with the loser re-probed
    every ``_REPROBE`` calls in case conditions change.

    ``ND_TPU_HOST_FILTER`` = never | always | auto (default) pins it.
    """

    _REPROBE = 64
    _MIN_BYTES = 1 << 20

    def __init__(self):
        self.rates = {'device': None, 'host': None}
        self.n = 0
        self._warmed = set()   # executable keys whose compile-bearing
        #                        first device sample was discarded
        self._probing = False  # a background device probe is in flight

    def _winner(self):
        d, h = self.rates['device'], self.rates['host']
        if d is None or h is None:
            return None
        return 'device' if d >= h else 'host'

    def choose(self, nbytes):
        """Route a host-resident call.

        The serving path is NEVER routed to an unmeasured device: on a
        loaded remote-tunnel backend a single device dispatch can
        block for minutes, which would stall the whole tile pipeline
        (it did — the round-2 out-of-core regression). The device is
        measured by a BACKGROUND probe (`maybe_probe_device`) on a
        copy of one tile; traffic switches only once the measurement
        lands and wins. A device that currently wins is re-probed
        against the host every `_REPROBE` calls by routing one real
        call to the host (the host path is bounded — safe to sample
        inline).
        """
        import os
        mode = os.environ.get('ND_TPU_HOST_FILTER', 'auto')
        if mode in ('never', 'always'):
            return 'host' if mode == 'always' else 'device'
        if nbytes < self._MIN_BYTES:
            return self._winner() or 'host'
        self.n += 1
        w = self._winner()
        if w is None:
            return 'host'
        if w == 'device' and self.n % self._REPROBE == 0:
            return 'host'
        return w

    def maybe_probe_device(self, thunk, nbytes):
        """Measure the device path in the background (at most one in
        flight). ``thunk`` must be self-contained (own data copy) and
        record its own 'device' sample — its first pass is discarded
        by the `_warmed` per-executable logic (compile-bearing)."""
        import os
        if os.environ.get('ND_TPU_HOST_FILTER', 'auto') != 'auto':
            return   # pinned placement must never touch the device
        if nbytes < self._MIN_BYTES:
            # record() drops sub-MB samples, so a probe would neither
            # measure anything nor ever satisfy the rates gate — it
            # would respawn (and remote-compile) on every small call
            return
        if self._probing:
            return
        if self.rates['device'] is not None \
                and self.n % self._REPROBE != 1:
            return
        import threading
        self._probing = True

        def run():
            try:
                # two passes: the first bears the (possibly cached)
                # compile and is discarded via the _warmed key logic
                for _ in range(2):
                    thunk()
            except Exception:
                pass   # a failing device probe must never hurt serving
            finally:
                self._probing = False

        t = threading.Thread(target=run, daemon=True,
                             name='nd-tpu-placement-probe')
        self._thread = t
        if not getattr(self, '_atexit_registered', False):
            # a probe mid-dispatch while the interpreter tears down
            # aborts inside the PJRT runtime ("exception not
            # rethrown") — drain it before exit
            import atexit
            atexit.register(self._join_probe)
            self._atexit_registered = True
        t.start()

    def _join_probe(self, timeout=20.0):
        """Drain an in-flight probe (bounded): a probe blocked on an
        unresponsive remote service should delay exit by at most
        ``timeout`` — after that the daemon thread is abandoned (a
        teardown abort is then possible but the work is already
        done; scripts that need a guaranteed exit code should exit
        via ``os._exit`` after flushing, as bench.py does)."""
        t = getattr(self, '_thread', None)
        if t is not None and t.is_alive():
            t.join(timeout=timeout)

    def record(self, path, nbytes, seconds, key=None):
        if nbytes < self._MIN_BYTES or seconds <= 0:
            return
        if path == 'device' and key not in self._warmed:
            # the first device sample PER EXECUTABLE (kernel + shape
            # bucket) may include minutes of XLA compile — discard
            # it, rate the steady state. A single global flag would
            # let the second kernel family's compile poison the rate.
            self._warmed.add(key)
            return
        rate = nbytes / seconds
        old = self.rates[path]
        self.rates[path] = rate if old is None else 0.5 * (old + rate)


_placement = _HostDevicePlacement()


def _scipy_convolve(arr, kernel, axes, mode, cval):
    """Host path: scipy.ndimage.convolve with the kernel expanded to
    the array rank (size-1 on unfiltered axes) — the exact oracle the
    XLA conv is parity-tested against.

    Kernel dim i filters ``axes[i]``; when ``axes`` is not ascending
    (a transposed dataset layout) the kernel must be transposed to
    match before the reshape — a plain reshape would scatter its
    elements across the wrong axes."""
    from scipy import ndimage
    k = np.asarray(kernel, dtype=arr.dtype)
    order = np.argsort(np.asarray(axes))
    k = np.transpose(k, order)
    shape = [1] * arr.ndim
    for ax, ks in zip(sorted(axes), k.shape):
        shape[ax] = ks
    weights = k.reshape(shape)
    return ndimage.convolve(arr, weights, mode=mode, cval=cval)


def _hosted_device_conv(a_np, kernel, axes, mode, cval, pad_width,
                        trail, crop):
    """Host in -> host out device convolution: the pad AND the crop
    run in numpy, so the device executes exactly one canonical-shape
    executable regardless of the tile's ragged shape — and the tiling
    flow needs the result on host anyway (NetCDF write). Shared by
    the device route and the background placement probe."""
    import time as _time
    t0 = _time.perf_counter()
    np_mode = _SCIPY_TO_NP_PAD[mode]
    kwargs = {'constant_values': cval} if np_mode == 'constant' \
        else {}
    padded = np.pad(a_np, pad_width, mode=np_mode, **kwargs)
    if any(t for _, t in trail):
        padded = np.pad(padded, trail)
    out = np.asarray(_conv_core(jnp.asarray(padded), kernel, axes))
    out = out[crop] if any(t for _, t in trail) else out
    _placement.record('device', a_np.nbytes,
                      _time.perf_counter() - t0,
                      key=('conv', padded.shape,
                           tuple(kernel.shape), axes))
    return out


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
    # Tiles stream in as host numpy: do ALL the shape surgery
    # (boundary pad + bucket pad) host-side then, so the device only
    # ever sees the canonical bucketed shape. Eagerly dispatching the
    # pad/transpose/concat primitives per ragged tile shape costs a
    # fresh remote compile EACH (~3.5 s per new tile shape measured
    # over the tunneled backend — the round-1 out-of-core cliff).
    host_input = not isinstance(arr, jax.Array)
    arr = arr if host_input else jnp.asarray(arr)
    # the kernel is NOT converted to a device array here: the host
    # placement path must never touch the device (a jnp.asarray +
    # np.asarray pair costs a tunnel round trip per tile, and blocks
    # arbitrarily long when the remote service is loaded). Device
    # paths convert at their dispatch site.
    if not isinstance(kernel, jax.Array):
        kernel = np.asarray(kernel)
    if axes is None:
        axes = tuple(range(arr.ndim))
    axes = tuple(int(a) % arr.ndim for a in axes)
    if kernel.ndim != len(axes):
        raise ValueError('kernel must have one dim per filtered axis')

    if np.iscomplexobj(arr):
        re = convolve(arr.real, kernel, axes, mode, cval)
        im = convolve(arr.imag, kernel, axes, mode, cval)
        return re + 1j * im

    # scipy convolve flips the kernel (true convolution). For concrete
    # host kernels the flip stays in numpy: _conv_core reads the
    # kernel values on the host (separability probe), and XLA converts
    # constants at dispatch — a device kernel here would cost one
    # tunnel round trip per call. Traced kernels (inside jit, e.g. the
    # pipeline's multilook) must stay in jnp.
    if isinstance(kernel, jax.Array):
        kflip = jnp.flip(kernel, axis=tuple(range(kernel.ndim)))
    else:
        kflip = np.flip(np.asarray(kernel),
                        axis=tuple(range(np.ndim(kernel))))

    # Pad so output size == input size with scipy's origin convention
    # (origin at size//2 before the flip).
    pad_width = [(0, 0)] * arr.ndim
    for ax, ks in zip(axes, kflip.shape):
        pad_width[ax] = ((ks - 1) // 2, ks // 2)

    # Shape bucketing: round the filtered axes up to a multiple of
    # ``_SHAPE_BUCKET`` and crop the output back. The kept output
    # positions' windows span only real (boundary-padded) samples, so
    # results are unchanged — but ragged shapes (tile grids with
    # halos, odd edge tiles) now share one compiled executable
    # instead of paying a fresh XLA compile each (minutes per shape
    # on remote-compile backends). Rounds the LOGICAL size (not the
    # halo-padded one): an aligned input stays exactly as-is, and
    # every size in the same 64-window maps to one executable.
    trail = [(0, (-arr.shape[ax]) % _SHAPE_BUCKET) if ax in axes
             else (0, 0) for ax in range(arr.ndim)]
    crop = tuple(slice(0, arr.shape[ax]) for ax in range(arr.ndim))

    if host_input:
        a_np = np.asarray(arr)
        if _placement.choose(a_np.nbytes) != 'host':
            return _hosted_device_conv(a_np, kflip, axes, mode, cval,
                                       pad_width, trail, crop)
        import time as _time
        from scipy import ndimage
        t0 = _time.perf_counter()
        k_np = np.asarray(kernel)
        factors = _separable_factors(k_np)
        if factors is not None \
                and all(len(f) % 2 == 1 for f in factors) \
                and (mode != 'constant' or cval == 0.0) \
                and a_np.dtype.kind == 'f':
            # rank-1 kernels run as 1-d passes (boxcar, Gaussian
            # outer products): w+w taps instead of w*w. Gated to odd
            # sizes so the origin convention is unambiguous, to
            # cval==0 for 'constant' (sequential 1-d passes re-pad
            # each stage, which differs from the single N-d constant
            # pad), and to float data — the oracle casts the kernel
            # to the ARRAY dtype, so integer kernels truncate, which
            # float64 factor passes would not reproduce.
            out = a_np
            for ax, fac in zip(axes, factors):
                if len(fac) == 1:
                    out = out * np.asarray(fac[0], out.dtype)
                else:
                    out = ndimage.convolve1d(
                        out, fac.astype(np.float64), axis=ax,
                        mode=mode, cval=cval).astype(
                            out.dtype, copy=False)
        else:
            out = _scipy_convolve(a_np, k_np, axes, mode, cval)
        _placement.record('host', a_np.nbytes,
                          _time.perf_counter() - t0)
        kf_np = kflip if isinstance(kflip, np.ndarray) \
            else np.asarray(kflip)
        _placement.maybe_probe_device(
            lambda: _hosted_device_conv(a_np, kf_np, axes, mode,
                                        cval, pad_width, trail,
                                        crop),
            a_np.nbytes)
        return out

    # Fused Pallas path (TPU, f32, separable taps over the leading
    # two axes): pad copy + ONE read + ONE write instead of one HBM
    # round trip per filtered axis — the small-tap filters are
    # bandwidth-bound, so the composition's extra passes were the
    # dominant cost. Falls through to the XLA shift-add below
    # whenever the kernel does not apply. Factorizes the PRE-flip
    # kernel (a concrete jax.Array converts even inside jit, where
    # kflip is already staged as a tracer) and flips host-side.
    if arr.dtype == jnp.float32:
        try:
            k_host = np.flip(np.asarray(kernel),
                             axis=tuple(range(np.ndim(kernel))))
        except Exception:       # genuinely traced kernel
            k_host = None
        factors = _separable_factors(k_host) if k_host is not None \
            else None
        if factors is not None:
            from .conv_pallas import try_fused_separable
            fused = try_fused_separable(
                arr, list(zip(axes, factors)), mode, cval)
            if fused is not None:
                return fused

    kernel = kflip

    padded = pad_reflect(arr, pad_width, mode, cval)
    if any(t for _, t in trail):
        bucketed = jnp.pad(padded, trail)
        out = _conv_core(bucketed, kernel, axes)
        return out[crop]
    return _conv_core(padded, kernel, axes)


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
    """Apply a sequence of 1-d kernels along the given axes.

    Host (numpy) inputs take a single-upload path: boundary + bucket
    padding in numpy, then the per-axis VALID convolutions run at
    canonical shapes shared by every ragged tile (see ``convolve``).
    """
    # kernels stay host-side (see convolve: the host placement path
    # must never touch the device); device paths upload at dispatch
    active = [(int(ax), np.asarray(k)) for ax, k in zip(axes, kernels)
              if np.shape(k)[0] > 1]
    host_input = not isinstance(arr, jax.Array)
    if not active:
        # identity: host input stays host (no gratuitous upload)
        return np.asarray(arr) if host_input else jnp.asarray(arr)
    if not host_input or np.iscomplexobj(arr):
        out = jnp.asarray(arr)
        # fused one-pass kernel for the plain float case; constant
        # mode with cval != 0 keeps the sequential passes (each stage
        # re-pads with cval — a single N-d pad differs, same gate as
        # the host factor path)
        if not np.iscomplexobj(arr) and out.dtype == jnp.float32 \
                and (mode != 'constant' or cval == 0.0):
            from .conv_pallas import try_fused_separable
            pairs = [(ax, np.flip(k)) for ax, k in active]
            fused = try_fused_separable(out, pairs, mode, cval)
            if fused is not None:
                return fused
        for ax, k in active:
            out = convolve(out, k, axes=(ax,), mode=mode, cval=cval)
        return out

    a = np.asarray(arr)
    if _placement.choose(a.nbytes) == 'host':
        import time as _time
        from scipy import ndimage
        t0 = _time.perf_counter()
        out = a
        for ax, k in active:
            out = ndimage.convolve1d(out, np.asarray(k), axis=ax,
                                     mode=mode, cval=cval)
        _placement.record('host', a.nbytes,
                          _time.perf_counter() - t0)
        _placement.maybe_probe_device(
            lambda: _hosted_device_sep(a, active, mode, cval),
            a.nbytes)
        return out

    return _hosted_device_sep(a, active, mode, cval)


def _hosted_device_sep(a, active, mode, cval):
    """Host in -> host out separable device convolution (see
    ``_hosted_device_conv``); shared by the device route and the
    background placement probe."""
    pad_width = [(0, 0)] * a.ndim
    for ax, k in active:
        n = int(k.shape[0])
        pad_width[ax] = ((n - 1) // 2, n // 2)
    import time as _time
    t0 = _time.perf_counter()
    np_mode = _SCIPY_TO_NP_PAD[mode]
    kwargs = {'constant_values': cval} if np_mode == 'constant' else {}
    padded = np.pad(a, pad_width, mode=np_mode, **kwargs)
    filtered_axes = {ax for ax, _ in active}
    trail = [(0, (-a.shape[ax]) % _SHAPE_BUCKET)
             if ax in filtered_axes else (0, 0)
             for ax in range(a.ndim)]
    if any(t for _, t in trail):
        padded = np.pad(padded, trail)
    out = jnp.asarray(padded)
    for ax, k in active:
        # scipy convolve semantics: flipped kernel (symmetric Gaussian
        # kernels are unaffected, arbitrary kernels match convolve())
        out = _conv_core(out, np.flip(np.asarray(k), 0), (ax,))
    # host in -> host out (see convolve): the crop stays in numpy
    out = np.asarray(out)[
        tuple(slice(0, a.shape[ax]) for ax in range(a.ndim))]
    _placement.record('device', a.nbytes, _time.perf_counter() - t0,
                      key=('sep', padded.shape,
                           tuple(int(k.shape[0]) for _, k in active),
                           tuple(ax for ax, _ in active)))
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
