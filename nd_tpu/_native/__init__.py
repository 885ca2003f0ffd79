"""Native (C++) runtime components.

The compute hot path of this framework is XLA/Pallas on the TPU; this
package provides the native *host-side* components: multi-threaded C++
reference kernels (NLMeans, omnibus change detection with a built-in
chi-square CDF) used as the CPU benchmark baseline, as oracles, and as a
fallback when no accelerator is present. Compiled on first use with the
system toolchain (g++ -O3 -fopenmp) and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libnd_native.so')
_SOURCES = ['nlmeans.cpp', 'change.cpp', 'jp2_t1.cpp']
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build():
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    # compile to a temp name + atomic rename: concurrent processes
    # must never dlopen a half-written .so
    tmp = _LIB_PATH + '.%d.tmp' % os.getpid()
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared',
           '-fPIC', '-std=c++17', '-o', tmp] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        raise subprocess.CalledProcessError(
            e.returncode, e.cmd,
            e.output, (e.stderr or b'')[-2000:])  # keep diagnostics
    os.replace(tmp, _LIB_PATH)


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH) or any(
                os.path.getmtime(os.path.join(_HERE, s))
                > os.path.getmtime(_LIB_PATH) for s in _SOURCES):
            try:
                _build()
            except (OSError, subprocess.CalledProcessError) as e:
                stderr = getattr(e, 'stderr', b'') or b''
                raise NativeUnavailable(
                    'could not build native library: %s\n%s'
                    % (e, stderr.decode('utf-8', 'replace')))
        lib = ctypes.CDLL(_LIB_PATH)
        i64 = ctypes.c_int64
        dbl = ctypes.c_double
        for suffix, ptr in (('f32', ctypes.POINTER(ctypes.c_float)),
                            ('f64', ctypes.POINTER(ctypes.c_double))):
            fn = getattr(lib, 'nd_nlmeans_' + suffix)
            fn.restype = None
            fn.argtypes = [ptr, ptr] + [i64] * 10 + [dbl] * 3 \
                + [ctypes.c_int]
            fc = getattr(lib, 'nd_change_' + suffix)
            fc.restype = None
            fc.argtypes = [ptr, ctypes.POINTER(ctypes.c_uint8),
                           i64, i64, i64, dbl, dbl, ctypes.c_int]
        ft1 = lib.nd_jp2_t1_decode
        ft1.restype = ctypes.c_int
        ft1.argtypes = [ctypes.POINTER(ctypes.c_uint8), i64,
                        i64, i64, ctypes.c_int, i64, i64,
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int16)]
        fb = lib.nd_jp2_t1_decode_batch
        fb.restype = ctypes.c_int
        fb.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                       ctypes.POINTER(ctypes.c_int64),
                       ctypes.POINTER(ctypes.c_int64), i64,
                       ctypes.POINTER(ctypes.c_int64),
                       ctypes.POINTER(ctypes.c_int16),
                       ctypes.POINTER(ctypes.c_int64),
                       ctypes.c_int]
        _LIB = lib
        return lib


def available():
    try:
        _load()
        return True
    except (NativeUnavailable, OSError, AttributeError):
        # corrupt/foreign .so (CDLL OSError) or stale symbols
        # (AttributeError) also mean 'not available'
        return False


def nlmeans_native(arr, r, f, sigma, h, n_eff=-1.0, nthreads=1):
    """NLMeans over a 4-D (d0, d1, d2, var) array on the host CPU."""
    lib = _load()
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.float32:
        fn = lib.nd_nlmeans_f32
        cptr = ctypes.POINTER(ctypes.c_float)
    elif arr.dtype == np.float64:
        fn = lib.nd_nlmeans_f64
        cptr = ctypes.POINTER(ctypes.c_double)
    else:
        arr = arr.astype(np.float64)
        fn = lib.nd_nlmeans_f64
        cptr = ctypes.POINTER(ctypes.c_double)
    out = np.empty_like(arr)
    d0, d1, d2, nv = arr.shape
    r = [int(v) for v in r]
    f = [int(v) for v in f]
    for i, dim in enumerate((d0, d1, d2)):
        if r[i] + f[i] >= dim:
            # same bound the XLA kernel enforces; beyond it the C++
            # single-bounce reflect would read out of bounds
            raise ValueError(
                'r + f (%d) must be smaller than dim %d size (%d)'
                % (r[i] + f[i], i, dim))
    fn(arr.ctypes.data_as(cptr), out.ctypes.data_as(cptr),
       d0, d1, d2, nv, r[0], r[1], r[2], f[0], f[1], f[2],
       float(sigma), float(h), float(n_eff), int(nthreads))
    return out


def change_detection_native(values, alpha, n=1, nthreads=1):
    """Omnibus change detection over (y, x, time, 4) on the host CPU."""
    lib = _load()
    values = np.ascontiguousarray(values)
    if values.ndim != 4 or values.shape[-1] != 4:
        raise ValueError(
            'expected (y, x, time, 4) dual-pol covariance channels, '
            'got shape %r' % (values.shape,))
    if values.dtype == np.float32:
        fn = lib.nd_change_f32
        cptr = ctypes.POINTER(ctypes.c_float)
    else:
        values = values.astype(np.float64, copy=False)
        fn = lib.nd_change_f64
        cptr = ctypes.POINTER(ctypes.c_double)
    ny, nx, k, _ = values.shape
    out = np.zeros((ny, nx, k), dtype=np.uint8)
    fn(values.ctypes.data_as(cptr),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ny, nx, k, float(alpha), float(n), int(nthreads))
    return out.astype(bool)


_T1_ORIENT = {'LL': 0, 'HL': 1, 'LH': 2, 'HH': 3}


def jp2_t1_decode_native(data, w, h, orientation, npasses, numbps):
    """Native EBCOT Tier-1 decode of one code-block.

    Returns ``(vals, lastp)``: signed int64 coefficients (h, w) and
    the per-coefficient last-updated bit-plane (int16, consumed by
    the 9/7 mid-bin reconstruction). Bit-exact twin of
    :class:`nd_tpu.io.jp2._T1Decoder` (pinned in tests/test_jp2.py).
    Raises :class:`NativeUnavailable` when the toolchain is absent and
    ValueError on a malformed pass count (same condition the Python
    decoder raises on).
    """
    lib = _load()
    buf = np.frombuffer(bytes(data), np.uint8)
    vals = np.zeros((int(h), int(w)), np.int64)
    lastp = np.zeros((int(h), int(w)), np.int16)
    rc = lib.nd_jp2_t1_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(buf), int(w), int(h), _T1_ORIENT[orientation],
        int(npasses), int(numbps),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lastp.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if rc != 0:
        raise ValueError('more coding passes than bit-planes')
    return vals, lastp


def jp2_t1_decode_batch_native(blocks, nthreads=0):
    """Batched native Tier-1 decode: ``blocks`` is a list of
    ``(data_bytes, w, h, orientation, npasses, numbps)``; code-blocks
    are independent, so they fan out over OpenMP threads
    (``nthreads=0`` = all cores). Returns a list of ``(vals, lastp)``
    in input order, each bit-exact with the per-block decode."""
    lib = _load()
    if not blocks:
        return []
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    data = b''.join(b[0] for b in blocks)
    offs = np.zeros(len(blocks) + 1, np.int64)
    np.cumsum([len(b[0]) for b in blocks], out=offs[1:])
    meta = np.asarray(
        [(int(b[1]), int(b[2]), _T1_ORIENT[b[3]], int(b[4]),
          int(b[5])) for b in blocks], np.int64)
    out_offs = np.zeros(len(blocks) + 1, np.int64)
    np.cumsum([int(b[1]) * int(b[2]) for b in blocks],
              out=out_offs[1:])
    vals = np.zeros(int(out_offs[-1]), np.int64)
    lastp = np.zeros(int(out_offs[-1]), np.int16)
    buf = np.frombuffer(data, np.uint8)
    if not len(buf):
        buf = np.zeros(1, np.uint8)
    rc = lib.nd_jp2_t1_decode_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(blocks),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lastp.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(nthreads))
    if rc != 0:
        raise ValueError('more coding passes than bit-planes')
    out = []
    for i, b in enumerate(blocks):
        w, h = int(b[1]), int(b[2])
        s = slice(int(out_offs[i]), int(out_offs[i + 1]))
        out.append((vals[s].reshape(h, w), lastp[s].reshape(h, w)))
    return out
