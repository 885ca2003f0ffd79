"""Runtime fail-safe for Pallas kernel launches.

``supports_pallas()`` in the kernel modules is a *static* backend check;
it cannot know that a launch will die at runtime with a transient
``INTERNAL: TPU backend error`` (exactly what voided round 1's bench
artifact). This module adds the dynamic half of the contract, mirroring
the reference's graceful-degradation stance for its optional native
kernels (/root/reference/nd/change.py:5-8,106-108): every eager Pallas
dispatch site routes through :func:`run_with_fallback`, which

1. launches the Pallas kernel and *probes* the result (fetches one
   element — on tunneled TPU backends ``block_until_ready`` is a no-op,
   so this is the only reliable way to surface an async launch error
   at the dispatch site);
2. on a runtime launch failure retries once (transients usually clear);
3. on a second failure dispatches the numerically-equivalent XLA kernel
   instead and records a strike;
4. after ``_MAX_STRIKES`` strikes disables Pallas for the session so
   later calls skip the doomed launch entirely.

Under tracing (``jax.jit``) the guard is inert — exceptions cannot be
intercepted per-kernel inside a compiled program — so jitted pipelines
keep their static dispatch; the guard protects the eager library
surface (``Filter.apply``, ``OmnibusTest.apply``, ``bench.py``).
"""

from __future__ import annotations

import warnings

import numpy as np

import jax

__all__ = ['run_with_fallback', 'is_pallas_runtime_error',
           'pallas_disabled', 'disable_pallas', 'reset_pallas_strikes']

_MAX_STRIKES = 2
_strikes = 0
_disabled = False
_disabled_reason = None

# substrings that mark a *launch/runtime* failure (retry-able /
# fallback-able) as opposed to a programming error in the kernel
_RUNTIME_MARKERS = (
    'INTERNAL', 'internal error', 'TPU backend error', 'Mosaic',
    'RESOURCE_EXHAUSTED', 'RESOURCE EXHAUSTED', 'UNAVAILABLE',
    'ABORTED', 'DEADLINE_EXCEEDED', 'out of memory', 'OOM',
    'DMA', 'scoped vmem', 'VMEM',
)


def is_pallas_runtime_error(exc):
    """True when ``exc`` looks like a (possibly transient) device-side
    kernel launch failure rather than a Python-level bug."""
    runtime_types = [RuntimeError]
    jrt = getattr(jax.errors, 'JaxRuntimeError', None)
    if jrt is not None:
        runtime_types.append(jrt)
    try:  # the raw XLA client error type, when exposed
        from jax._src.lib import xla_client
        runtime_types.append(xla_client.XlaRuntimeError)
    except Exception:
        pass
    if not isinstance(exc, tuple(runtime_types)):
        return False
    msg = str(exc)
    return any(m in msg for m in _RUNTIME_MARKERS)


def pallas_disabled():
    """True once repeated runtime failures disabled Pallas dispatch
    for this session."""
    return _disabled


def disable_pallas(reason=None):
    global _disabled, _disabled_reason
    _disabled = True
    _disabled_reason = reason
    warnings.warn(
        'Pallas TPU kernels disabled for this session after repeated '
        'runtime launch failures%s; the XLA kernels (numerically '
        'equivalent) take over.'
        % (': %s' % reason if reason else ''))


def reset_pallas_strikes():
    """Re-enable Pallas dispatch (used by tests)."""
    global _strikes, _disabled, _disabled_reason
    _strikes = 0
    _disabled = False
    _disabled_reason = None


def _probe(out):
    """Force one element of ``out`` to the host so an asynchronously
    dispatched launch failure surfaces here, inside the try block."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])
    return out


def _is_tracing(args):
    return any(isinstance(a, jax.core.Tracer)
               for a in jax.tree_util.tree_leaves(args))


def run_with_fallback(primary, fallback, *args, probe=True, name=None):
    """Run ``primary(*args)``; on a runtime kernel failure retry once,
    then run ``fallback(*args)``.

    ``primary`` and ``fallback`` must be numerically equivalent (the
    Pallas and XLA formulations of the same op). Under tracing the
    guard dispatches ``primary`` directly — a traced call cannot fail
    at this level. Exceptions that do not look like launch failures
    (see :func:`is_pallas_runtime_error`) propagate unchanged.
    """
    global _strikes
    if _disabled:
        return fallback(*args)
    if _is_tracing(args):
        return primary(*args)
    for attempt in range(2):
        try:
            out = primary(*args)
            if probe:
                _probe(out)
            _strikes = 0
            return out
        except Exception as e:
            if not is_pallas_runtime_error(e):
                raise
            warnings.warn(
                'Pallas kernel%s failed at runtime (%s: %s) — %s'
                % (' %r' % name if name else '', type(e).__name__,
                   str(e).splitlines()[0][:200],
                   'retrying once' if attempt == 0
                   else 'falling back to the XLA kernel'))
            if attempt == 1:
                _strikes += 1
                if _strikes >= _MAX_STRIKES:
                    disable_pallas(str(e).splitlines()[0][:200])
    return fallback(*args)
