"""Tracing and profiling (new capability vs the reference, SURVEY §5:
the reference ships no tracing at all).

Thin, dependency-free wrappers over ``jax.profiler`` plus a wall-clock
span tracer whose reports can be dumped as JSON — usable in production
runs to find host/device imbalance.
"""

from __future__ import annotations

import contextlib
import functools
import json
import threading
import time
from collections import defaultdict

__all__ = ['trace', 'span', 'report', 'reset', 'start_device_trace',
           'stop_device_trace', 'annotate']

_LOCK = threading.Lock()
_SPANS = defaultdict(lambda: {'count': 0, 'total': 0.0, 'max': 0.0})


@contextlib.contextmanager
def span(name):
    """Time a host-side span; aggregated in the global report."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            s = _SPANS[name]
            s['count'] += 1
            s['total'] += dt
            s['max'] = max(s['max'], dt)


def trace(name=None):
    """Decorator form of :func:`span`.

    Works both bare (``@trace``) and parameterized (``@trace('x')``) —
    the bare form used to silently return a decorator factory, so the
    "decorated" function never executed.
    """
    def deco(fn):
        label = (name if isinstance(name, str) and name
                 else fn.__qualname__)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with span(label):
                return fn(*args, **kwargs)
        return wrapper

    if callable(name):          # bare @trace
        return deco(name)
    return deco


def report(as_json=False):
    """Aggregated span timings."""
    with _LOCK:
        data = {k: dict(v) for k, v in _SPANS.items()}
    if as_json:
        return json.dumps(data, indent=2, sort_keys=True)
    return data


def reset():
    with _LOCK:
        _SPANS.clear()


def start_device_trace(logdir):
    """Start a device (XLA) profiler trace viewable in TensorBoard/
    Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)


def stop_device_trace():
    import jax
    jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Annotate a region in the device trace (StepTraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
