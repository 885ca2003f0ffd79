"""Algorithm framework: the abstract base class every datacube operation
derives from, plus the machinery that parallelizes and functionalizes it.

Re-designed from the reference's ``nd/algorithm.py``
(/root/reference/nd/algorithm.py:15-198) for a TPU execution model:

  - ``Algorithm.apply`` remains the class API; ``@parallelize`` injects an
    ``njobs`` kwarg for host-level split/apply/merge chunking (halo-aware).
  - New TPU hooks: ``_jax_kernel`` (optional) lets the sharding engine in
    ``nd_tpu.parallel`` run the op under ``shard_map`` across a device
    mesh with ICI halo exchange instead of host chunking.
  - ``wrap_algorithm`` generates the functional API (``nlmeans(ds, ...)``)
    from the class, merging ``__init__`` and ``apply`` signatures.
"""

from __future__ import annotations

import inspect
from abc import ABC, abstractmethod
from functools import partial

from . import utils

__all__ = ['Algorithm', 'parallelize', 'wrap_algorithm']


class Algorithm(ABC):
    """Abstract base class for all datacube operations."""

    @abstractmethod
    def apply(self, ds):
        """Apply the algorithm to a Dataset. Implemented by subclasses,
        decorated with @parallelize where appropriate."""
        return

    def _buffer(self, dim):
        """Halo width required when splitting along ``dim``."""
        return 0

    def _parallel_dimension(self, ds):
        """Dimension along which to split for parallel execution."""
        return 'y'


def parallelize(func):
    """Decorator: give an ``apply`` method an ``njobs`` kwarg.

    ``njobs == 1`` executes directly. Otherwise the dataset is split
    along ``self._parallel_dimension(ds)`` into ``njobs`` chunks with a
    ``self._buffer(dim)`` halo, mapped, trimmed and concatenated —
    identical reassembly semantics to the reference
    (/root/reference/nd/algorithm.py:38-105), with threads instead of
    fork+pickle since device kernels dispatch asynchronously.
    """

    def wrapper(self, ds, *args, njobs=1, **kwargs):
        from .tracing import span
        method = partial(func, self)
        if njobs == -1:
            njobs = utils.ncpus()
        with span('%s.apply' % type(self).__name__):
            if njobs == 1:
                return method(ds, *args, **kwargs)
            dim = self._parallel_dimension(ds)
            buffer = self._buffer(dim)
            return utils.parallel(
                method, dim=dim, chunks=njobs, buffer=buffer
            )(ds, *args, **kwargs)

    # -- signature: original parameters + njobs ---------------------------
    sig_func = inspect.signature(func)
    sig_wrapper = inspect.signature(wrapper)
    parameters = tuple(sig_func.parameters.values())
    parameters += (sig_wrapper.parameters['njobs'],)
    parameters = sorted(
        parameters,
        key=lambda p: (p.kind, p.default is not inspect._empty))
    new_parameters = []
    for p in parameters:
        if p not in new_parameters:
            new_parameters.append(p)
    sig = sig_func.replace(parameters=new_parameters)

    # -- docstring: document the njobs parameter ---------------------------
    doc = utils.parse_docstring(func.__doc__)
    if 'Parameters' not in doc:
        doc['Parameters'] = []
    doc['Parameters'].append(
        ['njobs : int, optional',
         '    Number of chunks to process in parallel. -1 uses the',
         '    number of available cores. njobs=1 disables chunking',
         '    (default: 1).'])
    doc.setdefault('indent', 0)
    wrapper.__signature__ = sig
    wrapper.__doc__ = utils.assemble_docstring(doc, sig=sig)
    wrapper.__name__ = getattr(func, '__name__', 'apply')
    wrapper.__wrapped_apply__ = func

    return wrapper


def wrap_algorithm(algo, name=None):
    """Return the functional form of an Algorithm class.

    ``wrap_algorithm(NLMeansFilter, 'nlmeans')`` produces a function
    ``nlmeans(ds, **params)`` that instantiates the class with the
    constructor arguments and calls ``apply`` with the rest.
    """
    if not (inspect.isclass(algo) and issubclass(algo, Algorithm)):
        raise ValueError('Class must be derived from nd_tpu.Algorithm.')

    def _wrapper(*args, **kwargs):
        apply_kwargs = utils.extract_arguments(algo.apply, args, kwargs)
        init_args = apply_kwargs.pop('args', ())
        init_kwargs = apply_kwargs.pop('kwargs', {})
        return algo(*init_args, **init_kwargs).apply(**apply_kwargs)

    _wrapper.__module__ = algo.__module__
    if name is not None:
        _wrapper.__name__ = name
        _wrapper.__qualname__ = name

    # -- merged signature: apply params first, then __init__ params --------
    sig_init = inspect.signature(algo.__init__)
    sig_apply = inspect.signature(algo.apply)
    parameters = tuple(sig_apply.parameters.values())[1:] + \
        tuple(sig_init.parameters.values())[1:]
    parameters = sorted(
        parameters,
        key=lambda p: (p.kind, p.default is not inspect._empty))
    new_parameters = []
    for p in parameters:
        if p not in new_parameters:
            new_parameters.append(p)
    sig = sig_init.replace(parameters=new_parameters)
    _wrapper.__signature__ = sig

    # -- docstring ----------------------------------------------------------
    link = ':class:`{}.{}`'.format(algo.__module__, algo.__name__)
    doc = utils.parse_docstring(algo.__doc__)
    doc.setdefault(None, ['', ''])
    doc[None].insert(0, 'Wrapper for {}.'.format(link))
    doc[None].insert(1, '')
    if algo.apply.__doc__ is not None:
        apply_doc = utils.parse_docstring(algo.apply.__doc__)
        if 'Parameters' in apply_doc:
            doc['Parameters'] = (apply_doc['Parameters']
                                 + doc.get('Parameters', []))
        if 'Returns' in apply_doc:
            doc['Returns'] = apply_doc['Returns']
    doc.setdefault('indent', 0)
    _wrapper.__doc__ = utils.assemble_docstring(doc, sig=sig)
    _wrapper.__algorithm__ = algo

    return _wrapper
