"""Algorithm framework + registry contract tests (mirrors the
reference's test_algorithm.py and the *_common.py registry suites)."""

import inspect

import numpy as np
import pytest

from nd_tpu.algorithm import Algorithm, parallelize, wrap_algorithm
from nd_tpu.testing import (all_algorithms, assert_equal_data,
                            generate_test_dataset)


class _Scale(Algorithm):
    """Scale the dataset.

    Parameters
    ----------
    factor : float
        Scale factor.
    """

    def __init__(self, factor=2.0):
        self.factor = factor

    @parallelize
    def apply(self, ds):
        """Apply.

        Parameters
        ----------
        ds : Dataset
            Input dataset.
        """
        return ds * self.factor


def test_abstract_base():
    with pytest.raises(TypeError):
        Algorithm()


def test_default_hooks():
    s = _Scale()
    assert s._buffer('y') == 0
    assert s._parallel_dimension(None) == 'y'


def test_parallelize_injects_njobs():
    sig = inspect.signature(_Scale.apply)
    assert 'njobs' in sig.parameters
    assert 'njobs' in (_Scale.apply.__doc__ or '')


def test_parallelize_equivalence():
    ds = generate_test_dataset(dims={'y': 20, 'x': 10, 'time': 3})
    s = _Scale(3.0)
    assert_equal_data(s.apply(ds), s.apply(ds, njobs=4))
    assert_equal_data(s.apply(ds), s.apply(ds, njobs=-1))


def test_wrap_algorithm_function():
    ds = generate_test_dataset(dims={'y': 10, 'x': 10, 'time': 2})
    scale = wrap_algorithm(_Scale, 'scale')
    assert scale.__name__ == 'scale'
    sig = inspect.signature(scale)
    assert 'factor' in sig.parameters
    assert_equal_data(scale(ds, factor=3.0), _Scale(3.0).apply(ds))
    assert 'Wrapper for' in scale.__doc__


def test_wrap_algorithm_rejects_non_algorithm():
    with pytest.raises(ValueError):
        wrap_algorithm(int)


# ---------------------------------------------------------------------------
# Registry-driven contract tests over every Algorithm in the package
# ---------------------------------------------------------------------------

def _instantiable(cls):
    """Instantiate with defaults where possible."""
    try:
        return cls()
    except (TypeError, ImportError):
        return None


def test_all_algorithms_discovered():
    algos = all_algorithms()
    names = {a.__name__ for a in algos}
    assert {'ConvolutionFilter', 'BoxcarFilter', 'GaussianFilter',
            'NLMeansFilter', 'OmnibusTest', 'Reprojection', 'Resample',
            'Alignment', 'Coregistration'} <= names


@pytest.mark.parametrize('cls', all_algorithms(),
                         ids=lambda c: c.__name__)
def test_algorithm_interface_contract(cls):
    """Every Algorithm exposes apply(ds) and the halo hooks."""
    assert hasattr(cls, 'apply')
    assert hasattr(cls, '_buffer')
    assert hasattr(cls, '_parallel_dimension')
    params = list(inspect.signature(cls.apply).parameters)
    assert params[0] == 'self'
    assert params[1] in ('ds', 'datasets')


@pytest.mark.parametrize('cls', all_algorithms(),
                         ids=lambda c: c.__name__)
def test_filter_output_type_contract(cls):
    """Filters preserve type/dims/shape on a standard cube."""
    from nd_tpu.filters import Filter
    if not (isinstance(cls, type) and issubclass(cls, Filter)):
        pytest.skip('not a Filter')
    algo = _instantiable(cls)
    if algo is None:
        pytest.skip('needs constructor args')
    ds = generate_test_dataset(dims={'y': 14, 'x': 12, 'time': 3})
    out = algo.apply(ds)
    assert type(out) is type(ds)
    assert out.sizes == ds.sizes
