"""Utility-layer tests (mirrors the reference's test_utils coverage)."""

import inspect
import time

import numpy as np
import pytest

from nd_tpu import utils
from nd_tpu.core import Dataset
from nd_tpu.testing import assert_equal_data, generate_test_dataset


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 30, 'x': 20, 'time': 5})


def test_get_shape_dims(ds):
    assert utils.get_dims(ds) == ('y', 'x', 'time')
    assert utils.get_shape(ds) == (30, 20, 5)


def test_str2date():
    d = utils.str2date('02-DEC-2018 06:54:06.200153')
    assert d.year == 2018 and d.month == 12 and d.day == 2
    d2 = utils.str2date('2020-01-02', fmt='%Y-%m-%d')
    assert d2.day == 2
    d3 = utils.str2date('2020-01-02', tz=True)
    assert d3.tzinfo is not None


def test_chunks():
    out = list(utils.chunks(list(range(10)), 3))
    assert [len(c) for c in out] == [3, 3, 3, 1]


def test_array_chunks():
    arr = np.arange(10)
    out = list(utils.array_chunks(arr, 4))
    assert [len(c) for c in out] == [4, 4, 2]
    with pytest.raises(ValueError):
        list(utils.array_chunks(arr, 2, axis=1))


def test_block_split_merge():
    arr = np.arange(36).reshape(6, 6)
    for blocks in [(2, 3), (1, 1), (6, 1)]:
        parts = utils.block_split(arr, blocks)
        assert len(parts) == np.prod(blocks)
        merged = utils.block_merge(parts, blocks)
        np.testing.assert_array_equal(merged, arr)


@pytest.mark.parametrize('dim', ['y', 'x', 'time'])
@pytest.mark.parametrize('chunks', [1, 2, 4])
@pytest.mark.parametrize('buffer', [0, 1, 3])
def test_xr_split_and_merge(ds, dim, chunks, buffer):
    parts = list(utils.xr_split(ds, dim, chunks, buffer=buffer))
    assert 1 <= len(parts) <= chunks
    merged = utils.xr_merge(parts, dim, buffer=buffer)
    assert_equal_data(merged, ds, rtol=0, atol=0)
    np.testing.assert_array_equal(merged[dim].values, ds[dim].values)


def test_parallel_equals_serial(ds):
    def fn(d):
        return d * 2 + 1
    serial = fn(ds)
    par = utils.parallel(fn, dim='y', chunks=4)(ds)
    assert_equal_data(serial, par)


def test_parallel_invalid_dim(ds):
    with pytest.raises(ValueError):
        utils.parallel(lambda d: d, dim='nonexistent')(ds)


def test_parallel_invalid_scheduler(ds):
    with pytest.raises(ValueError):
        utils.parallel(lambda d: d, scheduler='dask')(ds)


def test_parallel_processes_equals_serial(ds):
    # spawn-based process pool: real multi-core for GIL-bound numpy
    # paths (the reference's multiprocessing.Pool capability,
    # /root/reference/nd/utils.py:389-392); must agree with serial
    # bit-exactly, including the halo trim
    from _pool_worker import smooth_chunk
    serial = smooth_chunk(ds)
    par = utils.parallel(smooth_chunk, dim='y', chunks=2, buffer=1,
                         scheduler='processes')(ds)
    assert_equal_data(serial, par, rtol=0, atol=0)


def test_parallel_processes_forwards_args(ds):
    from _pool_worker import affine_chunk
    serial = affine_chunk(ds, 3.0, offset=-1.0)
    par = utils.parallel(affine_chunk, dim='x', chunks=2,
                         scheduler='processes')(ds, 3.0, offset=-1.0)
    assert_equal_data(serial, par, rtol=0, atol=0)


@pytest.mark.skipif(utils.ncpus() < 2,
                    reason='multi-core speedup needs >1 CPU')
def test_parallel_processes_speedup(ds):
    # mirrors the reference's pool speedup check
    # (/root/reference/nd/tests/test_utils.py:150-167): with real
    # cores, the process pool beats serial on GIL-bound numpy work
    import time
    from _pool_worker import burn_cpu_chunk
    big = ds.isel(y=slice(0, ds.sizes['y']))
    t0 = time.perf_counter()
    utils.parallel(burn_cpu_chunk, dim='y', chunks=1,
                   scheduler='serial')(big, spins=200)
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    utils.parallel(burn_cpu_chunk, dim='y', chunks=utils.ncpus(),
                   scheduler='processes')(big, spins=200)
    t_par = time.perf_counter() - t0
    assert t_par < t_serial * 1.2


def test_select():
    objs = [{'a': 1, 'b': 2}, {'a': 2, 'b': 2}, {'a': 1, 'b': 1}]
    out = utils.select(objs, lambda o: o['a'] == 1)
    assert len(out) == 2
    first = utils.select(objs, lambda o: o['a'] == 2, first=True)
    assert first == {'a': 2, 'b': 2}
    single = utils.select(objs, lambda o: o['b'] == 1)
    assert single == {'a': 1, 'b': 1}  # unlisted


def test_get_vars_for_dims(ds):
    ds2 = ds.copy()
    ds2['meta'] = (('time',), np.arange(5))
    assert set(utils.get_vars_for_dims(ds2, ('y', 'x'))) == \
        {'C11', 'C12__im', 'C12__re', 'C22'}
    assert utils.get_vars_for_dims(ds2, ('y', 'x'), invert=True) == \
        ['meta']


def test_expand_variables_roundtrip(ds):
    da = ds.to_array()
    back = utils.expand_variables(da)
    assert_equal_data(back, ds)


def test_is_complex(ds):
    assert not utils.is_complex(ds)
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    assert utils.is_complex(dsc)
    assert utils.is_complex(dsc['C12'])
    with pytest.raises(ValueError):
        utils.is_complex(np.zeros(3))


def test_parse_assemble_docstring():
    doc = """
    Summary line.

    Parameters
    ----------
    a : int
        The a.
    b : str, optional
        The b.

    Returns
    -------
    int
        Something.
    """
    parsed = utils.parse_docstring(doc)
    assert 'Parameters' in parsed
    assert len(parsed['Parameters']) == 2
    out = utils.assemble_docstring(parsed)
    assert 'Parameters' in out and 'Returns' in out


def test_requires_decorator():
    @utils.requires('nonexistent_module_xyz')
    def fn():
        return 1

    with pytest.raises(ImportError):
        fn()

    @utils.requires('gsl')  # built-in capability, always available
    def fn2():
        return 2

    assert fn2() == 2

    @utils.requires('nonexistent_module_xyz')
    class C:
        def __init__(self):
            pass

    assert C._skip
    with pytest.raises(ImportError):
        C()


def test_apply_signature_validation(ds):
    with pytest.raises(ValueError):
        utils.apply(ds, lambda x: x, signature='(time)->(other)')


def test_extract_arguments():
    def fn(a, b=2, *args, **kwargs):
        pass
    out = utils.extract_arguments(fn, (1,), {'b': 3, 'c': 4})
    assert out['a'] == 1 and out['b'] == 3
    assert out['kwargs'] == {'c': 4}


def test_dict_product():
    out = list(utils.dict_product({'a': [1, 2], 'b': [3]}))
    assert out == [{'a': 1, 'b': 3}, {'a': 2, 'b': 3}]


def test_tracing_spans():
    from nd_tpu import tracing
    tracing.reset()
    with tracing.span('unit-test'):
        time.sleep(0.01)

    @tracing.trace('deco-test')
    def fn():
        return 42

    assert fn() == 42
    rep = tracing.report()
    assert rep['unit-test']['count'] == 1
    assert rep['unit-test']['total'] >= 0.01
    assert rep['deco-test']['count'] == 1
    assert isinstance(tracing.report(as_json=True), str)


def test_algorithm_apply_traced():
    """Every Algorithm.apply records a tracing span automatically."""
    from nd_tpu import tracing
    from nd_tpu.filters import BoxcarFilter
    from nd_tpu.testing import generate_test_dataset

    tracing.reset()
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 2})
    BoxcarFilter(w=3).apply(ds)
    rep = tracing.report()
    assert rep['BoxcarFilter.apply']['count'] == 1
