"""Accessor parity: every ds.nd.* / ds.filter.* method must equal its
functional counterpart."""

import numpy as np
import pytest

import nd_tpu
from nd_tpu import filters, io, warp
from nd_tpu.crs import CRS
from nd_tpu.testing import (assert_equal_data, generate_test_dataset)


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 16, 'x': 16, 'time': 4})


def test_nd_properties(ds):
    assert ds.nd.dims == ('y', 'x', 'time')
    assert ds.nd.shape == (16, 16, 4)
    assert ds.nd.crs == CRS.from_epsg(4326)
    assert tuple(ds.nd.bounds) == tuple(warp.get_bounds(ds))
    assert ds.nd.resolution == warp.get_resolution(ds)
    assert ds.nd.transform == warp.get_transform(ds)


def test_nd_as_real_complex(ds):
    dsc = ds.copy()
    dsc['C12'] = dsc['C12__re'] + 1j * dsc['C12__im']
    del dsc['C12__re']
    del dsc['C12__im']
    real = dsc.nd.as_real()
    assert 'C12__re' in real.data_vars
    back = real.nd.as_complex()
    assert 'C12' in back.data_vars
    np.testing.assert_allclose(back['C12'].values, dsc['C12'].values)


def test_nd_to_netcdf(tmp_path, ds):
    p1 = str(tmp_path / 'a.nc')
    p2 = str(tmp_path / 'b.nc')
    ds.nd.to_netcdf(p1)
    io.to_netcdf(ds, p2)
    d1 = io.open_netcdf(p1)
    d2 = io.open_netcdf(p2)
    assert_equal_data(d1, d2)


def test_filter_accessor_equals_functional(ds):
    assert_equal_data(ds.filter.boxcar(w=3), filters.boxcar(ds, w=3))
    assert_equal_data(ds.filter.gaussian(sigma=1.0),
                      filters.gaussian(ds, sigma=1.0))
    k = np.random.RandomState(0).rand(3, 3)
    assert_equal_data(ds.filter.convolve(kernel=k),
                      filters.convolution(ds, kernel=k))
    assert_equal_data(ds.filter.nlmeans(r=1, f=1, sigma=1, h=1),
                      filters.nlmeans(ds, r=1, f=1, sigma=1, h=1))


def test_nd_reproject(ds):
    out1 = ds.nd.reproject(crs='epsg:3395')
    out2 = warp.reproject(ds, crs='epsg:3395')
    assert_equal_data(out1, out2)


def test_nd_resample(ds):
    out1 = ds.nd.resample(width=8)
    out2 = warp.resample(ds, width=8)
    assert_equal_data(out1, out2)


def test_nd_apply(ds):
    res = ds.nd.apply(lambda arr: arr.mean(axis=-1),
                      signature='(time)->()')
    assert 'time' not in res.sizes


def test_nd_change_omnibus(ds):
    from nd_tpu.change import omnibus
    r1 = ds.nd.change_omnibus(n=9, alpha=0.9)
    r2 = omnibus(ds, n=9, alpha=0.9)
    np.testing.assert_array_equal(r1.values, r2.values)


def test_accessor_on_dataarray(ds):
    da = ds['C11']
    assert da.nd.dims == da.dims
    out = da.filter.boxcar(w=3)
    assert out.sizes == da.sizes


def test_nd_to_video(tmp_path, ds):
    p = str(tmp_path / 'v.gif')
    ds.nd.to_video(p, fps=2)
    import os
    assert os.path.getsize(p) > 0


def test_nd_coregister():
    ds2 = generate_test_dataset(dims={'y': 32, 'x': 32, 'time': 3})
    out = ds2.nd.coregister(reference=0, upsampling=5)
    assert out.sizes == ds2.sizes


def test_nd_tile(tmp_path, ds):
    ds.nd.tile(str(tmp_path), chunks={'y': 8})
    import os
    assert len(os.listdir(tmp_path)) == 2


def test_nd_classify():
    from nd_tpu.testing import create_mock_classes
    from sklearn.linear_model import LogisticRegression
    dsm, labels = create_mock_classes(dims={'y': 20, 'x': 20,
                                            'time': 2})
    pred = dsm.nd.classify(LogisticRegression(max_iter=100), labels)
    assert set(pred.dims) == {'y', 'x', 'time'}


def test_accessor_to_netcdf_file_identical(tmp_path, ds):
    """Accessor and functional writers produce byte-identical files
    (reference strategy: assert_equal_files by md5)."""
    from nd_tpu.testing import assert_equal_files
    p1 = str(tmp_path / 'acc.nc')
    p2 = str(tmp_path / 'fn.nc')
    ds.nd.to_netcdf(p1)
    io.to_netcdf(ds, p2)
    assert_equal_files(p1, p2)
