"""Integration tests: the example pipelines run end-to-end."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/examples')


def test_sar_change_pipeline(tmp_path):
    from sar_change_pipeline import main
    change = main(outdir=str(tmp_path), subset=64)
    per_t = np.asarray(change.values).sum(axis=(0, 1))
    # the synthetic step at t=3 must be detected in the central patch
    assert per_t[:3].sum() == 0
    assert per_t[3:5].sum() > 50
    assert (tmp_path / 'change.nc').exists()
    assert (tmp_path / 'change_t3.tif').exists()


def test_forest_classification():
    from forest_classification import main
    pred = main()
    assert set(pred.dims) == {'y', 'x'}


def test_concat_new_dim_dataset():
    """Regression: Dataset concat along a new dim must stack variables
    (it used to silently keep only the first element)."""
    from nd_tpu import concat
    from nd_tpu.testing import generate_test_dataset
    parts = [generate_test_dataset(dims={'y': 5, 'x': 4},
                                   random_seed=i) for i in range(3)]
    out = concat(parts, 'time')
    assert out.sizes['time'] == 3
    assert out['C11'].dims == ('y', 'x', 'time')
    np.testing.assert_allclose(
        out['C11'].isel(time=1).values, parts[1]['C11'].values)


def test_out_of_core_mosaic(tmp_path):
    from out_of_core_mosaic import main
    out = main(outdir=str(tmp_path), ny=96, nx=120, k=2)
    import os
    assert os.path.exists(os.path.join(out, 'mosaic_3395.nc'))


def test_continental_mosaic():
    from continental_mosaic import main
    out = main()
    from nd_tpu.crs import CRS
    from nd_tpu.warp import get_crs
    assert get_crs(out) == CRS.from_epsg(3035)
    vals = np.asarray(out['C11'].values, np.float64)
    # the three scenes overlap; most of the grid is covered and the
    # averaged mosaic stays in the synthetic data's range
    assert np.isfinite(vals).mean() > 0.4
    assert np.nanstd(vals) < 3.0


def test_geostationary_disk():
    from geostationary_disk import main
    disk, europe, laea = main()
    bt = np.asarray(disk['BT'].values)
    # the Earth disk fills pi/4 of the square bounding grid (+ margin)
    frac = np.isfinite(bt).mean()
    assert 0.70 < frac < 0.85
    # the European cut-out lies fully on the disk
    e = np.asarray(europe['BT'].values)
    assert np.isfinite(e).all()
    # equator warm, poleward cold (the synthetic field's gradient
    # survives the geos inverse + reprojection)
    ey = np.asarray(europe._coords['y'].values)
    south = e[np.argmax(ey < 40.0)]
    north = e[np.argmax(ey < 60.0)]
    assert np.nanmean(south) > np.nanmean(north)
    from nd_tpu.crs import CRS
    from nd_tpu.warp import get_crs
    assert get_crs(laea) == CRS.from_epsg(3035)


def test_timeseries_gapfill_example():
    from timeseries_gapfill import main
    mosaic, filled, series = main()
    # the mosaic spans the union grid of both swaths
    assert mosaic.sizes['x'] == 60
    # interpolation + edge fill removes every gap
    assert not np.isnan(np.asarray(filled.values)).any()
    # the seasonal signal survives: the weighted series peaks near
    # the sine's crest (t ~ k/4) and dips near the trough
    s = np.asarray(series.values)
    assert s.argmax() in (1, 2, 3) and s.argmin() in (5, 6, 7)
    assert 0.3 < s.min() < s.max() < 0.9
