"""End-to-end SAR change-detection pipeline on the bundled Sentinel-1
product.

Loads the real dual-pol C2 scene (slc.nc), builds a short time series
with a synthetic backscatter change, then runs the full TPU pipeline:

    speckle filtering (NLMeans) -> multilook + omnibus change detection
    -> change statistics -> exports (NetCDF, GeoTIFF, RGB quicklook)

Run: python examples/sar_change_pipeline.py [output_dir]
"""

import os
import sys

import numpy as np

import nd_tpu
from nd_tpu import concat, open_dataset, to_netcdf
from nd_tpu.change import OmnibusTest
from nd_tpu.filters import NLMeansFilter
from nd_tpu.io import to_geotiff


def build_time_series(ds, k=6, change_at=3, seed=0):
    """Stack speckled copies of the scene; add a backscatter step.

    The covariance structure is kept positive-semidefinite:
    |C12|^2 < C11 * C22 at every pixel and time step.
    """
    rng = np.random.RandomState(seed)
    base_c11 = np.abs(np.asarray(ds['C11'].values)) + 1e-4
    base_c22 = np.abs(np.asarray(ds['C22'].values)) + 1e-4
    steps = []
    for t in range(k):
        step = ds.copy()
        c11 = base_c11 * rng.gamma(9.0, 1 / 9.0, base_c11.shape)
        c22 = base_c22 * rng.gamma(9.0, 1 / 9.0, base_c22.shape)
        if t >= change_at:
            # simulate deforestation backscatter drop in the central
            # patch of the scene
            ny, nx = c11.shape[:2]
            sl = (slice(ny // 3, 2 * ny // 3),
                  slice(nx // 3, 2 * nx // 3))
            c11[sl] *= 0.25
            c22[sl] *= 0.25
        coh = 0.3 * np.sqrt(c11 * c22) \
            * rng.uniform(0.5, 1.0, c11.shape)
        phase = rng.uniform(0, 2 * np.pi, c11.shape)
        step['C11'] = (('y', 'x'), c11.astype(np.float32))
        step['C22'] = (('y', 'x'), c22.astype(np.float32))
        step['C12__re'] = (('y', 'x'),
                           (coh * np.cos(phase)).astype(np.float32))
        step['C12__im'] = (('y', 'x'),
                           (coh * np.sin(phase)).astype(np.float32))
        step.attrs.pop('start_date', None)
        steps.append(step)
    series = concat(steps, 'time')
    times = np.arange(
        np.datetime64('2020-01-01'),
        np.datetime64('2020-01-01') + np.timedelta64(k, 'D'),
        np.timedelta64(1, 'D')).astype('datetime64[ns]')
    return series.assign_coords(time=times)


def main(outdir='/tmp/nd_tpu_example', subset=None):
    os.makedirs(outdir, exist_ok=True)

    print('loading bundled Sentinel-1 product ...')
    from nd_tpu.io import open_netcdf
    ds = open_netcdf('/root/reference/data/slc.nc', as_complex=True)
    ds = ds.nd.as_real()   # -> C11, C12__re, C12__im, C22
    for v in list(ds.data_vars):
        ds[v] = (ds[v].dims,
                 np.nan_to_num(np.asarray(ds[v].values),
                               nan=0.05).astype(np.float32))
    if subset:
        ds = ds.isel(y=slice(0, subset), x=slice(0, subset))

    series = build_time_series(ds)
    series = series.transpose('y', 'x', 'time')
    print('time series:', dict(series.sizes))

    print('speckle filtering (NLMeans) ...')
    filt = NLMeansFilter(dims=('y', 'x'), r=1, f=1, sigma=0.8,
                         h=1.2).apply(series)

    print('omnibus change detection ...')
    change = OmnibusTest(ml=3, alpha=0.9).apply(filt)
    per_t = np.asarray(change.values).sum(axis=(0, 1))
    print('changed pixels per time step:', per_t.tolist())

    print('exporting ...')
    to_netcdf(change.to_dataset(name='change'),
              os.path.join(outdir, 'change.nc'))
    to_geotiff(change.isel(time=3).astype(np.uint8),
               os.path.join(outdir, 'change_t3.tif'))
    try:
        from nd_tpu.visualize import to_rgb
        rgb_ds = filt.isel(time=0)
        to_rgb([rgb_ds['C11'], rgb_ds['C22'],
                rgb_ds['C11'] / (rgb_ds['C22'] + 1e-9)],
               output=os.path.join(outdir, 'quicklook.png'))
    except ImportError:
        pass
    print('wrote outputs to', outdir)
    return change


if __name__ == '__main__':
    _args = sys.argv[1:]
    main(*( [_args[0]] if _args else [] ),
         subset=int(_args[1]) if len(_args) > 1 else None)
