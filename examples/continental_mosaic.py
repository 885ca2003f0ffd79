"""Continental equal-area mosaic: reproject heterogeneous scenes onto
one production grid (ETRS89-LAEA Europe, EPSG:3035) and mosaic them.

Demonstrates the round-2 projection families: scenes arrive in
different CRS (a UTM zone, geographic, Web Mercator), are reprojected
onto the common Lambert-azimuthal-equal-area grid — the standard
European reporting grid — and merged. Equal-area grids make pixel
counts area-proportional, which is what continental statistics
(deforestation, burnt area, crop extent) need.

Run: JAX_PLATFORMS=cpu python examples/continental_mosaic.py
"""

import numpy as np

import nd_tpu  # noqa: F401
from nd_tpu.crs import CRS, transform_coords
from nd_tpu.testing import generate_test_dataset
from nd_tpu.warp import Reprojection, get_crs


def make_scenes():
    """Three overlapping scenes over central Europe, each in its own
    CRS (as downloaded products would be)."""
    scenes = []
    # geographic scene (as Sentinel-3 style products ship)
    scenes.append(generate_test_dataset(
        dims={'y': 60, 'x': 80, 'time': 2},
        extent=(6.0, 46.0, 14.0, 52.0)))
    # the same region's neighbours, reprojected into UTM 32N and
    # Web Mercator to emulate multi-source inputs
    utm = generate_test_dataset(dims={'y': 60, 'x': 80, 'time': 2},
                                extent=(10.0, 46.0, 18.0, 52.0))
    scenes.append(Reprojection(crs='epsg:32632').apply(utm))
    web = generate_test_dataset(dims={'y': 60, 'x': 80, 'time': 2},
                                extent=(2.0, 44.0, 10.0, 50.0))
    scenes.append(Reprojection(crs='epsg:3857').apply(web))
    return scenes


def mosaic(scenes, res=20000.0):
    """Reproject every scene onto EPSG:3035 at ``res`` metres and
    average the overlaps."""
    # one common grid covering every scene
    corners = []
    for s in scenes:
        src = get_crs(s)
        xs = np.asarray(s.coords['x'].values)
        ys = np.asarray(s.coords['y'].values)
        bx = np.array([xs.min(), xs.max(), xs.min(), xs.max()])
        by = np.array([ys.min(), ys.min(), ys.max(), ys.max()])
        ex, ey = transform_coords(src, 'epsg:3035', bx, by)
        corners.append((np.min(ex), np.min(ey), np.max(ex),
                        np.max(ey)))
    left = min(c[0] for c in corners)
    bottom = min(c[1] for c in corners)
    right = max(c[2] for c in corners)
    top = max(c[3] for c in corners)

    proj = Reprojection(crs='epsg:3035',
                        extent=(left, bottom, right, top), res=res)
    acc = None
    cnt = None
    for s in scenes:
        warped = proj.apply(s)
        vals = np.asarray(warped['C11'].transpose(
            'y', 'x', 'time').values, np.float64)
        good = np.isfinite(vals)
        if acc is None:
            acc = np.where(good, vals, 0.0)
            cnt = good.astype(np.int32)
        else:
            acc += np.where(good, vals, 0.0)
            cnt += good
        out_grid = warped
    with np.errstate(invalid='ignore'):
        mean = np.where(cnt > 0, acc / np.maximum(cnt, 1), np.nan)
    out = out_grid.copy()
    out['C11'] = (('y', 'x', 'time'), mean)
    return out, cnt


def main():
    scenes = make_scenes()
    out, cnt = mosaic(scenes)
    assert get_crs(out) == CRS.from_epsg(3035)
    covered = float((cnt.max(axis=-1) if cnt.ndim == 3
                     else cnt).astype(bool).mean())
    print('mosaic grid: %s px on EPSG:3035, %.0f%% covered, '
          'overlap depth up to %d scenes'
          % (dict(out.sizes), covered * 100, int(cnt.max())))
    return out


if __name__ == '__main__':
    main()
