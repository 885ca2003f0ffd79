"""The dependency-free map renderer produces REAL cartographic pixels.

Unlike the cartopy surface (exercised against a stub in
``test_map_stub.py`` because cartopy/matplotlib are not in this image),
``render_map`` runs end to end here: these tests assert pixel-level
structure — graticule lines present, footprint burned, labels and the
geodesic scale bar rendered — in an actually-written PNG.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from nd_tpu.testing import generate_test_dataset  # noqa: E402
from nd_tpu.visualize_map import render_map  # noqa: E402

EXTENT = (4.0, 50.0, 8.0, 53.0)   # a few degrees over NW Europe


@pytest.fixture(scope='module')
def ds():
    return generate_test_dataset(dims={'y': 12, 'x': 14, 'time': 2},
                                 extent=EXTENT)


@pytest.fixture(scope='module')
def full(ds):
    return render_map(ds, shape=(480, 480))


def test_shape_dtype(full):
    assert full.shape == (480, 480, 3)
    assert full.dtype == np.uint8


def test_zoomed_view_is_on_globe(full, ds):
    # a few-degree footprint view lies entirely on the disk: no pixel
    # carries the space background
    bare = render_map(ds, shape=(480, 480), graticule=False,
                      footprint=False, scalebar=False)
    from nd_tpu.visualize_map import _SPACE
    space = np.all(bare == np.array(_SPACE, np.uint8), axis=-1)
    assert not space.any()
    # ocean shading: blue channel dominates everywhere on the bare map
    assert (bare[..., 2].astype(int) > bare[..., 0].astype(int)).all()


def test_graticule_present(ds, full):
    no_grat = render_map(ds, shape=(480, 480), graticule=False)
    diff = np.any(full != no_grat, axis=-1)
    frac = diff.mean()
    # thin lines + labels: some pixels but nowhere near area fill
    assert 0.002 < frac < 0.15
    # graticule pixels appear in all four quadrants of the view
    hh, ww = diff.shape[0] // 2, diff.shape[1] // 2
    assert diff[:hh, :ww].any() and diff[:hh, ww:].any()
    assert diff[hh:, :ww].any() and diff[hh:, ww:].any()


def test_footprint_burned(ds, full):
    # the footprint centre pixel is red-blended on the full map
    no_fp = render_map(ds, shape=(480, 480), footprint=False)
    diff = np.any(full != no_fp, axis=-1)
    assert diff.any()
    ys, xs = np.nonzero(diff)
    cy, cx = int(ys.mean()), int(xs.mean())
    r, g, b = full[cy, cx].astype(int)
    r0, g0, b0 = no_fp[cy, cx].astype(int)
    assert r > r0                  # red overlay raised the red channel
    assert r > g and r > b         # and dominates locally
    # footprint occupies an interior region, not the frame edge
    assert 40 < cy < 440 and 40 < cx < 440


def test_scalebar_present(ds, full):
    no_bar = render_map(ds, shape=(480, 480), scalebar=False)
    diff = np.any(full != no_bar, axis=-1)
    assert diff.any()
    ys, xs = np.nonzero(diff)
    # drawn in the lower-left corner region
    assert ys.min() > 480 * 0.75
    assert xs.min() < 480 * 0.5


def test_labels_rendered(ds):
    # degree labels render dark ink over a light halo: the graticule
    # diff must contain near-black AND near-white pixels (text + halo),
    # not just the mid-gray lines
    full = render_map(ds, shape=(480, 480), footprint=False,
                      scalebar=False)
    none = render_map(ds, shape=(480, 480), graticule=False,
                      footprint=False, scalebar=False)
    changed = np.any(full != none, axis=-1)
    vals = full[changed].astype(int).sum(axis=1)
    assert (vals < 150).any(), 'no dark label ink found'
    assert (vals > 690).any(), 'no label halo found'


def test_png_written(tmp_path, ds, full):
    path = str(tmp_path / 'map.png')
    img = render_map(ds, shape=(480, 480), output=path)
    back = cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_plot_map_dispatches_without_cartopy(ds, tmp_path):
    import nd_tpu.visualize as vis
    if vis.cartopy is not None:
        pytest.skip('cartopy installed: plot_map uses the cartopy path')
    out = vis.plot_map(ds, output=str(tmp_path / 'pm.png'))
    assert isinstance(out, np.ndarray) and out.ndim == 3
    assert (tmp_path / 'pm.png').exists()


def test_hemisphere_view_shows_limb():
    # a continent-scale footprint zooms out enough that the view
    # includes off-globe space pixels in the corners
    big = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 1},
                                extent=(-60.0, -35.0, 60.0, 65.0))
    img = render_map(big, shape=(400, 400), graticule=False,
                     footprint=False, scalebar=False)
    from nd_tpu.visualize_map import _SPACE
    space = np.all(img == np.array(_SPACE, np.uint8), axis=-1)
    assert space[0, 0] or space[0, -1] or space[-1, 0] or space[-1, -1]
    assert not space[200, 200]
