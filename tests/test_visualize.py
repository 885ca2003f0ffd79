"""Visualization tests: RGB conversion, colorize, video writing."""

import os

import numpy as np
import pytest

from nd_tpu.testing import generate_test_dataset
from nd_tpu.visualize import (calculate_shape, colorize, to_rgb,
                              write_video)


@pytest.fixture
def ds():
    return generate_test_dataset(dims={'y': 24, 'x': 32, 'time': 3})


def test_calculate_shape():
    assert calculate_shape(None, (10, 20)) == (10, 20)
    assert calculate_shape((None, None), (10, 20)) == (10, 20)
    assert calculate_shape((5, None), (10, 20)) == (5, 10)
    assert calculate_shape((None, 10), (10, 20)) == (4, 10)
    assert calculate_shape((7, 9), (10, 20)) == (7, 9)


def test_to_rgb_single_channel(ds):
    img = to_rgb(ds['C11'].isel(time=0))
    assert img.shape == (24, 32, 3)
    assert img.dtype == np.uint8


def test_to_rgb_three_channels(ds):
    d = ds.isel(time=0)
    img = to_rgb([d['C11'], d['C22'], d['C11'] / d['C22']])
    assert img.shape == (24, 32, 3)


def test_to_rgb_vmin_vmax(ds):
    ch = ds['C11'].isel(time=0)
    img1 = to_rgb(ch, vmin=-1, vmax=1)
    img2 = to_rgb(ch, vmin=-10, vmax=10)
    assert img1.std() > img2.std()


def test_to_rgb_mask_and_shape(ds):
    ch = ds['C11'].isel(time=0)
    mask = np.zeros((24, 32), dtype=bool)
    mask[5:10, 5:10] = True
    img = to_rgb(ch, mask=mask)
    assert (img[0, 0] == 0).all()
    img2 = to_rgb(ch, shape=(12, 16))
    assert img2.shape == (12, 16, 3)


def test_to_rgb_categorical():
    labels = np.random.RandomState(0).randint(0, 4, size=(16, 16))
    img = to_rgb(labels, categorical=True)
    assert img.shape == (16, 16, 3)
    assert (img[labels == 0] == 0).all()


def test_to_rgb_rejects_3d(ds):
    with pytest.raises(ValueError):
        to_rgb(ds['C11'])


def test_to_rgb_write(tmp_path, ds):
    out = str(tmp_path / 'img.png')
    to_rgb(ds['C11'].isel(time=0), output=out)
    assert os.path.exists(out)


def test_colorize():
    labels = np.arange(16).reshape(4, 4) % 3
    img = colorize(labels, N=3)
    assert img.shape == (4, 4, 3)


def test_write_video_gif(tmp_path, ds):
    path = str(tmp_path / 'video.gif')
    write_video(ds, path, fps=2)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_accessor_to_rgb(ds):
    img = ds.isel(time=0).nd.to_rgb()
    assert img.shape == (24, 32, 3)


def test_plot_map_renders_without_cartopy():
    # cartopy-less images no longer lose the map stack: plot_map
    # falls back to the framework's own renderer (render_map) and
    # returns the RGB image instead of raising
    try:
        import cartopy  # noqa: F401
        pytest.skip('cartopy installed; fallback not exercised')
    except ImportError:
        pass
    from nd_tpu.visualize import plot_map
    ds = generate_test_dataset(dims={'y': 8, 'x': 8, 'time': 1})
    out = plot_map(ds)
    assert isinstance(out, np.ndarray)
    assert out.ndim == 3 and out.dtype == np.uint8
