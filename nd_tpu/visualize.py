"""Quick visualization: RGB export, video writing, cartographic maps.

Parity surface of /root/reference/nd/visualize.py (colorize, to_rgb,
write_video, plot_map). Host-side presentation code on OpenCV/imageio;
``plot_map`` and the geodesic scale bar require cartopy and are gated
with the framework's ``requires`` mechanism (they raise a clean
ImportError when cartopy is unavailable).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
import imageio

from .core import DataArray, Dataset
from .utils import requires

try:
    import cartopy
except ImportError:
    cartopy = None

__all__ = ['colorize', 'to_rgb', 'write_video', 'plot_map',
           'gridlines_with_labels', 'scale_bar', 'calculate_shape',
           'CMAPS']

CMAPS = {}
if cv2 is not None:
    CMAPS = {
        'jet': cv2.COLORMAP_JET,
        'hsv': cv2.COLORMAP_HSV,
        'hot': cv2.COLORMAP_HOT,
        'cool': cv2.COLORMAP_COOL,
    }


def _parse_cmap(cmap):
    if cmap in CMAPS:
        return CMAPS[cmap]
    try:
        return getattr(cv2, 'COLORMAP_{}'.format(str(cmap).upper()))
    except AttributeError:
        return cmap


def calculate_shape(new_shape, orig_shape):
    """Fill in missing height/width, preserving the aspect ratio.

    Parameters
    ----------
    new_shape : tuple or None
        Desired (height, width); either entry may be None.
    orig_shape : tuple
        The original (height, width).

    Returns
    -------
    tuple of int
    """
    if new_shape is None:
        return orig_shape
    height, width = new_shape
    if height is None:
        if width is not None:
            height = width * orig_shape[0] / orig_shape[1]
            height = height // 2 * 2
        else:
            height = orig_shape[0]
            width = orig_shape[1]
    elif width is None:
        width = height * orig_shape[1] / orig_shape[0]
        width = width // 2 * 2
    return (int(height), int(width))


def colorize(labels, N=None, nan_vals=[], cmap='jet'):
    """Apply a colormap to an integer label image -> BGR image."""
    labels = np.asarray(labels)
    if N is None:
        N = min(10, len(np.unique(labels)))
    N = max(N, 2)
    data = (labels % N) * (255 / (N - 1))
    data_gray = cv2.cvtColor(data.astype(np.uint8), cv2.COLOR_GRAY2RGB)
    data_color = cv2.applyColorMap(data_gray, _parse_cmap(cmap))
    for nv in nan_vals:
        data_color[labels == nv] = 0
    return data_color


def to_rgb(data, output=None, vmin=None, vmax=None, pmin=2, pmax=98,
           categorical=False, mask=None, shape=None, cmap=None):
    """Convert data channels into an RGB image (or write it to a file).

    Parameters
    ----------
    data : DataArray, ndarray or list of either
        One (grayscale/colormapped) or three (RGB) 2-d channels.
    output : str, optional
        Output image path; if None the array is returned.
    vmin, vmax : float or list, optional
        Explicit stretch limits per channel.
    pmin, pmax : float, optional
        Percentile stretch when vmin/vmax are absent (default 2/98).
    categorical : bool, optional
        Colorize integer labels instead of stretching.
    mask : ndarray, optional
        Pixels outside the mask are blacked out.
    shape : tuple, optional
        Output (height, width); either may be None.
    cmap : optional
        OpenCV colormap for single-channel data.

    Returns
    -------
    np.ndarray (RGB) or None
    """
    if isinstance(data, list):
        n_channels = len(data)
    elif isinstance(data, (DataArray, np.ndarray)):
        n_channels = 1
        data = [data]
    else:
        raise ValueError('`data` must be a DataArray or list of '
                         'DataArrays')

    for d in data:
        if np.ndim(d) > 2:
            raise ValueError('The RGB channels must be two-dimensional.')

    values = [np.asarray(d) for d in data]
    shape_rgb = values[0].shape + (n_channels,)

    if isinstance(vmin, (int, float)):
        vmin = [vmin] * n_channels
    if isinstance(vmax, (int, float)):
        vmax = [vmax] * n_channels

    if categorical:
        colored = colorize(values[0], nan_vals=[0])
    else:
        im = np.empty(shape_rgb)
        for i in range(n_channels):
            channel = values[i].astype(np.float64)
            minval = vmin[i] if vmin is not None \
                else np.nanpercentile(channel, pmin)
            maxval = vmax[i] if vmax is not None \
                else np.nanpercentile(channel, pmax)
            if maxval > minval:
                channel = (channel - minval) / (maxval - minval) * 255
            im[:, :, i] = channel
        im = np.clip(np.nan_to_num(im), 0, 255).astype(np.uint8)
        if n_channels == 1:
            colored = cv2.cvtColor(im[:, :, 0], cv2.COLOR_GRAY2BGR)
            if cmap is not None:
                colored = cv2.applyColorMap(colored, _parse_cmap(cmap))
        else:
            colored = cv2.cvtColor(im, cv2.COLOR_RGB2BGR)

    if mask is not None:
        colored[~np.asarray(mask)] = 0

    shape = calculate_shape(shape, colored.shape[:2])
    colored = cv2.resize(colored, shape[::-1])

    if output is None:
        return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
    cv2.imwrite(output, colored)


def write_video(ds, path, timestamp='upper left', fontcolor=(0, 0, 0),
                width=None, height=None, fps=1, codec=None, rgb=None,
                cmap=None, mask=None, contours=None, **kwargs):
    """Render the time axis of a dataset as a video (or GIF).

    Parameters
    ----------
    ds : Dataset or DataArray with dims y, x, time.
    path : str
        Output video path (codec from extension; .gif supported).
    timestamp : str or None, optional
        Timestamp stamp corner ('upper left', 'lr', ... or None).
    fontcolor : tuple, optional
        Timestamp color (default black).
    width, height : int, optional
        Output size (default: dataset size, aspect preserved).
    fps : int, optional
        Frames per second (default 1).
    codec : str, optional
        fourcc codec for non-GIF output (default libx264).
    rgb : callable, optional
        Maps each time slice to RGB channels; default C11/C22/ratio
        for Datasets, grayscale for DataArrays.
    cmap, mask :
        Forwarded to :func:`to_rgb`.
    """
    if rgb is None:
        if isinstance(ds, DataArray):
            def rgb(d):
                return d
        else:
            def rgb(d):
                return [d['C11'], d['C22'], d['C11'] / d['C22']]

    height, width = calculate_shape(
        (height, width),
        (len(np.asarray(ds.coords['y'].values)),
         len(np.asarray(ds.coords['x'].values))))

    if timestamp in ('upper right', 'ur'):
        corner = (width - 230, 40)
    elif timestamp in ('lower left', 'll'):
        corner = (20, height - 20)
    elif timestamp in ('lower right', 'lr'):
        corner = (width - 230, height - 20)
    else:
        corner = (20, 40)

    _, ext = os.path.splitext(path)
    writer_kwargs = {'mode': 'I', 'fps': fps}
    writer_kwargs.update(kwargs)
    if ext != '.gif':
        writer_kwargs['macro_block_size'] = None
        writer_kwargs['ffmpeg_log_level'] = 'error'
        writer_kwargs['codec'] = codec or 'libx264'

    with imageio.get_writer(path, **writer_kwargs) as writer:
        for t in np.asarray(ds.coords['time'].values):
            d = ds.sel(time=t)
            frame = to_rgb(rgb(d), cmap=cmap, mask=mask)
            if contours is not None:
                frame = cv2.drawContours(frame, contours, -1,
                                         (255, 255, 255), thickness=1)
            frame = cv2.resize(frame, (width, height))
            if timestamp not in (False, None):
                cv2.putText(frame, str(t)[:10], corner,
                            cv2.FONT_HERSHEY_SIMPLEX, 1, fontcolor, 2)
            writer.append_data(frame)


@requires('cartopy')
def plot_map(ds, buffer=None, background='_default', imscale=6,
             gridlines=True, coastlines=True, scalebar=True,
             gridlines_kwargs={}):
    """Plot a dataset's footprint on an orthographic basemap.

    Requires cartopy (optional dependency).
    """
    import matplotlib.pyplot as plt
    import cartopy.crs as ccrs
    from . import warp

    extent = warp.get_extent(ds)
    lon0 = (extent.left + extent.right) / 2
    lat0 = (extent.bottom + extent.top) / 2
    proj = ccrs.Orthographic(lon0, lat0)
    ax = plt.axes(projection=proj)
    if coastlines:
        ax.coastlines()
    geom = warp.get_geometry(ds)
    xs = [c[0] for c in geom.exterior.coords]
    ys = [c[1] for c in geom.exterior.coords]
    ax.plot(xs, ys, transform=ccrs.PlateCarree(), color='red')
    if gridlines:
        ax.gridlines(**gridlines_kwargs)
    ax.set_global()
    return ax


@requires('cartopy')
def gridlines_with_labels(ax, top=True, bottom=True, left=True,
                          right=True, **kwargs):
    """Draw gridlines with degree labels on a cartopy axis, including
    projections where cartopy cannot label automatically.

    Requires cartopy (optional dependency).
    """
    import cartopy.crs as ccrs
    import matplotlib.ticker as mticker

    gl = ax.gridlines(draw_labels=False, **kwargs)
    gl.xlocator = mticker.MaxNLocator(8)
    gl.ylocator = mticker.MaxNLocator(8)

    # Project graticule intersections with the axes boundary and place
    # text labels manually (works for arbitrary projections).
    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    pc = ccrs.PlateCarree()
    edges = {
        'bottom': ([x0 + (x1 - x0) * f for f in
                    np.linspace(0.1, 0.9, 5)], y0, bottom, (0, -12)),
        'left': (x0, [y0 + (y1 - y0) * f for f in
                      np.linspace(0.1, 0.9, 5)], left, (-30, 0)),
    }
    for name, spec in edges.items():
        if name == 'bottom':
            xs, y, enabled, offset = spec
            pts = [(x, y) for x in xs]
        else:
            x, ys, enabled, offset = spec
            pts = [(x, y) for y in ys]
        if not enabled:
            continue
        for (px, py) in pts:
            lonlat = pc.transform_point(px, py, ax.projection)
            if not np.all(np.isfinite(lonlat)):
                continue
            lon, lat = lonlat
            label = ('%.1f°%s' % (abs(lon), 'E' if lon >= 0 else 'W')
                     if name == 'bottom' else
                     '%.1f°%s' % (abs(lat), 'N' if lat >= 0 else 'S'))
            ax.annotate(label, xy=(px, py), xytext=offset,
                        textcoords='offset points', fontsize=8,
                        ha='center', va='top')
    return gl


@requires('cartopy')
def scale_bar(ax, length_km=None, location=(0.1, 0.05), linewidth=3):
    """Draw a geodesic scale bar on a cartopy axis.

    The bar length is computed with the framework's own geodesic math
    (no cartopy.geodesic needed). Requires cartopy for the axis.
    """
    import cartopy.crs as ccrs

    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    sbx = x0 + (x1 - x0) * location[0]
    sby = y0 + (y1 - y0) * location[1]
    pc = ccrs.PlateCarree()
    lon0, lat0 = pc.transform_point(sbx, sby, ax.projection)
    lon1, lat1 = pc.transform_point(sbx + (x1 - x0) * 0.2, sby,
                                    ax.projection)
    # haversine ground distance of 20% of the view width
    R = 6371.0088
    dlat = np.radians(lat1 - lat0)
    dlon = np.radians(lon1 - lon0)
    a = (np.sin(dlat / 2) ** 2 + np.cos(np.radians(lat0))
         * np.cos(np.radians(lat1)) * np.sin(dlon / 2) ** 2)
    span_km = 2 * R * np.arcsin(np.sqrt(a))
    if length_km is None:
        # round to a nice number
        mag = 10 ** np.floor(np.log10(max(span_km, 1e-6)))
        length_km = float(int(span_km / mag) * mag) or mag
    frac = length_km / span_km * 0.2
    ax.plot([sbx, sbx + (x1 - x0) * frac], [sby, sby],
            transform=ax.projection, color='k', linewidth=linewidth)
    ax.text(sbx + (x1 - x0) * frac / 2, sby + (y1 - y0) * 0.01,
            '%g km' % length_km, ha='center', va='bottom', fontsize=8)
    return length_km
