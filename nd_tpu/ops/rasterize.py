"""Polygon rasterization on device.

Replaces ``rasterio.features.rasterize`` / ``geometry_mask``
(/root/reference/nd/vector.py:158-183): pixel-center containment is
evaluated as a vectorized even-odd crossing test over all polygon edges
at once — O(pixels x edges) fused array work on the VPU instead of a
scanline loop on the host.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ['polygon_mask', 'rasterize_values']


def _edges_of(geom):
    """Stack all rings of a Polygon/MultiPolygon into edge arrays."""
    from ..vector.geometry import MultiPolygon, Polygon
    rings = []
    if isinstance(geom, Polygon):
        rings = [geom.exterior.as_array()] + \
            [h.as_array() for h in geom.interiors]
    elif isinstance(geom, MultiPolygon):
        for g in geom.geoms:
            rings.append(g.exterior.as_array())
            rings.extend(h.as_array() for h in g.interiors)
    else:
        raise TypeError('cannot rasterize %r' % type(geom))
    p0 = np.concatenate([r[:-1] for r in rings], axis=0)
    p1 = np.concatenate([r[1:] for r in rings], axis=0)
    return p0, p1


def _cell_sizes(coords):
    """Per-axis cell size from (possibly descending) center coords."""
    c = np.asarray(coords, np.float64)
    return float(np.abs(np.diff(c)).mean()) if len(c) > 1 else 1.0


def _point_mask(px, py, xs, ys):
    """Mask of the cells whose center is nearest to each point —
    rasterio's point burning (the cell containing the point)."""
    xs_np = np.asarray(xs, np.float64)
    ys_np = np.asarray(ys, np.float64)
    dx = _cell_sizes(xs_np) / 2
    dy = _cell_sizes(ys_np) / 2
    mask = np.zeros((len(ys_np), len(xs_np)), bool)
    for x, y in zip(np.atleast_1d(px), np.atleast_1d(py)):
        j = int(np.argmin(np.abs(xs_np - x)))
        i = int(np.argmin(np.abs(ys_np - y)))
        if abs(xs_np[j] - x) <= dx + 1e-12 and \
                abs(ys_np[i] - y) <= dy + 1e-12:
            mask[i, j] = True
    return jnp.asarray(mask)


def _line_mask(coords, xs, ys):
    """Cells touched by the polyline: sample each segment at sub-cell
    spacing and burn the containing cells (matches rasterio's
    all-touched-along-the-line behavior closely)."""
    xs_np = np.asarray(xs, np.float64)
    ys_np = np.asarray(ys, np.float64)
    step = min(_cell_sizes(xs_np), _cell_sizes(ys_np)) / 2
    a = np.asarray(coords, np.float64)
    pts = [a[:1]]
    for p0, p1 in zip(a[:-1], a[1:]):
        seg = np.hypot(*(p1 - p0))
        n = max(int(np.ceil(seg / max(step, 1e-12))), 1)
        t = np.linspace(0, 1, n + 1)[1:, None]
        pts.append(p0 + t * (p1 - p0))
    pts = np.concatenate(pts, axis=0)
    return _point_mask(pts[:, 0], pts[:, 1], xs, ys)


def polygon_mask(geom, xs, ys):
    """Boolean (len(ys), len(xs)) mask of the cells covered by
    ``geom``: pixel-center containment (even-odd rule, holes excluded)
    for polygons; the containing cell for points; cells along the path
    for linestrings.
    """
    from ..vector.geometry import LineString, Point
    if isinstance(geom, Point):
        return _point_mask(geom.x, geom.y, xs, ys)
    if isinstance(geom, LineString):
        return _line_mask(geom.coords, xs, ys)
    p0, p1 = _edges_of(geom)
    X = jnp.asarray(xs)[None, :, None]           # (1, nx, 1)
    Y = jnp.asarray(ys)[:, None, None]           # (ny, 1, 1)
    x0 = jnp.asarray(p0[:, 0])[None, None, :]    # (1, 1, E)
    y0 = jnp.asarray(p0[:, 1])[None, None, :]
    x1 = jnp.asarray(p1[:, 0])[None, None, :]
    y1 = jnp.asarray(p1[:, 1])[None, None, :]

    cond = (y0 <= Y) != (y1 <= Y)
    denom = jnp.where(y1 == y0, 1.0, y1 - y0)
    xint = x0 + (Y - y0) / denom * (x1 - x0)
    crossings = jnp.sum(cond & (X < xint), axis=-1)
    return (crossings % 2) == 1


def rasterize_values(geom_value_pairs, xs, ys, fill=0, dtype=None):
    """Burn (geometry, value) pairs onto a grid, later pairs on top.

    Mirrors rasterio.features.rasterize semantics (last geometry wins).
    """
    values = [v for _, v in geom_value_pairs]
    if dtype is None:
        dtype = np.result_type(*(np.asarray(v).dtype
                                 for v in values)) \
            if values else np.float64
    out = jnp.full((len(ys), len(xs)), fill, dtype=dtype)
    for geom, value in geom_value_pairs:
        mask = polygon_mask(geom, xs, ys)
        out = jnp.where(mask, jnp.asarray(value, dtype), out)
    return out
