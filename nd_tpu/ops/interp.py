"""Gather-based resampling on device.

This is the TPU replacement for the GDAL warper the reference calls into
(``rasterio.warp.reproject``, /root/reference/nd/warp.py:758-767): the
destination grid is mapped to fractional source pixel coordinates (host
or device), and the values are gathered + interpolated on the TPU.
Nearest and bilinear modes with NaN nodata semantics (any out-of-range
target, or any NaN contributor, yields NaN).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ['map_coordinates', 'grid_from_transforms']


def map_coordinates(values, rows, cols, method='bilinear', cval=np.nan):
    """Sample ``values`` at fractional pixel coordinates.

    Parameters
    ----------
    values : array (..., H, W)
        Source raster(s); leading dims are batched.
    rows, cols : arrays of identical shape S
        Fractional pixel coordinates to sample at.
    method : {'bilinear', 'nearest'}
    cval : float
        Fill value for out-of-bounds samples (default NaN).

    Returns
    -------
    array (..., *S)
    """
    values = jnp.asarray(values)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    H, W = values.shape[-2], values.shape[-1]
    batch_shape = values.shape[:-2]
    out_shape = rows.shape

    flat = values.reshape((-1, H, W))
    r = rows.reshape(-1)
    c = cols.reshape(-1)

    if method == 'nearest':
        ri = jnp.round(r).astype(jnp.int32)
        ci = jnp.round(c).astype(jnp.int32)
        valid = (ri >= 0) & (ri < H) & (ci >= 0) & (ci < W)
        ri = jnp.clip(ri, 0, H - 1)
        ci = jnp.clip(ci, 0, W - 1)
        out = flat[:, ri, ci]
        if jnp.issubdtype(out.dtype, jnp.floating) or \
                jnp.issubdtype(out.dtype, jnp.complexfloating):
            fill = jnp.asarray(cval, out.dtype)          # NaN is fine
        else:
            # integer rasters can't hold NaN; use 0 as the nodata
            # sentinel (the reference's int-nodata convention)
            try:
                is_nan = bool(np.isnan(cval))
            except (TypeError, ValueError):
                is_nan = False
            fill = jnp.asarray(0 if is_nan else cval, out.dtype)
        out = jnp.where(valid[None, :], out, fill)
    elif method == 'bilinear':
        # tolerate float rounding at the raster boundary (identity
        # warps must keep edge pixels valid)
        eps = 1e-6
        valid = (r >= -eps) & (r <= H - 1 + eps) & \
            (c >= -eps) & (c <= W - 1 + eps)
        r = jnp.clip(r, 0, H - 1)
        c = jnp.clip(c, 0, W - 1)
        r0 = jnp.floor(r)
        c0 = jnp.floor(c)
        fr = (r - r0)
        fc = (c - c0)
        r0i = r0.astype(jnp.int32)
        c0i = c0.astype(jnp.int32)
        r0c = jnp.clip(r0i, 0, H - 1)
        r1c = jnp.clip(r0i + 1, 0, H - 1)
        c0c = jnp.clip(c0i, 0, W - 1)
        c1c = jnp.clip(c0i + 1, 0, W - 1)
        v00 = flat[:, r0c, c0c]
        v01 = flat[:, r0c, c1c]
        v10 = flat[:, r1c, c0c]
        v11 = flat[:, r1c, c1c]
        fr = fr[None, :].astype(v00.dtype)
        fc = fc[None, :].astype(v00.dtype)
        out = (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc
               + v10 * fr * (1 - fc) + v11 * fr * fc)
        out = jnp.where(valid[None, :], out,
                        jnp.asarray(cval, out.dtype))
    else:
        raise ValueError('unknown method %r' % method)

    return out.reshape(batch_shape + out_shape)


def grid_from_transforms(dst_transform, dst_shape, src_transform,
                         src_crs=None, dst_crs=None, xp=jnp):
    """Fractional source-pixel coordinates for every destination pixel.

    Uses the framework's corner-grid convention: the coordinate of pixel
    (row, col) is ``transform * (col, row)``. CRS transforms run as pure
    array math (device-capable via ``nd_tpu.crs.transform_coords``).
    """
    from ..crs import transform_coords

    height, width = dst_shape
    jj = xp.arange(width, dtype=xp.float64 if xp is np else None)
    ii = xp.arange(height, dtype=xp.float64 if xp is np else None)
    J, I = xp.meshgrid(jj, ii)
    X = dst_transform.a * J + dst_transform.b * I + dst_transform.c
    Y = dst_transform.d * J + dst_transform.e * I + dst_transform.f

    if src_crs is not None and dst_crs is not None and \
            not (src_crs == dst_crs):
        X, Y = transform_coords(dst_crs, src_crs, X, Y, xp=xp)

    from ..crs.affine import Affine
    inv = ~src_transform if isinstance(src_transform, Affine) \
        else ~Affine(*src_transform)
    cols = inv.a * X + inv.b * Y + inv.c
    rows = inv.d * X + inv.e * Y + inv.f
    return rows, cols
