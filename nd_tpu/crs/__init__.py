"""From-scratch CRS / affine / projection library (no GDAL, no PROJ)."""

from .affine import Affine
from .crs import CRS, transform_coords
from .proj import Ellipsoid, ELLIPSOIDS

__all__ = ['Affine', 'CRS', 'transform_coords', 'Ellipsoid', 'ELLIPSOIDS']
