"""Vector data: geometry types, file ingestion, rasterization."""

from .geometry import (Point, LineString, Polygon, MultiPolygon, box,
                       shape, mapping, transform_geom)
from .shapefile import read_shapefile
from .vector import read_file, rasterize

__all__ = ['Point', 'LineString', 'Polygon', 'MultiPolygon', 'box',
           'shape', 'mapping', 'transform_geom', 'read_shapefile',
           'read_file', 'rasterize']
