"""Vector data: geometry types, file ingestion, rasterization."""

from .geometry import (Point, LineString, Polygon, MultiPolygon, box,
                       shape, mapping, transform_geom)

__all__ = ['Point', 'LineString', 'Polygon', 'MultiPolygon', 'box',
           'shape', 'mapping', 'transform_geom']
