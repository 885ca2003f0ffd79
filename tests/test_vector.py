"""Vector tests: geometry ops, shapefile reading, device rasterization."""

import numpy as np
import pytest

from nd_tpu.testing import (generate_test_dataset,
                            generate_test_geodataframe)
from nd_tpu.vector import (Point, Polygon, box, rasterize, read_file,
                           read_shapefile)
from nd_tpu.vector.geometry import MultiPolygon, shape, mapping


def test_polygon_basics():
    p = box(0, 0, 2, 2)
    assert p.bounds == (0, 0, 2, 2)
    assert np.isclose(p.area, 4)
    assert p.contains(Point(1, 1))
    assert not p.contains(Point(3, 1))


def test_polygon_with_hole():
    p = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)],
                holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]])
    assert p.contains(Point(0.5, 0.5))
    assert not p.contains(Point(2, 2))
    assert np.isclose(p.area, 16 - 4)


def test_polygon_intersects():
    a = box(0, 0, 2, 2)
    b = box(1, 1, 3, 3)
    c = box(5, 5, 6, 6)
    assert a.intersects(b)
    assert not a.intersects(c)


def test_geojson_mapping_roundtrip():
    p = box(0, 0, 2, 2)
    m = mapping(p)
    p2 = shape(m)
    assert p2.bounds == p.bounds


def test_read_reference_shapefile():
    geoms, records, crs = read_shapefile(
        '/root/reference/data/labels.shp')
    assert len(geoms) == len(records)
    assert len(geoms) > 0
    assert all(g.geom_type in ('Polygon', 'MultiPolygon')
               for g in geoms if g is not None)


def test_read_file_with_clip():
    df = read_file('/root/reference/data/labels.shp')
    assert 'geometry' in df.columns
    full = len(df)
    g0 = df['geometry'][0]
    clipped = read_file('/root/reference/data/labels.shp',
                        clip=box(*g0.bounds))
    assert 1 <= len(clipped) <= full


def test_rasterize_numeric():
    ds = generate_test_dataset(dims={'y': 40, 'x': 40, 'time': 3})
    df = generate_test_geodataframe(n=5, random_seed=1)
    raster = rasterize(df, ds, columns=['float'])
    assert 'float' in raster.data_vars
    assert raster['float'].dims == ('y', 'x', 'time')
    assert raster.sizes['y'] == 40
    vals = np.asarray(raster['float'].values)
    assert (vals != 0).any()


def test_rasterize_categorical_encoding():
    ds = generate_test_dataset(dims={'y': 40, 'x': 40, 'time': 3})
    df = generate_test_geodataframe(n=6, random_seed=2)
    raster = rasterize(df, ds, columns=['category'])
    var = raster._variables['category']
    assert 'legend' in var.attrs
    legend = dict(var.attrs['legend'])
    assert legend[0] is None
    vals = np.asarray(raster['category'].values)
    assert vals.max() >= 1


def test_rasterize_date_field():
    ds = generate_test_dataset(dims={'y': 30, 'x': 30, 'time': 3})
    df = generate_test_geodataframe(n=6, random_seed=3)
    raster = rasterize(df, ds, columns=['integer'], date_field='date')
    n_dates = len(np.unique(np.asarray(df['date'].values)))
    assert raster.sizes['time'] == n_dates


def test_rasterize_values_inside_polygon():
    """Pixels at a polygon's centroid carry its burned value."""
    ds = generate_test_dataset(dims={'y': 50, 'x': 50, 'time': 2})
    df = generate_test_geodataframe(n=4, random_seed=4)
    raster = rasterize(df, ds, columns=['integer'])
    ys = np.asarray(ds['y'].values)
    xs = np.asarray(ds['x'].values)
    burned = np.asarray(raster['integer'].isel(time=0).values)
    hits = 0
    for _, row in df.iterrows():
        c = row['geometry'].centroid
        i = int(np.argmin(np.abs(ys - c.y)))
        j = int(np.argmin(np.abs(xs - c.x)))
        if row['geometry'].contains(Point(xs[j], ys[i])):
            assert burned[i, j] == row['integer']
            hits += 1
    assert hits >= 2


def test_read_geojson(tmp_path):
    import json
    gj = {
        'type': 'FeatureCollection',
        'features': [
            {'type': 'Feature',
             'properties': {'name': 'a', 'value': 1.5},
             'geometry': {'type': 'Polygon',
                          'coordinates': [[[0, 0], [2, 0], [2, 2],
                                           [0, 2], [0, 0]]]}},
            {'type': 'Feature',
             'properties': {'name': 'b', 'value': 2.5},
             'geometry': {'type': 'Point', 'coordinates': [5, 5]}},
            {'type': 'Feature', 'properties': {'name': 'none'},
             'geometry': None},
        ],
    }
    p = str(tmp_path / 'features.geojson')
    json.dump(gj, open(p, 'w'))
    df = read_file(p)
    assert len(df) == 2  # null geometry dropped
    assert df['geometry'][0].geom_type == 'Polygon'
    assert df['value'][1] == 2.5
    clipped = read_file(p, clip=box(4, 4, 6, 6))
    assert len(clipped) == 1
    assert clipped['name'].iloc[0] == 'b'


def test_point_linestring_intersects():
    """Point/LineString clip geometries must not crash intersects()
    (read_file(clip=...) dispatches Point args to contains())."""
    from nd_tpu.vector.geometry import LineString, Point, box
    p = Point(0.5, 0.5)
    assert p.intersects(Point(0.5, 0.5))
    assert not p.intersects(Point(2.0, 0.5))
    ln = LineString([(0, 0), (1, 1)])
    assert ln.intersects(Point(0.5, 0.5))
    assert not ln.intersects(Point(0.9, 0.1))
    assert box(0, 0, 1, 1).intersects(p)


def test_rasterize_points_and_lines():
    """Point and LineString geometries burn onto the grid (the
    reference's rasterio.features.rasterize handles them)."""
    import jax.numpy as jnp
    from nd_tpu.ops.rasterize import rasterize_values
    from nd_tpu.vector.geometry import LineString, Point
    xs = np.arange(10) + 0.5
    ys = np.arange(8) + 0.5
    out = np.asarray(rasterize_values(
        [(Point(3.4, 2.6), 7), (LineString([(0.5, 0.5), (6.5, 6.5)]),
                                2)], xs, ys, fill=0))
    assert out[2, 3] == 7                     # point's containing cell
    assert out[out == 2].size >= 6            # line touched >= 6 cells


def test_dbf_unset_date_is_none(tmp_path):
    """Blank DBF date fields read as None (fiona parity), not ''. """
    import datetime
    import struct
    dbf = tmp_path / 't.dbf'
    # minimal dbf: 1 field 'D' date, 2 records (one blank)
    nrec, hdr_len, rec_len = 2, 32 + 32 + 1, 1 + 8
    header = struct.pack('<BBBBIHH20x', 3, 24, 1, 1, nrec, hdr_len,
                         rec_len)
    field = b'DATE\x00\x00\x00\x00\x00\x00\x00' + b'D' + b'\x00' * 4 \
        + bytes([8]) + b'\x00' * 15
    recs = b' ' + b'20200115' + b' ' + b' ' * 8
    dbf.write_bytes(header + field + b'\x0d' + recs + b'\x1a')
    from nd_tpu.vector.shapefile import _read_dbf
    rows = _read_dbf(str(dbf))
    assert rows[0]['DATE'] == datetime.date(2020, 1, 15)
    assert rows[1]['DATE'] is None


def test_to_file_geojson_roundtrip(tmp_path):
    """to_file writes RFC 7946 GeoJSON that read_file round-trips."""
    from nd_tpu.testing import generate_test_geodataframe
    from nd_tpu.vector import read_file, to_file

    df = generate_test_geodataframe()
    path = str(tmp_path / 'out.geojson')
    to_file(df, path)
    back = read_file(path)
    assert len(back) == len(df)
    for a, b in zip(df['geometry'], back['geometry']):
        if hasattr(a, 'area'):
            assert abs(a.area - b.area) < 1e-9
    # properties survive with JSON-safe types
    prop_cols = [c for c in df.columns if c != 'geometry']
    for c in prop_cols:
        assert c in back.columns


def test_to_file_reprojects_to_wgs84(tmp_path):
    """A table in a projected CRS is written in lon/lat (RFC 7946)."""
    import json

    from nd_tpu.vector import to_file
    from nd_tpu.vector.geometry import Point
    import pandas as pd

    df = pd.DataFrame({'name': ['bern']})
    df['geometry'] = [Point(2600000.0, 1200000.0)]   # LV95 origin
    path = str(tmp_path / 'pt.geojson')
    to_file(df, path, crs='epsg:2056')
    gj = json.load(open(path))
    lon, lat = gj['features'][0]['geometry']['coordinates']
    # the CH1903+ -> WGS84 datum shift moves Bern by ~70 m: the
    # true WGS84 position of the LV95 false origin
    assert abs(lon - 7.438632) < 1e-4
    assert abs(lat - 46.951083) < 1e-3
