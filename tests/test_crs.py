"""CRS / projection engine tests: parsing, round-trips, known values."""

import numpy as np
import pytest

from nd_tpu.crs import CRS, Affine, transform_coords
from nd_tpu.crs.proj import ELLIPSOIDS, meridian_arc, \
    inverse_meridian_arc

wgs84 = CRS.from_epsg(4326)


# ---------------------------------------------------------------------------
# parsing and equality
# ---------------------------------------------------------------------------

def test_parse_equivalent_forms():
    forms = [CRS.from_epsg(4326), CRS.from_string('epsg:4326'),
             CRS({'init': 'epsg:4326'}),
             CRS.from_proj4('+proj=longlat +datum=WGS84'),
             CRS.from_wkt(wgs84.wkt)]
    for f in forms:
        assert f == wgs84


def test_parse_utm_proj4():
    c = CRS.from_proj4('+proj=utm +zone=32 +datum=WGS84')
    assert c == CRS.from_epsg(32632)
    s = CRS.from_proj4('+proj=utm +zone=33 +south +datum=WGS84')
    assert s == CRS.from_epsg(32733)


def test_crs_inequality():
    assert CRS.from_epsg(4326) != CRS.from_epsg(3395)
    assert CRS.from_epsg(32632) != CRS.from_epsg(32633)


def test_crs_properties():
    assert wgs84.is_geographic and not wgs84.is_projected
    m = CRS.from_epsg(3395)
    assert m.is_projected
    assert m.linear_units == 'm'
    assert wgs84.linear_units == 'degree'
    assert wgs84.to_epsg() == 4326


def test_wkt_roundtrip_projected():
    for code in (3395, 3857, 32632, 27700):
        c = CRS.from_epsg(code)
        c2 = CRS.from_wkt(c.wkt)
        assert c == c2, code


def test_invalid_epsg():
    with pytest.raises(ValueError):
        CRS.from_epsg(99999)


# ---------------------------------------------------------------------------
# known transform values (published references)
# ---------------------------------------------------------------------------

def test_web_mercator_known_value():
    x, y = transform_coords(4326, 3857, np.array([10.0]),
                            np.array([50.0]))
    assert abs(x[0] - 1113194.9079) < 0.01
    assert abs(y[0] - 6446275.841) < 0.01


def test_world_mercator_known_value():
    x, y = transform_coords(4326, 3395, np.array([10.0]),
                            np.array([50.0]))
    assert abs(x[0] - 1113194.9079) < 0.01
    assert abs(y[0] - 6413524.594) < 0.01


def test_utm_central_meridian():
    x, y = transform_coords(4326, 32632, np.array([9.0]),
                            np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-3
    assert abs(y[0]) < 1e-3


def test_osgb_greenwich():
    # Royal Observatory Greenwich in OSGB36 national grid
    x, y = transform_coords(4326, 27700, np.array([-0.0015]),
                            np.array([51.4778]))
    assert abs(x[0] - 538883) < 20
    assert abs(y[0] - 177320) < 20


@pytest.mark.parametrize('code', [3395, 3857, 32601, 32632, 32733,
                                  27700])
def test_roundtrip_accuracy(code):
    rng = np.random.RandomState(0)
    lon0 = {32601: -177, 32632: 9, 32733: 15}.get(code, 0)
    lon = lon0 + rng.uniform(-2.5, 2.5, 50)
    lat = rng.uniform(-60 if code == 32733 else 5, -5 if code == 32733
                      else 65, 50)
    x, y = transform_coords(4326, code, lon, lat)
    lon2, lat2 = transform_coords(code, 4326, x, y)
    # datum-shifted CRS drop ellipsoidal heights: ~1e-7 deg (~1.5 cm)
    # residual is inherent to 2-D Helmert round-trips
    atol = 5e-7 if code == 27700 else 1e-8
    np.testing.assert_allclose(lon2, lon, atol=atol)
    np.testing.assert_allclose(lat2, lat, atol=atol)


def test_sinusoidal_roundtrip():
    sinu = CRS.from_proj4('+proj=sinu +lon_0=0 +x_0=0 +y_0=0 '
                          '+ellps=WGS84')
    lon = np.array([10.0, -120.0, 45.0])
    lat = np.array([50.0, -33.0, 70.0])
    x, y = transform_coords(4326, sinu, lon, lat)
    lon2, lat2 = transform_coords(sinu, 4326, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)


def test_meridian_arc_inverse():
    ell = ELLIPSOIDS['WGS84']
    phi = np.radians(np.linspace(-80, 80, 33))
    m = meridian_arc(phi, ell)
    back = inverse_meridian_arc(m, ell)
    np.testing.assert_allclose(back, phi, atol=1e-12)
    # quarter meridian ~ 10001965.7 m
    q = meridian_arc(np.pi / 2, ell)
    assert abs(q - 10001965.729) < 0.01


def test_transform_on_device():
    """CRS math must be jittable (device coordinate grids)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(lon, lat):
        return transform_coords(4326, 3395, lon, lat, xp=jnp)

    x, y = go(jnp.asarray([10.0]), jnp.asarray([50.0]))
    assert abs(float(x[0]) - 1113194.9079) < 0.01


# ---------------------------------------------------------------------------
# Affine
# ---------------------------------------------------------------------------

def test_affine_algebra():
    a = Affine(0.5, 0, 10, 0, -0.5, 20)
    assert (~a * (a * (3, 4))) == (3.0, 4.0)
    b = Affine.translation(1, 2) * Affine.scale(2)
    assert b * (1, 1) == (3.0, 4.0)
    assert Affine.from_gdal(*a.to_gdal()) == a
    assert a.determinant == -0.25
    xs, ys = a * (np.array([0, 1]), np.array([0, 1]))
    np.testing.assert_allclose(xs, [10, 10.5])
    np.testing.assert_allclose(ys, [20, 19.5])


def test_polar_stereographic_known_values():
    """EPSG:3413 (NSIDC Sea Ice Polar Stereographic North)."""
    # North pole maps to the origin
    x, y = transform_coords(4326, 3413, np.array([0.0]),
                            np.array([90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # At the true-scale parallel on the central meridian, the radius
    # equals a*m_c analytically (rho(lat_ts) = a m(lat_ts) t/t_c with
    # t = t_c): x = 0, y = -a cos(70)/sqrt(1 - e^2 sin^2 70)
    import math
    e2 = 0.00669437999014
    rho = 6378137.0 * math.cos(math.radians(70)) \
        / math.sqrt(1 - e2 * math.sin(math.radians(70)) ** 2)
    x, y = transform_coords(4326, 3413, np.array([-45.0]),
                            np.array([70.0]))
    assert abs(x[0]) < 1e-6
    assert abs(y[0] + rho) < 0.01


def test_polar_stereographic_roundtrips():
    rng = np.random.RandomState(0)
    lon = rng.uniform(-180, 180, 40)
    lat = rng.uniform(55, 89.5, 40)
    x, y = transform_coords(4326, 3413, lon, lat)
    lon2, lat2 = transform_coords(3413, 4326, x, y)
    np.testing.assert_allclose(((lon2 - lon + 180) % 360) - 180, 0,
                               atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # Antarctic
    lat_s = rng.uniform(-89.5, -60, 40)
    x, y = transform_coords(4326, 3031, lon, lat_s)
    lon2, lat2 = transform_coords(3031, 4326, x, y)
    np.testing.assert_allclose(((lon2 - lon + 180) % 360) - 180, 0,
                               atol=1e-8)
    np.testing.assert_allclose(lat2, lat_s, atol=1e-8)


def test_mercator_lat_ts_scale():
    """+lat_ts implies k0 = cos(phi)/sqrt(1-e2 sin2 phi) (PROJ merc)."""
    import math
    from nd_tpu.crs import CRS, transform_coords
    c0 = CRS.from_proj4('+proj=merc +ellps=WGS84')
    c1 = CRS.from_proj4('+proj=merc +lat_ts=41 +ellps=WGS84')
    wgs = CRS.from_epsg(4326)
    x0, _ = transform_coords(wgs, c0, np.array([10.0]), np.array([0.0]))
    x1, _ = transform_coords(wgs, c1, np.array([10.0]), np.array([0.0]))
    phi = math.radians(41)
    e2 = 0.00669437999014
    k0 = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    np.testing.assert_allclose(np.asarray(x1) / np.asarray(x0), k0,
                               rtol=1e-9)


def test_towgs84_three_param():
    """3-parameter +towgs84 pads to the 7-parameter Helmert."""
    from nd_tpu.crs import CRS, transform_coords
    ed50 = CRS.from_proj4('+proj=longlat +ellps=intl '
                          '+towgs84=-87,-98,-121')
    wgs = CRS.from_epsg(4326)
    lon, lat = transform_coords(ed50, wgs, np.array([10.0]),
                                np.array([50.0]))
    # the ED50->WGS84 shift moves coordinates by ~100m (~1e-3 deg)
    assert 1e-4 < abs(float(np.asarray(lon)) - 10.0) < 5e-3


def test_polar_stereographic_wkt1():
    """GDAL WKT1: latitude_of_origin IS the standard parallel."""
    from nd_tpu.crs import CRS
    wkt = ('PROJCS["NSIDC Sea Ice Polar Stereographic North",'
           'GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Polar_Stereographic"],'
           'PARAMETER["latitude_of_origin",70],'
           'PARAMETER["central_meridian",-45],'
           'PARAMETER["false_easting",0],'
           'PARAMETER["false_northing",0],UNIT["metre",1]]')
    crs = CRS.from_wkt(wkt)
    assert crs._params.get('lat_ts') == 70
    assert crs._params.get('lat_0') == 90.0
    # roundtrips through our writer with the same convention
    again = CRS.from_wkt(crs.to_wkt())
    assert again._params.get('lat_ts') == 70
    assert again._params.get('lat_0') == 90.0


def test_to_wkt_k0_alias():
    from nd_tpu.crs import CRS
    crs = CRS.from_proj4('+proj=tmerc +lat_0=0 +lon_0=9 +k_0=0.9996 '
                         '+x_0=500000 +ellps=WGS84')
    assert 'scale_factor",0.9996' in crs.to_wkt()


def test_from_user_input_numpy_int():
    from nd_tpu.crs import CRS
    crs = CRS.from_user_input(np.int64(4326))
    assert crs.is_geographic
