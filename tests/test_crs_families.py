"""Projection-family coverage added in round 2 (VERDICT item 2):
Lambert conformal conic (lcc), Albers equal-area (aea), Lambert
azimuthal equal-area (laea, oblique + polar), cylindrical equal-area
(cea) and Mollweide (moll).

Oracles are pyproj-free and implementation-independent:

- published worked examples: the IOGP/EPSG Guidance Note 7-2 LAEA
  (ETRS89-LAEA Europe) example and Snyder (1987) numerical examples
  for Albers (p. 292) and Lambert conformal conic (p. 296), matched to
  a decimeter;
- differential defining properties: unit scale along the standard
  parallels of the conformal/conic projections, unit areal scale
  (h*k = 1 resp. |J| = area element) everywhere for the equal-area
  family — measured by numerical differentiation of the forward map;
- forward/inverse round-trips at < 1e-6 degree.
"""

import math

import numpy as np
import pytest

from nd_tpu.crs import CRS, transform_coords
from nd_tpu.crs.proj import (ELLIPSOIDS, project_forward,
                             project_inverse)

GRS80 = ELLIPSOIDS['GRS80']
WGS84 = ELLIPSOIDS['WGS84']
CLRK66 = ELLIPSOIDS['clrk66']


# ---------------------------------------------------------------------------
# published worked examples
# ---------------------------------------------------------------------------

def test_laea_epsg_guidance_worked_example():
    # IOGP Guidance Note 7-2, Lambert Azimuthal Equal Area
    # (ETRS89-LAEA, EPSG:3035): 50N 5E -> E 3962799.45, N 2999718.85
    p = {'lat_0': 52.0, 'lon_0': 10.0, 'x_0': 4321000.0,
         'y_0': 3210000.0}
    x, y = project_forward('laea', np.float64(5.0), np.float64(50.0),
                           GRS80, p)
    assert abs(float(x) - 3962799.45) < 0.02
    assert abs(float(y) - 2999718.85) < 0.02


def test_aea_snyder_numerical_example():
    # Snyder (1987) p. 292: Clarke 1866, SP 29.5/45.5, origin 23/-96,
    # point (35N, 75W) -> x 1885472.7, y 1535925.0
    p = {'lat_0': 23.0, 'lon_0': -96.0, 'lat_1': 29.5, 'lat_2': 45.5}
    x, y = project_forward('aea', np.float64(-75.0), np.float64(35.0),
                           CLRK66, p)
    assert abs(float(x) - 1885472.7) < 0.1
    assert abs(float(y) - 1535925.0) < 0.1


def test_lcc_snyder_numerical_example():
    # Snyder (1987) p. 296: Clarke 1866, SP 33/45, origin 23/-96,
    # point (35N, 75W) -> x 1894410.9, y 1564649.5
    p = {'lat_0': 23.0, 'lon_0': -96.0, 'lat_1': 33.0, 'lat_2': 45.0}
    x, y = project_forward('lcc', np.float64(-75.0), np.float64(35.0),
                           CLRK66, p)
    assert abs(float(x) - 1894410.9) < 0.1
    assert abs(float(y) - 1564649.5) < 0.1


# ---------------------------------------------------------------------------
# round-trips over a grid
# ---------------------------------------------------------------------------

_FAMILY_PARAMS = [
    ('lcc', {'lat_0': 46.5, 'lon_0': 3.0, 'lat_1': 49.0,
             'lat_2': 44.0, 'x_0': 700000.0, 'y_0': 6600000.0},
     GRS80, (-5.0, 15.0, 38.0, 55.0)),
    ('lcc', {'lat_0': 0.0, 'lon_0': 132.0, 'lat_1': -18.0,
             'lat_2': -36.0}, GRS80, (115.0, 150.0, -42.0, -8.0)),
    ('lcc', {'lat_0': 40.0, 'lon_0': -100.0, 'k': 0.99},   # 1SP form
     WGS84, (-120.0, -80.0, 25.0, 55.0)),
    ('aea', {'lat_0': 23.0, 'lon_0': -96.0, 'lat_1': 29.5,
             'lat_2': 45.5}, GRS80, (-125.0, -65.0, 20.0, 55.0)),
    ('aea', {'lat_0': 0.0, 'lon_0': 132.0, 'lat_1': -18.0,
             'lat_2': -36.0}, GRS80, (115.0, 150.0, -45.0, -8.0)),
    ('laea', {'lat_0': 52.0, 'lon_0': 10.0, 'x_0': 4321000.0,
              'y_0': 3210000.0}, GRS80, (-10.0, 35.0, 33.0, 70.0)),
    ('laea', {'lat_0': 90.0, 'lon_0': 0.0}, WGS84,
     (-179.0, 179.0, 35.0, 89.0)),
    ('laea', {'lat_0': -90.0, 'lon_0': 0.0}, WGS84,
     (-179.0, 179.0, -89.0, -35.0)),
    ('cea', {'lat_ts': 30.0, 'lon_0': 0.0}, WGS84,
     (-179.0, 179.0, -85.0, 85.0)),
    ('moll', {'lon_0': 0.0}, WGS84, (-170.0, 170.0, -85.0, 85.0)),
    ('somerc', {'lat_0': 46.952405555555565,
                'lon_0': 7.439583333333333, 'k_0': 1.0}, None,
     (5.9, 10.5, 45.8, 47.8)),
    ('geos', {'h': 35785831.0, 'lon_0': 0.0, 'sweep': 'y'}, WGS84,
     (-55.0, 55.0, -55.0, 55.0)),
    ('ortho', {'lat_0': 40.0, 'lon_0': -100.0}, WGS84,
     (-140.0, -60.0, 5.0, 75.0)),
    ('aeqd', {'lat_0': 48.0, 'lon_0': 12.0}, WGS84,
     (-60.0, 84.0, -40.0, 80.0)),
]
# somerc runs on its native Bessel ellipsoid
_FAMILY_PARAMS = [
    (p, prm, (ELLIPSOIDS['bessel'] if e is None else e), b)
    for p, prm, e, b in _FAMILY_PARAMS
]


@pytest.mark.parametrize('proj,params,ell,bbox', _FAMILY_PARAMS)
def test_roundtrip_below_1e6_deg(proj, params, ell, bbox):
    lo0, lo1, la0, la1 = bbox
    lon, lat = np.meshgrid(np.linspace(lo0, lo1, 17),
                           np.linspace(la0, la1, 15))
    x, y = project_forward(proj, lon, lat, ell, params)
    lon2, lat2 = project_inverse(proj, x, y, ell, params)
    np.testing.assert_allclose(lon2, lon, atol=1e-6)
    np.testing.assert_allclose(lat2, lat, atol=1e-6)


def test_jax_path_matches_numpy():
    import jax.numpy as jnp
    lon = np.linspace(-10.0, 30.0, 11)
    lat = np.linspace(35.0, 68.0, 11)
    for crs in ('epsg:3035', 'epsg:5070', 'epsg:2154', 'epsg:6933',
                'epsg:2056',
                '+proj=ortho +lat_0=45 +lon_0=10 +ellps=WGS84',
                '+proj=aeqd +lat_0=48 +lon_0=12 +ellps=WGS84',
                '+proj=geos +h=35785831 +lon_0=0 +sweep=y '
                '+ellps=WGS84'):
        xn, yn = transform_coords('epsg:4326', crs, lon, lat, xp=np)
        xj, yj = transform_coords('epsg:4326', crs,
                                  jnp.asarray(lon), jnp.asarray(lat),
                                  xp=jnp)
        np.testing.assert_allclose(np.asarray(xj), xn, atol=1e-4)
        np.testing.assert_allclose(np.asarray(yj), yn, atol=1e-4)


# ---------------------------------------------------------------------------
# defining differential properties (implementation-independent oracle)
# ---------------------------------------------------------------------------

def _scales(proj, params, ell, lon, lat, eps=1e-6):
    """(h, k): numerical scale factors along meridian / parallel."""
    phi = math.radians(lat)
    x0, y0 = project_forward(proj, np.float64(lon), np.float64(lat),
                             ell, params)
    xb, yb = project_forward(proj, np.float64(lon),
                             np.float64(lat + eps), ell, params)
    xl, yl = project_forward(proj, np.float64(lon + eps),
                             np.float64(lat), ell, params)
    deps = math.radians(eps)
    s2 = math.sin(phi) ** 2
    M = ell.a * (1 - ell.e2) / (1 - ell.e2 * s2) ** 1.5
    N = ell.a / math.sqrt(1 - ell.e2 * s2)
    h = math.hypot(float(xb - x0), float(yb - y0)) / (M * deps)
    k = math.hypot(float(xl - x0), float(yl - y0)) \
        / (N * math.cos(phi) * deps)
    return h, k


def test_lcc_unit_scale_at_standard_parallels():
    p = {'lat_0': 46.5, 'lon_0': 3.0, 'lat_1': 49.0, 'lat_2': 44.0}
    for lat in (44.0, 49.0):
        h, k = _scales('lcc', p, GRS80, 5.0, lat)
        assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-6
    # conformal: h == k everywhere
    for lat in (40.0, 46.5, 52.0):
        h, k = _scales('lcc', p, GRS80, -4.0, lat)
        assert abs(h / k - 1) < 1e-6


def test_aea_unit_area_and_parallel_scale():
    p = {'lat_0': 23.0, 'lon_0': -96.0, 'lat_1': 29.5, 'lat_2': 45.5}
    for lat in (25.0, 29.5, 35.0, 45.5, 50.0):
        h, k = _scales('aea', p, GRS80, -80.0, lat)
        assert abs(h * k - 1) < 1e-5            # equal-area
    for lat in (29.5, 45.5):
        _, k = _scales('aea', p, GRS80, -80.0, lat)
        assert abs(k - 1) < 1e-6                # true scale at SPs


def test_laea_unit_area():
    p = {'lat_0': 52.0, 'lon_0': 10.0}
    for lon, lat in ((10.0, 52.0), (0.0, 45.0), (25.0, 60.0),
                     (15.0, 40.0)):
        h, k = _scales('laea', p, GRS80, lon, lat)
        # tolerance reflects finite-difference truncation, not the
        # projection (round-trips pin the map itself to < 1e-8 deg)
        assert abs(h * k - 1) < 2e-4
    # center projects to the (false) origin with no distortion
    x, y = project_forward('laea', np.float64(10.0), np.float64(52.0),
                           GRS80, p)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6


def test_cea_unit_area_and_lat_ts_scale():
    p = {'lat_ts': 30.0, 'lon_0': 0.0}
    for lat in (0.0, 30.0, 55.0):
        h, k = _scales('cea', p, WGS84, 20.0, lat)
        assert abs(h * k - 1) < 1e-5
    _, k = _scales('cea', p, WGS84, 20.0, 30.0)
    assert abs(k - 1) < 1e-6


def test_moll_unit_area_on_sphere():
    # PROJ computes moll on a sphere of radius a; check |J| equals the
    # spherical area element a^2 cos(phi)
    p = {'lon_0': 0.0}
    a = WGS84.a
    eps = 1e-6
    deps = math.radians(eps)
    for lon, lat in ((0.0, 0.0), (20.0, 40.0), (-60.0, 70.0)):
        x0, y0 = project_forward('moll', np.float64(lon),
                                 np.float64(lat), WGS84, p)
        xb, yb = project_forward('moll', np.float64(lon),
                                 np.float64(lat + eps), WGS84, p)
        xl, yl = project_forward('moll', np.float64(lon + eps),
                                 np.float64(lat), WGS84, p)
        J = abs(float((xb - x0) * (yl - y0) - (xl - x0) * (yb - y0))) \
            / deps ** 2
        assert abs(J / (a * a * math.cos(math.radians(lat))) - 1) < 1e-5
    # closed-form extremes
    x, y = project_forward('moll', np.float64(0.0), np.float64(90.0),
                           WGS84, p)
    assert abs(float(y) - math.sqrt(2) * a) < 1e-3
    x, y = project_forward('moll', np.float64(180.0), np.float64(0.0),
                           WGS84, p)
    assert abs(float(x) - 2 * math.sqrt(2) * a) < 1e-3


# ---------------------------------------------------------------------------
# CRS plumbing: EPSG registry, proj4 + WKT round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('code,proj', [
    (3035, 'laea'), (5070, 'aea'), (2154, 'lcc'), (3034, 'lcc'),
    (3577, 'aea'), (6933, 'cea'), (6931, 'laea'), (6932, 'laea'),
    (3573, 'laea'), (54009, 'moll'),
])
def test_epsg_registry(code, proj):
    crs = CRS.from_epsg(code)
    assert crs.proj == proj
    assert crs.to_epsg() == code
    # accepted through every entry point
    assert CRS.from_user_input('epsg:%d' % code) == crs
    assert CRS.from_user_input(code) == crs


@pytest.mark.parametrize('code', [3035, 5070, 2154, 6933, 54009])
def test_proj4_roundtrip(code):
    crs = CRS.from_epsg(code)
    again = CRS.from_proj4(crs.to_proj4())
    assert again == crs


@pytest.mark.parametrize('code', [3035, 5070, 2154, 6933, 54009])
def test_wkt_roundtrip(code):
    crs = CRS.from_epsg(code)
    again = CRS.from_wkt(crs.to_wkt())
    assert again == crs, (crs.to_wkt(), again.params)


def test_wkt_conic_standard_parallels_parse():
    wkt = ('PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",'
           'DATUM["North_American_Datum_1983",'
           'SPHEROID["GRS 1980",6378137,298.257222101]],'
           'PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Albers_Conic_Equal_Area"],'
           'PARAMETER["standard_parallel_1",29.5],'
           'PARAMETER["standard_parallel_2",45.5],'
           'PARAMETER["latitude_of_center",23],'
           'PARAMETER["longitude_of_center",-96],'
           'PARAMETER["false_easting",0],'
           'PARAMETER["false_northing",0],UNIT["metre",1],'
           'AUTHORITY["EPSG","5070"]]')
    crs = CRS.from_wkt(wkt)
    assert crs.proj == 'aea'
    assert crs.params['lat_1'] == 29.5
    assert crs.params['lat_2'] == 45.5
    assert crs.params['lat_0'] == 23
    assert crs == CRS.from_epsg(5070)


def test_wkt2_lcc_method_name():
    wkt = ('PROJCRS["RGF93 / Lambert-93",'
           'BASEGEOGCRS["RGF93",DATUM["Reseau Geodesique Francais '
           '1993",ELLIPSOID["GRS 1980",6378137,298.257222101]]],'
           'CONVERSION["Lambert-93",'
           'METHOD["Lambert Conic Conformal (2SP)"],'
           'PARAMETER["Latitude of false origin",46.5],'
           'PARAMETER["Longitude of false origin",3],'
           'PARAMETER["Latitude of 1st standard parallel",49],'
           'PARAMETER["Latitude of 2nd standard parallel",44],'
           'PARAMETER["Easting at false origin",700000],'
           'PARAMETER["Northing at false origin",6600000]],'
           'ID["EPSG",2154]]')
    crs = CRS.from_wkt(wkt)
    assert crs.proj == 'lcc'
    assert crs.params['lat_1'] == 49
    assert crs.params['lat_2'] == 44
    assert crs == CRS.from_epsg(2154)


def test_lcc_1sp_defaults_standard_parallel_to_origin():
    # WKT1 Lambert_Conformal_Conic_1SP carries only the origin + k
    one = CRS.from_proj4('+proj=lcc +lat_0=40 +lon_0=-100 +k_0=0.99 '
                         '+ellps=WGS84')
    two = CRS.from_proj4('+proj=lcc +lat_0=40 +lat_1=40 +lon_0=-100 '
                         '+k_0=0.99 +ellps=WGS84')
    lon, lat = np.array([-104.0]), np.array([43.0])
    x1, y1 = transform_coords('epsg:4326', one, lon, lat)
    x2, y2 = transform_coords('epsg:4326', two, lon, lat)
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: Reprojection onto the new grids
# ---------------------------------------------------------------------------

def test_reproject_onto_epsg3035():
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection, get_crs

    ds = generate_test_dataset(dims={'y': 24, 'x': 30, 'time': 2},
                               extent=(0.0, 45.0, 20.0, 58.0))
    out = Reprojection(crs='epsg:3035').apply(ds)
    assert get_crs(out) == CRS.from_epsg(3035)
    # the output grid's corner coordinates must agree with the direct
    # projection of the input extent (independent of the warp path)
    xs = np.asarray(out.coords['x'].values)
    ys = np.asarray(out.coords['y'].values)
    ex, ey = transform_coords(
        'epsg:4326', 'epsg:3035',
        np.array([0.0, 45.0]), np.array([20.0, 58.0]))
    assert xs.min() >= min(ex) - 1e6 and xs.max() <= max(ex) + 1e6
    # data survives: some finite pixels in every variable
    for v in out.data_vars:
        vals = np.asarray(out[v].values, dtype=np.complex128)
        assert np.isfinite(vals.real).any()


def test_reproject_roundtrip_epsg3035_preserves_values():
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection

    ds = generate_test_dataset(dims={'y': 40, 'x': 50, 'time': 1},
                               extent=(5.0, 45.0, 15.0, 55.0))
    # a smooth field round-trips through bilinear resampling nearly
    # unchanged (white noise would not — interpolation is a low-pass)
    xx = np.asarray(ds.coords['x'].values)[None, :, None]
    yy = np.asarray(ds.coords['y'].values)[:, None, None]
    smooth = np.sin(xx / 2.0) * np.cos(yy / 3.0) \
        * np.ones((1, 1, ds.sizes['time']))
    ds['C11'] = (('y', 'x', 'time'), smooth.astype(np.float64))
    fwd = Reprojection(crs='epsg:3035').apply(ds)
    back = Reprojection(crs='epsg:4326',
                        extent=(5.0, 45.0, 15.0, 55.0),
                        width=50, height=40).apply(fwd)
    a = np.asarray(ds['C11'].values, np.float64)
    b = np.asarray(back['C11'].transpose(*ds['C11'].dims).values,
                   np.float64)
    # interior pixels (away from the resampled boundary) round-trip
    interior = np.isfinite(b[4:-4, 4:-4, ...])
    assert interior.mean() > 0.9
    diff = np.abs(b - a)[4:-4, 4:-4, ...]
    assert np.nanmedian(diff) < 0.02


# ---------------------------------------------------------------------------
# round-2 additions: geostationary (geos), Swiss oblique Mercator
# (somerc), orthographic (ortho)
# ---------------------------------------------------------------------------

def _lv03_params():
    return {'proj': 'somerc', 'lat_0': 46.952405555555565,
            'lon_0': 7.439583333333333, 'k_0': 1.0,
            'x_0': 600000.0, 'y_0': 200000.0}


def test_somerc_swisstopo_worked_example():
    """swisstopo 'Formulas and constants' reference point (Rigi):
    lat 47°03'28.956590" lon 8°29'11.111270" -> E 679520.05 N 212273.44
    (CH1903/LV03), and the projection origin maps to the false origin
    exactly."""
    bessel = ELLIPSOIDS['bessel']
    p = _lv03_params()
    x, y = project_forward('somerc', np.array([7.439583333333333]),
                           np.array([46.952405555555565]), bessel, p)
    assert abs(x[0] - 600000.0) < 1e-6
    assert abs(y[0] - 200000.0) < 1e-6
    lat = 47 + 3 / 60 + 28.956590 / 3600
    lon = 8 + 29 / 60 + 11.111270 / 3600
    x, y = project_forward('somerc', np.array([lon]), np.array([lat]),
                           bessel, p)
    assert abs(x[0] - 679520.05) < 0.01
    assert abs(y[0] - 212273.44) < 0.01


def test_somerc_roundtrip_and_conformality():
    bessel = ELLIPSOIDS['bessel']
    p = _lv03_params()
    lons, lats = np.meshgrid(np.linspace(5.9, 10.5, 9),
                             np.linspace(45.8, 47.8, 9))
    x, y = project_forward('somerc', lons, lats, bessel, p)
    lo, la = project_inverse('somerc', x, y, bessel, p)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    # conformal: the local scale is direction-independent
    eps = 1e-6
    for lon, lat in [(7.0, 46.5), (9.5, 47.2)]:
        x0, y0 = project_forward('somerc', np.array([lon]),
                                 np.array([lat]), bessel, p)
        xe, ye = project_forward('somerc', np.array([lon + eps]),
                                 np.array([lat]), bessel, p)
        xn, yn = project_forward('somerc', np.array([lon]),
                                 np.array([lat + eps]), bessel, p)
        phi = math.radians(lat)
        nu = bessel.a / math.sqrt(1 - bessel.e2 * math.sin(phi) ** 2)
        rho = bessel.a * (1 - bessel.e2) \
            / (1 - bessel.e2 * math.sin(phi) ** 2) ** 1.5
        k_east = math.hypot(xe[0] - x0[0], ye[0] - y0[0]) \
            / (math.radians(eps) * nu * math.cos(phi))
        k_north = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) \
            / (math.radians(eps) * rho)
        assert abs(k_east / k_north - 1.0) < 1e-6


def test_geos_geometric_oracle():
    """Forward geos must equal a literal ray-trace from the geometric
    definition: scanning angles of the satellite->surface-point vector
    from a satellite at (r_orbit, 0, 0) in sub-satellite coordinates."""
    wgs = ELLIPSOIDS['WGS84']
    h = 35785831.0
    p = {'proj': 'geos', 'h': h, 'lon_0': 0.0, 'sweep': 'y',
         'x_0': 0.0, 'y_0': 0.0}
    rng = np.random.RandomState(0)
    lons = rng.uniform(-55, 55, 40)
    lats = rng.uniform(-55, 55, 40)
    x, y = project_forward('geos', lons, lats, wgs, p)
    a, b = wgs.a, wgs.b
    sat = np.array([a + h, 0.0, 0.0])
    for lon, lat, xi, yi in zip(lons, lats, x, y):
        lam, phi = math.radians(lon), math.radians(lat)
        # ellipsoid surface point (geodetic, h=0)
        nu = a / math.sqrt(1 - wgs.e2 * math.sin(phi) ** 2)
        P = np.array([nu * math.cos(phi) * math.cos(lam),
                      nu * math.cos(phi) * math.sin(lam),
                      nu * (1 - wgs.e2) * math.sin(phi)])
        v = P - sat                      # satellite->point ray
        # sweep=y (SEVIRI): x is the scan angle about the N-S axis
        # (after rotating out the elevation), y the elevation angle
        x_ang = math.atan2(v[1], -v[0])
        y_ang = math.atan2(v[2], math.hypot(v[0], v[1]))
        assert abs(xi - h * x_ang) < 1e-3, (lon, lat)
        assert abs(yi - h * y_ang) < 1e-3, (lon, lat)


def test_geos_roundtrip_visibility_and_sweep():
    wgs = ELLIPSOIDS['WGS84']
    p = {'proj': 'geos', 'h': 35785831.0, 'lon_0': 140.7,
         'sweep': 'y', 'x_0': 0.0, 'y_0': 0.0}
    lons, lats = np.meshgrid(np.linspace(90, 190, 9),
                             np.linspace(-60, 60, 9))
    x, y = project_forward('geos', lons, lats, wgs, p)
    lo, la = project_inverse('geos', x, y, wgs, p)
    assert np.nanmax(np.abs(lo - lons)) < 1e-9
    assert np.nanmax(np.abs(la - lats)) < 1e-9
    # sub-satellite point maps to the origin
    x0, y0 = project_forward('geos', np.array([140.7]),
                             np.array([0.0]), wgs, p)
    assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6
    # the far side of the Earth is not visible
    xf, yf = project_forward('geos', np.array([-39.3]),
                             np.array([0.0]), wgs, p)
    assert np.isnan(xf[0]) and np.isnan(yf[0])
    # GOES sweep=x and SEVIRI sweep=y disagree off-axis
    px = dict(p, sweep='x')
    xa, ya = project_forward('geos', np.array([150.0]),
                             np.array([20.0]), wgs, p)
    xb, yb = project_forward('geos', np.array([150.0]),
                             np.array([20.0]), wgs, px)
    assert abs(xa[0] - xb[0]) > 100.0
    lo2, la2 = project_inverse('geos', xb, yb, wgs, px)
    assert abs(lo2[0] - 150.0) < 1e-9 and abs(la2[0] - 20.0) < 1e-9


def test_ortho_epsg_guidance_worked_example():
    """EPSG Guidance 7-2 method 9840 example: topocentric origin
    55°N 5°E on WGS84; lat 53°48'33.82"N lon 2°07'46.38"E ->
    E -189011.711 N -128640.567."""
    wgs = ELLIPSOIDS['WGS84']
    p = {'proj': 'ortho', 'lat_0': 55.0, 'lon_0': 5.0,
         'x_0': 0.0, 'y_0': 0.0}
    lat = 53 + 48 / 60 + 33.82 / 3600
    lon = 2 + 7 / 60 + 46.38 / 3600
    x, y = project_forward('ortho', np.array([lon]), np.array([lat]),
                           wgs, p)
    assert abs(x[0] - (-189011.711)) < 0.01
    assert abs(y[0] - (-128640.567)) < 0.01
    lo, la = project_inverse('ortho', x, y, wgs, p)
    assert abs(lo[0] - lon) < 1e-9
    assert abs(la[0] - lat) < 1e-9


def test_ortho_horizon_mask_and_roundtrip():
    wgs = ELLIPSOIDS['WGS84']
    p = {'proj': 'ortho', 'lat_0': 40.0, 'lon_0': -100.0,
         'x_0': 0.0, 'y_0': 0.0}
    lons, lats = np.meshgrid(np.linspace(-140, -60, 9),
                             np.linspace(5, 75, 9))
    x, y = project_forward('ortho', lons, lats, wgs, p)
    lo, la = project_inverse('ortho', x, y, wgs, p)
    assert np.nanmax(np.abs(lo - lons)) < 1e-9
    assert np.nanmax(np.abs(la - lats)) < 1e-9
    # antipodal hemisphere is masked
    xf, yf = project_forward('ortho', np.array([80.0]),
                             np.array([-40.0]), wgs, p)
    assert np.isnan(xf[0])


@pytest.mark.parametrize('code', [2056, 21781])
def test_swiss_epsg_registry(code):
    crs = CRS.from_epsg(code)
    assert crs.proj == 'somerc'
    assert CRS.from_string(crs.to_proj4()) == crs
    assert CRS.from_string(crs.to_wkt()) == crs
    # LV95 false origin is offset (+2000000, +1000000) from LV03
    x0 = crs.params['x_0']
    assert x0 == (2600000 if code == 2056 else 600000)


def test_geos_wkt_and_proj4_roundtrip():
    for s in ['+proj=geos +h=35785831 +lon_0=0 +sweep=y +ellps=WGS84',
              '+proj=geos +h=35786023 +lon_0=-75 +sweep=x +ellps=GRS80']:
        crs = CRS.from_string(s)
        assert crs.proj == 'geos'
        assert CRS.from_string(crs.to_proj4()) == crs
        back = CRS.from_string(crs.to_wkt())
        assert back == crs
        assert back.params.get('sweep') == crs.params.get('sweep', 'y')


def test_hotine_general_azimuth_parses_as_omerc():
    # a general initial line under the azimuth-center method name is
    # the Hotine oblique Mercator variant B (it used to be refused;
    # azimuth 90 still resolves to the Swiss somerc convention)
    wkt = ('PROJCS["rso",GEOGCS["g",DATUM["WGS84",SPHEROID["WGS84",'
           '6378137,298.257223563],TOWGS84[0,0,0,0,0,0,0]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
           'PARAMETER["azimuth",53.31580995],'
           'PARAMETER["latitude_of_center",4],'
           'PARAMETER["longitude_of_center",115],UNIT["metre",1]]')
    crs = CRS.from_string(wkt)
    assert crs.proj == 'omerc'
    assert not crs.params.get('no_uoff')
    assert abs(crs.params['lonc'] - 115.0) < 1e-9


# ---------------------------------------------------------------------------
# Hotine oblique Mercator (omerc), Krovak, Equal Earth — round 2
# additions (EPSG methods 9812/9815, 9819, 1078)
# ---------------------------------------------------------------------------

EVRST_SS = ELLIPSOIDS['evrstSS']
BESSEL = ELLIPSOIDS['bessel']

_RSO_BORNEO = {'lat_0': 4.0, 'lonc': 115.0,
               'alpha': 53.31582047222222,
               'gamma': 53.13010236111111, 'k': 0.99984}
_KROVAK = {'lat_0': 49.5, 'lon_0': 24.833333333333332,
           'alpha': 30.288139722222223, 'k': 0.9999}


def test_omerc_epsg_guidance_worked_example():
    # IOGP Guidance Note 7-2, Hotine Oblique Mercator variant B:
    # Timbalai 1948 / RSO Borneo. phi 5°23'14.1129"N, lam
    # 115°48'19.8196"E -> E 679245.73, N 596562.78 (FE/FN included)
    p = dict(_RSO_BORNEO, x_0=590476.87, y_0=442857.65)
    lon = 115 + 48 / 60 + 19.8196 / 3600
    lat = 5 + 23 / 60 + 14.1129 / 3600
    x, y = project_forward('omerc', np.float64(lon), np.float64(lat),
                           EVRST_SS, p)
    assert abs(float(x) - 679245.73) < 0.02
    assert abs(float(y) - 596562.78) < 0.02
    lo, la = project_inverse('omerc', x, y, EVRST_SS, p)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9


def test_omerc_conformality_and_initial_line_scale():
    # conformal: h == k everywhere; scale k0 on the initial line
    # (which passes through the projection centre)
    for lon, lat in ((115.0, 4.0), (117.5, 5.5), (112.0, 1.5)):
        h, k = _scales('omerc', _RSO_BORNEO, EVRST_SS, lon, lat)
        assert abs(h / k - 1) < 1e-5
    h, k = _scales('omerc', _RSO_BORNEO, EVRST_SS, 115.0, 4.0)
    assert abs(k - 0.99984) < 1e-5


def test_omerc_variant_a_offset_relationship():
    # variant A (no_uoff) differs from variant B by the constant
    # (u_c sin/cos gamma_c) rectified offset — same shape, shifted grid
    pa = dict(_RSO_BORNEO, no_uoff=True)
    pts = [(115.0, 4.0), (117.0, 6.0)]
    deltas = []
    for lon, lat in pts:
        xa, ya = project_forward('omerc', np.float64(lon),
                                 np.float64(lat), EVRST_SS, pa)
        xb, yb = project_forward('omerc', np.float64(lon),
                                 np.float64(lat), EVRST_SS,
                                 _RSO_BORNEO)
        deltas.append((float(xa - xb), float(ya - yb)))
    assert abs(deltas[0][0] - deltas[1][0]) < 1e-6
    assert abs(deltas[0][1] - deltas[1][1]) < 1e-6
    assert abs(deltas[0][0]) > 1000        # the offset is real
    lo, la = project_inverse('omerc', np.float64(10000.0),
                             np.float64(20000.0), EVRST_SS, pa)
    x2, y2 = project_forward('omerc', lo, la, EVRST_SS, pa)
    assert abs(float(x2) - 10000) < 1e-6
    assert abs(float(y2) - 20000) < 1e-6


def test_omerc_alaska_zone1_roundtrip():
    crs = CRS.from_epsg(26931)
    wgs = CRS.from_epsg(4326)
    lon = np.linspace(-139.0, -131.0, 7)
    lat = np.linspace(54.5, 59.5, 7)
    x, y = transform_coords(wgs, crs, lon, lat)
    assert np.all(np.isfinite(x))
    lo, la = transform_coords(crs, wgs, x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


def test_krovak_epsg_guidance_worked_example():
    # IOGP Guidance Note 7-2, Krovak: phi 50°12'32.4416"N, lam
    # 16°50'59.1790"E (Greenwich) -> southing 1050538.63, westing
    # 568991.00; EPSG:5514 east/north = the negated pair
    lon = 16 + 50 / 60 + 59.1790 / 3600
    lat = 50 + 12 / 60 + 32.4416 / 3600
    x, y = project_forward('krovak', np.float64(lon), np.float64(lat),
                           BESSEL, _KROVAK)
    assert abs(float(x) - -568991.00) < 0.05
    assert abs(float(y) - -1050538.63) < 0.05
    lo, la = project_inverse('krovak', x, y, BESSEL, _KROVAK)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9


def test_krovak_czech_flag_flips_signs():
    p = dict(_KROVAK, czech=True)
    lon, lat = 14.42, 50.09            # Prague
    xe, ye = project_forward('krovak', np.float64(lon),
                             np.float64(lat), BESSEL, _KROVAK)
    xs, ys = project_forward('krovak', np.float64(lon),
                             np.float64(lat), BESSEL, p)
    assert abs(float(xe) + float(xs)) < 1e-9
    assert abs(float(ye) + float(ys)) < 1e-9
    lo, la = project_inverse('krovak', xs, ys, BESSEL, p)
    assert abs(float(lo) - lon) < 1e-9 and abs(float(la) - lat) < 1e-9


def test_krovak_conformality_and_pseudo_parallel_scale():
    for lon, lat in ((14.42, 50.09), (17.25, 49.2), (21.0, 48.7)):
        h, k = _scales('krovak', _KROVAK, BESSEL, lon, lat)
        assert abs(h / k - 1) < 1e-5


def test_eqearth_equal_area_property():
    # |J| of the forward map must equal the ellipsoidal area element
    # (1-e2) a^2 cos(phi) / (1 - e2 sin^2 phi)^2 — the defining
    # property, measured by numerical differentiation
    p = {'lon_0': 0.0}
    eps = 1e-6
    deps = math.radians(eps)
    for lon, lat in ((0.0, 0.0), (20.0, 40.0), (-60.0, 70.0),
                     (120.0, -35.0)):
        x0, y0 = project_forward('eqearth', np.float64(lon),
                                 np.float64(lat), WGS84, p)
        xl, yl = project_forward('eqearth', np.float64(lon + eps),
                                 np.float64(lat), WGS84, p)
        xb, yb = project_forward('eqearth', np.float64(lon),
                                 np.float64(lat + eps), WGS84, p)
        jac = abs(float(xl - x0) * float(yb - y0)
                  - float(xb - x0) * float(yl - y0)) / deps ** 2
        s2 = math.sin(math.radians(lat)) ** 2
        element = (1 - WGS84.e2) * WGS84.a ** 2 \
            * math.cos(math.radians(lat)) / (1 - WGS84.e2 * s2) ** 2
        assert abs(jac / element - 1) < 2e-4


def test_eqearth_symmetries_and_roundtrip():
    p = {'lon_0': 0.0}
    x, y = project_forward('eqearth', np.float64(30.0),
                           np.float64(45.0), WGS84, p)
    xm, ym = project_forward('eqearth', np.float64(-30.0),
                             np.float64(-45.0), WGS84, p)
    assert abs(float(x) + float(xm)) < 1e-6
    assert abs(float(y) + float(ym)) < 1e-6
    lon = np.linspace(-179.0, 179.0, 13)
    lat = np.linspace(-85.0, 85.0, 13)
    xx, yy = project_forward('eqearth', lon, lat, WGS84, p)
    lo, la = project_inverse('eqearth', xx, yy, WGS84, p)
    np.testing.assert_allclose(lo, lon, atol=1e-7)
    np.testing.assert_allclose(la, lat, atol=1e-7)


@pytest.mark.parametrize('code,proj', [
    (5514, 'krovak'), (8857, 'eqearth'), (29873, 'omerc'),
    (26931, 'omerc'), (3375, 'omerc')])
def test_round2_registry_and_roundtrips(code, proj):
    crs = CRS.from_epsg(code)
    assert crs.proj == proj
    assert CRS.from_wkt(crs.to_wkt()) == crs
    assert CRS.from_proj4(crs.to_proj4()) == crs


def test_omerc_different_initial_lines_are_different_grids():
    a = CRS.from_epsg(29873)
    b = CRS({'proj': 'omerc', 'lat_0': 4.0, 'lonc': 115.0,
             'alpha': 40.0, 'k': 0.99984, 'x_0': 590476.87,
             'y_0': 442857.65, 'ellps': 'evrstSS'})
    assert a != b


def test_reproject_onto_krovak_grid():
    import nd_tpu
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection
    ds = generate_test_dataset(
        dims={'y': 24, 'x': 24, 'time': 2},
        extent=(13.0, 48.5, 19.0, 51.0))
    out = Reprojection(crs='epsg:5514').apply(ds)
    from nd_tpu.warp import get_crs
    assert get_crs(out) == CRS.from_epsg(5514)
    v = np.asarray(out['C11'].values)
    assert np.isfinite(v).mean() > 0.4


def test_reproject_onto_lv95_and_geos():
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection

    ds = generate_test_dataset(dims={'y': 40, 'x': 50, 'time': 1},
                               extent=(6.0, 46.0, 10.0, 47.5))
    out = Reprojection(crs='epsg:2056').apply(ds)
    xs = np.asarray(out._coords['x'].values)
    assert np.isfinite(np.asarray(out['C11'].values)).mean() > 0.8
    assert 2450000 < xs.min() < xs.max() < 2850000   # LV95 band

    ds2 = generate_test_dataset(dims={'y': 30, 'x': 30, 'time': 1},
                                extent=(-20.0, -20.0, 20.0, 20.0))
    out2 = Reprojection(
        crs='+proj=geos +h=35785831 +lon_0=0 +sweep=y +ellps=WGS84',
        extent=(-2.2e6, -2.2e6, 2.2e6, 2.2e6),
        width=64, height=64).apply(ds2)
    assert np.isfinite(np.asarray(out2['C11'].values)).mean() > 0.8


# ---------------------------------------------------------------------------
# round 3 (VERDICT item 4): oblique stereographic (sterea + non-polar
# stere), Robinson, ESRI authority
# ---------------------------------------------------------------------------

BESSEL = ELLIPSOIDS['bessel']


def test_sterea_epsg_guidance_worked_example():
    # IOGP Guidance Note 7-2, Oblique Stereographic (EPSG method 9809),
    # Amersfoort / RD New (EPSG:28992): 53N 6E (Amersfoort geographic)
    # -> E 196105.283, N 557057.739
    p = {'lat_0': 52.15616055555555, 'lon_0': 5.38763888888889,
         'k': 0.9999079, 'x_0': 155000.0, 'y_0': 463000.0}
    x, y = project_forward('sterea', np.array([6.0]), np.array([53.0]),
                           BESSEL, p)
    assert abs(x[0] - 196105.283) < 2e-3
    assert abs(y[0] - 557057.739) < 2e-3
    lon, lat = project_inverse('sterea', x, y, BESSEL, p)
    assert abs(lon[0] - 6.0) < 1e-9
    assert abs(lat[0] - 53.0) < 1e-9


def test_sterea_scale_at_origin():
    # conformal with scale k0 at the projection centre
    p = {'lat_0': 52.15616055555555, 'lon_0': 5.38763888888889,
         'k': 0.9999079}
    lat0, lon0 = 52.15616055555555, 5.38763888888889
    d = 1e-6
    x0, y0 = project_forward('sterea', np.array([lon0]),
                             np.array([lat0]), BESSEL, p)
    xn, yn = project_forward('sterea', np.array([lon0]),
                             np.array([lat0 + d]), BESSEL, p)
    # meridional ground distance for d degrees
    phi = math.radians(lat0)
    rho = BESSEL.a * (1 - BESSEL.e2) \
        / (1 - BESSEL.e2 * math.sin(phi) ** 2) ** 1.5
    ground = rho * math.radians(d)
    k = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) / ground
    assert abs(k - 0.9999079) < 1e-6


def test_oblique_stere_roundtrip_and_sphere_limit():
    p = {'lat_0': 40.0, 'lon_0': -100.0, 'k': 0.9999}
    lons = np.array([-90.0, -120.0, -100.0, -75.0])
    lats = np.array([30.0, 55.0, 40.0, -10.0])
    x, y = project_forward('stere', lons, lats, WGS84, p)
    lon, lat = project_inverse('stere', x, y, WGS84, p)
    np.testing.assert_allclose(lon, lons, atol=1e-9)
    np.testing.assert_allclose(lat, lats, atol=1e-9)

    # spherical limit: closed-form Snyder 21-2..21-4
    from nd_tpu.crs.proj import Ellipsoid
    R = 6370997.0
    sph = Ellipsoid('sphere', R, b=R)
    p = {'lat_0': 40.0, 'lon_0': -100.0, 'k': 1.0}
    x, y = project_forward('stere', np.array([-90.0]),
                           np.array([30.0]), sph, p)
    phi1, phi, dl = map(math.radians, (40.0, 30.0, 10.0))
    kk = 2 / (1 + math.sin(phi1) * math.sin(phi)
              + math.cos(phi1) * math.cos(phi) * math.cos(dl))
    assert abs(x[0] - R * kk * math.cos(phi) * math.sin(dl)) < 1e-6
    assert abs(y[0] - R * kk * (math.cos(phi1) * math.sin(phi)
                                - math.sin(phi1) * math.cos(phi)
                                * math.cos(dl))) < 1e-6


def test_oblique_stere_conformality():
    # equal scale along meridian and parallel (differential isotropy)
    p = {'lat_0': 40.0, 'lon_0': -100.0, 'k': 1.0}
    lon, lat = -92.0, 33.0
    d = 1e-6
    x0, y0 = project_forward('stere', np.array([lon]), np.array([lat]),
                             WGS84, p)
    xm, ym = project_forward('stere', np.array([lon]),
                             np.array([lat + d]), WGS84, p)
    xp_, yp_ = project_forward('stere', np.array([lon + d]),
                               np.array([lat]), WGS84, p)
    phi = math.radians(lat)
    s2 = math.sin(phi) ** 2
    rho = WGS84.a * (1 - WGS84.e2) / (1 - WGS84.e2 * s2) ** 1.5
    nu = WGS84.a / math.sqrt(1 - WGS84.e2 * s2)
    h = math.hypot(xm[0] - x0[0], ym[0] - y0[0]) \
        / (rho * math.radians(d))
    k = math.hypot(xp_[0] - x0[0], yp_[0] - y0[0]) \
        / (nu * math.cos(phi) * math.radians(d))
    assert abs(h / k - 1.0) < 1e-5


def test_robinson_nodes_and_roundtrip():
    p = {'lon_0': 0.0}
    # table nodes are reproduced exactly (X, Y at 50N)
    x, y = project_forward('robin', np.array([100.0]),
                           np.array([50.0]), WGS84, p)
    a = WGS84.a
    assert abs(x[0] / (0.8487 * a * math.radians(100)) - 0.8679) < 1e-12
    assert abs(y[0] / (1.3523 * a) - 0.6176) < 1e-12
    lons = np.array([-150.0, 30.0, 0.0, 179.0, -179.0])
    lats = np.array([-72.0, 47.3, 0.0, 85.0, -90.0])
    x, y = project_forward('robin', lons, lats, WGS84, p)
    lon, lat = project_inverse('robin', x, y, WGS84, p)
    np.testing.assert_allclose(lon, lons, atol=1e-6)
    np.testing.assert_allclose(lat, lats, atol=1e-6)


def test_esri_authority_and_epsg_28992():
    for code, proj in [('ESRI:54030', 'robin'), ('esri:54009', 'moll'),
                       ('ESRI:54008', 'sinu'), ('ESRI:54032', 'aeqd'),
                       ('ESRI:54034', 'cea'), ('ESRI:54004', 'merc'),
                       ('ESRI:54002', 'eqc'), ('EPSG:28992', 'sterea'),
                       ('epsg:54030', 'robin')]:
        c = CRS.from_user_input(code)
        assert c.proj == proj, code
        # WKT and proj4 round-trips preserve the definition
        assert CRS.from_wkt(c.to_wkt()) == c, code
        assert CRS.from_proj4(c.to_proj4()) == c, code
    with pytest.raises(ValueError):
        CRS.from_user_input('ESRI:99999')


def test_transform_roundtrip_28992_and_robinson():
    lon = np.array([4.0, 5.5, 6.5])
    lat = np.array([51.5, 52.2, 53.0])
    x, y = transform_coords('epsg:4326', 'epsg:28992', lon, lat)
    lo, la = transform_coords('epsg:28992', 'epsg:4326', x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)
    # the grid is anchored near Amersfoort: the origin maps near
    # (x_0, y_0) up to the WGS84->Bessel datum shift (~100 m)
    x, y = transform_coords('epsg:4326', 'epsg:28992',
                            np.array([5.38763888888889]),
                            np.array([52.15616055555555]))
    assert abs(x[0] - 155000) < 300 and abs(y[0] - 463000) < 300

    x, y = transform_coords('epsg:4326', 'ESRI:54030', lon, lat)
    lo, la = transform_coords('ESRI:54030', 'epsg:4326', x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


# ---------------------------------------------------------------------------
# round 4 (VERDICT item 3): NAD83/NAD27/ED50 UTM series, Belgian
# Lambert 72, Irish grid, NTF Lambert zone II, web-Mercator aliases
# ---------------------------------------------------------------------------

def test_registry_round4_codes_parse_and_roundtrip():
    codes = (['EPSG:269%02d' % z for z in range(1, 24)]
             + ['EPSG:267%02d' % z for z in range(1, 23)]
             + ['EPSG:230%d' % z for z in range(28, 39)]
             + ['EPSG:31370', 'EPSG:29902', 'EPSG:27572',
                'ESRI:102100', 'ESRI:102113', 'epsg:102100',
                'epsg:102113'])
    for code in codes:
        c = CRS.from_user_input(code)
        assert CRS.from_wkt(c.to_wkt()) == c, code
        assert CRS.from_proj4(c.to_proj4()) == c, code
    assert CRS.from_user_input('ESRI:102100').proj == 'webmerc'
    assert CRS.from_user_input('EPSG:26917').proj == 'utm'


def test_nad83_utm17_cn_tower_oracle():
    # Public survey anchor (the Wikipedia UTM worked example): the CN
    # Tower at 43.642567 N, 79.387139 W sits at UTM 17N 630084 E,
    # 4833438 N. NAD83 is within centimetres of WGS 84 here.
    x, y = transform_coords('epsg:4326', 'epsg:26917',
                            np.array([-79.387139]),
                            np.array([43.642567]))
    assert abs(x[0] - 630084.0) < 1.0
    assert abs(y[0] - 4833438.0) < 1.0
    lo, la = transform_coords('epsg:26917', 'epsg:4326', x, y)
    assert abs(lo[0] + 79.387139) < 1e-9
    assert abs(la[0] - 43.642567) < 1e-9


def test_nad27_utm_differs_from_nad83_by_datum_shift():
    # Clarke 1866 + the CONUS-average shift move the same ground point
    # by tens to a couple hundred metres relative to NAD83 UTM — and
    # NOT by zero (a missing datum hookup would make them identical).
    lon = np.array([-79.4, -95.0])
    lat = np.array([43.6, 30.0])
    x83, y83 = transform_coords('epsg:4326', 'epsg:26917', lon, lat)
    x27, y27 = transform_coords('epsg:4326', 'epsg:26717', lon, lat)
    d = np.hypot(x27 - x83, y27 - y83)
    assert (d > 5).all() and (d < 300).all()
    lo, la = transform_coords('epsg:26717', 'epsg:4326', x27, y27)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


def test_ed50_utm_offset_from_wgs84_utm():
    # ED50 coordinates in the North Sea area are famously ~100-250 m
    # away from their WGS 84 UTM counterparts.
    lon = np.array([9.0])
    lat = np.array([53.5])
    xw, yw = transform_coords('epsg:4326', 'epsg:32632', lon, lat)
    xe, ye = transform_coords('epsg:4326', 'epsg:23032', lon, lat)
    d = float(np.hypot(xe - xw, ye - yw)[0])
    assert 50 < d < 300
    lo, la = transform_coords('epsg:23032', 'epsg:4326', xe, ye)
    assert abs(lo[0] - 9.0) < 1e-8 and abs(la[0] - 53.5) < 1e-8


def test_belgian_lambert72_structure():
    # lat_0 = 90: the conic apex (the pole) maps exactly onto the
    # false origin — an exact structural invariant of the definition.
    from nd_tpu.crs.proj import project_forward
    c = CRS.from_user_input('EPSG:31370')
    x, y = project_forward('lcc', np.array([4.367486666666666]),
                           np.array([90.0]), c.ellipsoid, c.params)
    assert abs(x[0] - 150000.013) < 1e-6
    assert abs(y[0] - 5400088.438) < 1e-6
    # Brussels lands where Belgian Lambert 72 puts Brussels (km-level
    # window; catches swapped parallels / wrong ellipsoid / missing
    # false origin)
    bx, by = transform_coords('epsg:4326', 'epsg:31370',
                              np.array([4.3517]), np.array([50.8503]))
    assert 147000 < bx[0] < 151000 and 169000 < by[0] < 173000
    lo, la = transform_coords('epsg:31370', 'epsg:4326', bx, by)
    assert abs(lo[0] - 4.3517) < 1e-8 and abs(la[0] - 50.8503) < 1e-8


def test_irish_grid_29902():
    # the true origin (53.5 N, 8 W) maps exactly onto the false origin
    from nd_tpu.crs.proj import project_forward
    c = CRS.from_user_input('EPSG:29902')
    assert c.ellipsoid.name == 'mod_airy'
    x, y = project_forward('tmerc', np.array([-8.0]), np.array([53.5]),
                           c.ellipsoid, c.params)
    assert abs(x[0] - 200000.0) < 1e-6
    assert abs(y[0] - 250000.0) < 1e-6
    # Dublin city centre is in the O square around (315900, 234600)
    dx, dy = transform_coords('epsg:4326', 'epsg:29902',
                              np.array([-6.2603]), np.array([53.3498]))
    assert 314000 < dx[0] < 318000 and 233000 < dy[0] < 237000
    lo, la = transform_coords('epsg:29902', 'epsg:4326', dx, dy)
    assert abs(lo[0] + 6.2603) < 1e-8 and abs(la[0] - 53.3498) < 1e-8


def test_ntf_lambert_zone2_27572():
    # the true origin (46.8 N on the Paris meridian, folded to
    # Greenwich 2.337229166666667 E) maps exactly onto (600000, 2200000)
    from nd_tpu.crs.proj import project_forward
    c = CRS.from_user_input('EPSG:27572')
    x, y = project_forward('lcc', np.array([2.337229166666667]),
                           np.array([46.8]), c.ellipsoid, c.params)
    assert abs(x[0] - 600000.0) < 1e-6
    assert abs(y[0] - 2200000.0) < 1e-6
    # Paris lands near (601000, 2428500) in Lambert II etendue
    px, py = transform_coords('epsg:4326', 'epsg:27572',
                              np.array([2.3522]), np.array([48.8566]))
    assert 599000 < px[0] < 603000 and 2426000 < py[0] < 2431000
    lo, la = transform_coords('epsg:27572', 'epsg:4326', px, py)
    assert abs(lo[0] - 2.3522) < 1e-8 and abs(la[0] - 48.8566) < 1e-8


def test_web_mercator_alias_102100_matches_3857():
    lon = np.array([-79.4, 4.35, 151.2])
    lat = np.array([43.6, 50.85, -33.87])
    x1, y1 = transform_coords('epsg:4326', 'epsg:3857', lon, lat)
    x2, y2 = transform_coords('epsg:4326', 'ESRI:102100', lon, lat)
    np.testing.assert_allclose(x1, x2, rtol=0, atol=1e-9)
    np.testing.assert_allclose(y1, y2, rtol=0, atol=1e-9)


def test_reproject_onto_epsg26917_matches_oracle_grid():
    # VERDICT r3 done-criterion: a Reprojection onto EPSG:26917 agrees
    # with a precomputed (external) oracle. The analytic field
    # f(lon, lat) is warped onto the UTM grid; at the output pixel
    # nearest the CN Tower's published UTM coordinates the value must
    # equal f at the tower's published geographic coordinates.
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection, get_crs

    ds = generate_test_dataset(dims={'y': 40, 'x': 50, 'time': 1},
                               extent=(-79.6, 43.5, -79.2, 43.8))
    lon = np.asarray(ds.coords['x'].values)[None, :, None]
    lat = np.asarray(ds.coords['y'].values)[:, None, None]
    f = np.sin(lon / 2.0) * np.cos(lat / 3.0) * np.ones((1, 1, 1))
    ds['C11'] = (('y', 'x', 'time'), f.astype(np.float64))
    out = Reprojection(crs='epsg:26917').apply(ds)
    assert get_crs(out) == CRS.from_epsg(26917)
    xs = np.asarray(out.coords['x'].values)
    ys = np.asarray(out.coords['y'].values)
    ix = int(np.argmin(np.abs(xs - 630084.0)))
    iy = int(np.argmin(np.abs(ys - 4833438.0)))
    # the oracle point must be interior to the output grid
    assert 0 < ix < len(xs) - 1 and 0 < iy < len(ys) - 1
    got = float(np.asarray(out['C11'].values)[iy, ix, 0])
    want = math.sin(-79.387139 / 2.0) * math.cos(43.642567 / 3.0)
    assert abs(got - want) < 0.01
