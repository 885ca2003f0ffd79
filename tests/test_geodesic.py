"""Vincenty geodesics (nd_tpu.crs.geodesic) and the azimuthal
equidistant projection built on them. Oracles are implementation-
independent: the in-repo meridian-arc series, exact equatorial arcs,
the GeographicLib documentation example, and an RK4 integration of the
geodesic ODE."""

import math

import numpy as np
import pytest

from nd_tpu.crs import CRS
from nd_tpu.crs.geodesic import geodesic_direct, geodesic_inverse
from nd_tpu.crs.proj import (ELLIPSOIDS, meridian_arc,
                             project_forward, project_inverse)

WGS84 = ELLIPSOIDS['WGS84']
r = math.radians


def test_meridian_and_equator_exact():
    s, _, _ = geodesic_inverse(r(0), r(0), r(0), r(50), WGS84)
    assert abs(float(s) - meridian_arc(r(50), WGS84)) < 1e-5
    s, _, _ = geodesic_inverse(r(0), r(0), r(90), r(0), WGS84)
    assert abs(float(s) - WGS84.a * math.pi / 2) < 1e-6


def test_geographiclib_doc_example():
    """GeographicLib's documented inverse example:
    (40.6N, 73.8W) -> (51.6N, 0.5W) = 5551759.4 m."""
    s, az1, _ = geodesic_inverse(r(-73.8), r(40.6), r(-0.5), r(51.6),
                                 WGS84)
    assert abs(float(s) - 5551759.4) < 0.5


def test_direct_inverts_inverse():
    rng = np.random.RandomState(0)
    lo1 = np.radians(rng.uniform(-170, 170, 200))
    la1 = np.radians(rng.uniform(-80, 80, 200))
    lo2 = np.radians(rng.uniform(-170, 170, 200))
    la2 = np.radians(rng.uniform(-80, 80, 200))
    s, az1, az2 = geodesic_inverse(lo1, la1, lo2, la2, WGS84)
    ok = np.isfinite(s)
    assert ok.mean() > 0.95      # only near-antipodal pairs drop out
    lo3, la3, _ = geodesic_direct(lo1[ok], la1[ok], az1[ok], s[ok],
                                  WGS84)
    dlo = np.abs((lo3 - lo2[ok] + math.pi) % (2 * math.pi) - math.pi)
    assert math.degrees(dlo.max()) < 1e-10
    assert np.degrees(np.abs(la3 - la2[ok])).max() < 1e-10


def test_rk4_integration_oracle():
    """Integrating the geodesic ODE from the returned (azimuth,
    distance) must land on the target point."""
    s, az1, _ = geodesic_inverse(r(7.0), r(46.0), r(25.0), r(35.0),
                                 WGS84)
    a, e2 = WGS84.a, WGS84.e2
    y = np.array([r(46.0), r(7.0), float(az1)])
    n = 5000
    h = float(s) / n

    def f(y):
        phi, lam, alpha = y
        sp = math.sin(phi)
        M = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        N = a / math.sqrt(1 - e2 * sp * sp)
        return np.array([math.cos(alpha) / M,
                         math.sin(alpha) / (N * math.cos(phi)),
                         math.sin(alpha) * math.tan(phi) / N])

    for _ in range(n):
        k1 = f(y)
        k2 = f(y + h / 2 * k1)
        k3 = f(y + h / 2 * k2)
        k4 = f(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    assert abs(math.degrees(y[1] - r(25.0))) < 1e-7
    assert abs(math.degrees(y[0] - r(35.0))) < 1e-7


def test_antipodal_masked_nan():
    s, az1, _ = geodesic_inverse(r(0), r(0.5), r(179.7), r(-0.5),
                                 WGS84)
    assert np.isnan(float(s))


def test_near_pole_over_the_top():
    s, _, _ = geodesic_inverse(r(0), r(89.5), r(180), r(89.5), WGS84)
    # the geodesic crosses the pole: twice 0.5 deg of meridian
    expect = 2 * (meridian_arc(r(90), WGS84) - meridian_arc(r(89.5),
                                                            WGS84))
    assert abs(float(s) - expect) < 1.0


# ---------------------------------------------------------------------------
# aeqd
# ---------------------------------------------------------------------------

def test_aeqd_polar_meridian_distance():
    p = {'proj': 'aeqd', 'lat_0': 90.0, 'lon_0': 0.0,
         'x_0': 0.0, 'y_0': 0.0}
    x, y = project_forward('aeqd', np.array([0.0]), np.array([60.0]),
                           WGS84, p)
    expect = meridian_arc(r(90), WGS84) - meridian_arc(r(60), WGS84)
    assert abs(-float(y[0]) - expect) < 1e-4
    assert abs(float(x[0])) < 1e-6


def test_aeqd_roundtrip_and_center():
    p = {'proj': 'aeqd', 'lat_0': 48.0, 'lon_0': 12.0,
         'x_0': 0.0, 'y_0': 0.0}
    LO, LA = np.meshgrid(np.linspace(-60, 84, 9),
                         np.linspace(-40, 80, 9))
    X, Y = project_forward('aeqd', LO, LA, WGS84, p)
    lo2, la2 = project_inverse('aeqd', X, Y, WGS84, p)
    assert np.nanmax(np.abs(lo2 - LO)) < 1e-9
    assert np.nanmax(np.abs(la2 - LA)) < 1e-9
    x0, y0 = project_forward('aeqd', np.array([12.0]),
                             np.array([48.0]), WGS84, p)
    assert float(x0[0]) == 0.0 and float(y0[0]) == 0.0


def test_aeqd_radial_distance_is_geodesic():
    p = {'proj': 'aeqd', 'lat_0': 48.0, 'lon_0': 12.0,
         'x_0': 0.0, 'y_0': 0.0}
    x, y = project_forward('aeqd', np.array([25.0]), np.array([35.0]),
                           WGS84, p)
    s, _, _ = geodesic_inverse(r(12.0), r(48.0), r(25.0), r(35.0),
                               WGS84)
    assert abs(math.hypot(float(x[0]), float(y[0])) - float(s)) < 1e-6


@pytest.mark.parametrize('code,proj', [(54032, 'aeqd'),
                                       (25832, 'utm'),
                                       (25830, 'utm'),
                                       (4258, 'longlat')])
def test_new_epsg_registry_roundtrip(code, proj):
    crs = CRS.from_epsg(code)
    assert crs.proj == proj
    assert CRS.from_string(crs.to_proj4()) == crs
    assert CRS.from_string(crs.to_wkt()) == crs


def test_aeqd_reprojection_end_to_end():
    from nd_tpu.testing import generate_test_dataset
    from nd_tpu.warp import Reprojection
    ds = generate_test_dataset(dims={'y': 30, 'x': 30, 'time': 1},
                               extent=(8.0, 44.0, 16.0, 50.0))
    out = Reprojection(
        crs='+proj=aeqd +lat_0=47 +lon_0=12 +ellps=WGS84').apply(ds)
    assert np.isfinite(np.asarray(out['C11'].values)).mean() > 0.8
