"""Geodesic measures (gdal_spark/geodesic.py, operators/geodesy.py).

Independent verification on the FULL WGS84 ellipsoid (the gated
sphere mode is checked by the oracle; these pin the ellipsoid math):
* total surface area against the published WGS84 constant;
* meridian quarter arc against a dense trapezoid integration of the
  meridional radius M(phi) — series-free, textbook integrand;
* equator arc a * dlon and azimuth conventions;
* inverse-then-shoot: RK4 integration of the Clairaut geodesic ODE
  (dphi/ds = cos a / M, dlam/ds = sin a / (N cos phi),
  da/ds = sin a tan phi / N) from point 1 with the solved azimuth and
  distance must arrive at point 2;
* polygon area against the same RK4 paths' Green integral, and in
  sphere mode against the Gauss-Bonnet angle-sum excess.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.geodesic import A_WGS84, Geodesic

G = Geodesic()
R = 6378137.0
GS = Geodesic(R, 0.0)

# published WGS84 surface area (GeographicLib / NGA): 5.10065621724e14
WGS84_AREA = 510065621724088.44


def _rk4_path(la1, lo1, azi1, s12, n=4000):
    e2 = G.e2

    def deriv(y):
        phi, lam, alp = y
        w = math.sqrt(1 - e2 * math.sin(phi) ** 2)
        m = A_WGS84 * (1 - e2) / w**3
        nr = A_WGS84 / w
        return np.array(
            [
                math.cos(alp) / m,
                math.sin(alp) / (nr * math.cos(phi)),
                math.sin(alp) * math.tan(phi) / nr,
            ]
        )

    y = np.array([math.radians(la1), math.radians(lo1), azi1])
    h = s12 / n
    pts = [y.copy()]
    for _ in range(n):
        k1 = deriv(y)
        k2 = deriv(y + h / 2 * k1)
        k3 = deriv(y + h / 2 * k2)
        k4 = deriv(y + h * k3)
        y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        pts.append(y.copy())
    return np.array(pts)


def test_total_area_constant():
    assert G.total_area() == pytest.approx(WGS84_AREA, rel=1e-12)


def test_meridian_quarter_arc():
    phi = np.linspace(0, math.pi / 2, 100001)
    m = G.a * (1 - G.e2) / np.power(1 - G.e2 * np.sin(phi) ** 2, 1.5)
    arc = np.trapz(m, phi)
    s12, a12, azi1 = G.inverse(0.0, 10.0, 90.0, 10.0)
    assert s12 == pytest.approx(arc, rel=1e-10)
    assert a12 == 0.0
    assert azi1 == pytest.approx(0.0, abs=1e-12)


def test_equator_arc():
    s12, a12, azi1 = G.inverse(0.0, 10.0, 0.0, 55.0)
    assert s12 == pytest.approx(G.a * math.radians(45.0), rel=1e-14)
    assert azi1 == pytest.approx(math.pi / 2, abs=1e-12)


@pytest.mark.parametrize(
    "p",
    [
        (-30.5, 12.3, 41.2, 55.7),
        (10.0, -120.0, 35.0, -60.0),
        (-5.0, 3.0, -7.0, 22.0),
        (47.0, 7.0, 49.0, 9.0),
        (60.0, 170.0, 55.0, -170.0),
        (12.0, 30.0, 12.0, 31.5),  # equal latitudes (past-vertex arc)
        (20.0, 0.0, -30.0, 40.0),
    ],
)
def test_inverse_then_rk4_shoot(p):
    la1, lo1, la2, lo2 = p
    s12, _, azi1 = G.inverse(la1, lo1, la2, lo2)
    path = _rk4_path(la1, lo1, azi1, s12, n=8000)
    fla, flo = math.degrees(path[-1, 0]), math.degrees(path[-1, 1])
    dlon = (flo - lo2 + 180.0) % 360.0 - 180.0
    assert abs(fla - la2) < 1e-8
    assert abs(dlon) < 1e-8


POLYS = [
    ([10.0, 10.0, 25.0, 25.0], [20.0, 40.0, 40.0, 20.0]),
    ([-35.0, -30.0, -20.0], [100.0, 115.0, 105.0]),
    ([50.0, 50.0, 62.0, 62.0], [-10.0, 15.0, 15.0, -10.0]),
]


@pytest.mark.parametrize("lats,lons", POLYS[:2])
def test_polygon_area_vs_rk4_green_integral(lats, lons):
    per, area = G.polygon_perimeter_area(lats, lons)
    tot = 0.0
    n = len(lats)
    for i in range(n):
        j = (i + 1) % n
        s12, _, azi1 = G.inverse(lats[i], lons[i], lats[j], lons[j])
        path = _rk4_path(lats[i], lons[i], azi1, s12, n=4000)
        tot += np.trapz(G.area_q(path[:, 0]), path[:, 1])
    assert area == pytest.approx(-tot, rel=1e-7)
    assert area > 0  # CCW rings positive


def _sph_az(p1, l1, p2, l2):
    dl = l2 - l1
    return math.atan2(
        math.sin(dl) * math.cos(p2),
        math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl),
    )


@pytest.mark.parametrize("lats,lons", POLYS)
def test_sphere_polygon_area_vs_excess(lats, lons):
    per, area = GS.polygon_perimeter_area(lats, lons)
    n = len(lats)
    pr = [math.radians(x) for x in lats]
    lr = [math.radians(x) for x in lons]
    turn = 0.0
    for i in range(n):
        h = (i - 1) % n
        j = (i + 1) % n
        az_in_rev = _sph_az(pr[i], lr[i], pr[h], lr[h])
        az_out = _sph_az(pr[i], lr[i], pr[j], lr[j])
        turn += (az_out - az_in_rev) % (2 * math.pi) - math.pi
    want = R * R * (2 * math.pi + turn)
    assert area == pytest.approx(want, rel=1e-12)


def test_sphere_distance_closed_form():
    rng = np.random.default_rng(5)
    for _ in range(25):
        la1, la2 = rng.uniform(-80, 80, 2)
        lo1, lo2 = rng.uniform(-180, 180, 2)
        dl = math.radians(lo2 - lo1)
        if abs(abs(math.atan2(math.sin(dl), math.cos(dl))) - math.pi) < 0.2:
            continue  # near-antipodal out of supported domain
        p1, p2 = math.radians(la1), math.radians(la2)
        c = math.atan2(
            math.hypot(
                math.cos(p2) * math.sin(dl),
                math.cos(p1) * math.sin(p2)
                - math.sin(p1) * math.cos(p2) * math.cos(dl),
            ),
            math.sin(p1) * math.sin(p2)
            + math.cos(p1) * math.cos(p2) * math.cos(dl),
        )
        got, _, _ = GS.inverse(la1, lo1, la2, lo2)
        assert got == pytest.approx(R * c, rel=1e-12, abs=1e-6)


def test_ellipsoid_vs_sphere_flattening_magnitude():
    # the ellipsoid correction must be present and of order f
    s_e, _, _ = G.inverse(30.0, 10.0, 30.0, 40.0)
    s_s, _, _ = GS.inverse(30.0, 10.0, 30.0, 40.0)
    rel = abs(s_e - s_s) / s_s
    assert 1e-4 < rel < 5e-3
