"""Geodesic measures on an ellipsoid of revolution — the semantics of
OGRGeometry::get_GeodesicLength / get_GeodesicArea (GDAL >= 3.9,
ogr/ogrgeometry.cpp, geod_geodesic/geod_polygonarea underneath).

Fresh implementation from Karney 2013 ("Algorithms for geodesics",
J. Geod. 87) — but where GeographicLib expands the three geodesic
integrals into 6th-order series, this implementation evaluates the
EXACT integrands with fixed 32-point Gauss-Legendre quadrature (the
integrands are analytic and nearly constant for |f| ~ 1/300, so the
quadrature error is far below 1e-14 relative — verified against an
independent Clairaut-ODE integration in tests/test_geodesic.py):

* distance:   s = b * I1(sigma),  I1' = sqrt(1 + k^2 sin^2 sigma)
* longitude:  lambda = omega - f sin(alpha0) * I3(sigma),
              I3' = (2 - f) / (1 + (1 - f) sqrt(1 + k^2 sin^2 sigma))
* area: per-edge boundary integral of Green's form
              A = closed-integral Q(phi) dlambda,
              Q(phi) = a^2 (1 - e^2)/2 * [ sin(phi)/(1 - e^2 sin^2 phi)
                       + atanh(e sin phi)/e ]
  (d/dphi Q = a^2 (1-e^2) cos phi / (1 - e^2 sin^2 phi)^2 — the exact
  meridional area element; Q(pi/2) - Q(-pi/2) times 2 pi is the known
  total ellipsoid surface area), with
              dlambda/dsigma = sin(alpha0)/(cos^2 sigma +
                  sin^2 alpha0 sin^2 sigma) - f sin(alpha0) I3'(sigma).

The inverse problem solves for the departure azimuth by a bracketed
secant iteration on alpha1 (Karney's canonical arrangement: point 1
the southernmost, latitudes mirrored negative, lambda12 in [0, pi],
so cos(alpha2) takes the + root); meridional and equatorial edges
take their closed shortcuts. Nearly-antipodal pairs (lambda12 within
~5f of pi with low latitudes) are OUTSIDE the supported domain of
this solver — polygon edges, the GDAL use case, never approach it.

Pure numpy, per-feature local: the Spark operators run this inside
Arrow-batched mapInPandas with no shuffle (operators/geodesy.py).
"""

from __future__ import annotations

import math

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563

_GL_X, _GL_W = np.polynomial.legendre.leggauss(32)


class Geodesic:
    def __init__(self, a: float = A_WGS84, f: float = F_WGS84):
        self.a = a
        self.f = f
        self.b = a * (1.0 - f)
        self.e2 = f * (2.0 - f)
        self.ep2 = self.e2 / (1.0 - self.e2)
        self.e = math.sqrt(self.e2)

    # -- exact integrands ------------------------------------------------
    def _i1p(self, sig, k2):
        s = np.sin(sig)
        return np.sqrt(1.0 + k2 * s * s)

    def _i3p(self, sig, k2):
        return (2.0 - self.f) / (
            1.0 + (1.0 - self.f) * self._i1p(sig, k2)
        )

    @staticmethod
    def _quad(fn, s1: float, s2: float) -> float:
        h = 0.5 * (s2 - s1)
        m = 0.5 * (s2 + s1)
        return float(h * np.sum(_GL_W * fn(m + h * _GL_X)))

    # -- area antiderivative --------------------------------------------
    def area_q(self, phi):
        """Q(phi): area between the equator and the parallel phi, per
        unit longitude."""
        sp = np.sin(phi)
        if self.e < 1e-12:
            tail = sp
        else:
            tail = np.arctanh(self.e * sp) / self.e
        return (
            self.a
            * self.a
            * (1.0 - self.e2)
            / 2.0
            * (sp / (1.0 - self.e2 * sp * sp) + tail)
        )

    def total_area(self) -> float:
        return 4.0 * math.pi * self.area_q(0.5 * math.pi)

    # -- inverse problem --------------------------------------------------
    def _beta(self, phi: float) -> float:
        return math.atan2((1.0 - self.f) * math.sin(phi), math.cos(phi))

    def _lam12(self, alp1, sbet1, cbet1, sbet2, cbet2):
        """lambda12 and the sigma parametrization for departure
        azimuth alp1 in the canonical arrangement."""
        salp0 = math.sin(alp1) * cbet1
        calp0 = math.sqrt(max(0.0, 1.0 - salp0 * salp0))
        ssig1, csig1 = sbet1, math.cos(alp1) * cbet1
        sig1 = math.atan2(ssig1, csig1)
        omg1 = math.atan2(salp0 * ssig1, csig1)
        # + root: canonical |beta2| <= |beta1| => before the vertex
        calp2 = (
            math.sqrt(
                max(
                    0.0,
                    (math.cos(alp1) * cbet1) ** 2
                    + (cbet2 * cbet2 - cbet1 * cbet1),
                )
            )
            / cbet2
        )
        ssig2, csig2 = sbet2, calp2 * cbet2
        sig2 = math.atan2(ssig2, csig2)
        omg2 = math.atan2(salp0 * ssig2, csig2)
        k2 = self.ep2 * calp0 * calp0
        i3 = self._quad(lambda s: self._i3p(s, k2), sig1, sig2)
        lam = (omg2 - omg1) - self.f * salp0 * i3
        return lam, (salp0, calp0, sig1, sig2, calp2, k2)

    def _edge_area(self, salp0, calp0, k2, sig1, sig2) -> float:
        """Integral of Q(phi(sigma)) dlambda/dsigma over the edge."""
        omf = 1.0 - self.f

        def integrand(sig):
            ss, cs = np.sin(sig), np.cos(sig)
            sbet = calp0 * ss
            cbet = np.sqrt(1.0 - sbet * sbet)
            # phi from beta: tan(phi) = tan(beta) / (1 - f)
            sphi = sbet / np.sqrt(sbet * sbet + (omf * cbet) ** 2)
            phi = np.arcsin(np.clip(sphi, -1.0, 1.0))
            dlam = salp0 / (cs * cs + salp0 * salp0 * ss * ss) - (
                self.f * salp0 * self._i3p(sig, k2)
            )
            return self.area_q(phi) * dlam

        return self._quad(integrand, sig1, sig2)

    def inverse(self, lat1, lon1, lat2, lon2):
        """Returns (s12 meters, S12 signed area contribution of the
        edge in the Green boundary integral, azi1 radians)."""
        phi1, phi2 = math.radians(lat1), math.radians(lat2)
        lam12 = math.radians(lon2 - lon1)
        lam12 = math.atan2(math.sin(lam12), math.cos(lam12))  # wrap
        bet1, bet2 = self._beta(phi1), self._beta(phi2)

        # canonical flips; the area integrand is odd under each
        sign_area = 1.0
        swapped = False
        if abs(bet1) < abs(bet2):
            bet1, bet2 = bet2, bet1
            lam12 = -lam12
            sign_area = -sign_area
            swapped = True
        latflip = False
        if bet1 > 0:
            bet1, bet2 = -bet1, -bet2
            sign_area = -sign_area
            latflip = True
        lonflip = False
        if lam12 < 0:
            lam12 = -lam12
            sign_area = -sign_area
            lonflip = True

        sbet1, cbet1 = math.sin(bet1), math.cos(bet1)
        sbet2, cbet2 = math.sin(bet2), math.cos(bet2)

        if lam12 < 1e-12:
            # meridional (or coincident): sigma == beta, k2 = ep2
            k2 = self.ep2
            s12 = self.b * abs(
                self._quad(lambda s: self._i1p(s, k2), bet1, bet2)
            )
            azi1 = 0.0 if bet2 >= bet1 else math.pi
            return s12, 0.0, self._azi_back(
                azi1, azi1, swapped, latflip, lonflip
            )
        if abs(sbet1) < 1e-12 and abs(sbet2) < 1e-12:
            if lam12 <= (1.0 - self.f) * math.pi:
                # equatorial segment; Q(0) = 0 so no area term
                return self.a * lam12, 0.0, self._azi_back(
                    0.5 * math.pi, 0.5 * math.pi, swapped, latflip, lonflip
                )
            raise ValueError("near-antipodal equatorial pair unsupported")

        # secant + bisection bracket on alpha1 in (0, pi)
        lo, hi = 1e-12, math.pi - 1e-12
        g_lo, _ = self._lam12(lo, sbet1, cbet1, sbet2, cbet2)
        g_hi, _ = self._lam12(hi, sbet1, cbet1, sbet2, cbet2)
        g_lo -= lam12
        g_hi -= lam12
        if g_lo > 0 or g_hi < 0:
            raise ValueError("inverse bracket failed (antipodal-ish pair)")
        # spherical initial guess on the auxiliary sphere
        alp1 = math.atan2(
            cbet2 * math.sin(lam12),
            cbet1 * sbet2 - sbet1 * cbet2 * math.cos(lam12),
        )
        alp1 = min(max(alp1, lo), hi)
        g, st = self._lam12(alp1, sbet1, cbet1, sbet2, cbet2)
        g -= lam12
        a_prev, g_prev = (lo, g_lo) if g > 0 else (hi, g_hi)
        for _ in range(80):
            if abs(g) < 1e-14:
                break
            if g > 0:
                hi = alp1
            else:
                lo = alp1
            denom = g - g_prev
            step = (
                alp1 - g * (alp1 - a_prev) / denom
                if abs(denom) > 1e-300
                else 0.5 * (lo + hi)
            )
            a_prev, g_prev = alp1, g
            alp1 = step if lo < step < hi else 0.5 * (lo + hi)
            g, st = self._lam12(alp1, sbet1, cbet1, sbet2, cbet2)
            g -= lam12
        salp0, calp0, sig1, sig2, calp2, k2 = st
        s12 = self.b * self._quad(lambda s: self._i1p(s, k2), sig1, sig2)
        s12 = abs(s12)
        area = sign_area * self._edge_area(salp0, calp0, k2, sig1, sig2)
        alp2 = math.atan2(salp0, calp2 * cbet2)
        return s12, area, self._azi_back(
            alp1, alp2, swapped, latflip, lonflip
        )

    @staticmethod
    def _azi_back(alp1c, alp2c, swapped, latflip, lonflip):
        """Departure azimuth at the ORIGINAL point 1: undo the
        canonical flips (swap -> the reversed arrival azimuth at the
        canonical endpoint; the mirrors negate / supplement)."""
        a = (alp2c + math.pi) if swapped else alp1c
        if latflip:
            a = math.pi - a
        if lonflip:
            a = -a
        return math.atan2(math.sin(a), math.cos(a))

    # -- polygon measures -------------------------------------------------
    def polygon_perimeter_area(self, lats, lons):
        """(perimeter_m, signed_area_m2) of the geodesic polygon with
        vertices in order (ring not explicitly closed). The Green
        boundary integral is exact for rings that neither enclose nor
        touch a pole (the GDAL layer-feature regime); CCW-in-(lon,lat)
        rings come out positive."""
        n = len(lats)
        per = 0.0
        area = 0.0
        for i in range(n):
            j = (i + 1) % n
            s12, a12, _ = self.inverse(lats[i], lons[i], lats[j], lons[j])
            per += s12
            area += a12
        # Green's theorem: closed-integral Q dlambda = -(enclosed
        # area) for CCW-in-(lon,lat) rings — negate so CCW > 0
        return per, -area
