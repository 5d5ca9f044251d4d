"""Tiny deterministic Delaunay triangulation (Bowyer-Watson).

The reference's linear gridding (GDALGridLinear, alg/gdalgrid.cpp:2477)
interpolates each node barycentrically inside the facet of a Delaunay
triangulation of the scattered points (alg/delaunay.c wraps qhull; the
algorithm here is the textbook Bowyer-Watson incremental insertion —
same triangulation up to degenerate ties, which the synthetic point
sets avoid).

The point sets of the gridding operators are tiny and driver-resident
(the distributed part is the per-node interpolation over the raster),
so a pure-python triangulation is the right cost model: O(n^2) on n
scattered points, run once on the driver, broadcast as constants.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np


def _circumcircle_contains(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """True iff (px, py) lies strictly inside the circumcircle of
    triangle abc (a, b, c counter-clockwise). EXACT: floats are
    dyadic rationals, so the Fraction determinant has the true sign —
    no filtered float path, n is tiny and driver-side (module
    docstring). Exactness matters doubly here: the super-triangle
    sits 1e12 radii out (see delaunay()), far outside float-det
    range."""
    F = Fraction
    adx, ady = F(ax) - F(px), F(ay) - F(py)
    bdx, bdy = F(bx) - F(px), F(by) - F(py)
    cdx, cdy = F(cx) - F(px), F(cy) - F(py)
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return det > 0


def _ccw(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)


def _ccw_exact(ax, ay, bx, by, cx, cy) -> int:
    F = Fraction
    v = (F(bx) - F(ax)) * (F(cy) - F(ay)) - (F(cx) - F(ax)) * (F(by) - F(ay))
    return (v > 0) - (v < 0)


def delaunay(px, py) -> list[tuple[int, int, int]]:
    """Indices (i, j, k) of the Delaunay triangles of the point set,
    every triangle CCW, list sorted for determinism."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    n = len(px)
    if n < 3:
        return []
    # Super-triangle FAR outside every final circumcircle: hull-
    # adjacent triangles are only Delaunay-correct if no super vertex
    # lies inside their circumcircles, and a thin hull triangle's
    # circumradius can reach ~r^3/(4*area). 1e12 radii covers
    # triangles down to relative area ~2.5e-13 (below that the points
    # are collinear at float resolution); the hypothesis fuzz caught
    # the old 16-radii super-triangle clipping real circumcircles
    # (hull gaps + non-Delaunay hull triangles). Exact predicates
    # make the huge coordinates safe.
    cx = float(px.mean())
    cy = float(py.mean())
    r = float(np.hypot(px - cx, py - cy).max()) * 1e12 + 1e12
    sx = [cx - 2.0 * r, cx + 2.0 * r, cx]
    sy = [cy - r, cy - r, cy + 2.0 * r]
    X = list(px) + sx
    Y = list(py) + sy
    tris = [(n, n + 1, n + 2)]
    for p in range(n):
        bad = []
        for t in tris:
            a, b, c = t
            if _circumcircle_contains(
                X[a], Y[a], X[b], Y[b], X[c], Y[c], X[p], Y[p]
            ):
                bad.append(t)
        # boundary of the cavity: edges belonging to exactly one bad
        # triangle
        edges: dict[tuple[int, int], int] = {}
        for a, b, c in bad:
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        cavity = [e for e, cnt in edges.items() if cnt == 1]
        tris = [t for t in tris if t not in bad]
        for a, b in cavity:
            # orient CCW (exact: cavity edges may touch super
            # vertices whose 1e12-scale coords swamp a float cross)
            if _ccw_exact(X[a], Y[a], X[b], Y[b], X[p], Y[p]) > 0:
                tris.append((a, b, p))
            else:
                tris.append((b, a, p))
    out = []
    for a, b, c in tris:
        if a < n and b < n and c < n:
            # canonical rotation: smallest vertex first, keep CCW order
            v = [a, b, c]
            m = v.index(min(v))
            out.append((v[m], v[(m + 1) % 3], v[(m + 2) % 3]))
    return sorted(out)
