"""Delaunay triangulation + linear gridding invariants."""

import itertools

import numpy as np

from gdal_spark import delaunay as dl
from gdal_spark.operators import raster_misc


def _pts():
    return (
        np.array(raster_misc.LINEAR_POINTS["px"]),
        np.array(raster_misc.LINEAR_POINTS["py"]),
    )


def test_empty_circumcircle():
    """Defining Delaunay property: no point strictly inside any
    triangle's circumcircle (brute force over all points)."""
    px, py = _pts()
    tris = dl.delaunay(px, py)
    assert len(tris) >= 2 * 3  # 12 generic points -> >= 2n-2-h tris
    for a, b, c in tris:
        # ensure CCW for the determinant test
        if dl._ccw(px[a], py[a], px[b], py[b], px[c], py[c]) < 0:
            b, c = c, b
        for p in range(len(px)):
            if p in (a, b, c):
                continue
            assert not dl._circumcircle_contains(
                px[a], py[a], px[b], py[b], px[c], py[c], px[p], py[p]
            ), (a, b, c, p)


def test_triangulation_covers_hull_area():
    """Triangle areas sum to the convex hull area (no gaps, no
    overlaps) — hull area via the shoelace on the brute-force hull."""
    px, py = _pts()
    tris = dl.delaunay(px, py)
    area = sum(
        abs(dl._ccw(px[a], py[a], px[b], py[b], px[c], py[c])) / 2.0
        for a, b, c in tris
    )
    # brute-force hull: points that are vertices of the convex hull
    # via orientation tests over all pairs
    n = len(px)
    hull = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            side = [
                dl._ccw(px[i], py[i], px[j], py[j], px[k], py[k])
                for k in range(n)
                if k not in (i, j)
            ]
            if all(s >= 0 for s in side):
                hull.append((i, j))
    # walk the hull edges to order vertices
    nxt = dict(hull)
    start = hull[0][0]
    order = [start]
    while nxt[order[-1]] != start:
        order.append(nxt[order[-1]])
    hx = px[order]
    hy = py[order]
    hull_area = abs(
        float(np.dot(hx, np.roll(hy, -1)) - np.dot(hy, np.roll(hx, -1)))
    ) / 2.0
    assert abs(area - hull_area) < 1e-9


def test_linear_reproduces_linear_field(spark):
    """Interpolating a globally-linear field reproduces it exactly at
    every in-hull node (barycentric interpolation is exact on linear
    functions) — independent of which valid triangulation was built."""
    import pandas as pd

    px, py = _pts()
    v = 7.0 + 3.0 * px - 2.0 * py
    pdf = pd.DataFrame({"px": px, "py": py, "v": v})
    out = (
        raster_misc.grid_linear(spark, pdf, 64, 64)
        .toPandas()
        .set_index("y")
        .sort_index()
    )
    # recompute expected keys: linear value inside hull, nearest
    # outside
    tris = dl.delaunay(px, py)
    gy, gx = np.mgrid[0:64, 0:64]
    gx = gx.astype(float)
    gy = gy.astype(float)
    vals = np.full((64, 64), np.nan)
    for a, b, c in tris:
        x1, y1, x2, y2, x3, y3 = px[a], py[a], px[b], py[b], px[c], py[c]
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        l1 = ((y2 - y3) * (gx - x3) + (x3 - x2) * (gy - y3)) / det
        l2 = ((y3 - y1) * (gx - x3) + (x1 - x3) * (gy - y3)) / det
        l3 = 1.0 - l1 - l2
        m = (l1 >= 0) & (l2 >= 0) & (l3 >= 0) & np.isnan(vals)
        vals[m] = (l1 * v[a] + l2 * v[b] + l3 * v[c])[m]
    inhull = ~np.isnan(vals)
    exact = 7.0 + 3.0 * gx - 2.0 * gy
    assert np.abs(vals[inhull] - exact[inhull]).max() < 1e-9
    d2 = (gx[None] - px[:, None, None]) ** 2 + (gy[None] - py[:, None, None]) ** 2
    vals[~inhull] = v[d2.argmin(axis=0)][~inhull]
    keys = np.floor(vals * 1e6).astype(np.int64).sum(axis=1)
    for y in range(64):
        assert out.loc[y].val_sum_key == keys[y]
