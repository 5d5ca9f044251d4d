"""Convex hull operator: chain vs an independent O(n^3) brute force,
plus containment invariants on the synth cloud."""

import numpy as np

from gdal_spark import synth
from gdal_spark.operators import hull


def brute_hull_vertices(pts: np.ndarray) -> set[tuple[int, int]]:
    """Independent O(n^3) maximal-edge characterization (the oracle's
    logic, in python): returns the set of hull vertices (edge starts)."""
    n = len(pts)
    verts = set()
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            ok = True
            for c in range(n):
                if c in (a, b):
                    continue
                cr = int(
                    (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1])
                    - (pts[b, 1] - pts[a, 1]) * (pts[c, 0] - pts[a, 0])
                )
                if cr > 0:
                    continue
                if cr == 0:
                    lo = min(pts[a, 0], pts[b, 0]), min(pts[a, 1], pts[b, 1])
                    hi = max(pts[a, 0], pts[b, 0]), max(pts[a, 1], pts[b, 1])
                    if pts[a, 0] != pts[b, 0]:
                        if lo[0] < pts[c, 0] < hi[0]:
                            continue
                    elif lo[1] < pts[c, 1] < hi[1]:
                        continue
                ok = False
                break
            if ok:
                verts.add((int(pts[a, 0]), int(pts[a, 1])))
    return verts


def test_chain_matches_bruteforce_including_degenerates():
    rng = np.random.default_rng(3)
    cases = [
        rng.integers(-50, 50, size=(30, 2)),          # general position
        np.array([[i, 2 * i] for i in range(8)]),     # all collinear
        np.array([[0, 0], [5, 5]]),                   # 2 points
        np.array([[7, 7]]),                           # 1 point
        np.array([[0, 0], [4, 0], [8, 0], [4, 4]]),   # collinear edge run
        np.repeat(rng.integers(-5, 5, size=(6, 2)), 2, axis=0),  # dups
    ]
    for raw in cases:
        upts = np.unique(np.asarray(raw, dtype=np.int64), axis=0)
        idx = hull._hull_indices(upts)
        got = {tuple(map(int, upts[i])) for i in idx}
        if len(upts) >= 3:
            exp = brute_hull_vertices(upts)
            # brute force on fully-collinear sets returns the 2 extremes,
            # same as the chain
            assert got == exp, (upts, got, exp)
        # every point inside or on the hull (cross >= 0 around CCW ring)
        if len(idx) >= 3:
            hv = upts[idx]
            for p in upts:
                for a in range(len(idx)):
                    b = (a + 1) % len(idx)
                    cr = int(hv[b, 0] - hv[a, 0]) * int(p[1] - hv[a, 1]) - int(
                        hv[b, 1] - hv[a, 1]
                    ) * int(p[0] - hv[a, 0])
                    assert cr >= 0


def test_cell_hulls_spark(spark):
    """Driver-query invariants at small n: one row per non-empty cell,
    hull vertices bounded by point count, positive area for cells with
    >= 3 non-collinear points, and the hot cell present."""
    out = hull.cell_hulls(synth.images_df(spark, 3000)).toPandas()
    assert (out.hull_n <= out.n_pts).all()
    assert (out.area2 >= 0).all()
    assert ((out.hull_n >= 3) == (out.area2 > 0)).all()
    # sampled 3000/16 ~ 187 points over 8x8 cells: several real hulls
    assert (out.hull_n >= 3).sum() >= 10


def test_cell_hulls_nondefault_zoom(spark):
    """Scale-knob audit: zoom is a run-scale argument — a finer grid
    (z4 = 16x16 cells) yields at least as many cells, each with no
    more points than its z3 parent."""
    z3 = hull.cell_hulls(synth.images_df(spark, 3000)).toPandas()
    z4 = hull.cell_hulls(synth.images_df(spark, 3000), zoom=4).toPandas()
    assert len(z4) >= len(z3)
    assert z4.n_pts.sum() == z3.n_pts.sum()  # same sampled points
    assert z4.n_pts.max() <= z3.n_pts.max()
