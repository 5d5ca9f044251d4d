"""Vectorized geometry kernels: even-odd ray-cast point-in-polygon and
polygon -> covering-cell expansion.

The point-in-polygon rule is the classic even-odd crossing test — the
same parity rule GDAL's scanline polygon fill uses
(alg/llrasterize.cpp:76-208) and the exact-refine stage of
OGRLayer::FilterGeometry (ogr/ogrsf_frmts/generic/ogrlayer.cpp:1445):
envelope prefilter first, exact parity test second. Holes need no
special casing — every ring flips parity.

All kernels are numpy-vectorized over *points* (the long axis); ring
edges are the short loop. They run inside pandas UDFs on Arrow
batches.
"""

from __future__ import annotations

import numpy as np

from . import grid, wkb


def points_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd ray cast of many points against one polygon's rings.

    px, py: float64 arrays (N,). rings: list of (M_i, 2) arrays,
    closed or open (first==last handled either way).
    Returns boolean (N,) — inside by the even-odd rule.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        n = len(r)
        if n < 3:
            continue
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(r[:, 0], -1), np.roll(r[:, 1], -1)
        for k in range(n):
            cond = (y1[k] > py) != (y2[k] > py)
            if not cond.any():
                continue
            xint = (x2[k] - x1[k]) * (py - y1[k]) / (y2[k] - y1[k]) + x1[k]
            inside ^= cond & (px < xint)
    return inside


def points_in_wkb(px: np.ndarray, py: np.ndarray, geom_wkb: bytes) -> np.ndarray:
    """Even-odd PIP against a WKB polygon/multipolygon, with the
    envelope reject fast path (FilterGeometry ogrlayer.cpp:1468)."""
    minx, miny, maxx, maxy = wkb.envelope(geom_wkb)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    out = np.zeros(px.shape, dtype=bool)
    if cand.any():
        out[cand] = points_in_rings(px[cand], py[cand], wkb.polygon_rings(geom_wkb))
    return out


def covering_cells_geodetic(geom_wkb: bytes, zoom: int) -> np.ndarray:
    """All geodetic (TMS-compatible) grid cells whose tile box
    intersects the geometry's envelope at ``zoom``. This is the
    equi-join prefilter key set — exactness comes from the refine
    stage, so envelope covering (a superset) is correct. Returns an
    int64 array of packed cell ids.

    This mirrors the reference's bbox pushdown in layer algebra
    (ogrlayer.cpp:2278 Intersection: method-layer envelope ->
    SetSpatialFilterRect on the input layer).
    """
    minx, miny, maxx, maxy = wkb.envelope(geom_wkb)
    tx0, ty0 = grid.lonlat_to_tile_geodetic([minx], [miny], zoom)
    tx1, ty1 = grid.lonlat_to_tile_geodetic([maxx], [maxy], zoom)
    xs = np.arange(int(tx0[0]), int(tx1[0]) + 1, dtype=np.int64)
    ys = np.arange(int(ty0[0]), int(ty1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return grid.pack_cell(zoom, gx.ravel(), gy.ravel())


def zoom_for_max_cells(geom_wkb: bytes, max_cells: int, max_zoom: int = 12) -> int:
    """Coarsest-enough zoom so the envelope covering has at most
    ``max_cells`` cells — the adaptive-cell-splitting dual: large
    polygons get coarse cells, small ones fine cells."""
    minx, miny, maxx, maxy = wkb.envelope(geom_wkb)
    for z in range(max_zoom, -1, -1):
        res = float(grid.geodetic_resolution(z)) * grid.TILE_SIZE
        nx = int(np.floor((maxx - minx) / res)) + 2
        ny = int(np.floor((maxy - miny) / res)) + 2
        if nx * ny <= max_cells:
            return z
    return 0
