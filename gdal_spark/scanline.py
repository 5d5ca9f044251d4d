"""Scanline polygon fill + Bresenham line burn — GDAL-parity numpy.

Fresh implementations of the rasterization semantics of
alg/llrasterize.cpp:

- ``fill_polygon`` — even-odd scanline conversion
  (GDALdllImageFilledPolygon, :76): per scanline y the test height is
  y + 0.5; edge intersections round to floor(x + 0.5); spans fill
  [ints[i], ints[i+1] - 1]; bottom horizontal segments fill
  separately, top ones are skipped. A pixel burns iff its center is
  inside (ties on half-integers follow the rounding above).
- ``draw_line`` — integer Bresenham on floor()ed endpoints
  (GDALdllImageLine, :241); intermediate segment endpoints are
  burned once (skipped per segment except the last) so ADD mode
  doesn't double-burn vertices.
- ``burn_value`` clamping for Byte targets matches GDAL's behavior in
  autotest/alg/rasterize.py:87 (burn 256 -> 255, -1 -> 0);
  parity golden: test_rasterize_1 checksum 6452.

Coordinates are in pixel space (caller applies the inverse
geotransform first, as gdalrasterize.cpp does).
"""

from __future__ import annotations

import math

import numpy as np


def fill_polygon(arr: np.ndarray, rings, value: float, merge: str = "replace"):
    """Burn a polygon (list of (N,2) pixel-space rings, open or
    closed) into 2-D ``arr`` in place."""
    h, w = arr.shape
    pts = []
    sizes = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        if len(r) >= 3:
            pts.append(r)
            sizes.append(len(r))
    if not pts:
        return
    ys = np.concatenate([p[:, 1] for p in pts])
    miny = max(int(ys.min()), 0)
    maxy = min(int(ys.max()), h - 1)
    maxx = w - 1

    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints = []
        for r in pts:
            n = len(r)
            for i in range(n):
                x1, y1 = r[i - 1]
                x2, y2 = r[i]
                if (y1 < dy and y2 < dy) or (y1 > dy and y2 > dy):
                    continue
                if y1 == y2:
                    # bottom horizontal segments fill separately
                    # (right-to-left orientation), top ones skip
                    if x1 > x2:
                        hx1 = int(math.floor(x2 + 0.5))
                        hx2 = int(math.floor(x1 + 0.5))
                        if hx1 > maxx or hx2 <= 0:
                            continue
                        _burn_span(arr, y, hx1, hx2 - 1, value, merge)
                    continue
                if y1 > y2:
                    x1, y1, x2, y2 = x2, y2, x1, y1
                if dy < y2 and dy >= y1:
                    xint = (dy - y1) * (x2 - x1) / (y2 - y1) + x1
                    ints.append(int(math.floor(xint + 0.5)))
        ints.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= maxx and ints[i + 1] > 0:
                _burn_span(arr, y, ints[i], ints[i + 1] - 1, value, merge)


def _burn_span(arr, y, x0, x1, value, merge):
    h, w = arr.shape
    x0 = max(x0, 0)
    x1 = min(x1, w - 1)
    if x1 < x0:
        return
    if merge == "add":
        arr[y, x0 : x1 + 1] += value
    else:
        arr[y, x0 : x1 + 1] = value


def draw_line(arr: np.ndarray, pts, value: float, merge: str = "replace"):
    """Burn a polyline (array (N,2) of pixel-space points) into
    ``arr`` in place, Bresenham with vertex de-duplication."""
    h, w = arr.shape
    pts = np.asarray(pts, dtype=np.float64)
    npts = len(pts)
    for j in range(1, npts):
        ix = int(math.floor(pts[j - 1, 0]))
        iy = int(math.floor(pts[j - 1, 1]))
        ix1 = int(math.floor(pts[j, 0]))
        iy1 = int(math.floor(pts[j, 1]))
        ndx = abs(ix1 - ix)
        ndy = abs(iy1 - iy)
        xstep = -1 if ix > ix1 else 1
        ystep = -1 if iy > iy1 else 1
        if ndx >= ndy:
            xerr = ndy << 1
            yerr = xerr - (ndx << 1)
            err = xerr - ndx
            if j != npts - 1:
                ndx -= 1
            while ndx >= 0:
                ndx -= 1
                if 0 <= ix < w and 0 <= iy < h:
                    _burn_px(arr, iy, ix, value, merge)
                ix += xstep
                if err > 0:
                    iy += ystep
                    err += yerr
                else:
                    err += xerr
        else:
            xerr = ndx << 1
            yerr = xerr - (ndy << 1)
            err = xerr - ndy
            if j != npts - 1:
                ndy -= 1
            while ndy >= 0:
                ndy -= 1
                if 0 <= ix < w and 0 <= iy < h:
                    _burn_px(arr, iy, ix, value, merge)
                iy += ystep
                if err > 0:
                    ix += xstep
                    err += yerr
                else:
                    err += xerr


def _burn_px(arr, y, x, value, merge):
    if merge == "add":
        arr[y, x] += value
    else:
        arr[y, x] = value


def draw_line_all_touched(
    arr: np.ndarray,
    pts,
    value: float,
    merge: str = "replace",
    intersect_only: bool = False,
):
    """ALL_TOUCHED line walk (GDALdllImageLineAllTouched,
    alg/llrasterize.cpp:370): burn every pixel the segment passes
    through. Vertical/horizontal segments within 0.01 of an integer
    grid line are skipped when ``intersect_only`` (the polygon-outline
    mode, gdalrasterize.cpp bAllTouched path); the general case walks
    pixel boundary crossings along x."""
    h, w = arr.shape
    pts = np.asarray(pts, dtype=np.float64)
    for j in range(1, len(pts)):
        x, y = float(pts[j - 1, 0]), float(pts[j - 1, 1])
        xe, ye = float(pts[j, 0]), float(pts[j, 1])
        if (y < 0 and ye < 0) or (y > h and ye > h) or (
            x < 0 and xe < 0
        ) or (x > w and xe > w):
            continue
        if x > xe:
            x, xe, y, ye = xe, x, ye, y
        # vertical special case
        if math.floor(x) == math.floor(xe) or abs(x - xe) < 0.01:
            if intersect_only and abs(x - round(x)) < 0.01 and abs(
                xe - round(xe)
            ) < 0.01:
                continue
            if ye < y:
                y, ye = ye, y
            ix = int(math.floor(xe))
            iy, iye = int(math.floor(y)), int(math.floor(ye))
            if ix < 0 or ix >= w:
                continue
            iy = max(iy, 0)
            iye = min(iye, h - 1)
            for yy in range(iy, iye + 1):
                _burn_px(arr, yy, ix, value, merge)
            continue
        # horizontal special case
        if math.floor(y) == math.floor(ye) or abs(y - ye) < 0.01:
            if intersect_only and abs(y - round(y)) < 0.01 and abs(
                ye - round(ye)
            ) < 0.01:
                continue
            if xe < x:
                x, xe = xe, x
            ix, ixe = int(math.floor(x)), int(math.floor(xe))
            iy = int(math.floor(y))
            if iy < 0 or iy >= h:
                continue
            ix = max(ix, 0)
            ixe = min(ixe, w - 1)
            for xx in range(ix, ixe + 1):
                _burn_px(arr, iy, xx, value, merge)
            continue
        # general sloped case: clip, then walk boundary crossings
        slope = (ye - y) / (xe - x)
        if xe > w:
            ye -= (xe - w) * slope
            xe = float(w)
        if x < 0.0:
            y += (0.0 - x) * slope
            x = 0.0
        if ye > y:
            if y < 0.0:
                x += (0.0 - y) / slope
                y = 0.0
            if ye >= h:
                xe += (ye - h) / slope
                xe = min(xe, float(w))
        else:
            if y >= h:
                x += (h - y) / slope
                y = float(h)
            if ye < 0.0:
                xe -= (ye - 0.0) / slope
        while 0.0 <= x < xe:
            ix = int(math.floor(x))
            iy = int(math.floor(y))
            if 0 <= iy < h and 0 <= ix < w:
                _burn_px(arr, iy, ix, value, merge)
            step_x = math.floor(x + 1.0) - x
            step_y = step_x * slope
            if int(math.floor(y + step_y)) == iy:
                x += step_x
                y += step_y
            elif slope < 0:
                step_y = min(iy - y, -1e-9)
                x += step_y / slope
                y += step_y
            else:
                step_y = max((iy + 1) - y, 1e-9)
                x += step_y / slope
                y += step_y


def fill_polygon_all_touched(arr: np.ndarray, rings, value, merge="replace"):
    """ALL_TOUCHED polygon burn: scanline fill + all-touched outline
    (the gdalrasterize.cpp bAllTouched composition)."""
    fill_polygon(arr, rings, value, merge)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 2 or not (r[0] == r[-1]).all():
            r = np.concatenate([r, r[:1]])
        draw_line_all_touched(arr, r, value, merge, intersect_only=True)


def clamp_byte(value: float) -> float:
    """Byte-band burn clamping (256 -> 255, -1 -> 0)."""
    return min(max(value, 0.0), 255.0)
