"""S2-scheme spherical cell ids — the second member of the engine's
"H3/S2 cell assignment" family (grid.py's z/x/y quadkey grid is the
first).

Structure follows the published S2 geometry scheme (s2geometry.io,
"S2 Cell Hierarchy"; the reference engine consumes such ids through
its tiling grids, osgeo_utils/gdal2tiles.py:337):

1. lon/lat -> unit-sphere XYZ (cos/sin — bit-identical numpy/DuckDB
   on this platform, see synth.py:168),
2. cube face 0..5 = largest-|component| axis (+x,+y,+z,-x,-y,-z) with
   a fixed >=-comparison tie-break, face-local (u, v) via the
   standard per-face division table,
3. the quadratic ST projection st = 0.5*sqrt(1+3u) (u>=0) /
   1-0.5*sqrt(1-3u) (u<0) that equalizes cell areas,
4. integer (i, j) leaf coordinates at ``level``,
5. a space-filling-curve position via the classic Hilbert xy2d
   recurrence (orientation convention: canonical Hilbert, not S2's
   per-face orientation tables — documented deviation; locality
   properties are identical),
6. cell_id = face * 4^level + curve_pos  (orderable, groupable,
   prefix-shiftable to parents like grid.pack_cell ids).

Everything is a fixed chain of CASE/floor/sqrt/div stages on named
columns — pure Catalyst codegen on the Spark side (no Python in the
path, so the assignment fuses into whatever scan precedes it), and
the same text as MATERIALIZED CTE stages on the DuckDB side, so the
oracle is bit-exact. The Hilbert bit loop uses only arithmetic
(floor-div/mod), no dialect-specific bitwise operators.
"""

from __future__ import annotations

import numpy as np

from . import synth

PI = float(np.pi)


def _deg2rad(col: str) -> str:
    return f"(({col}) * {synth.flit(PI / 180.0)})"


def s2_stages(level: int, keep: str, lon: str = "lon", lat: str = "lat"):
    """The staged select-lists shared by both dialects. ``keep`` is a
    comma-joined list of pass-through columns; each stage's SQL only
    references columns produced by the previous stage."""
    stages = []
    # 1) unit sphere
    stages.append(
        f"{keep}, cos({_deg2rad(lat)}) * cos({_deg2rad(lon)}) AS px, "
        f"cos({_deg2rad(lat)}) * sin({_deg2rad(lon)}) AS py, "
        f"sin({_deg2rad(lat)}) AS pz"
    )
    # 2) face + (u, v): face = largest-|axis| with (x, y, z) priority
    face = (
        "CASE WHEN abs(px) >= abs(py) AND abs(px) >= abs(pz) THEN "
        "(CASE WHEN px > 0.0E0 THEN 0 ELSE 3 END) "
        "WHEN abs(py) >= abs(pz) THEN (CASE WHEN py > 0.0E0 THEN 1 ELSE 4 END) "
        "ELSE (CASE WHEN pz > 0.0E0 THEN 2 ELSE 5 END) END"
    )
    stages.append(f"{keep}, px, py, pz, {face} AS face")
    u = (
        "CASE face WHEN 0 THEN py / px WHEN 1 THEN -px / py "
        "WHEN 2 THEN -px / pz WHEN 3 THEN pz / px "
        "WHEN 4 THEN pz / py ELSE -py / pz END"
    )
    v = (
        "CASE face WHEN 0 THEN pz / px WHEN 1 THEN pz / py "
        "WHEN 2 THEN -py / pz WHEN 3 THEN py / px "
        "WHEN 4 THEN -px / py ELSE -px / pz END"
    )
    stages.append(f"{keep}, face, {u} AS fu, {v} AS fv")
    # 3) quadratic ST
    st = (
        "CASE WHEN {w} >= 0.0E0 THEN 0.5E0 * sqrt(1.0E0 + 3.0E0 * {w}) "
        "ELSE 1.0E0 - 0.5E0 * sqrt(1.0E0 - 3.0E0 * {w}) END"
    )
    stages.append(
        f"{keep}, face, {st.format(w='fu')} AS fs, {st.format(w='fv')} AS ft"
    )
    # 4) integer leaf coords + Hilbert accumulator
    side = 1 << level
    ij = "greatest(0, least({m}, cast(floor({c} * {n}.0E0) as bigint)))"
    stages.append(
        f"{keep}, face, "
        f"{ij.format(c='fs', m=side - 1, n=side)} AS hx, "
        f"{ij.format(c='ft', m=side - 1, n=side)} AS hy, "
        f"cast(0 as bigint) AS hd"
    )
    # preserve the leaf coords: the Hilbert stages consume hx/hy bit
    # by bit (they end at 0), but ci/cj in the output must be the
    # original (i, j)
    stages.append(f"{keep}, face, hx, hy, hd, hx AS oi, hy AS oj")
    # 5) Hilbert xy2d, one stage per level (s = side/2 .. 1). Pure
    # arithmetic bit tests; the (3*rx) XOR ry quadrant index is the
    # explicit CASE over the four (rx, ry) combinations.
    for k in range(level):
        s = side >> (k + 1)
        rx = f"(cast(floor(hx / {s}) as bigint) % 2)"
        ry = f"(cast(floor(hy / {s}) as bigint) % 2)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
        )
        nx = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - (hy % {s}) "
            f"WHEN {ry} = 0 THEN hy % {s} ELSE hx % {s} END"
        )
        ny = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - (hx % {s}) "
            f"WHEN {ry} = 0 THEN hx % {s} ELSE hy % {s} END"
        )
        stages.append(
            f"{keep}, face, oi, oj, hd + {s} * {s} * {quad} AS hd, "
            f"{nx} AS hx, {ny} AS hy"
        )
    # 6) pack
    stages.append(
        f"{keep}, face, oi AS ci, oj AS cj, "
        f"face * {4 ** level} + hd AS s2_id"
    )
    return stages


def assign_s2(df, level: int, keep: str, lon: str = "lon", lat: str = "lat"):
    """Spark side: chain the stages as selectExpr calls (named-column
    staging keeps Catalyst analysis linear — see CLAUDE.md)."""
    for sel in s2_stages(level, keep, lon, lat):
        df = df.selectExpr(*[e.strip() for e in _split_select(sel)])
    return df


def _split_select(sel: str):
    """Split a select-list on top-level commas (CASE/func commas are
    inside parens ... except CASE WHEN, which has none — so split on
    ' AS ' boundaries instead: every item ends with an alias or is a
    bare column)."""
    items, depth, cur = [], 0, []
    for ch in sel:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    return items


def s2_cte_sql(level: int, keep: str, src: str, lon: str = "lon",
               lat: str = "lat", prefix: str = "s2s") -> tuple[str, str]:
    """DuckDB side: the same stages as MATERIALIZED CTEs (DuckDB 1.0
    inlines CTEs — chained stages must materialize, see CLAUDE.md).
    Returns (cte_sql_fragment, final_relation_name)."""
    stages = s2_stages(level, keep, lon, lat)
    ctes = []
    prev = src
    for n, sel in enumerate(stages):
        rel = f"{prefix}{n}"
        ctes.append(f"{rel} AS MATERIALIZED (SELECT {sel} FROM {prev})")
        prev = rel
    return ", ".join(ctes), prev


# ---------------------------------------------------------------------------
# pure-python reference for unit tests (independent of the SQL text)


def hilbert_xy2d(side: int, x: int, y: int) -> int:
    """Quadrant order (rx,ry) = (0,0),(0,1),(1,1),(1,0); sub-square
    transform: transpose / identity / identity / anti-transpose — the
    canonical Hilbert construction, applied to the LOWER bits at each
    level (mirrors the SQL stages exactly; validity — bijectivity +
    unit-step adjacency — is asserted in tests)."""
    d = 0
    s = side // 2
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((3 * rx) ^ ry)
        xl, yl = x % s, y % s
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - yl, s - 1 - xl
            else:
                x, y = yl, xl
        else:
            x, y = xl, yl
        s //= 2
    return d


def s2_id_py(lon: float, lat: float, level: int) -> tuple[int, int, int, int]:
    """(face, i, j, s2_id) — numpy/python replica of the SQL chain."""
    phi, theta = np.deg2rad(lat), np.deg2rad(lon)
    p = np.array(
        [np.cos(phi) * np.cos(theta), np.cos(phi) * np.sin(theta), np.sin(phi)]
    )
    ax = np.abs(p)
    if ax[0] >= ax[1] and ax[0] >= ax[2]:
        face = 0 if p[0] > 0 else 3
    elif ax[1] >= ax[2]:
        face = 1 if p[1] > 0 else 4
    else:
        face = 2 if p[2] > 0 else 5
    x, y, z = p
    u, v = {
        0: (y / x, z / x), 1: (-x / y, z / y), 2: (-x / z, -y / z),
        3: (z / x, y / x), 4: (z / y, -x / y), 5: (-y / z, -x / z),
    }[face]

    def st(w):
        return (
            0.5 * np.sqrt(1.0 + 3.0 * w)
            if w >= 0
            else 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * w)
        )

    side = 1 << level
    ci = int(max(0, min(side - 1, np.floor(st(u) * side))))
    cj = int(max(0, min(side - 1, np.floor(st(v) * side))))
    d = hilbert_xy2d(side, ci, cj)
    return face, ci, cj, face * 4**level + d
