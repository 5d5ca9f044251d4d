"""Polygon-polygon spatial predicates (OGRGeometry::Intersects /
Contains / Within / Touches / Disjoint, ogr/ogr_geometry.h:511-525).

Round 1 had only point-in-polygon; this adds the pairwise layer
predicates over simple polygons (any synth kind, holes included) with
a fresh numpy kernel — no GEOS in this container:

- proper edge-pair crossing  -> interiors meet on both boundaries
  -> 'intersects' (partial overlap),
- no crossing + a vertex of A strictly inside B (even-odd, holes
  flip parity) -> 'within' (and symmetrically 'contains'),
- boundary contact only (collinear overlap / endpoint-on-edge with
  no proper crossing and no interior containment) -> 'touches',
- otherwise 'disjoint'.

For SIMPLE polygons these four cases are exhaustive and exact; the
kernel is deterministic IEEE arithmetic, so the driver oracle can
classify the box-kind subset in closed form while the Spark side runs
the general machinery.

Spark shape: same candidate generation as overlay (envelope covering
cells -> equi-join, clip side broadcast), envelope prefilter keeps
touching pairs (>= compare), one Arrow-batched refine classifying
each pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import geom, wkb
from .cells import cell_id_sql
from .overlay import _cells_of, _envelope_cols, _open_ring


# ---------------------------------------------------------------------------
# numpy predicate kernel


def _edges(rings):
    """All boundary edges of a ring set as (n, 2, 2)."""
    segs = []
    for r in rings:
        a = r
        b = np.roll(r, -1, axis=0)
        segs.append(np.stack([a, b], axis=1))
    return np.concatenate(segs, axis=0)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _segments_cross(ea, eb):
    """Pairwise segment intersection classification between two edge
    sets. Returns (any_proper, any_touch): proper = interiors of the
    segments cross; touch = contact at an endpoint / collinear
    overlap only."""
    a0 = ea[:, None, 0]
    a1 = ea[:, None, 1]
    b0 = eb[None, :, 0]
    b1 = eb[None, :, 1]
    d1 = _cross(a0, a1, b0)
    d2 = _cross(a0, a1, b1)
    d3 = _cross(b0, b1, a0)
    d4 = _cross(b0, b1, a1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (
        (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    )
    if proper.any():
        return True, True

    def on_seg(p, q, r):
        """r collinear with p-q and within its bbox."""
        return (
            (np.minimum(p[..., 0], q[..., 0]) <= r[..., 0])
            & (r[..., 0] <= np.maximum(p[..., 0], q[..., 0]))
            & (np.minimum(p[..., 1], q[..., 1]) <= r[..., 1])
            & (r[..., 1] <= np.maximum(p[..., 1], q[..., 1]))
        )

    touch = (
        ((d1 == 0) & on_seg(a0, a1, b0))
        | ((d2 == 0) & on_seg(a0, a1, b1))
        | ((d3 == 0) & on_seg(b0, b1, a0))
        | ((d4 == 0) & on_seg(b0, b1, a1))
    )
    return False, bool(touch.any())


def classify(rings_a, rings_b) -> str:
    """'intersects' | 'within' | 'contains' | 'touches' | 'disjoint'
    for two simple polygons (ring lists, holes after the shell).

    Equal geometries return 'equals' (OGRGeometry::Equals; note GEOS
    Within(A,A) and Contains(A,A) are also true per DE-9IM — callers
    treating equals as within/contains should accept both labels).
    Convex hole-free pairs take an exact Sutherland-Hodgman area
    branch (robust even for collinear shared-edge overlaps). The
    general branch classifies by the Greiner-Hormann intersection
    AREA against the operand areas (tolerance-compared — boundary
    degeneracies resolve through boolop's deterministic-perturbation
    retry), which labels even the collinear-partial-overlap case
    correctly; only if the region engine still degenerates does it
    fall back to proper-crossing + vertex-probe classification (the
    pre-r3 behavior, which mislabels that measure-zero case)."""
    from .overlay import clip_polygon_convex, is_convex, ring_area

    if (
        len(rings_a) == 1
        and len(rings_b) == 1
        and is_convex(rings_a[0])
        and is_convex(rings_b[0])
    ):
        _, inter = clip_polygon_convex(rings_a, rings_b[0])
        if inter > 0.0:
            area_a = abs(ring_area(rings_a[0]))
            area_b = abs(ring_area(rings_b[0]))
            if inter == area_a and inter == area_b:
                return "equals"
            if inter == area_a:
                return "within"
            if inter == area_b:
                return "contains"
            return "intersects"
        ea, eb = _edges(rings_a), _edges(rings_b)
        _, touch = _segments_cross(ea, eb)
        return "touches" if touch else "disjoint"
    if len(rings_a) == len(rings_b):
        from .. import boolop

        scale = max(
            1.0, max(abs(float(v)) for r in rings_a for v in r.ravel())
        )
        used = set()
        for ra in rings_a:
            hit = None
            for kb, rb in enumerate(rings_b):
                if kb not in used and boolop._rings_equal(
                    ra, rb, 1e-12 * scale
                ):
                    hit = kb
                    break
            if hit is None:
                break
            used.add(hit)
        else:
            return "equals"
    from .. import boolop

    try:
        ra = boolop.region_of_rings(rings_a)
        rb = boolop.region_of_rings(rings_b)
        area_a = boolop.region_area(ra)
        area_b = boolop.region_area(rb)
        inter = boolop.region_area(boolop.boolean_regions(ra, rb, "inter"))
        tol = 1e-9 * max(area_a, area_b, 1e-300)
        if inter <= tol:
            _, touch = _segments_cross(_edges(rings_a), _edges(rings_b))
            return "touches" if touch else "disjoint"
        if abs(inter - area_a) <= tol and abs(inter - area_b) <= tol:
            return "equals"
        if abs(inter - area_a) <= tol:
            return "within"
        if abs(inter - area_b) <= tol:
            return "contains"
        return "intersects"
    except boolop.Degeneracy:
        pass
    ea, eb = _edges(rings_a), _edges(rings_b)
    proper, touch = _segments_cross(ea, eb)
    if proper:
        return "intersects"
    # no boundary crossing: containment decided by one vertex probe
    # (even-odd ray cast honors holes)
    pa = rings_a[0][0]
    pb = rings_b[0][0]
    a_in_b = bool(
        geom.points_in_rings(
            np.array([pa[0]]), np.array([pa[1]]), rings_b
        )[0]
    )
    b_in_a = bool(
        geom.points_in_rings(
            np.array([pb[0]]), np.array([pb[1]]), rings_a
        )[0]
    )
    if a_in_b:
        return "within"
    if b_in_a:
        return "contains"
    if touch:
        return "touches"
    return "disjoint"


# ---------------------------------------------------------------------------
# DataFrame operator


def spatial_predicates(
    layer_a: DataFrame,
    layer_b: DataFrame,
    zoom: int = 6,
    broadcast_b: bool = True,
    include_disjoint: bool = False,
) -> DataFrame:
    """Pairwise predicate classification between two polygon layers
    ((id_a, wkb_a) x (id_b, wkb_b)). Emits (id_a, id_b, predicate)
    for non-disjoint candidate pairs (candidates = envelope-cell
    co-occurrence, so far-apart disjoint pairs never materialize)."""
    a_cells = _cells_of(layer_a, "id_a", "wkb_a", zoom)
    b_cells = _cells_of(layer_b, "id_b", "wkb_b", zoom)
    if broadcast_b:
        b_cells = F.broadcast(b_cells)
    pairs = a_cells.join(b_cells, "cell_id").select("id_a", "id_b").distinct()
    a_env = _envelope_cols(layer_a, "id_a", "wkb_a", "a")
    b_env = _envelope_cols(layer_b, "id_b", "wkb_b", "b")
    if broadcast_b:
        b_env = F.broadcast(b_env)
    cand = (
        pairs.join(a_env, "id_a")
        .join(b_env, "id_b")
        # inclusive compare: touching envelopes stay in
        .where(
            (F.col("ax0") <= F.col("bx1"))
            & (F.col("bx0") <= F.col("ax1"))
            & (F.col("ay0") <= F.col("by1"))
            & (F.col("by0") <= F.col("ay1"))
        )
        .select("id_a", "wkb_a", "id_b", "wkb_b")
    )

    def refine(batches):
        for pdf in batches:
            rows = []
            for id_a, wa, id_b, wc in zip(
                pdf["id_a"], pdf["wkb_a"], pdf["id_b"], pdf["wkb_b"]
            ):
                ra = [_open_ring(r) for r in wkb.polygon_rings(bytes(wa))]
                rb = [_open_ring(r) for r in wkb.polygon_rings(bytes(wc))]
                pred = classify(ra, rb)
                if pred == "disjoint" and not include_disjoint:
                    continue
                rows.append((id_a, id_b, pred))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "predicate"])

    return cand.mapInPandas(
        refine, schema="id_a string, id_b string, predicate string"
    )


# ---------------------------------------------------------------------------
# driver gate: box-kind subset, closed-form oracle


def predicates_boxes_query(polys: DataFrame) -> DataFrame:
    """Predicates between all box-kind polygons and the hot-box
    cluster (the dense-overlap subset: partial overlaps AND
    containments occur)."""
    a = polys.where(F.col("kind").isin("box", "hot_box")).select(
        F.col("poly_id").alias("id_a"), F.col("geom_wkb").alias("wkb_a")
    )
    b = polys.where(F.col("kind") == "hot_box").select(
        F.col("poly_id").alias("id_b"), F.col("geom_wkb").alias("wkb_b")
    )
    out = spatial_predicates(a, b)
    return out.where(F.col("id_a") != F.col("id_b"))


def oracle_predicates_boxes(m: int) -> str:
    """Closed-form box classification: strict-interval containment,
    open-interval overlap, boundary-contact touch."""
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    ids = "concat('poly', lpad(cast({j} as varchar), 4, '0'))"
    return f"""
WITH p AS ({p}),
a AS (SELECT j, cx - hw AS x0, cx + hw AS x1, cy - hh AS y0, cy + hh AS y1
      FROM p WHERE kind IN ('box', 'hot_box')),
b AS (SELECT j, cx - hw AS x0, cx + hw AS x1, cy - hh AS y0, cy + hh AS y1
      FROM p WHERE kind = 'hot_box'),
pr AS (SELECT a.j AS ja, b.j AS jb,
       a.x0 AS ax0, a.x1 AS ax1, a.y0 AS ay0, a.y1 AS ay1,
       b.x0 AS bx0, b.x1 AS bx1, b.y0 AS by0, b.y1 AS by1
       FROM a JOIN b ON a.j <> b.j
       AND a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1)
SELECT {ids.format(j='ja')} AS id_a, {ids.format(j='jb')} AS id_b,
  CASE
    WHEN ax0 > bx0 AND ax1 < bx1 AND ay0 > by0 AND ay1 < by1 THEN 'within'
    WHEN bx0 > ax0 AND bx1 < ax1 AND by0 > ay0 AND by1 < ay1 THEN 'contains'
    WHEN least(ax1, bx1) > greatest(ax0, bx0)
     AND least(ay1, by1) > greatest(ay0, by0) THEN 'intersects'
    ELSE 'touches'
  END AS predicate
FROM pr
"""


# ---------------------------------------------------------------------------
# OGRGeometry::Distance (ogr_geometry.h:525, GEOS-delegated in the
# reference): minimum distance between two geometries. Gated on the
# DISJOINT-envelope candidate pairs (overlapping pairs have distance
# 0 and are the predicate query's domain). Numeric contract: both
# engines evaluate the SAME point-segment formula text
#   t  = clamp(((p-a).(b-a)) / |b-a|^2, 0, 1)
#   d2 = |p - (a + t (b-a))|^2
# (only +,-,*,/ and clamp — correctly-rounded IEEE, so d2 is
# bit-identical and the 1e6 floor needs no nudge).

DIST_MAX = 2.0  # candidate cap, degrees


def _env_cell_explode(
    env_df: DataFrame, prefix: str, pad: float, zoom: int
) -> DataFrame:
    """Explode an envelope table to the geodetic ``zoom`` cells its
    (pad-expanded) envelope covers — pure Catalyst (corner tile
    indices + sequence explode), the same covering-cells shape as
    spatial_join.polygon_cells."""
    from .cells import geodetic_tile_sql
    from ..synth import flit

    p = flit(pad)
    tx0 = geodetic_tile_sql(f"({prefix}x0 - {p})", "0", zoom, "x")
    tx1 = geodetic_tile_sql(f"({prefix}x1 + {p})", "0", zoom, "x")
    ty0 = geodetic_tile_sql("0", f"({prefix}y0 - {p})", zoom, "y")
    ty1 = geodetic_tile_sql("0", f"({prefix}y1 + {p})", zoom, "y")
    return (
        env_df.withColumn(
            "ctx", F.expr(f"explode(sequence({tx0}, {tx1}))")
        )
        .withColumn("cty", F.expr(f"explode(sequence({ty0}, {ty1}))"))
        .withColumn("cell_id", F.expr(cell_id_sql("ctx", "cty", zoom)))
        .drop("ctx", "cty")
    )


def _dist_cell_zoom(max_dist: float) -> int:
    """Coarsest zoom whose geodetic cell is at least ``max_dist`` wide
    (so a pad-expanded envelope covers O(1) cells)."""
    z = 0
    while 180.0 / (2 ** (z + 1)) >= max_dist and z < 12:
        z += 1
    return z


def min_distance_pairs(
    layer_a: DataFrame, layer_b: DataFrame, max_dist: float = DIST_MAX
) -> DataFrame:
    """(id_a, id_b, d2_key): floor(1e6 * min boundary distance^2) for
    envelope-disjoint pairs within ``max_dist``.

    Candidate generation is a CELL EQUI-JOIN (the r3 verdict flagged
    the previous crossJoin(broadcast) BNLJ as the one O(|A|x|B|) path
    left in the engine): A envelopes are padded by ``max_dist`` and
    both sides explode to covering geodetic cells at a zoom whose
    cell is >= max_dist wide, so each pair meets in at least one
    common cell. A pair meeting in SEVERAL cells is kept only in its
    canonical cell — the one containing the lower-left corner of the
    padded-envelope overlap — a JVM filter that replaces a
    dropDuplicates shuffle. The exact vertex x edge sweep then runs
    once per candidate pair."""
    from .cells import geodetic_tile_sql

    zoom = _dist_cell_zoom(max_dist)
    a_env = _envelope_cols(layer_a, "id_a", "wkb_a", "a")
    b_env = _envelope_cols(layer_b, "id_b", "wkb_b", "b")
    a_cells = _env_cell_explode(a_env, "a", max_dist, zoom)
    b_cells = F.broadcast(_env_cell_explode(b_env, "b", 0.0, zoom))
    d = max_dist
    anchor_lon = f"greatest(ax0 - {d}, bx0)"
    anchor_lat = f"greatest(ay0 - {d}, by0)"
    canon = cell_id_sql(
        geodetic_tile_sql(anchor_lon, "0", zoom, "x"),
        geodetic_tile_sql("0", anchor_lat, zoom, "y"),
        zoom,
    )
    cand = a_cells.join(b_cells, "cell_id").where(
        # envelope-disjoint ...
        (
            (F.col("ax1") < F.col("bx0"))
            | (F.col("bx1") < F.col("ax0"))
            | (F.col("ay1") < F.col("by0"))
            | (F.col("by1") < F.col("ay0"))
        )
        # ... but within the candidate cap
        & (F.col("ax0") - d <= F.col("bx1"))
        & (F.col("bx0") - d <= F.col("ax1"))
        & (F.col("ay0") - d <= F.col("by1"))
        & (F.col("by0") - d <= F.col("ay1"))
        # ... reported once, in the canonical cell of the pair
        & (F.col("cell_id") == F.expr(canon))
    ).select("id_a", "wkb_a", "id_b", "wkb_b")

    def seg_d2(P: np.ndarray, A: np.ndarray, B: np.ndarray) -> float:
        """min over points P x segments (A[i], B[i]) — formula text
        mirrored by the SQL oracle."""
        px, py = P[:, None, 0], P[:, None, 1]
        ax, ay = A[None, :, 0], A[None, :, 1]
        bx, by = B[None, :, 0], B[None, :, 1]
        dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        t = np.clip(dot / len2, 0.0, 1.0)
        qx = ax + t * (bx - ax)
        qy = ay + t * (by - ay)
        return float(
            ((px - qx) * (px - qx) + (py - qy) * (py - qy)).min()
        )

    def refine(batches):
        for pdf in batches:
            rows = []
            for id_a, wa, id_b, wc in zip(
                pdf["id_a"], pdf["wkb_a"], pdf["id_b"], pdf["wkb_b"]
            ):
                ra = [_open_ring(r) for r in wkb.polygon_rings(bytes(wa))]
                rb = [_open_ring(r) for r in wkb.polygon_rings(bytes(wc))]
                pa = np.concatenate(ra)
                pb = np.concatenate(rb)
                ea0 = np.concatenate([r for r in ra])
                ea1 = np.concatenate([np.roll(r, -1, axis=0) for r in ra])
                eb0 = np.concatenate([r for r in rb])
                eb1 = np.concatenate([np.roll(r, -1, axis=0) for r in rb])
                d2 = min(seg_d2(pa, eb0, eb1), seg_d2(pb, ea0, ea1))
                rows.append((id_a, id_b, int(np.floor(d2 * 1e6))))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "d2_key"])

    return cand.mapInPandas(
        refine, schema="id_a string, id_b string, d2_key bigint"
    )


def distance_boxes_query(polys: DataFrame) -> DataFrame:
    """Distances between the box/triangle layer and the hot-box
    cluster (disjoint near-pairs)."""
    a = polys.where(F.col("kind").isin("box", "hot_box", "triangle")).select(
        F.col("poly_id").alias("id_a"), F.col("geom_wkb").alias("wkb_a")
    )
    b = polys.where(F.col("kind") == "hot_box").select(
        F.col("poly_id").alias("id_b"), F.col("geom_wkb").alias("wkb_b")
    )
    return min_distance_pairs(a, b).where(F.col("id_a") != F.col("id_b"))


def oracle_distance_boxes(m: int, max_dist: float = DIST_MAX) -> str:
    """Closed-form vertex/edge enumeration for box/triangle kinds +
    the identical point-segment formula text."""
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    ids = "concat('poly', lpad(cast({j} as varchar), 4, '0'))"
    d = synth.flit(max_dist)

    # vertex coordinate CASEs in kind_geom ring order: box
    # (cx-hw,cy-hh),(cx+hw,cy-hh),(cx+hw,cy+hh),(cx-hw,cy+hh);
    # triangle (cx-hw,cy-hh),(cx+hw,cy-hh),(cx,cy+hh)
    def vx(pre, v):
        return (
            f"(CASE WHEN {pre}kind = 'triangle' AND ({v}) = 2 THEN {pre}cx "
            f"WHEN ({v}) IN (0, 3) THEN {pre}cx - {pre}hw "
            f"ELSE {pre}cx + {pre}hw END)"
        )

    def vy(pre, v):
        return (
            f"(CASE WHEN ({v}) IN (0, 1) THEN {pre}cy - {pre}hh "
            f"ELSE {pre}cy + {pre}hh END)"
        )

    def nv(pre):
        return f"(CASE WHEN {pre}kind = 'triangle' THEN 3 ELSE 4 END)"

    def side(pt_pre, ed_pre):
        e2 = f"((ei + 1) % {nv(ed_pre)})"
        return (
            f"SELECT ja, jb, {vx(pt_pre, 'vi')} AS px, {vy(pt_pre, 'vi')} AS py, "
            f"{vx(ed_pre, 'ei')} AS ax, {vy(ed_pre, 'ei')} AS ay, "
            f"{vx(ed_pre, e2)} AS bx, {vy(ed_pre, e2)} AS by "
            f"FROM pr, range(0, 4) t(vi), range(0, 4) s(ei) "
            f"WHERE vi < {nv(pt_pre)} AND ei < {nv(ed_pre)}"
        )

    t = (
        "least(greatest(((px - ax) * (bx - ax) + (py - ay) * (by - ay)) "
        "/ ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)), 0.0E0), 1.0E0)"
    )
    d2 = (
        f"((px - (ax + {t} * (bx - ax))) * (px - (ax + {t} * (bx - ax))) "
        f"+ (py - (ay + {t} * (by - ay))) * (py - (ay + {t} * (by - ay))))"
    )
    return f"""
WITH p AS ({p}),
a AS (SELECT j, kind, cx, cy, hw, hh, cx - hw AS x0, cx + hw AS x1,
      cy - hh AS y0, cy + hh AS y1 FROM p
      WHERE kind IN ('box', 'hot_box', 'triangle')),
b AS (SELECT j, kind, cx, cy, hw, hh, cx - hw AS x0, cx + hw AS x1,
      cy - hh AS y0, cy + hh AS y1 FROM p WHERE kind = 'hot_box'),
pr AS MATERIALIZED (SELECT a.j AS ja, b.j AS jb,
       a.kind AS akind, a.cx AS acx, a.cy AS acy, a.hw AS ahw, a.hh AS ahh,
       b.kind AS bkind, b.cx AS bcx, b.cy AS bcy, b.hw AS bhw, b.hh AS bhh
       FROM a JOIN b ON a.j <> b.j
       AND (a.x1 < b.x0 OR b.x1 < a.x0 OR a.y1 < b.y0 OR b.y1 < a.y0)
       AND a.x0 - {d} <= b.x1 AND b.x0 - {d} <= a.x1
       AND a.y0 - {d} <= b.y1 AND b.y0 - {d} <= a.y1),
allp AS MATERIALIZED (
  {side('a', 'b')}
  UNION ALL
  {side('b', 'a')}
),
md AS (SELECT ja, jb, min({d2}) AS d2 FROM allp GROUP BY 1, 2)
SELECT {ids.format(j='ja')} AS id_a, {ids.format(j='jb')} AS id_b,
       cast(floor(d2 * 1000000.0E0) as bigint) AS d2_key
FROM md
"""
