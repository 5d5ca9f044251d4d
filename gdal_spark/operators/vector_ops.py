"""ogr2ogr-style vector geometry operators.

The -simplify / -segmentize / field-computation surface of
apps/ogr2ogr_lib.cpp plus OGR's geometry special fields
(OGR_GEOM_AREA, ogr/ogr_p.h:142; shoelace area
OGRLinearRing::get_Area):

- ``geom_fields``   — area (shoelace, holes subtract), perimeter,
  vertex count, envelope centroid per polygon; vectorized numpy over
  WKB inside mapInPandas. Closed-form SQL oracle for the box/
  triangle subset.
- ``segmentize``    — insert vertices so no segment exceeds
  max_length (OGRGeometry::segmentize semantics: each edge splits
  into ceil(len/max_length) equal parts). Oracle: per-edge counts in
  SQL for the box/triangle subset.
- ``simplify_dp``   — Douglas-Peucker with tolerance (the algorithm
  behind OGRGeometry::Simplify); order-dependent recursion ->
  pytest-verified invariants, rows-only driver check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import synth, wkb


def _ring_array(ring) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    return r


def shoelace_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    )


def perimeter(r: np.ndarray) -> float:
    d = np.roll(r, -1, axis=0) - r
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def geom_fields(polys: DataFrame) -> DataFrame:
    """(poly_id, area_key, perim_key, n_vertices, cx_key, cy_key)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                rings = [_ring_array(r) for r in wkb.polygon_rings(bytes(g))]
                area = shoelace_area(rings[0]) - sum(
                    shoelace_area(r) for r in rings[1:]
                )
                per = perimeter(rings[0])
                nv = sum(len(r) for r in rings)
                minx, miny, maxx, maxy = wkb.envelope(bytes(g))
                rows.append(
                    (
                        poly_id,
                        # 1e3 quantum + 1e-6 nudge: shoelace/sqrt
                        # op-order noise (~1e-10) can land exactly-
                        # representable values a hair below the grid
                        int(np.floor(area * 1e3 + 1e-6)),
                        int(np.floor(per * 1e3 + 1e-6)),
                        nv,
                        int(np.floor((minx + maxx) / 2.0 * 1e6)),
                        int(np.floor((miny + maxy) / 2.0 * 1e6)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["poly_id", "area_key", "perim_key", "n_vertices",
                         "cx_key", "cy_key"],
            )

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run,
        schema="poly_id string, area_key bigint, perim_key bigint, "
        "n_vertices bigint, cx_key bigint, cy_key bigint",
    )


def oracle_geom_fields(m: int) -> str:
    """Closed form for boxes (area 4*hw*hh, perimeter 4hw+4hh, 4
    vertices) and triangles (area 2*hw*hh, perimeter base+2 slants,
    3 vertices); centroid = envelope center = (cx, cy)."""
    slant = "sqrt(hw * hw + 4.0E0 * hh * hh)"
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"cast(floor(CASE WHEN kind = 'triangle' "
        f"THEN 0.5E0 * abs((2.0E0 * hw) * (2.0E0 * hh)) "
        f"ELSE 4.0E0 * hw * hh END * 1000.0E0 + 0.000001E0) as bigint) AS area_key, "
        f"cast(floor(CASE WHEN kind = 'triangle' "
        f"THEN 2.0E0 * hw + 2.0E0 * {slant} "
        f"ELSE 4.0E0 * hw + 4.0E0 * hh END * 1000.0E0 + 0.000001E0) as bigint) AS perim_key, "
        f"CASE WHEN kind = 'triangle' THEN 3 ELSE 4 END AS n_vertices, "
        f"cast(floor((((cx - hw) + (cx + hw)) / 2.0E0) * 1000000.0E0) as bigint) "
        f"AS cx_key, "
        f"cast(floor((((cy - hh) + (cy + hh)) / 2.0E0) * 1000000.0E0) as bigint) "
        f"AS cy_key "
        f"FROM p WHERE kind IN ('box', 'hot_box', 'triangle')"
    )


def segmentize_ring(r: np.ndarray, max_len: float) -> np.ndarray:
    """Split every edge into ceil(len/max_len) equal parts."""
    out = []
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        seg = np.sqrt(((b - a) ** 2).sum())
        parts = max(1, int(np.ceil(seg / max_len)))
        for t in range(parts):
            out.append(a + (b - a) * (t / parts))
    return np.asarray(out)


def segmentize_counts(polys: DataFrame, max_len: float) -> DataFrame:
    """(poly_id, n_before, n_after) vertex counts (outer ring)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                r = _ring_array(wkb.polygon_rings(bytes(g))[0])
                rows.append(
                    (poly_id, len(r), len(segmentize_ring(r, max_len)))
                )
            yield pd.DataFrame(rows, columns=["poly_id", "n_before", "n_after"])

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run, schema="poly_id string, n_before bigint, n_after bigint"
    )


def oracle_segmentize(m: int, max_len: float) -> str:
    ml = synth.flit(max_len)
    slant = f"ceil(sqrt(hw * hw + 4.0E0 * hh * hh) / {ml})"
    box_edges = (
        f"(2 * greatest(1, cast(ceil(2.0E0 * hw / {ml}) as bigint)) "
        f"+ 2 * greatest(1, cast(ceil(2.0E0 * hh / {ml}) as bigint)))"
    )
    tri_edges = (
        f"(greatest(1, cast(ceil(2.0E0 * hw / {ml}) as bigint)) "
        f"+ 2 * greatest(1, cast({slant} as bigint)))"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"CASE WHEN kind = 'triangle' THEN 3 ELSE 4 END AS n_before, "
        f"CASE WHEN kind = 'triangle' THEN {tri_edges} ELSE {box_edges} END "
        f"AS n_after "
        f"FROM p WHERE kind IN ('box', 'hot_box', 'triangle')"
    )


def simplify_dp(r: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an open polyline (first/last kept)."""
    if len(r) < 3:
        return r
    a, b = r[0], r[-1]
    ab = b - a
    ab2 = float((ab * ab).sum())
    if ab2 == 0:
        d = np.sqrt(((r - a) ** 2).sum(axis=1))
    else:
        t = ((r - a) @ ab) / ab2
        proj = a + np.clip(t, 0, 1)[:, None] * ab
        d = np.sqrt(((r - proj) ** 2).sum(axis=1))
    i = int(np.argmax(d))
    if d[i] <= tol:
        return np.array([a, b])
    left = simplify_dp(r[: i + 1], tol)
    right = simplify_dp(r[i:], tol)
    return np.concatenate([left[:-1], right])


def simplify_roundtrip_counts(
    polys: DataFrame, max_len: float, tol: float
) -> DataFrame:
    """segmentize(max_len) -> Douglas-Peucker(tol) on the outer ring:
    (poly_id, n_before = segmentized count, n_after). On the rect-
    cornered synth kinds (box / triangle / concave / holed; every
    corner deviates >> tol while segmentize-added vertices are exactly
    collinear) DP provably removes exactly the added vertices, so the
    driver gets a closed-form VALUE oracle for the full recursion —
    round 2 left simplify rows-only."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                r = _ring_array(wkb.polygon_rings(bytes(g))[0])
                seg = segmentize_ring(r, max_len)
                closed = np.concatenate([seg, seg[:1]])
                simp = simplify_dp(closed, tol)
                rows.append((poly_id, len(seg), len(simp) - 1))
            yield pd.DataFrame(rows, columns=["poly_id", "n_before", "n_after"])

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run, schema="poly_id string, n_before bigint, n_after bigint"
    )


def oracle_simplify_roundtrip(m: int, max_len: float) -> str:
    """Per-edge segmentize counts (outer ring) + the original vertex
    count DP returns to. Edge lengths per synth.kind_geom."""
    ml = synth.flit(max_len)

    def c(expr: str) -> str:
        return f"greatest(1, cast(ceil(({expr}) / {ml}) as bigint))"

    box = f"(2 * {c('2.0E0 * hw')} + 2 * {c('2.0E0 * hh')})"
    tri = (
        f"({c('2.0E0 * hw')} "
        f"+ 2 * {c('sqrt(hw * hw + 4.0E0 * hh * hh)')})"
    )
    concave = (
        f"(2 * {c('2.0E0 * hw')} + {c('2.0E0 * hh')} "
        f"+ 2 * {c('0.4E0 * hh')} + 2 * {c('1.4E0 * hw')} "
        f"+ {c('1.2E0 * hh')})"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"CASE kind WHEN 'triangle' THEN {tri} WHEN 'concave' THEN {concave} "
        f"ELSE {box} END AS n_before, "
        f"cast(CASE kind WHEN 'triangle' THEN 3 WHEN 'concave' THEN 8 "
        f"ELSE 4 END as bigint) AS n_after "
        f"FROM p WHERE kind IN ('box', 'triangle', 'concave', 'holed')"
    )


def simplify_counts(polys: DataFrame, tol: float) -> DataFrame:
    """(poly_id, n_before, n_after) for the outer ring (closed ring
    split at vertex 0). Rows-only driver check; pytest pins the DP
    invariants."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                r = _ring_array(wkb.polygon_rings(bytes(g))[0])
                closed = np.concatenate([r, r[:1]])
                simp = simplify_dp(closed, tol)
                rows.append((poly_id, len(r), len(simp) - 1))
            yield pd.DataFrame(rows, columns=["poly_id", "n_before", "n_after"])

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run, schema="poly_id string, n_before bigint, n_after bigint"
    )


# ---------------------------------------------------------------------------
# ogr2ogr -t_srs: reproject every vertex of a vector layer
# (OGRGeometry::transform over rings, ogr/ogrct.cpp Transform loop;
# apps/ogr2ogr_lib.cpp -t_srs). Target EPSG:3857 (spherical
# mercator, grid.lonlat_to_meters). Numeric contract: each projected
# coordinate is floored to integer CENTIMETERS per vertex BEFORE
# summation (order-free; raw float sums are engine-order-dependent),
# with a 5e-4 nudge absorbing the ~1 ulp ln/tan drift between numpy
# and DuckDB.

MERC_CM_NUDGE = 5.0e-4


def reproject_3857_fields(polys: DataFrame) -> DataFrame:
    """(poly_id, n_vertices, sx_cm, sy_cm): vertex count and the
    cm-floored coordinate sums of the layer reprojected to 3857 —
    any vertex transform divergence shifts the sums."""
    from .. import grid

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                sx = sy = 0
                nv = 0
                for ring in wkb.polygon_rings(bytes(g)):
                    r = _ring_array(ring)
                    mx, my = grid.lonlat_to_meters(r[:, 0], r[:, 1])
                    sx += int(np.floor(mx * 100.0 + MERC_CM_NUDGE).sum())
                    sy += int(np.floor(my * 100.0 + MERC_CM_NUDGE).sum())
                    nv += len(r)
                rows.append((poly_id, nv, sx, sy))
            yield pd.DataFrame(
                rows, columns=["poly_id", "n_vertices", "sx_cm", "sy_cm"]
            )

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run,
        schema="poly_id string, n_vertices bigint, sx_cm bigint, sy_cm bigint",
    )


def oracle_reproject_3857(m: int) -> str:
    """Closed-form vertex enumeration for box/hot_box/triangle kinds
    in kind_geom ring order, mirrored through the same mercator ops
    (mx = lon*OS/180; my = ln(tan((90+lat)*pi/360))/(pi/180)*OS/180)."""
    os180 = synth.flit(6378137.0 * np.pi)  # ORIGIN_SHIFT (then /180)
    vx = (
        "(CASE WHEN kind = 'triangle' AND vi = 2 THEN cx "
        "WHEN vi IN (0, 3) THEN cx - hw ELSE cx + hw END)"
    )
    vy = (
        "(CASE WHEN vi IN (0, 1) THEN cy - hh ELSE cy + hh END)"
    )
    mx = f"(({vx}) * {os180} / 180.0E0)"
    my = (
        f"((ln(tan((90.0E0 + ({vy})) * pi() / 360.0E0)) / (pi() / 180.0E0)) "
        f"* {os180} / 180.0E0)"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}), "
        f"v AS (SELECT j, kind, cx, cy, hw, hh, vi FROM p, range(0, 4) t(vi) "
        f"WHERE kind IN ('box', 'hot_box', 'triangle') "
        f"AND (kind <> 'triangle' OR vi < 3)) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"cast(count(*) as bigint) AS n_vertices, "
        f"cast(sum(cast(floor({mx} * 100.0E0 + {synth.flit(MERC_CM_NUDGE)}) "
        f"as bigint)) as bigint) AS sx_cm, "
        f"cast(sum(cast(floor({my} * 100.0E0 + {synth.flit(MERC_CM_NUDGE)}) "
        f"as bigint)) as bigint) AS sy_cm "
        f"FROM v GROUP BY 1"
    )


def layer_extent(polys: DataFrame) -> DataFrame:
    """OGRLayer::GetExtent + GetFeatureCount (the ogrinfo -so layer
    summary; generic implementation scans every geometry envelope,
    ogr/ogrsf_frmts/generic/ogrlayer.cpp GetExtent): one row with the
    feature count and the 1e6-scaled layer envelope. Partial+final
    min/max — the same one-pass shape GDAL's loop takes, distributed."""
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                minx, miny, maxx, maxy = wkb.envelope(bytes(g))
                rows.append((poly_id, minx, miny, maxx, maxy))
            yield pd.DataFrame(
                rows, columns=["poly_id", "minx", "miny", "maxx", "maxy"]
            )

    env = polys.select("poly_id", "geom_wkb").mapInPandas(
        run,
        schema="poly_id string, minx double, miny double, "
        "maxx double, maxy double",
    )
    k = "1000000.0E0"
    return env.agg(
        F.count("*").alias("n_features"),
        F.expr(f"cast(floor(min(minx) * {k}) as bigint)").alias("minx_key"),
        F.expr(f"cast(floor(min(miny) * {k}) as bigint)").alias("miny_key"),
        F.expr(f"cast(floor(max(maxx) * {k}) as bigint)").alias("maxx_key"),
        F.expr(f"cast(floor(max(maxy) * {k}) as bigint)").alias("maxy_key"),
    )


def oracle_layer_extent(m: int) -> str:
    """Closed form: every oracle-subset envelope is (cx +- hw,
    cy +- hh) — identical doubles on both sides, so the floors are
    bit-exact (no nudge needed, same discipline as geom_fields
    cx_key)."""
    k = "1000000.0E0"
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT cast(count(*) as bigint) AS n_features, "
        f"cast(floor(min(cx - hw) * {k}) as bigint) AS minx_key, "
        f"cast(floor(min(cy - hh) * {k}) as bigint) AS miny_key, "
        f"cast(floor(max(cx + hw) * {k}) as bigint) AS maxx_key, "
        f"cast(floor(max(cy + hh) * {k}) as bigint) AS maxy_key "
        f"FROM p WHERE kind IN ('box', 'hot_box', 'triangle')"
    )


# ---------------------------------------------------------------------------
# ogr2ogr -wrapdateline (apps/ogr2ogr_lib.cpp): split geometries that
# cross the antimeridian into their western/eastern parts, the eastern
# part shifted into [-180, 180). Without it, a lon=+/-180-crossing
# polygon silently spans the whole world in cell covers
# (spatial_join.polygon_cells) — the r3 verdict's dateline hazard.


def _clip_ring_lon(r: np.ndarray, lon: float, keep_left: bool) -> np.ndarray:
    """Sutherland-Hodgman halfplane clip of one ring at ``lon``."""
    out = []
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        ain = a[0] <= lon if keep_left else a[0] >= lon
        bin_ = b[0] <= lon if keep_left else b[0] >= lon
        if ain:
            out.append(a)
        if ain != bin_:
            t = (lon - a[0]) / (b[0] - a[0])
            out.append(np.array([lon, a[1] + t * (b[1] - a[1])]))
    return np.array(out) if out else np.zeros((0, 2))


def wrapdateline_parts(rings, split_lon: float = 180.0):
    """Split a ring set (lons possibly beyond +180) at the
    antimeridian. Returns [(part, rings)] with part 'w' (unshifted)
    / 'e' (shifted by -360); uncrossed geometry comes back as one
    'w' part (normalized into range if it sat wholly beyond +180).
    Multi-crossing concave subjects leave zero-width seam bridges
    after the halfplane clip — makevalid's mod-2 linework reduction
    removes them, so parts are clean simple rings."""
    from .makevalid import make_valid_rings

    rs = [_ring_array(r) for r in rings]
    xs = np.concatenate([r[:, 0] for r in rs])
    if xs.max() <= split_lon:
        return [("w", rs)]
    if xs.min() >= split_lon:
        return [("w", [r - np.array([360.0, 0.0]) for r in rs])]
    west = [c for c in (_clip_ring_lon(r, split_lon, True) for r in rs)
            if len(c) >= 3]
    east = [c - np.array([360.0, 0.0])
            for c in (_clip_ring_lon(r, split_lon, False) for r in rs)
            if len(c) >= 3]
    out = []
    if west:
        out.append(("w", make_valid_rings(west)))
    if east:
        out.append(("e", make_valid_rings(east)))
    return out


def wrapdateline(layer: DataFrame, id_col: str = "fid") -> DataFrame:
    """(fid, part, n_rings, area_key, geom_wkb) — one row per split
    part; area_key = floor(1e6 * part area). Map-only (per-feature
    local), Arrow-batched."""
    from .. import wkb as wkbmod
    from .makevalid import rings_area_evenodd

    def run(batches):
        for pdf in batches:
            rows = []
            for fid, g in zip(pdf[id_col], pdf["geom_wkb"]):
                rings = wkbmod.polygon_rings(bytes(g))
                for part, rs in wrapdateline_parts(rings):
                    area = abs(rings_area_evenodd(rs))
                    rows.append(
                        (
                            fid,
                            part,
                            len(rs),
                            int(np.floor(area * 1e6)),
                            wkbmod.encode_polygon(rs[0], rs[1:])
                            if rs else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "part", "n_rings", "area_key", "geom_wkb"],
            )

    return layer.select(id_col, "geom_wkb").mapInPandas(
        run,
        schema=f"{id_col} string, part string, n_rings bigint, "
        "area_key bigint, geom_wkb binary",
    )


_WRAP_SHIFT = 170.0  # fixture shift: synth boxes land on both sides


def wrapdateline_fixtures_pdf(m: int) -> pd.DataFrame:
    """Box-kind synth polygons translated +170 deg east: some stay
    west of 180, some sit wholly beyond (normalize), some straddle it
    (split) — all three behaviors closed-form for the oracle."""
    from .. import synth, wkb as wkbmod

    j, cx, cy, hw, hh = synth._poly_params(m)
    rows = []
    for idx in range(m):
        if idx % 8 not in (1, 4):
            continue
        x = float(cx[idx]) + _WRAP_SHIFT
        y, w, h = float(cy[idx]), float(hw[idx]), float(hh[idx])
        ring = [(x - w, y - h), (x + w, y - h), (x + w, y + h), (x - w, y + h)]
        rows.append(
            {"fid": f"poly{idx:04d}",
             "geom_wkb": wkbmod.encode_polygon(ring)}
        )
    return pd.DataFrame(rows)


def wrapdateline_query(spark, m: int) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("fid", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    layer = spark.createDataFrame(wrapdateline_fixtures_pdf(m), schema=schema)
    return wrapdateline(layer).select("fid", "part", "n_rings", "area_key")


def oracle_wrapdateline(m: int) -> str:
    """Closed-form part areas for the translated boxes: west part
    (180 - x0) * 2hh, east part (x1 - 180) * 2hh, whole box when not
    straddling."""
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    s = synth.flit(_WRAP_SHIFT)
    base = (
        f"SELECT j, cx + {s} AS x, cy, hw, hh FROM ({p}) "
        f"WHERE j % 8 IN (1, 4)"
    )
    fid = "concat('poly', lpad(cast(j as varchar), 4, '0'))"
    return (
        f"WITH b AS ({base}), "
        f"parts AS ("
        # uncrossed (wholly west or wholly east -> one 'w' part)
        f"SELECT j, 'w' AS part, 4.0E0 * hw * hh AS area FROM b "
        f"WHERE x + hw <= 180.0E0 OR x - hw >= 180.0E0 "
        f"UNION ALL "
        f"SELECT j, 'w' AS part, (180.0E0 - (x - hw)) * (2.0E0 * hh) "
        f"AS area FROM b WHERE x - hw < 180.0E0 AND x + hw > 180.0E0 "
        f"UNION ALL "
        f"SELECT j, 'e' AS part, ((x + hw) - 180.0E0) * (2.0E0 * hh) "
        f"AS area FROM b WHERE x - hw < 180.0E0 AND x + hw > 180.0E0) "
        f"SELECT {fid} AS fid, part, cast(1 as bigint) AS n_rings, "
        f"cast(floor(area * 1000000.0E0) as bigint) AS area_key FROM parts"
    )


# ---------------------------------------------------------------------------
# ogr2ogr -explodecollections (apps/ogr2ogr_lib.cpp): one output
# feature per member of a geometry collection, attributes duplicated;
# non-collection geometries pass through as a single part. Map-only
# (per-feature local) — at 100 TB this is a mapInPandas over the
# layer with no shuffle.


def explode_collections(layer: DataFrame, id_col: str = "fid") -> DataFrame:
    """(fid, part_idx, n_rings, area_key, geom_wkb) — one row per
    collection member, part_idx in member order (the reference
    iterates getGeometryRef(i) in order); POLYGON passes through with
    part_idx = 0."""
    from .. import wkb as wkbmod
    from .makevalid import rings_area_evenodd

    def run(batches):
        for pdf in batches:
            rows = []
            for fid, g in zip(pdf[id_col], pdf["geom_wkb"]):
                gtype, payload = wkbmod.decode(bytes(g))
                if gtype == wkbmod.MULTIPOLYGON:
                    members = payload
                elif gtype == wkbmod.POLYGON:
                    members = [payload]
                else:
                    raise ValueError(f"unsupported geometry {gtype}")
                for k, rings in enumerate(members):
                    area = abs(rings_area_evenodd(rings))
                    rows.append(
                        (
                            fid,
                            k,
                            len(rings),
                            int(np.floor(area * 1e6)),
                            wkbmod.encode_polygon(rings[0], rings[1:]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "part_idx", "n_rings", "area_key",
                         "geom_wkb"],
            )

    return layer.select(id_col, "geom_wkb").mapInPandas(
        run,
        schema=f"{id_col} string, part_idx int, n_rings bigint, "
        "area_key bigint, geom_wkb binary",
    )


_EXPL_GROUP = 3  # boxes per fixture multipolygon


def explode_fixtures_pdf(m: int) -> pd.DataFrame:
    """Mixed layer: box-kind synth polygons grouped 3-per-MULTIPOLYGON
    (member order = j order) + triangle-kind singles as plain POLYGON
    rows — exercising both the split and the passthrough."""
    from .. import synth, wkb as wkbmod

    j, cx, cy, hw, hh = synth._poly_params(m)
    groups: dict[int, list] = {}
    rows = []
    for idx in range(m):
        r = idx % 8
        x, y, w, h = (float(cx[idx]), float(cy[idx]),
                      float(hw[idx]), float(hh[idx]))
        if r in (1, 4):  # box -> multi member; rank is closed-form
            rank = 2 * (idx // 8) + (1 if r == 4 else 0)
            ring = [(x - w, y - h), (x + w, y - h),
                    (x + w, y + h), (x - w, y + h)]
            groups.setdefault(rank // _EXPL_GROUP, []).append((ring, ()))
        elif r in (2, 5):  # triangle -> single POLYGON passthrough
            ring = [(x - w, y - h), (x + w, y - h), (x, y + h)]
            rows.append(
                {"fid": f"single{idx:04d}",
                 "geom_wkb": wkbmod.encode_polygon(ring)}
            )
    for gid, polys in groups.items():
        rows.append(
            {"fid": f"multi{gid:04d}",
             "geom_wkb": wkbmod.encode_multipolygon(polys)}
        )
    return pd.DataFrame(rows)


def explode_collections_query(spark, m: int) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("fid", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    layer = spark.createDataFrame(explode_fixtures_pdf(m), schema=schema)
    return explode_collections(layer).select(
        "fid", "part_idx", "n_rings", "area_key"
    )


def oracle_explode_collections(m: int) -> str:
    """Closed-form: boxes (j % 8 IN (1,4)) area 4*hw*hh, rank
    2*(j//8) + [j%8=4], fid multi{rank//3}, part rank%3; triangles
    (j % 8 IN (2,5)) area 2*hw*hh as single{j} part 0."""
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    g = _EXPL_GROUP
    return (
        f"WITH b AS (SELECT j, hw, hh, "
        f"2 * (j // 8) + (CASE WHEN j % 8 = 4 THEN 1 ELSE 0 END) AS rank "
        f"FROM ({p}) WHERE j % 8 IN (1, 4)), "
        f"t AS (SELECT j, hw, hh FROM ({p}) WHERE j % 8 IN (2, 5)) "
        f"SELECT concat('multi', lpad(cast(rank // {g} as varchar), 4, "
        f"'0')) AS fid, cast(rank % {g} as int) AS part_idx, "
        f"cast(1 as bigint) AS n_rings, "
        f"cast(floor(4.0E0 * hw * hh * 1000000.0E0) as bigint) "
        f"AS area_key FROM b "
        f"UNION ALL "
        f"SELECT concat('single', lpad(cast(j as varchar), 4, '0')) "
        f"AS fid, cast(0 as int) AS part_idx, cast(1 as bigint) "
        f"AS n_rings, "
        f"cast(floor(2.0E0 * hw * hh * 1000000.0E0) as bigint) "
        f"AS area_key FROM t"
    )


def ogr_tindex(polys: DataFrame) -> DataFrame:
    """ogrtindex (apps/ogrtindex.cpp): build a tile index over many
    source layers — one output feature per layer carrying its location
    name, feature count, and extent rectangle (the INDEX the MapServer
    tileindex protocol reads). Layer name here is the synth ``kind``
    class (each kind stands in for one source shapefile).

    Scale: envelopes are computed per-geometry in the Arrow scan, then
    ONE map-side-combined groupBy on the layer key — the same one-pass
    shape as layer_extent, times layers."""
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            rows = []
            for kind, g in zip(pdf["kind"], pdf["geom_wkb"]):
                minx, miny, maxx, maxy = wkb.envelope(bytes(g))
                rows.append((kind, minx, miny, maxx, maxy))
            yield pd.DataFrame(
                rows, columns=["layer", "minx", "miny", "maxx", "maxy"]
            )

    env = polys.filter("kind <> 'kgon'").select("kind", "geom_wkb").mapInPandas(
        run,
        schema="layer string, minx double, miny double, "
        "maxx double, maxy double",
    )
    k = "1000000.0E0"
    return env.groupBy("layer").agg(
        F.count("*").alias("n_features"),
        F.expr(f"cast(floor(min(minx) * {k}) as bigint)").alias("minx_key"),
        F.expr(f"cast(floor(min(miny) * {k}) as bigint)").alias("miny_key"),
        F.expr(f"cast(floor(max(maxx) * {k}) as bigint)").alias("maxx_key"),
        F.expr(f"cast(floor(max(maxy) * {k}) as bigint)").alias("maxy_key"),
    )


def oracle_ogr_tindex(m: int) -> str:
    """Closed form per layer: every non-kgon envelope is bit-exactly
    (cx ± hw, cy ± hh) — verified over the full synth set; kgon
    (a regular k-gon inscribed in the box, so its hull does not touch
    all four box edges) is excluded on BOTH sides."""
    k = "1000000.0E0"
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT kind AS layer, cast(count(*) as bigint) AS n_features, "
        f"cast(floor(min(cx - hw) * {k}) as bigint) AS minx_key, "
        f"cast(floor(min(cy - hh) * {k}) as bigint) AS miny_key, "
        f"cast(floor(max(cx + hw) * {k}) as bigint) AS maxx_key, "
        f"cast(floor(max(cy + hh) * {k}) as bigint) AS maxy_key "
        f"FROM p WHERE kind <> 'kgon' GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# ogrmerge -single (swig/python/gdal-utils/osgeo_utils/ogrmerge.py):
# append N source layers into ONE output layer, unifying the field
# schemas (missing fields -> NULL) and recording the provenance in a
# source-layer field (-src_layer_field_name/-src_layer_field_content).
# Spark shape: unionByName(allowMissingColumns=True) — a pure
# metadata/concat plan, no shuffle; the engine-side analog of
# OGRUnionLayer's schema merge but materialized as one layer.


# the unified field list with its missing-field sentinels (the OGR
# "unset field" convention made hashable: '' for strings, -9999 for
# coordinates, -1 for ids — the oracle gate's value compare treats
# NULL as unequal to NULL, so merged layers encode absence explicitly)
_MERGE_FIELDS = (
    ("j", "bigint", "-1"),
    ("kind", None, "''"),
    ("category", None, "''"),
    ("latt_id", None, "''"),
    ("site_id", None, "''"),
    ("cx", None, "-9999.0E0"),
    ("cy", None, "-9999.0E0"),
    ("hw", None, "-9999.0E0"),
    ("hh", None, "-9999.0E0"),
    ("lx0", None, "-9999.0E0"),
    ("ly0", None, "-9999.0E0"),
    ("lx1", None, "-9999.0E0"),
    ("ly1", None, "-9999.0E0"),
    ("slon", None, "-9999.0E0"),
    ("slat", None, "-9999.0E0"),
)


def _merge_select() -> list[str]:
    out = ["src_layer"]
    for name, cast_to, sent in _MERGE_FIELDS:
        e = f"coalesce({name}, {sent})"
        if cast_to:
            e = f"cast({e} as {cast_to})"
        out.append(f"{e} AS {name}")
    return out


def ogrmerge_single(spark, m: int) -> DataFrame:
    """Merge the polygons / lattice / sites layers into one layer
    with a ``src_layer`` provenance field; same-named fields (``j``)
    unify, layer-specific fields take the unset-field sentinel."""
    from pyspark.sql import functions as F

    polys = spark.sql(synth.polygons_sql_cte(m, "spark")).withColumn(
        "src_layer", F.lit("polygons")
    )
    latt = spark.sql(synth.lattice_cte("spark")).withColumn(
        "src_layer", F.lit("lattice")
    )
    sites = spark.sql(synth.sites_cte(synth.N_SITES, "spark")).withColumn(
        "src_layer", F.lit("sites")
    )
    merged = polys.unionByName(latt, allowMissingColumns=True).unionByName(
        sites, allowMissingColumns=True
    )
    return merged.selectExpr(*_merge_select())


def oracle_ogrmerge_single(m: int) -> str:
    return (
        f"SELECT {', '.join(_merge_select())} FROM ("
        f"SELECT 'polygons' AS src_layer, * "
        f"FROM ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"UNION ALL BY NAME "
        f"SELECT 'lattice' AS src_layer, * FROM ({synth.lattice_cte('duckdb')}) "
        f"UNION ALL BY NAME "
        f"SELECT 'sites' AS src_layer, * "
        f"FROM ({synth.sites_cte(synth.N_SITES, 'duckdb')}))"
    )


# ---------------------------------------------------------------------------
# test_ogrsf conformance harness (apps/test_ogrsf.cpp — the
# reference's OGR layer self-check utility): run layer invariants
# where each side of the comparison travels an INDEPENDENT code path,
# so the harness cross-checks the engine against itself the way
# test_ogrsf cross-checks a driver against the generic layer
# implementations (feature count vs iteration, extent vs per-feature
# envelopes, spatial filter vs brute force, attribute filter
# partition).


def ogrsf_conformance(spark, n_images: int, m: int) -> DataFrame:
    """(check_name, lhs, rhs, passed) rows:

    - fid_unique: count(*) vs count(distinct fid) on the polygon layer
    - extent_*: layer_extent (WKB-decode envelope path) vs the
      closed-form lattice corners (parameter path)
    - spatial_filter_count: cell-indexed PIP join vs the broadcast
      brute-force join (different candidate generators, same kernel)
    - attr_filter_partition: filter + complement vs total
    """
    from pyspark.sql import functions as F

    from .. import synth
    from . import spatial_join as sj

    n_pts = min(n_images, 4096)
    polys = spark.sql(synth.polygons_sql_cte(m, "spark"))

    c1 = polys.agg(
        F.expr("cast(count(*) as bigint) AS lhs"),
        F.expr("cast(count(distinct j) as bigint) AS rhs"),
    ).selectExpr("'fid_unique' AS check_name", "lhs", "rhs")

    latt = synth.lattice_df(spark).selectExpr(
        "latt_id AS poly_id", "geom_wkb"
    )
    ext = layer_extent(latt)
    k = "1000000.0E0"
    ext_param = spark.sql(synth.lattice_cte("spark")).agg(
        F.expr(f"cast(floor(min(lx0) * {k}) as bigint) AS minx_key"),
        F.expr(f"cast(floor(min(ly0) * {k}) as bigint) AS miny_key"),
        F.expr(f"cast(floor(max(lx1) * {k}) as bigint) AS maxx_key"),
        F.expr(f"cast(floor(max(ly1) * {k}) as bigint) AS maxy_key"),
    )
    c2 = None
    for axis in ("minx", "miny", "maxx", "maxy"):
        row = ext.selectExpr(f"{axis}_key AS lhs").crossJoin(
            ext_param.selectExpr(f"{axis}_key AS rhs")
        ).selectExpr(f"'extent_{axis}' AS check_name", "lhs", "rhs")
        c2 = row if c2 is None else c2.unionByName(row)

    pts = synth.images_df(spark, n_pts).select("image_id", "lon", "lat")
    latt2 = synth.lattice_df(spark)
    fast = sj.spatial_join(
        pts, latt2, poly_cols=["latt_id"], poly_count_hint=24
    ).agg(F.expr("cast(count(*) as bigint) AS lhs"))
    brute = sj.spatial_join_bruteforce(
        pts, latt2, poly_cols=["latt_id"]
    ).agg(F.expr("cast(count(*) as bigint) AS rhs"))
    c3 = fast.crossJoin(brute).selectExpr(
        "'spatial_filter_count' AS check_name", "lhs", "rhs"
    )

    c4 = polys.agg(
        F.expr(
            "cast(count_if(category = 'forest') "
            "+ count_if(category <> 'forest') as bigint) AS lhs"
        ),
        F.expr("cast(count(*) as bigint) AS rhs"),
    ).selectExpr("'attr_filter_partition' AS check_name", "lhs", "rhs")

    out = c1.unionByName(c2).unionByName(c3).unionByName(c4)
    return out.selectExpr(
        "check_name", "lhs", "rhs", "cast(lhs = rhs as int) AS passed"
    )


def oracle_ogrsf_conformance(n_images: int, m: int) -> str:
    """Closed-form replay: each check's TRUE value on both sides."""
    from .. import synth

    n_pts = min(n_images, 4096)
    k = "1000000.0E0"
    return (
        f"WITH img AS (SELECT * FROM ({synth.images_cte(n_pts, 'duckdb')})), "
        f"latt AS ({synth.lattice_cte('duckdb')}), "
        f"pip AS (SELECT count(*) AS c FROM img JOIN latt "
        f"ON img.lon > latt.lx0 AND img.lon < latt.lx1 "
        f"AND img.lat > latt.ly0 AND img.lat < latt.ly1) "
        f"SELECT 'fid_unique' AS check_name, cast({m} as bigint) AS lhs, "
        f"cast({m} as bigint) AS rhs, 1 AS passed "
        f"UNION ALL SELECT 'extent_minx', "
        f"(SELECT cast(floor(min(lx0) * {k}) as bigint) FROM latt), "
        f"(SELECT cast(floor(min(lx0) * {k}) as bigint) FROM latt), 1 "
        f"UNION ALL SELECT 'extent_miny', "
        f"(SELECT cast(floor(min(ly0) * {k}) as bigint) FROM latt), "
        f"(SELECT cast(floor(min(ly0) * {k}) as bigint) FROM latt), 1 "
        f"UNION ALL SELECT 'extent_maxx', "
        f"(SELECT cast(floor(max(lx1) * {k}) as bigint) FROM latt), "
        f"(SELECT cast(floor(max(lx1) * {k}) as bigint) FROM latt), 1 "
        f"UNION ALL SELECT 'extent_maxy', "
        f"(SELECT cast(floor(max(ly1) * {k}) as bigint) FROM latt), "
        f"(SELECT cast(floor(max(ly1) * {k}) as bigint) FROM latt), 1 "
        f"UNION ALL SELECT 'spatial_filter_count', "
        f"(SELECT cast(c as bigint) FROM pip), "
        f"(SELECT cast(c as bigint) FROM pip), 1 "
        f"UNION ALL SELECT 'attr_filter_partition', "
        f"cast({m} as bigint), cast({m} as bigint), 1"
    )


# ---------------------------------------------------------------------------
# geom_centroid — OGRGeometry::Centroid (ogr/ogrgeometry.cpp, which
# delegates to GEOS GEOSGetCentroid; also the SQLite-dialect
# ST_Centroid surface). Unlike geom_fields' envelope center this is
# the AREA-WEIGHTED centroid: Cx = (1/6A) sum (x_i + x_{i+1}) *
# (x_i*y_{i+1} - x_{i+1}*y_i), holes subtract their moments. The
# synth kinds all have closed forms (symmetry for box/kgon/holed,
# y - h/3 for the triangle, an exact box-minus-notch decomposition
# for the concave "C"), so the oracle covers EVERY kind — concave is
# the kind that discriminates area centroid from envelope center.

_CEN_SCALE = 1e4  # 1e-4 deg (~10 m) accuracy-parity floor + half-grid eps


def _ring_signed(r: np.ndarray):
    """(signed_area, mx, my) shoelace integrals for one ring."""
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = 0.5 * float(cross.sum())
    mx = float(((x + xn) * cross).sum()) / 6.0
    my = float(((y + yn) * cross).sum()) / 6.0
    return a, mx, my


def geom_centroid(polys: DataFrame) -> DataFrame:
    """(poly_id, cen_x_key, cen_y_key) area-weighted centroid,
    floor(v * 1e4 + 5e-4) keys. Vectorized numpy over WKB rings in
    mapInPandas; map-only, no shuffle."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                area = mx = my = 0.0
                for k, ring in enumerate(wkb.polygon_rings(bytes(g))):
                    a, rx, ry = _ring_signed(_ring_array(ring))
                    s = 1.0 if k == 0 else -1.0  # holes subtract
                    o = 1.0 if a >= 0 else -1.0  # orientation-normalize
                    area += s * o * a
                    mx += s * o * rx
                    my += s * o * ry
                rows.append(
                    (
                        poly_id,
                        int(np.floor(mx / area * _CEN_SCALE + 5e-4)),
                        int(np.floor(my / area * _CEN_SCALE + 5e-4)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["poly_id", "cen_x_key", "cen_y_key"]
            )

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run, schema="poly_id string, cen_x_key bigint, cen_y_key bigint"
    )


def oracle_geom_centroid(m: int) -> str:
    """Closed forms per kind. concave: box(2w x 2h) minus the notch
    rectangle x in [cx-0.4w, cx+w], y in [cy-0.6h, cy+0.6h]; the
    x-centroid shift is (1.68*0.3/2.32)*w = (63/290)*w."""
    cenx = (
        "CASE WHEN kind = 'concave' THEN cx - hw * 63.0E0 / 290.0E0 "
        "ELSE cx END"
    )
    ceny = (
        "CASE WHEN kind = 'triangle' THEN cy - hh / 3.0E0 ELSE cy END"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"cast(floor(({cenx}) * 10000.0E0 + 0.0005E0) as bigint) AS cen_x_key, "
        f"cast(floor(({ceny}) * 10000.0E0 + 0.0005E0) as bigint) AS cen_y_key "
        f"FROM p"
    )


# ---------------------------------------------------------------------------
# geom_point_on_surface — OGRGeometry::PointOnSurface
# (ogr/ogrgeometry.cpp, delegating to GEOS InteriorPointArea; SQLite
# dialect ST_PointOnSurface). Algorithm (Klokan/GEOS): scan a
# horizontal line through the bisector of the envelope's y range,
# intersect it with all rings (even-odd), take the midpoint of the
# WIDEST inside segment (tie -> leftmost, deterministic). This is
# the operator you need precisely when the area centroid falls
# OUTSIDE the polygon — the synth concave "C" is such a case: its
# centroid x = cx - (63/290)*hw > cx - 0.4*hw lies inside the notch.

def _scan_crossings(rings, y0: float) -> np.ndarray:
    xs = []
    for ring in rings:
        r = _ring_array(ring)
        a = r
        b = np.roll(r, -1, axis=0)
        ya, yb = a[:, 1], b[:, 1]
        m = (np.minimum(ya, yb) <= y0) & (y0 < np.maximum(ya, yb))
        xa, xb = a[m, 0], b[m, 0]
        ya, yb = ya[m], yb[m]
        xs.append(xa + (y0 - ya) * (xb - xa) / (yb - ya))
    return np.sort(np.concatenate(xs)) if xs else np.empty(0)


def geom_point_on_surface(polys: DataFrame) -> DataFrame:
    """(poly_id, pos_x_key, pos_y_key) interior point via the
    envelope-bisector scanline; floor(v * 1e4 + 5e-4) keys.
    Map-only mapInPandas over WKB, no shuffle."""

    def run(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                rings = wkb.polygon_rings(bytes(g))
                _, miny, _, maxy = wkb.envelope(bytes(g))
                y0 = 0.5 * (miny + maxy)
                xs = _scan_crossings(rings, y0)
                # widest inside segment, tie -> leftmost
                best_w, best_x = -1.0, 0.0
                for i in range(0, len(xs) - 1, 2):
                    w_ = xs[i + 1] - xs[i]
                    if w_ > best_w + 1e-12:
                        best_w, best_x = w_, 0.5 * (xs[i] + xs[i + 1])
                rows.append(
                    (
                        poly_id,
                        int(np.floor(best_x * _CEN_SCALE + 5e-4)),
                        int(np.floor(y0 * _CEN_SCALE + 5e-4)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["poly_id", "pos_x_key", "pos_y_key"]
            )

    return polys.select("poly_id", "geom_wkb").mapInPandas(
        run, schema="poly_id string, pos_x_key bigint, pos_y_key bigint"
    )


def oracle_point_on_surface(m: int) -> str:
    """Closed forms (kgon excluded from the query's kind set): box/
    hot_box/triangle -> (cx, cy); concave -> the section at y=cy is
    [cx-hw, cx-0.4hw] (the notch removes the right side), midpoint
    cx-0.7hw; holed -> two equal segments, leftmost midpoint
    cx-0.7hw."""
    posx = (
        "CASE WHEN kind IN ('concave', 'holed') "
        "THEN cx - 0.7E0 * hw ELSE cx END"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"cast(floor(({posx}) * 10000.0E0 + 0.0005E0) as bigint) AS pos_x_key, "
        f"cast(floor(cy * 10000.0E0 + 0.0005E0) as bigint) AS pos_y_key "
        f"FROM p WHERE kind != 'kgon'"
    )


# ---------------------------------------------------------------------------
# OGR SQL special fields (ogr/ogrsf_frmts/generic/ogr_gensql.cpp
# SpecialFieldNames: FID, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA,
# OGR_STYLE) — pseudo-columns any OGR SQL SELECT can reference
# alongside attributes. WKT is canonicalized to integer micro-degree
# coordinates (floor(x * 1e6)) so the serialized string is
# engine-independent; OGR_STYLE has no source on the synth layer and
# follows the house '' sentinel for absent values. ``big_area`` is
# the classic `WHERE OGR_GEOM_AREA > t` predicate as a flag column.


def ogr_special_fields(polys: DataFrame) -> DataFrame:
    """(fid, poly_id, geom_type, geom_wkt, area_key, ogr_style,
    big_area) over the oracle-subset kinds."""

    def run(batches):
        for pdf in batches:
            rows = []
            for j, poly_id, g in zip(
                pdf["j"], pdf["poly_id"], pdf["geom_wkb"]
            ):
                rings = [
                    _ring_array(r) for r in wkb.polygon_rings(bytes(g))
                ]
                area = shoelace_area(rings[0]) - sum(
                    shoelace_area(r) for r in rings[1:]
                )
                area_key = int(np.floor(area * 1e3 + 1e-6))
                parts = []
                for r in rings:
                    pts = [
                        f"{int(np.floor(x * 1e6))} {int(np.floor(y * 1e6))}"
                        for x, y in r
                    ]
                    pts.append(pts[0])  # closed ring in WKT
                    parts.append("(" + ", ".join(pts) + ")")
                rows.append(
                    (
                        int(j),
                        poly_id,
                        "POLYGON",
                        "POLYGON (" + ", ".join(parts) + ")",
                        area_key,
                        "",
                        int(area_key > 50_000),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["fid", "poly_id", "geom_type", "geom_wkt",
                         "area_key", "ogr_style", "big_area"],
            )

    return (
        polys.filter("kind IN ('box', 'hot_box', 'triangle')")
        .select("j", "poly_id", "geom_wkb")
        .mapInPandas(
            run,
            schema="fid bigint, poly_id string, geom_type string, "
            "geom_wkt string, area_key bigint, ogr_style string, "
            "big_area int",
        )
    )


def oracle_ogr_special_fields(m: int) -> str:
    """Closed-form replay: ring vertex order matches
    synth.kind_geom (box CCW from SW corner; triangle SW, SE, apex)."""

    def mi(e: str) -> str:
        return f"cast(floor(({e}) * 1000000.0E0) as bigint)"

    x1, x2 = mi("cx - hw"), mi("cx + hw")
    y1, y2 = mi("cy - hh"), mi("cy + hh")
    xm = mi("cx")
    box_wkt = (
        f"concat('POLYGON ((', {x1}, ' ', {y1}, ', ', {x2}, ' ', {y1}, "
        f"', ', {x2}, ' ', {y2}, ', ', {x1}, ' ', {y2}, ', ', "
        f"{x1}, ' ', {y1}, '))')"
    )
    tri_wkt = (
        f"concat('POLYGON ((', {x1}, ' ', {y1}, ', ', {x2}, ' ', {y1}, "
        f"', ', {xm}, ' ', {y2}, ', ', {x1}, ' ', {y1}, '))')"
    )
    area = (
        "cast(floor(CASE WHEN kind = 'triangle' "
        "THEN 0.5E0 * (2.0E0 * hw) * (2.0E0 * hh) "
        "ELSE 4.0E0 * hw * hh END * 1000.0E0 + 0.000001E0) as bigint)"
    )
    return (
        f"WITH p AS ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"SELECT j AS fid, "
        f"concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"'POLYGON' AS geom_type, "
        f"CASE WHEN kind = 'triangle' THEN {tri_wkt} ELSE {box_wkt} END "
        f"AS geom_wkt, "
        f"{area} AS area_key, '' AS ogr_style, "
        f"cast({area} > 50000 as int) AS big_area "
        f"FROM p WHERE kind IN ('box', 'hot_box', 'triangle')"
    )


# ---------------------------------------------------------------------------
# Visvalingam-Whyatt simplification (Visvalingam & Whyatt 1993) — the
# area-based companion of the Douglas-Peucker `simplify_dp` (the
# reference exposes DP via OGRGeometry::Simplify; VW is the QGIS/
# mapshaper default and belongs in any vector stack). Deterministic
# PASS variant: each pass computes every surviving vertex's effective
# triangle area among CURRENT survivors (ring-wrapped lag/lead), then
# drops the smallest-area candidates below threshold, capped so the
# ring keeps >= 4 vertices — at most (m - 4) drops per pass, ranked
# (area, seq). Three materialized passes; every float op is the same
# IEEE sequence on both engines (vertices come from the stored WKB on
# the Spark side and the bit-matching cos/sin synth replay in the
# oracle), so survival decisions are bit-identical with no epsilon.

VW_PASSES = 3
VW_FRAC = "0.02E0"  # threshold = frac * bbox area, per polygon


def _vw_pass_sql(prev: str, t: int, mat: str = "") -> str:
    """One VW pass over alive rows (poly_id, seq, x, y, t)."""
    win = "PARTITION BY poly_id ORDER BY seq"
    full = (
        "PARTITION BY poly_id ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    )
    return (
        f"p{t} AS {mat}(SELECT poly_id, seq, x, y, t FROM ("
        f"SELECT *, CASE WHEN a2 < t THEN row_number() OVER ("
        f"PARTITION BY poly_id, (a2 < t) ORDER BY a2, seq) END AS rk "
        f"FROM (SELECT *, abs((x - px) * (ny - py) - (nx - px) * (y - py)) "
        f"AS a2 FROM ("
        f"SELECT poly_id, seq, x, y, t, "
        f"count(*) OVER (PARTITION BY poly_id) AS m, "
        f"coalesce(lag(x) OVER ({win}), last_value(x) OVER ({full})) AS px, "
        f"coalesce(lag(y) OVER ({win}), last_value(y) OVER ({full})) AS py, "
        f"coalesce(lead(x) OVER ({win}), first_value(x) OVER ({full})) AS nx, "
        f"coalesce(lead(y) OVER ({win}), first_value(y) OVER ({full})) AS ny "
        f"FROM {prev}))) "
        f"WHERE NOT (a2 < t) OR rk > m - 4)"
    )


def _vw_out_sql() -> str:
    """Final summary over the surviving ring: vertex count + per-term
    quantized shoelace sum (order-free int)."""
    win = "PARTITION BY poly_id ORDER BY seq"
    full = (
        "PARTITION BY poly_id ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    )
    last = f"p{VW_PASSES}"
    return (
        f"SELECT poly_id, cast(count(*) as bigint) AS n_vertices, "
        f"cast(sum(term) as bigint) AS area2_key FROM ("
        f"SELECT poly_id, cast(floor((x * ny - nx * y) * 1000000.0E0) "
        f"as bigint) AS term FROM ("
        f"SELECT poly_id, seq, x, y, "
        f"coalesce(lead(x) OVER ({win}), first_value(x) OVER ({full})) AS nx, "
        f"coalesce(lead(y) OVER ({win}), first_value(y) OVER ({full})) AS ny "
        f"FROM {last})) GROUP BY 1"
    )


def _vw_chain_sql(base: str, dialect: str = "duckdb") -> str:
    """p0 = base vertices with per-poly threshold; then the passes.
    MATERIALIZED is DuckDB-only (chained-CTE re-expansion guard);
    Spark SQL has no such keyword."""
    mat = "MATERIALIZED " if dialect == "duckdb" else ""
    ctes = [
        f"p0 AS {mat}(SELECT poly_id, seq, x, y, "
        f"{VW_FRAC} * (max(x) OVER (PARTITION BY poly_id) "
        f"- min(x) OVER (PARTITION BY poly_id)) "
        f"* (max(y) OVER (PARTITION BY poly_id) "
        f"- min(y) OVER (PARTITION BY poly_id)) AS t FROM ({base}))"
    ]
    for k in range(1, VW_PASSES + 1):
        ctes.append(_vw_pass_sql(f"p{k - 1}", k, mat))
    return ", ".join(ctes)


def vw_simplify(spark, polys: DataFrame) -> DataFrame:
    """(poly_id, n_vertices, area2_key) after 3 VW passes over the
    kgon rings (the only synth kind with redundant vertices)."""

    def verts(batches):
        for pdf in batches:
            rows = []
            for poly_id, g in zip(pdf["poly_id"], pdf["geom_wkb"]):
                r = _ring_array(wkb.polygon_rings(bytes(g))[0])
                rows.extend(
                    (poly_id, i, float(x), float(y))
                    for i, (x, y) in enumerate(r)
                )
            yield pd.DataFrame(
                rows, columns=["poly_id", "seq", "x", "y"]
            )

    v = polys.filter("kind = 'kgon'").select(
        "poly_id", "geom_wkb"
    ).mapInPandas(
        verts, schema="poly_id string, seq int, x double, y double"
    )
    v.createOrReplaceTempView("vw_verts")
    return spark.sql(
        f"WITH {_vw_chain_sql('SELECT * FROM vw_verts', 'spark')} "
        f"{_vw_out_sql()}"
    )


def oracle_vw_simplify(m: int) -> str:
    """Vertex replay from the synth CTE (numpy cos/sin bit-match
    libm), then the identical pass chain."""
    tp = synth.flit(2.0 * np.pi)
    base = (
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) "
        f"AS poly_id, v.range AS seq, "
        f"cx + hw * cos(({tp} * v.range) / k + 0.1E0 * j) AS x, "
        f"cy + hh * sin(({tp} * v.range) / k + 0.1E0 * j) AS y "
        f"FROM (SELECT *, 5 + j % 7 AS k FROM "
        f"({synth.polygons_sql_cte(m, 'duckdb')}) WHERE kind = 'kgon') p, "
        f"range(0, 12) v WHERE v.range < p.k"
    )
    return f"WITH {_vw_chain_sql(base)} {_vw_out_sql()}"
