"""Geometry-producing layer algebra — the full OGR family.

Matches OGRLayer semantics (ogr/ogrsf_frmts/generic/ogrlayer.cpp:
Intersection :2278, Union :2679, SymDifference :3204, Identity :3619,
Update :4024, Clip :4361, Erase :4658; exercised by
autotest/ogr/ogr_layer_algebra.py). No GEOS in this container; two
fresh numpy cores instead:

- a Sutherland–Hodgman fast path for CONVEX clip rings (boxes,
  triangles, k-gons) — the dominant case, vectorized;
- the Greiner–Hormann region engine (gdal_spark/boolop.py) for
  everything else: concave clips, holed clips, union / symmetric
  difference, and the per-feature subtraction folds behind
  Union/Identity/Update/Erase leftovers.

Spark shape (scale-first): both layers explode to envelope-covering
cells at a shared zoom -> equi-join on cell_id (clip side broadcast
when small) -> pair dedup -> JVM envelope-overlap prefilter -> one
Arrow-batched refine stage computing the clipped rings + shoelace
area. Per-feature folds (A minus the union of ALL its partners) group
the candidate pairs by feature and subtract sequentially inside one
Arrow stage — partner lists are bounded by cell co-occurrence, so the
fold is as distributed as the pair join. The payload geometry crosses
the wire once; no driver-side loops.

The driver oracles use closed-form subsets (rect algebra for pairwise
union/symdiff vertex counts; a DISJOINT lattice method layer makes the
Identity/Update folds exactly summable); the general machinery is
pytest-verified against an independent fine-grid rasterization oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import boolop, geom, wkb
from . import cells as cellmod


# ---------------------------------------------------------------------------
# Sutherland–Hodgman core (numpy, per-ring)


def _open_ring(ring: np.ndarray) -> np.ndarray:
    """Drop the WKB closing vertex (rings are stored closed)."""
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[0] > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    return r


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    )


def _ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if ring_area(ring) >= 0.0 else ring[::-1]


def is_convex(ring: np.ndarray) -> bool:
    """All cross products of consecutive edges share a sign (allowing
    collinear zeros)."""
    r = _ensure_ccw(np.asarray(ring, dtype=np.float64))
    a = np.roll(r, -1, axis=0) - r
    b = np.roll(a, -1, axis=0)
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool(np.all(cross >= -1e-12 * np.max(np.abs(r))))


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` (any simple ring) against a
    CONVEX CCW ``clip_ring``. Returns the clipped ring (possibly empty,
    shape (k, 2)). Open rings (no repeated last vertex) expected."""
    out = np.asarray(subject, dtype=np.float64)
    clip_ring = _ensure_ccw(np.asarray(clip_ring, dtype=np.float64))
    m = clip_ring.shape[0]
    for e in range(m):
        if out.shape[0] == 0:
            break
        a = clip_ring[e]
        b = clip_ring[(e + 1) % m]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed distance of every subject vertex to the edge (left = in)
        d = ex * (out[:, 1] - a[1]) - ey * (out[:, 0] - a[0])
        inside = d >= 0.0
        nxt_idx = np.roll(np.arange(out.shape[0]), -1)
        new_pts: list[np.ndarray] = []
        for i in range(out.shape[0]):
            j = nxt_idx[i]
            if inside[i]:
                new_pts.append(out[i])
                if not inside[j]:
                    t = d[i] / (d[i] - d[j])
                    new_pts.append(out[i] + t * (out[j] - out[i]))
            elif inside[j]:
                t = d[i] / (d[i] - d[j])
                new_pts.append(out[i] + t * (out[j] - out[i]))
        out = (
            np.array(new_pts, dtype=np.float64)
            if new_pts
            else np.empty((0, 2), dtype=np.float64)
        )
    return out


def clip_polygon_convex(rings: list[np.ndarray], clip_ring: np.ndarray):
    """Clip a polygon (shell + holes) against a convex ring. Returns
    (out_rings, area): shell ring first, then clipped holes; area =
    shell area - hole areas (the multiplicity-correct region area for
    valid inputs)."""
    shell = clip_ring_convex(_ensure_ccw(rings[0]), clip_ring)
    if shell.shape[0] < 3:
        return [], 0.0
    area = abs(ring_area(shell))
    out = [shell]
    for hole in rings[1:]:
        ch = clip_ring_convex(_ensure_ccw(hole), clip_ring)
        if ch.shape[0] >= 3:
            area -= abs(ring_area(ch))
            out.append(ch[::-1])  # holes emitted CW
    return out, area


# ---------------------------------------------------------------------------
# DataFrame operator


OVERLAY_ZOOM = 6  # cell level for the candidate join


def _covering_iter(batches, id_col: str, wkb_col: str, zoom: int):
    for pdf in batches:
        ids, cids = [], []
        for pid, data in zip(pdf[id_col], pdf[wkb_col]):
            cs = geom.covering_cells_geodetic(bytes(data), zoom)
            ids.extend([pid] * len(cs))
            cids.extend(cs.tolist())
        yield pd.DataFrame({id_col: ids, "cell_id": pd.array(cids, dtype="int64")})


def _cells_of(df: DataFrame, id_col: str, wkb_col: str, zoom: int) -> DataFrame:
    return df.select(id_col, wkb_col).mapInPandas(
        lambda it: _covering_iter(it, id_col, wkb_col, zoom),
        schema=f"{id_col} string, cell_id bigint",
    )


def _envelope_cols(df: DataFrame, id_col: str, wkb_col: str, prefix: str) -> DataFrame:
    @F.pandas_udf("x0 double, y0 double, x1 double, y1 double")
    def env(s: pd.Series) -> pd.DataFrame:
        rows = [wkb.envelope(bytes(b)) for b in s]
        return pd.DataFrame(rows, columns=["x0", "y0", "x1", "y1"])

    e = env(F.col(wkb_col))
    return df.withColumn("_env", e).select(
        id_col,
        wkb_col,
        F.col("_env.x0").alias(f"{prefix}x0"),
        F.col("_env.y0").alias(f"{prefix}y0"),
        F.col("_env.x1").alias(f"{prefix}x1"),
        F.col("_env.y1").alias(f"{prefix}y1"),
    )


def _candidates(
    subject: DataFrame,
    clip: DataFrame,
    zoom: int,
    broadcast_clip: bool,
) -> DataFrame:
    """Shared candidate stage: cell equi-join -> pair dedup -> strict
    JVM envelope-overlap prefilter (touching boxes have zero-area
    intersection and are dropped, matching every refine)."""
    a_cells = _cells_of(subject, "id_a", "wkb_a", zoom)
    b_cells = _cells_of(clip, "id_b", "wkb_b", zoom)
    if broadcast_clip:
        b_cells = F.broadcast(b_cells)
    pairs = (
        a_cells.join(b_cells, "cell_id")
        .select("id_a", "id_b")
        .distinct()
    )
    a_env = _envelope_cols(subject, "id_a", "wkb_a", "a")
    b_env = _envelope_cols(clip, "id_b", "wkb_b", "b")
    if broadcast_clip:
        b_env = F.broadcast(b_env)
    return (
        pairs.join(a_env, "id_a")
        .join(b_env, "id_b")
        .where(
            (F.col("ax0") < F.col("bx1"))
            & (F.col("bx0") < F.col("ax1"))
            & (F.col("ay0") < F.col("by1"))
            & (F.col("by0") < F.col("ay1"))
        )
        .select("id_a", "wkb_a", "id_b", "wkb_b")
    )


def _region_is_rect(region) -> bool:
    """One hole-free 4-vertex shell with axis-parallel edges."""
    if len(region) != 1:
        return False
    shell, holes = region[0]
    if holes or shell.shape[0] != 4:
        return False
    d = np.roll(shell, -1, axis=0) - shell
    return bool(np.all((d == 0).sum(axis=1) == 1))


def _region_of_wkb(data: bytes):
    gtype, payload = wkb.decode(bytes(data))
    if gtype == wkb.POLYGON:
        return boolop.region_of_rings(payload)
    if gtype == wkb.MULTIPOLYGON:
        out = []
        for rings in payload:
            out.extend(boolop.region_of_rings(rings))
        return out
    raise ValueError("polygonal WKB expected")


def _encode_region(region):
    """Region -> WKB (POLYGON or MULTIPOLYGON; None when empty).
    Holes emitted CW per the repo convention."""
    if not region:
        return None
    if len(region) == 1:
        shell, holes = region[0]
        return wkb.encode_polygon(shell, holes=[h[::-1] for h in holes])
    return wkb.encode_multipolygon(
        [(s, [h[::-1] for h in hs]) for s, hs in region]
    )


def overlay(
    subject: DataFrame,
    clip: DataFrame,
    how: str = "intersection",
    zoom: int = OVERLAY_ZOOM,
    broadcast_clip: bool = True,
) -> DataFrame:
    """Layer-algebra overlay.

    subject: (id_a string, wkb_a binary); clip: (id_b string, wkb_b
    binary) — any simple polygons (convex clips take the vectorized
    Sutherland–Hodgman fast path; concave/holed clips route through
    the Greiner–Hormann region engine). Returns per overlapping pair:
    (id_a, id_b, inter_wkb, area, nvert) for 'intersection';
    for 'erase' area is subject_area - intersection_area and inter_wkb
    is the intersection removed (use overlay_fold for true multi-
    partner Erase semantics).
    """
    if how not in ("intersection", "erase"):
        raise ValueError(how)
    cand = _candidates(subject, clip, zoom, broadcast_clip)

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # decode every DISTINCT geometry once per Arrow batch
            # (a hot clip polygon appears in hundreds of pairs)
            a_codes, a_uniq = pd.factorize(pdf["wkb_a"])
            b_codes, b_uniq = pd.factorize(pdf["wkb_b"])

            def decode(uniq):
                rings_list, rect = [], []
                for g in uniq:
                    rings = [_open_ring(r) for r in wkb.polygon_rings(bytes(g))]
                    rings_list.append(rings)
                    r0 = rings[0]
                    is_rect = (
                        len(rings) == 1
                        and r0.shape[0] == 4
                        and bool(
                            np.all(
                                (np.roll(r0, -1, axis=0) - r0 == 0).sum(axis=1)
                                == 1
                            )
                        )
                    )
                    rect.append(is_rect)
                env = np.array(
                    [
                        (r[0][:, 0].min(), r[0][:, 1].min(),
                         r[0][:, 0].max(), r[0][:, 1].max())
                        for r in rings_list
                    ]
                )
                return rings_list, np.array(rect), env

            a_rings, a_rect, a_env = decode(a_uniq)
            b_rings, b_rect, b_env = decode(b_uniq)
            b_conv = np.array(
                [len(rb_) == 1 and is_convex(rb_[0]) for rb_ in b_rings]
            )

            rows = []
            ids_a = pdf["id_a"].to_numpy()
            ids_b = pdf["id_b"].to_numpy()
            fast = a_rect[a_codes] & b_rect[b_codes]
            # vectorized rectangle-rectangle path (the
            # m_bFilterIsEnvelope analog): clipped rect is the
            # envelope intersection, area in closed form
            if fast.any():
                ae = a_env[a_codes[fast]]
                be = b_env[b_codes[fast]]
                x0 = np.maximum(ae[:, 0], be[:, 0])
                y0 = np.maximum(ae[:, 1], be[:, 1])
                x1 = np.minimum(ae[:, 2], be[:, 2])
                y1 = np.minimum(ae[:, 3], be[:, 3])
                ok = (x1 > x0) & (y1 > y0)
                inter_area = (x1 - x0) * (y1 - y0)
                if how == "erase":
                    full = (ae[:, 2] - ae[:, 0]) * (ae[:, 3] - ae[:, 1])
                    out_area = full - inter_area
                else:
                    out_area = inter_area
                fa, fb = ids_a[fast], ids_b[fast]
                for i in np.nonzero(ok)[0]:
                    ring = [
                        (x0[i], y0[i]), (x1[i], y0[i]),
                        (x1[i], y1[i]), (x0[i], y1[i]),
                    ]
                    rows.append(
                        (
                            fa[i], fb[i], wkb.encode_polygon(ring),
                            float(out_area[i]), 4,
                        )
                    )
            # general path: Sutherland-Hodgman for convex clips,
            # Greiner-Hormann region engine otherwise
            for i in np.nonzero(~fast)[0]:
                s_rings = a_rings[a_codes[i]]
                c_rings = b_rings[b_codes[i]]
                if b_conv[b_codes[i]]:
                    out_rings, inter_area = clip_polygon_convex(
                        s_rings, c_rings[0]
                    )
                    if inter_area <= 0.0:
                        continue
                    inter = wkb.encode_polygon(
                        out_rings[0], holes=tuple(out_rings[1:])
                    )
                    nvert = int(out_rings[0].shape[0])
                else:
                    reg = boolop.boolean_regions(
                        boolop.region_of_rings(s_rings),
                        boolop.region_of_rings(c_rings),
                        "inter",
                    )
                    inter_area = boolop.region_area(reg)
                    if inter_area <= 0.0:
                        continue
                    inter = _encode_region(reg)
                    nvert = boolop.region_nvert(reg)
                if how == "erase":
                    subj_area = abs(ring_area(_ensure_ccw(s_rings[0]))) - sum(
                        abs(ring_area(_ensure_ccw(h))) for h in s_rings[1:]
                    )
                    area = subj_area - inter_area
                else:
                    area = inter_area
                rows.append((ids_a[i], ids_b[i], inter, float(area), nvert))
            yield pd.DataFrame(
                rows,
                columns=["id_a", "id_b", "inter_wkb", "area", "nvert"],
            )

    return cand.mapInPandas(
        refine,
        schema=(
            "id_a string, id_b string, inter_wkb binary, "
            "area double, nvert bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Greiner–Hormann-backed pairwise ops + per-feature folds


def overlay_pairs(
    subject: DataFrame,
    clip: DataFrame,
    how: str = "union",
    zoom: int = OVERLAY_ZOOM,
    broadcast_clip: bool = True,
) -> DataFrame:
    """Pairwise boolean overlay emitting the stitched geometry per
    genuinely overlapping pair. how: 'intersection' | 'union' |
    'symdiff'. Columns: (id_a, id_b, out_wkb, area, nvert, n_parts).
    Unlike overlay(), every pair routes through the Greiner–Hormann
    region engine (concave / holed inputs welcome on BOTH sides)."""
    if how not in ("intersection", "union", "symdiff"):
        raise ValueError(how)
    cand = _candidates(subject, clip, zoom, broadcast_clip)
    # the refine below is ~1 ms of Python per pair; AQE sees a tiny
    # shuffle (candidate pairs are a few columns) and coalesces it to
    # one partition, serializing the expensive stage. An explicit
    # partition count pins the fan-out (AQE never coalesces a
    # user-numbered repartition).
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a_codes, a_uniq = pd.factorize(pdf["wkb_a"])
            b_codes, b_uniq = pd.factorize(pdf["wkb_b"])
            a_regs = [_region_of_wkb(g) for g in a_uniq]
            b_regs = [_region_of_wkb(g) for g in b_uniq]
            # axis-aligned-rect inputs skip the GH overlap pre-test:
            # the candidate stage's strict envelope prefilter IS the
            # exact area>0 test for rects (one GH call per pair
            # instead of two — the dominant case in box layers)
            a_isrect = np.array([_region_is_rect(r) for r in a_regs])
            b_isrect = np.array([_region_is_rect(r) for r in b_regs])
            ids_a = pdf["id_a"].to_numpy()
            ids_b = pdf["id_b"].to_numpy()
            rows = []
            for i in range(len(pdf)):
                A = a_regs[a_codes[i]]
                B = b_regs[b_codes[i]]
                rect_pair = a_isrect[a_codes[i]] and b_isrect[b_codes[i]]
                if how == "intersection":
                    out = boolop.boolean_regions(A, B, "inter")
                    if boolop.region_area(out) <= 0.0:
                        continue
                else:
                    if not rect_pair:
                        inter = boolop.boolean_regions(A, B, "inter")
                        if boolop.region_area(inter) <= 0.0:
                            continue
                    out = boolop.boolean_regions(A, B, how)
                rows.append(
                    (
                        ids_a[i],
                        ids_b[i],
                        _encode_region(out),
                        float(boolop.region_area(out)),
                        int(boolop.region_nvert(out)),
                        len(out),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id_a", "id_b", "out_wkb", "area", "nvert", "n_parts"],
            )

    return cand.mapInPandas(
        refine,
        schema=(
            "id_a string, id_b string, out_wkb binary, area double, "
            "nvert bigint, n_parts bigint"
        ),
    )


def overlay_fold(
    feats: DataFrame,
    method: DataFrame,
    how: str = "erase",
    zoom: int = OVERLAY_ZOOM,
    broadcast_method: bool = True,
) -> DataFrame:
    """Per-feature layer-algebra fold against the union of ALL
    intersecting method features:

    - 'erase': A \\ union(B_i) (OGRLayer::Erase :4658) — also the
      leftover term of Union (:2679), SymDifference (:3204),
      Identity (:3619) and Update (:4024);
    - 'clip':  A ∩ union(B_i) (::Clip :4361), emitted as interior-
      disjoint pieces A∩B_i∖B_1..i-1 packed into one multipolygon.

    feats: (id_a, wkb_a); method: (id_b, wkb_b). For 'erase', features
    with no method candidate pass through whole; 'clip' drops them.
    One row per input feature: (id_a, out_wkb, area, n_parts, nvert)
    — out_wkb NULL and area 0.0 when fully consumed (row kept so the
    disjoint-method SQL oracle can mirror rows exactly).

    Scale shape: the candidate pair list (cell join + envelope
    prefilter) is grouped per feature; partner lists are bounded by
    cell co-occurrence, so no feature ever sees more geometry than its
    own overlap degree. The subtraction fold runs in one Arrow stage.
    """
    if how not in ("erase", "clip"):
        raise ValueError(how)
    cand = _candidates(feats, method, zoom, broadcast_method).select(
        "id_a", "wkb_b"
    )
    partners = cand.groupBy("id_a").agg(F.collect_list("wkb_b").alias("_bs"))
    join_type = "left" if how == "erase" else "inner"
    src = feats.join(partners, "id_a", join_type)

    def fold(batches):
        for pdf in batches:
            rows = []
            for id_a, wa, bs in zip(pdf["id_a"], pdf["wkb_a"], pdf["_bs"]):
                A = _region_of_wkb(wa)
                if bs is None or len(bs) == 0:
                    out = A
                elif how == "erase":
                    out = A
                    for ob in bs:
                        out = boolop.boolean_regions(
                            out, _region_of_wkb(ob), "diff"
                        )
                        if not out:
                            break
                else:  # clip: pieces A∩B_i minus previously-used B's
                    out = []
                    prior = []
                    for ob in bs:
                        piece = boolop.boolean_regions(
                            A, _region_of_wkb(ob), "inter"
                        )
                        for pb in prior:
                            piece = boolop.boolean_regions(
                                piece, _region_of_wkb(pb), "diff"
                            )
                        out.extend(piece)
                        prior.append(ob)
                rows.append(
                    (
                        id_a,
                        _encode_region(out),
                        float(boolop.region_area(out)),
                        len(out),
                        int(boolop.region_nvert(out)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id_a", "out_wkb", "area", "n_parts", "nvert"]
            )

    return src.mapInPandas(
        fold,
        schema=(
            "id_a string, out_wkb binary, area double, n_parts bigint, "
            "nvert bigint"
        ),
    )


# ---------------------------------------------------------------------------
# driver-gate helpers: box-kind subset with closed-form SQL oracles


def overlay_boxes_query(polys: DataFrame) -> DataFrame:
    """Intersection of box-kind polygons with the hot-box cluster
    (dense-overlap stress), integer-scaled areas."""
    boxes = polys.where(F.col("kind").isin("box", "hot_box")).select(
        F.col("poly_id").alias("id_a"), F.col("geom_wkb").alias("wkb_a")
    )
    hot = polys.where(F.col("kind") == "hot_box").select(
        F.col("poly_id").alias("id_b"), F.col("geom_wkb").alias("wkb_b")
    )
    out = overlay(boxes, hot, "intersection")
    return out.where(F.col("id_a") != F.col("id_b")).select(
        "id_a",
        "id_b",
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias("area_u"),
        "nvert",
    )


def oracle_overlay_boxes(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    ids = "concat('poly', lpad(cast({j} as varchar), 4, '0'))"
    return f"""
WITH p AS ({p}),
a AS (SELECT j, cx, cy, hw, hh FROM p WHERE kind IN ('box', 'hot_box')),
b AS (SELECT j, cx, cy, hw, hh FROM p WHERE kind = 'hot_box'),
pr AS (SELECT a.j AS ja, b.j AS jb,
       least(a.cx + a.hw, b.cx + b.hw) - greatest(a.cx - a.hw, b.cx - b.hw) AS ox,
       least(a.cy + a.hh, b.cy + b.hh) - greatest(a.cy - a.hh, b.cy - b.hh) AS oy
       FROM a JOIN b ON a.j <> b.j
       AND a.cx - a.hw < b.cx + b.hw AND b.cx - b.hw < a.cx + a.hw
       AND a.cy - a.hh < b.cy + b.hh AND b.cy - b.hh < a.cy + a.hh)
SELECT {ids.format(j='ja')} AS id_a, {ids.format(j='jb')} AS id_b,
       cast(floor(ox * oy * 1000000.0E0 + 5.0E-4) as bigint) AS area_u,
       4 AS nvert
FROM pr WHERE ox > 0.0E0 AND oy > 0.0E0
"""


def _flr(expr: str) -> str:
    return f"cast(floor(({expr}) * 1000000.0E0 + 5.0E-4) as bigint)"


_RECT_AB = """
a AS (SELECT j, cx - hw AS ax0, cx + hw AS ax1, cy - hh AS ay0,
             cy + hh AS ay1, 4.0E0 * hw * hh AS aarea
      FROM p WHERE kind IN ('box', 'hot_box')),
b AS (SELECT j, cx - hw AS bx0, cx + hw AS bx1, cy - hh AS by0,
             cy + hh AS by1, 4.0E0 * hw * hh AS barea
      FROM p WHERE kind = 'hot_box'),
pr AS (SELECT a.j AS ja, b.j AS jb, ax0, ax1, ay0, ay1, bx0, bx1, by0,
              by1, aarea, barea,
              least(ax1, bx1) - greatest(ax0, bx0) AS ox,
              least(ay1, by1) - greatest(ay0, by0) AS oy
       FROM a JOIN b ON a.j <> b.j
       AND ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1)
"""

_IDS = "concat('poly', lpad(cast({j} as varchar), 4, '0'))"


def _corners_in_sql(pa: str, pb: str) -> str:
    """# of pa-rect corners strictly inside pb-rect (SQL int expr)."""
    terms = []
    for px, py in (
        (f"{pa}x0", f"{pa}y0"),
        (f"{pa}x1", f"{pa}y0"),
        (f"{pa}x1", f"{pa}y1"),
        (f"{pa}x0", f"{pa}y1"),
    ):
        terms.append(
            f"(CASE WHEN {px} > {pb}x0 AND {px} < {pb}x1 "
            f"AND {py} > {pb}y0 AND {py} < {pb}y1 THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _crossings_sql() -> str:
    """# of boundary crossing points of two rects in general position:
    horizontal a-edges x vertical b-edges plus the mirror."""
    terms = []
    for ay in ("ay0", "ay1"):
        for bx in ("bx0", "bx1"):
            terms.append(
                f"(CASE WHEN ax0 < {bx} AND {bx} < ax1 "
                f"AND by0 < {ay} AND {ay} < by1 THEN 1 ELSE 0 END)"
            )
    for ax_ in ("ax0", "ax1"):
        for by in ("by0", "by1"):
            terms.append(
                f"(CASE WHEN bx0 < {ax_} AND {ax_} < bx1 "
                f"AND ay0 < {by} AND {by} < ay1 THEN 1 ELSE 0 END)"
            )
    return "(" + " + ".join(terms) + ")"


def _parts_diff_sql(pa: str, pb: str) -> str:
    """# of connected parts of rect_a \\ rect_b for overlapping rects:
    0 when consumed, 2 when b cuts a band strictly through a, else 1."""
    return (
        f"(CASE WHEN {_corners_in_sql(pa, pb)} = 4 THEN 0 "
        f"WHEN {pb}x0 < {pa}x0 AND {pb}x1 > {pa}x1 "
        f"AND {pb}y0 > {pa}y0 AND {pb}y1 < {pa}y1 THEN 2 "
        f"WHEN {pb}y0 < {pa}y0 AND {pb}y1 > {pa}y1 "
        f"AND {pb}x0 > {pa}x0 AND {pb}x1 < {pa}x1 THEN 2 "
        f"ELSE 1 END)"
    )


def _boxes_side(polys: DataFrame, side: str, kinds) -> DataFrame:
    return polys.where(F.col("kind").isin(*kinds)).select(
        F.col("poly_id").alias(f"id_{side}"),
        F.col("geom_wkb").alias(f"wkb_{side}"),
    )


def overlay_union_pairs_query(polys: DataFrame) -> DataFrame:
    """Pairwise Union geometries (boxes x hot cluster): the stitched
    GH union ring's area, vertex count and part count, all replayed
    closed-form by the rect-algebra oracle (corner containment +
    boundary crossings)."""
    out = overlay_pairs(
        _boxes_side(polys, "a", ("box", "hot_box")),
        _boxes_side(polys, "b", ("hot_box",)),
        "union",
    )
    return out.where(F.col("id_a") != F.col("id_b")).select(
        "id_a",
        "id_b",
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
        "nvert",
        "n_parts",
    )


def oracle_overlay_union_pairs(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    nvert = (
        f"(4 - {_corners_in_sql('a', 'b')}) + (4 - {_corners_in_sql('b', 'a')})"
        f" + {_crossings_sql()}"
    )
    return f"""
WITH p AS ({p}), {_RECT_AB}
SELECT {_IDS.format(j='ja')} AS id_a, {_IDS.format(j='jb')} AS id_b,
       {_flr('aarea + barea - ox * oy')} AS area_u,
       cast({nvert} as bigint) AS nvert,
       cast(1 as bigint) AS n_parts
FROM pr
"""


def overlay_symdiff_query(polys: DataFrame) -> DataFrame:
    """Pairwise SymDifference (A\\B parts + B\\A parts as one
    multipolygon feature pair): area, vertex count (8 + 2*crossings
    for rects) and part count (band-cut case analysis)."""
    out = overlay_pairs(
        _boxes_side(polys, "a", ("box", "hot_box")),
        _boxes_side(polys, "b", ("hot_box",)),
        "symdiff",
    )
    return out.where(F.col("id_a") != F.col("id_b")).select(
        "id_a",
        "id_b",
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
        "nvert",
        "n_parts",
    )


def oracle_overlay_symdiff(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    return f"""
WITH p AS ({p}), {_RECT_AB}
SELECT {_IDS.format(j='ja')} AS id_a, {_IDS.format(j='jb')} AS id_b,
       {_flr('aarea + barea - 2.0E0 * ox * oy')} AS area_u,
       cast(8 + 2 * {_crossings_sql()} as bigint) AS nvert,
       cast({_parts_diff_sql('a', 'b')} + {_parts_diff_sql('b', 'a')}
            as bigint) AS n_parts
FROM pr
"""


def overlay_concave_clip_query(polys: DataFrame) -> DataFrame:
    """Intersection with CONCAVE and HOLED clip polygons — the
    Greiner–Hormann path the convex-only round-2 engine refused. The
    clip layer is the j%8==7 shapes re-centered onto box j-6
    (synth.concave_clips_pdf) so overlaps exist at oracle scale; the
    oracle decomposes each clip into rect algebra (concave 'C' = big
    rect minus right-open notch; holed = big rect minus inner)."""
    from .. import synth

    m = polys.selectExpr("max(j)").first()[0] + 1
    clips = synth.concave_clips_df(polys.sparkSession, int(m)).select(
        F.col("clip_id").alias("id_b"), F.col("geom_wkb").alias("wkb_b")
    )
    out = overlay_pairs(
        _boxes_side(polys, "a", ("box", "hot_box")), clips, "intersection"
    )
    return out.select(
        "id_a",
        "id_b",
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
    )


def oracle_overlay_concave_clip(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    # clip center re-based onto box j-6 (synth.concave_clips_pdf);
    # notch/inner rect per clip kind relative to the new center:
    # concave: [ncx-0.4hw, ncx+hw] x [ncy-0.6hh, ncy+0.6hh] (right-open C)
    # holed:   [ncx-0.4hw, ncx+0.4hw] x [ncy-0.4hh, ncy+0.4hh]
    return f"""
WITH p AS ({p}),
a AS (SELECT j, cx - hw AS ax0, cx + hw AS ax1, cy - hh AS ay0,
             cy + hh AS ay1 FROM p WHERE kind IN ('box', 'hot_box')),
ctr AS (SELECT q.j, q.kind, q.hw, q.hh,
               t.cx + 0.3E0 * t.hw AS ncx, t.cy - 0.2E0 * t.hh AS ncy
        FROM p q JOIN p t ON t.j = q.j - 6
        WHERE q.kind IN ('concave', 'holed')),
c AS (SELECT j, ncx - hw AS bx0, ncx + hw AS bx1, ncy - hh AS by0,
             ncy + hh AS by1,
             ncx - 0.4E0 * hw AS nx0,
             CASE WHEN kind = 'concave' THEN ncx + hw
                  ELSE ncx + 0.4E0 * hw END AS nx1,
             CASE WHEN kind = 'concave' THEN ncy - 0.6E0 * hh
                  ELSE ncy - 0.4E0 * hh END AS ny0,
             CASE WHEN kind = 'concave' THEN ncy + 0.6E0 * hh
                  ELSE ncy + 0.4E0 * hh END AS ny1
      FROM ctr),
pr AS (SELECT a.j AS ja, c.j AS jb,
       least(ax1, bx1) - greatest(ax0, bx0) AS wb,
       least(ay1, by1) - greatest(ay0, by0) AS hb,
       greatest(least(ax1, nx1) - greatest(ax0, nx0), 0.0E0)
         * greatest(least(ay1, ny1) - greatest(ay0, ny0), 0.0E0) AS i_cut
       FROM a JOIN c ON ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1)
SELECT concat('poly', lpad(cast(ja as varchar), 4, '0')) AS id_a,
       concat('clip', lpad(cast(jb as varchar), 4, '0')) AS id_b,
       {_flr('wb * hb - i_cut')} AS area_u
FROM pr WHERE wb * hb - i_cut > 0.0E0
"""


def _lattice_method(spark) -> DataFrame:
    from .. import synth

    return synth.lattice_df(spark).select(
        F.col("latt_id").alias("id_b"), F.col("geom_wkb").alias("wkb_b")
    )


def overlay_identity_query(polys: DataFrame) -> DataFrame:
    """OGRLayer::Identity (ogrlayer.cpp:3619) against the disjoint
    lattice method layer: A∩B pieces per overlapping pair plus one
    leftover row per input feature (A minus the union of ALL its
    method partners — the geometric fold; id_b='__left__'). The
    disjoint method layer makes the fold exactly summable in SQL."""
    boxes = _boxes_side(polys, "a", ("box", "hot_box"))
    latt = _lattice_method(polys.sparkSession)
    pieces = overlay(boxes, latt, "intersection").select(
        "id_a",
        "id_b",
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
    )
    left = overlay_fold(boxes, latt, "erase").select(
        "id_a",
        F.lit("__left__").alias("id_b"),
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
    )
    return pieces.unionAll(left)


_LATT_PIECES = """
a AS (SELECT j, cx - hw AS ax0, cx + hw AS ax1, cy - hh AS ay0,
             cy + hh AS ay1,
             ((cx + hw) - (cx - hw)) * ((cy + hh) - (cy - hh)) AS aarea
      FROM p WHERE kind IN ('box', 'hot_box')),
pc AS (SELECT a.j, l.latt_id,
       (least(ax1, lx1) - greatest(ax0, lx0))
         * (least(ay1, ly1) - greatest(ay0, ly0)) AS ia
       FROM a JOIN l ON ax0 < lx1 AND lx0 < ax1 AND ay0 < ly1 AND ly0 < ay1)
"""


def oracle_overlay_identity(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    latt = synth.lattice_cte("duckdb")
    return f"""
WITH p AS ({p}), l AS ({latt}), {_LATT_PIECES}
SELECT {_IDS.format(j='j')} AS id_a, latt_id AS id_b, {_flr('ia')} AS area_u
FROM pc
UNION ALL
SELECT {_IDS.format(j='a.j')} AS id_a, '__left__' AS id_b,
       {_flr('aarea - coalesce(s.tot, 0.0E0)')} AS area_u
FROM a LEFT JOIN (SELECT j, sum(ia) AS tot FROM pc GROUP BY j) s
ON a.j = s.j
"""


def overlay_update_query(polys: DataFrame) -> DataFrame:
    """OGRLayer::Update (ogrlayer.cpp:4024): method features whole
    plus input-minus-method leftovers (attributes from input; rows
    with fully-consumed geometry kept with area 0)."""
    boxes = _boxes_side(polys, "a", ("box", "hot_box"))
    latt = _lattice_method(polys.sparkSession)

    @F.pandas_udf("double")
    def warea(s: pd.Series) -> pd.Series:
        return pd.Series(
            [boolop.region_area(_region_of_wkb(b)) for b in s]
        )

    method_rows = latt.withColumn("_a", warea("wkb_b")).select(
        F.col("id_b").alias("id"),
        F.lit("method").alias("src"),
        F.expr(
            "cast(floor(_a * 1000000.0E0 + 5.0E-4) as bigint)"
        ).alias("area_u"),
    )
    left = overlay_fold(boxes, latt, "erase").select(
        F.col("id_a").alias("id"),
        F.lit("input").alias("src"),
        F.expr("cast(floor(area * 1000000.0E0 + 5.0E-4) as bigint)").alias(
            "area_u"
        ),
    )
    return method_rows.unionAll(left)


def oracle_overlay_update(m: int) -> str:
    from .. import synth

    p = synth.polygons_sql_cte(m, "duckdb")
    latt = synth.lattice_cte("duckdb")
    return f"""
WITH p AS ({p}), l AS ({latt}), {_LATT_PIECES}
SELECT latt_id AS id, 'method' AS src,
       {_flr('(lx1 - lx0) * (ly1 - ly0)')} AS area_u
FROM l
UNION ALL
SELECT {_IDS.format(j='a.j')} AS id, 'input' AS src,
       {_flr('aarea - coalesce(s.tot, 0.0E0)')} AS area_u
FROM a LEFT JOIN (SELECT j, sum(ia) AS tot FROM pc GROUP BY j) s
ON a.j = s.j
"""


ERASE_RECT = (-50.0, -30.0, 40.0, 45.0)  # (x0, y0, x1, y1)


def overlay_erase_rect_query(polys: DataFrame) -> DataFrame:
    """Erase a fixed rectangle from every box-kind polygon (the
    ogr2ogr -clipsrc complement): remaining area per polygon. True
    Erase semantics — subjects that miss the rectangle survive whole,
    via a left join of the pairwise overlay back onto the layer."""
    x0, y0, x1, y1 = ERASE_RECT
    spark = polys.sparkSession
    rect = wkb.encode_polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])
    clip = spark.createDataFrame(
        [("rect", bytearray(rect))], "id_b string, wkb_b binary"
    )
    boxes = polys.where(F.col("kind").isin("box", "hot_box")).select(
        F.col("poly_id").alias("id_a"), F.col("geom_wkb").alias("wkb_a")
    )

    @F.pandas_udf("double")
    def subj_area(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            rings = [_open_ring(r) for r in wkb.polygon_rings(bytes(b))]
            a = abs(ring_area(_ensure_ccw(rings[0]))) - sum(
                abs(ring_area(_ensure_ccw(h))) for h in rings[1:]
            )
            out.append(a)
        return pd.Series(out)

    inter = overlay(boxes, clip, "intersection").select(
        "id_a", F.col("area").alias("inter_area")
    )
    return (
        boxes.withColumn("full_area", subj_area("wkb_a"))
        .join(inter, "id_a", "left")
        .selectExpr(
            "id_a",
            "cast(floor((full_area - coalesce(inter_area, 0.0E0)) "
            "* 1000000.0E0 + 5.0E-4) as bigint) AS left_u",
        )
    )


def oracle_overlay_erase_rect(m: int) -> str:
    from .. import synth

    x0, y0, x1, y1 = ERASE_RECT
    fl = synth.flit
    p = synth.polygons_sql_cte(m, "duckdb")
    return f"""
WITH p AS ({p}),
a AS (SELECT j, cx, cy, hw, hh FROM p WHERE kind IN ('box', 'hot_box')),
pr AS (SELECT j,
       least(cx + hw, {fl(x1)}) - greatest(cx - hw, {fl(x0)}) AS ox,
       least(cy + hh, {fl(y1)}) - greatest(cy - hh, {fl(y0)}) AS oy,
       4.0E0 * hw * hh AS full_area
       FROM a)
SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS id_a,
       cast(floor((full_area -
            CASE WHEN ox > 0.0E0 AND oy > 0.0E0 THEN ox * oy ELSE 0.0E0 END)
            * 1000000.0E0 + 5.0E-4) as bigint) AS left_u
FROM pr
"""
