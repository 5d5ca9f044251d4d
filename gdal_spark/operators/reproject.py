"""General SRS reprojection operators (gdalwarp -t_srs EPSG:326xx).

Fills the round-1 gap: the engine previously reprojected only through
the closed-form 4326<->3857 pair. These operators route through the
gdal_spark.srs transformer chain (Krueger-series UTM, the math PROJ's
tmerc uses), so any 4326 / 3857 / UTM pair works.

Two driver-gated queries:

- ``utm_corners`` — per-image zone selection + forward TM of the
  footprint corners. Pure Catalyst: the Krueger forward series is
  emitted as a SQL expression (srs.tm_forward_sql) built only from
  functions whole-stage codegen supports (sin/cos/ln/exp/sqrt/atan2),
  so at 100 TB this is a map-only JVM stage with zero Python. The
  DuckDB oracle runs the *same* fragment; outputs are quantized to
  decimeters so the few-ulp libm drift between engines cannot flip a
  floor boundary in practice.

- ``warp_reproject_utm`` — the full pixel path: per-image suggested
  output grid in the image's UTM zone (corner-projected bbox, common
  resolution, GDALSuggestedWarpOutput semantics,
  alg/gdaltransformer.cpp:407), inverse-chain per dst pixel center,
  nearest resample, GDAL checksum. Oracle replays the whole chain in
  SQL with the Newton-unrolled inverse (srs.tm_inverse_sql_cte).

Reference semantics: apps/gdalwarp_lib.cpp:2475 (per-dataset warp
loop), alg/gdaltransformer.cpp:1756 (GenImgProj chain),
ogr/ogrct.cpp:1590 (CRS<->CRS leg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs, resample, srs, synth


# shared dual-dialect SQL fragments (parse identically in Spark SQL
# and DuckDB) -------------------------------------------------------------

ZONE_SQL = (
    "greatest(1, least(60, cast(floor((lon + 180.0E0) / 6.0E0) as bigint) + 1))"
)
LON0_SQL = "(cast(zone as double) * 6.0E0 - 183.0E0)"
FN_SQL = "(CASE WHEN lat < 0.0E0 THEN 10000000.0E0 ELSE 0.0E0 END)"
# image footprint: res = 0.1/w deg, so lon span is 0.1 deg and lat
# span 0.1*h/w deg (synth geotransform convention)
LON2_SQL = "(lon + 0.1E0)"
LAT2_SQL = "(lat - 0.1E0 * cast(h as double) / cast(w as double))"


def _corner_exprs() -> list[tuple[str, str, str]]:
    """[(suffix, easting_sql, northing_sql_with_fn)] for the 4 footprint
    corners, in (tl, tr, bl, br) order."""
    out = []
    for suffix, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e, n = srs.tm_forward_sql(lon_e, lat_e, "lon0")
        out.append((suffix, e, f"({n} + fn)"))
    return out


def _tm_forward_staged(base: DataFrame, corners) -> DataFrame:
    """Krueger forward for several corners as STAGED Catalyst columns
    (named intermediates + native hyperbolics) — the single-expression
    SQL twin repeats each subterm textually and costs seconds of
    analysis; this keeps the tree linear in the series order. Expects
    lon0/fn columns; corners = [(suffix, lon_expr, lat_expr)]."""
    from .. import synth as _synth

    e = _synth.flit(srs.E)
    ka = _synth.flit(srs.K0 * srs.A_CAP)
    fe = _synth.flit(srs.FE)
    df = base
    for sfx, lon_e, lat_e in corners:
        df = df.selectExpr(
            "*",
            f"radians(({lon_e}) - lon0) AS lam_{sfx}",
            f"sin(radians({lat_e})) AS s_{sfx}",
        ).selectExpr(
            "*",
            f"sinh(atanh(s_{sfx}) - {e} * atanh({e} * s_{sfx})) AS t_{sfx}",
            f"cos(lam_{sfx}) AS cl_{sfx}",
        ).selectExpr(
            "*",
            f"atan2(t_{sfx}, cl_{sfx}) AS xip_{sfx}",
            f"asinh(sin(lam_{sfx}) / sqrt(t_{sfx} * t_{sfx} "
            f"+ cl_{sfx} * cl_{sfx})) AS etap_{sfx}",
        )
        xi_terms = [f"xip_{sfx}"]
        eta_terms = [f"etap_{sfx}"]
        for j, a in enumerate(srs.ALPHA, start=1):
            aj = _synth.flit(a)
            xi_terms.append(
                f"{aj} * sin({2 * j}.0E0 * xip_{sfx}) "
                f"* cosh({2 * j}.0E0 * etap_{sfx})"
            )
            eta_terms.append(
                f"{aj} * cos({2 * j}.0E0 * xip_{sfx}) "
                f"* sinh({2 * j}.0E0 * etap_{sfx})"
            )
        df = df.selectExpr(
            "*",
            f"{fe} + {ka} * ({' + '.join(eta_terms)}) AS e_{sfx}",
            f"{ka} * ({' + '.join(xi_terms)}) + fn AS n_{sfx}",
        ).drop(
            f"lam_{sfx}", f"s_{sfx}", f"t_{sfx}", f"cl_{sfx}",
            f"xip_{sfx}", f"etap_{sfx}",
        )
    return df


def utm_corners(images: DataFrame) -> DataFrame:
    """Transformer-chain query: UTM zone + dm-quantized corner
    coordinates of every image footprint. No UDFs — the whole Krueger
    forward series runs as Catalyst expressions (JVM codegen), staged
    through named intermediate columns."""
    base = images.selectExpr(
        "image_id",
        "lon",
        "lat",
        "w",
        "h",
        f"{ZONE_SQL} AS zone",
    ).selectExpr(
        "image_id", "lon", "lat", "w", "h", "zone",
        f"{LON0_SQL} AS lon0",
        f"{FN_SQL} AS fn",
    )
    corners = [
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ]
    df = _tm_forward_staged(base, corners)
    exprs = ["image_id", "zone"]
    for sfx, _, _ in corners:
        exprs.append(f"cast(floor(e_{sfx} * 10.0E0) as bigint) AS e_{sfx}_dm")
        exprs.append(f"cast(floor(n_{sfx} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return df.selectExpr(*exprs)


def oracle_utm_corners(n: int) -> str:
    parts = []
    for suffix, e_sql, n_sql in _corner_exprs():
        parts.append(f"cast(floor({e_sql} * 10.0E0) as bigint) AS e_{suffix}_dm")
        parts.append(f"cast(floor({n_sql} * 10.0E0) as bigint) AS n_{suffix}_dm")
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}), "
        f"z AS (SELECT image_id, lon, lat, w, h, {ZONE_SQL} AS zone FROM img), "
        f"g AS (SELECT image_id, lon, lat, w, h, zone, {LON0_SQL} AS lon0, "
        f"{FN_SQL} AS fn FROM z) "
        f"SELECT image_id, zone, {', '.join(parts)} FROM g"
    )


# ---------------------------------------------------------------------------
# Lambert Conformal Conic corners (second projection family; EPSG
# method 9802 / SRS_PT_LAMBERT_CONFORMAL_CONIC_2SP). Same shape as
# utm_corners: pure Catalyst forward (sin/cos/tan/power — all inside
# whole-stage codegen), dm quantization, DuckDB oracle running the
# SAME dual-dialect fragment.


def lcc_corners(images: DataFrame, epsg: int = 2154) -> DataFrame:
    """Footprint corners of every image in an LCC CRS (default
    RGF93 / Lambert-93). Map-only JVM stage, zero Python."""
    p = srs.LCC_REGISTRY[epsg]
    df = images.selectExpr("image_id", "lon", "lat", "w", "h")
    corners = [
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ]
    exprs = ["image_id"]
    for sfx, lon_e, lat_e in corners:
        e_sql, n_sql = srs.lcc_forward_sql(lon_e, lat_e, p)
        df = df.selectExpr("*", f"{e_sql} AS e_{sfx}", f"{n_sql} AS n_{sfx}")
        exprs.append(f"cast(floor(e_{sfx} * 10.0E0) as bigint) AS e_{sfx}_dm")
        exprs.append(f"cast(floor(n_{sfx} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return df.selectExpr(*exprs)


def oracle_lcc_corners(n: int, epsg: int = 2154) -> str:
    p = srs.LCC_REGISTRY[epsg]
    parts = []
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.lcc_forward_sql(lon_e, lat_e, p)
        parts.append(f"cast(floor({e_sql} * 10.0E0) as bigint) AS e_{sfx}_dm")
        parts.append(f"cast(floor({n_sql} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return (
        f"SELECT image_id, {', '.join(parts)} "
        f"FROM ({synth.images_cte(n, 'duckdb')})"
    )


# ---------------------------------------------------------------------------
# Albers Equal Area corners (third projection family; EPSG method
# 9822 / SRS_PT_ALBERS_CONIC_EQUAL_AREA). Same pure-Catalyst shape.


def aea_corners(images: DataFrame, epsg: int = 5070) -> DataFrame:
    """Footprint corners of every image in an Albers CRS (default
    NAD83 / Conus Albers). Map-only JVM stage, zero Python."""
    p = srs.AEA_REGISTRY[epsg]
    df = images.selectExpr("image_id", "lon", "lat", "w", "h")
    exprs = ["image_id"]
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.aea_forward_sql(lon_e, lat_e, p)
        df = df.selectExpr("*", f"{e_sql} AS e_{sfx}", f"{n_sql} AS n_{sfx}")
        exprs.append(f"cast(floor(e_{sfx} * 10.0E0) as bigint) AS e_{sfx}_dm")
        exprs.append(f"cast(floor(n_{sfx} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return df.selectExpr(*exprs)


def oracle_aea_corners(n: int, epsg: int = 5070) -> str:
    p = srs.AEA_REGISTRY[epsg]
    parts = []
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.aea_forward_sql(lon_e, lat_e, p)
        parts.append(f"cast(floor({e_sql} * 10.0E0) as bigint) AS e_{sfx}_dm")
        parts.append(f"cast(floor({n_sql} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return (
        f"SELECT image_id, {', '.join(parts)} "
        f"FROM ({synth.images_cte(n, 'duckdb')})"
    )


# ---------------------------------------------------------------------------
# Polar Stereographic: corners (pure Catalyst) + the full pixel warp
# path (fourth projection family; EPSG method 9829 /
# SRS_PT_POLAR_STEREOGRAPHIC). The projection is defined for every
# synth latitude, so no service-area filter is needed.

DST_W = 32  # suggested-output long edge in pixels (kept small: the
# oracle replays every dst pixel through the unrolled inverse)


def _suggest_grid_ps(lon, lat, w, h, p, dst_w):
    """Suggested output grid in the PS CRS (same bounded-size
    GDALSuggestedWarpOutput shape as _suggest_grid_lcc)."""
    res = 0.1 / w
    cx = np.array([lon, lon + w * res, lon, lon + w * res])
    cy = np.array([lat, lat, lat - h * res, lat - h * res])
    ex, ny = srs.ps_forward(cx, cy, p)
    minx, maxx = ex.min(), ex.max()
    miny, maxy = ny.min(), ny.max()
    dres = max(maxx - minx, maxy - miny) / dst_w
    w_eff = max(1, int(np.floor((maxx - minx) / dres + 0.5)))
    h_eff = max(1, int(np.floor((maxy - miny) / dres + 0.5)))
    return (minx, dres, 0.0, maxy, 0.0, -dres), h_eff, w_eff


def _reproject_ps_iter(batches, epsg: int, dst_w: int, alg: str):
    p = srs.PS_REGISTRY[epsg]
    for pdf in batches:
        rows = []
        for image_id, payload, lon, lat, w, h in zip(
            pdf["image_id"], pdf["bytes"], pdf["lon"], pdf["lat"],
            pdf["w"], pdf["h"],
        ):
            arr = codecs.decode_image(bytes(payload))
            lon, lat = float(lon), float(lat)
            w, h = int(w), int(h)
            res = 0.1 / w
            src_gt = (lon, res, 0.0, lat, 0.0, -res)
            dst_gt, dst_h, dst_w_eff = _suggest_grid_ps(
                lon, lat, w, h, p, dst_w
            )

            def transform(gx, gy, p=p):
                return srs.ps_inverse(gx, gy, p)

            warped = resample.warp_image(
                arr, src_gt, dst_gt, (dst_h, dst_w_eff), alg, transform
            )
            from .stats import gdal_checksum

            for c in range(warped.shape[2]):
                rows.append((image_id, c, gdal_checksum(warped[:, :, c])))
        yield pd.DataFrame(rows, columns=["image_id", "channel", "cks"])


def reproject_ps(
    images: DataFrame, epsg: int = 3031, dst_w: int = DST_W,
    alg: str = "near",
) -> DataFrame:
    """Warp images onto a suggested polar-stereographic grid;
    per-channel GDAL checksums. One mapInPandas stage, zero shuffle."""
    return images.select("image_id", "bytes", "lon", "lat", "w", "h").mapInPandas(
        lambda it: _reproject_ps_iter(it, epsg, dst_w, alg),
        schema="image_id string, channel bigint, cks bigint",
    )


def oracle_reproject_ps(
    n: int, max_i: int, epsg: int = 3031, dst_w: int = DST_W
) -> str:
    """Replays corners -> bbox -> grid -> per-pixel PS inverse
    (conformal-latitude fixed point unrolled) -> nearest src pixel ->
    checksum, over the same hot-cell subset as the LCC pixel path."""
    p = srs.PS_REGISTRY[epsg]
    corner_parts = []
    for suffix, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.ps_forward_sql(lon_e, lat_e, p)
        corner_parts.append(f"{e_sql} AS e_{suffix}")
        corner_parts.append(f"{n_sql} AS n_{suffix}")
    keep = "i, image_id, ilon, ilat, w, h, fmt, xd, yd, dw, dh"
    inv_cte = srs.ps_inverse_sql_cte("ec", "nc", p, "px2", keep)
    prime = (
        "(CASE ((yd * dw + xd) % 11) "
        "WHEN 0 THEN 7 WHEN 1 THEN 11 WHEN 2 THEN 13 WHEN 3 THEN 17 "
        "WHEN 4 THEN 19 WHEN 5 THEN 23 WHEN 6 THEN 29 WHEN 7 THEN 31 "
        "WHEN 8 THEN 37 WHEN 9 THEN 41 ELSE 43 END)"
    )
    val = synth.pixel_val_sql()
    return f"""
WITH img AS (SELECT i, image_id, lon AS ilon, lat AS ilat, lon, lat, w, h, fmt
             FROM ({synth.images_cte(n, 'duckdb')})
             WHERE i % 4 = 0 AND i < {max_i}),
crn AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
        {', '.join(corner_parts)} FROM img),
bbox AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
         least(e_tl, e_tr, e_bl, e_br) AS minx,
         greatest(e_tl, e_tr, e_bl, e_br) AS maxx,
         least(n_tl, n_tr, n_bl, n_br) AS miny,
         greatest(n_tl, n_tr, n_bl, n_br) AS maxy FROM crn),
grd AS (SELECT bbox.*,
        greatest(maxx - minx, maxy - miny) / {dst_w}.0E0 AS dres FROM bbox),
grd2 AS (SELECT grd.*,
         greatest(1, cast(floor((maxx - minx) / dres + 0.5E0) as bigint)) AS dw,
         greatest(1, cast(floor((maxy - miny) / dres + 0.5E0) as bigint)) AS dh
         FROM grd),
px2 AS (SELECT grd2.*, xd, yd,
        minx + (xd + 0.5E0) * dres AS ec,
        maxy - (yd + 0.5E0) * dres AS nc
        FROM grd2, range(0, {dst_w}) a(xd), range(0, {dst_w}) b(yd)
        WHERE xd < dw AND yd < dh),
{inv_cte},
sxy AS (SELECT i, image_id, w, h, fmt, xd, yd, dw,
        cast(floor((lon - ilon) / (0.1E0 / w) + 1.0E-10) as bigint) AS x,
        cast(floor((ilat - lat) / (0.1E0 / w) + 1.0E-10) as bigint) AS y
        FROM psinv),
vals AS (SELECT image_id, xd, yd, dw, ch,
         (CASE WHEN x >= 0 AND x < w AND y >= 0 AND y < h
               THEN {val} ELSE 0 END) AS v
         FROM sxy, range(0, 3) c(ch))
SELECT image_id, ch AS channel,
       cast(sum(v % {prime}) % 65536 as bigint) AS cks
FROM vals GROUP BY 1, 2
"""


def ps_corners(images: DataFrame, epsg: int = 3031) -> DataFrame:
    """Footprint corners of every image in a polar-stereographic CRS
    (default WGS84 / Antarctic Polar Stereographic). Map-only JVM
    stage, zero Python."""
    p = srs.PS_REGISTRY[epsg]
    df = images.selectExpr("image_id", "lon", "lat", "w", "h")
    exprs = ["image_id"]
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.ps_forward_sql(lon_e, lat_e, p)
        df = df.selectExpr("*", f"{e_sql} AS e_{sfx}", f"{n_sql} AS n_{sfx}")
        exprs.append(f"cast(floor(e_{sfx} * 10.0E0) as bigint) AS e_{sfx}_dm")
        exprs.append(f"cast(floor(n_{sfx} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return df.selectExpr(*exprs)


def oracle_ps_corners(n: int, epsg: int = 3031) -> str:
    p = srs.PS_REGISTRY[epsg]
    parts = []
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.ps_forward_sql(lon_e, lat_e, p)
        parts.append(f"cast(floor({e_sql} * 10.0E0) as bigint) AS e_{sfx}_dm")
        parts.append(f"cast(floor({n_sql} * 10.0E0) as bigint) AS n_{sfx}_dm")
    return (
        f"SELECT image_id, {', '.join(parts)} "
        f"FROM ({synth.images_cte(n, 'duckdb')})"
    )


# ---------------------------------------------------------------------------
# pixel-level reprojection


def _suggest_grid(lon, lat, w, h, lon0, fn, dst_w=DST_W):
    """Suggested output grid in the UTM zone: project the 4 footprint
    corners, take the bbox, one common resolution so the longer edge is
    ``dst_w`` pixels (bounded-size variant of GDALSuggestedWarpOutput).
    Returns (dst_gt, dst_h, dst_w_eff)."""
    res = 0.1 / w
    cx = np.array([lon, lon + w * res, lon, lon + w * res])
    cy = np.array([lat, lat, lat - h * res, lat - h * res])
    ex, ny = srs.tm_forward(cx, cy, lon0)
    ny = ny + fn
    minx, maxx = ex.min(), ex.max()
    miny, maxy = ny.min(), ny.max()
    dres = max(maxx - minx, maxy - miny) / dst_w
    w_eff = max(1, int(np.floor((maxx - minx) / dres + 0.5)))
    h_eff = max(1, int(np.floor((maxy - miny) / dres + 0.5)))
    return (minx, dres, 0.0, maxy, 0.0, -dres), h_eff, w_eff


def _reproject_utm_iter(batches, dst_w: int, alg: str):
    for pdf in batches:
        rows = []
        for image_id, payload, lon, lat, w, h in zip(
            pdf["image_id"], pdf["bytes"], pdf["lon"], pdf["lat"],
            pdf["w"], pdf["h"],
        ):
            arr = codecs.decode_image(bytes(payload))
            lon, lat = float(lon), float(lat)
            w, h = int(w), int(h)
            zone = int(srs.utm_zone(np.array([lon]), np.array([lat]))[0])
            lon0 = zone * 6.0 - 183.0
            fn = srs.FN_SOUTH if lat < 0.0 else 0.0
            res = 0.1 / w
            src_gt = (lon, res, 0.0, lat, 0.0, -res)
            dst_gt, dst_h, dst_w_eff = _suggest_grid(
                lon, lat, w, h, lon0, fn, dst_w
            )

            def transform(gx, gy, lon0=lon0, fn=fn):
                return srs.tm_inverse(gx, np.asarray(gy) - fn, lon0)

            warped = resample.warp_image(
                arr, src_gt, dst_gt, (dst_h, dst_w_eff), alg, transform
            )
            from .stats import gdal_checksum

            for c in range(warped.shape[2]):
                rows.append(
                    (image_id, zone, c, gdal_checksum(warped[:, :, c]))
                )
        yield pd.DataFrame(
            rows, columns=["image_id", "zone", "channel", "cks"]
        )


def reproject_utm(
    images: DataFrame, dst_w: int = DST_W, alg: str = "near"
) -> DataFrame:
    """Warp every image from its 4326 grid onto a suggested UTM grid in
    its own zone; per-channel GDAL checksums of the result. One
    mapInPandas stage, zero shuffle — embarrassingly parallel at any
    table size."""
    out = images.select("image_id", "bytes", "lon", "lat", "w", "h").mapInPandas(
        lambda it: _reproject_utm_iter(it, dst_w, alg),
        schema="image_id string, zone bigint, channel bigint, cks bigint",
    )
    return out


def oracle_reproject_utm(n: int, max_i: int, dst_w: int = DST_W) -> str:
    """Replays the whole chain in DuckDB SQL: corners -> bbox -> grid
    -> per-pixel inverse TM (Newton unrolled) -> nearest src pixel ->
    synthetic pixel value -> GDAL checksum."""
    corner_parts = []
    for suffix, e_sql, n_sql in _corner_exprs():
        corner_parts.append(f"{e_sql} AS e_{suffix}")
        corner_parts.append(f"{n_sql} AS n_{suffix}")
    keep = "i, image_id, ilon, ilat, w, h, fmt, zone, fn, xd, yd, dw, dh"
    inv_cte = srs.tm_inverse_sql_cte("ec", "nc - fn", "lon0", "px2", keep)
    prime = (
        "(CASE ((yd * dw + xd) % 11) "
        "WHEN 0 THEN 7 WHEN 1 THEN 11 WHEN 2 THEN 13 WHEN 3 THEN 17 "
        "WHEN 4 THEN 19 WHEN 5 THEN 23 WHEN 6 THEN 29 WHEN 7 THEN 31 "
        "WHEN 8 THEN 37 WHEN 9 THEN 41 ELSE 43 END)"
    )
    val = synth.pixel_val_sql()
    return f"""
WITH img AS (SELECT i, image_id, lon AS ilon, lat AS ilat, w, h, fmt
             FROM ({synth.images_cte(n, 'duckdb')}) WHERE i < {max_i}),
z AS (SELECT img.*,
      greatest(1, least(60, cast(floor((ilon + 180.0E0) / 6.0E0) as bigint) + 1)) AS zone
      FROM img),
g AS (SELECT z.*, (cast(zone as double) * 6.0E0 - 183.0E0) AS lon0,
      (CASE WHEN ilat < 0.0E0 THEN 10000000.0E0 ELSE 0.0E0 END) AS fn,
      ilon AS lon, ilat AS lat FROM z),
crn AS (SELECT i, image_id, ilon, ilat, w, h, fmt, zone, lon0, fn,
        {', '.join(corner_parts)} FROM g),
bbox AS (SELECT i, image_id, ilon, ilat, w, h, fmt, zone, lon0, fn,
         least(e_tl, e_tr, e_bl, e_br) AS minx,
         greatest(e_tl, e_tr, e_bl, e_br) AS maxx,
         least(n_tl, n_tr, n_bl, n_br) AS miny,
         greatest(n_tl, n_tr, n_bl, n_br) AS maxy FROM crn),
grd AS (SELECT bbox.*,
        greatest(maxx - minx, maxy - miny) / {dst_w}.0E0 AS dres FROM bbox),
grd2 AS (SELECT grd.*,
         greatest(1, cast(floor((maxx - minx) / dres + 0.5E0) as bigint)) AS dw,
         greatest(1, cast(floor((maxy - miny) / dres + 0.5E0) as bigint)) AS dh
         FROM grd),
px2 AS (SELECT grd2.*, xd, yd,
        minx + (xd + 0.5E0) * dres AS ec,
        maxy - (yd + 0.5E0) * dres AS nc
        FROM grd2, range(0, {dst_w}) a(xd), range(0, {dst_w}) b(yd)
        WHERE xd < dw AND yd < dh),
{inv_cte},
sxy AS (SELECT i, image_id, w, h, fmt, zone, xd, yd, dw,
        cast(floor((lon - ilon) / (0.1E0 / w) + 1.0E-10) as bigint) AS x,
        cast(floor((ilat - lat) / (0.1E0 / w) + 1.0E-10) as bigint) AS y
        FROM tminv),
vals AS (SELECT image_id, zone, xd, yd, dw, ch,
         (CASE WHEN x >= 0 AND x < w AND y >= 0 AND y < h
               THEN {val} ELSE 0 END) AS v
         FROM sxy, range(0, 3) c(ch))
SELECT image_id, zone, ch AS channel,
       cast(sum(v % {prime}) % 65536 as bigint) AS cks
FROM vals GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# LCC pixel warp — the round-3 projection families wired into the full
# warp path (gdalwarp -t_srs EPSG:2154 over images inside the CRS's
# service area; same chain as reproject_utm: suggested grid ->
# per-dst-pixel inverse -> resample -> checksum).


def _suggest_grid_lcc(lon, lat, w, h, p, dst_w=DST_W):
    """Suggested output grid in the LCC CRS (bounded-size
    GDALSuggestedWarpOutput, as _suggest_grid)."""
    res = 0.1 / w
    cx = np.array([lon, lon + w * res, lon, lon + w * res])
    cy = np.array([lat, lat, lat - h * res, lat - h * res])
    ex, ny = srs.lcc_forward(cx, cy, p)
    minx, maxx = ex.min(), ex.max()
    miny, maxy = ny.min(), ny.max()
    dres = max(maxx - minx, maxy - miny) / dst_w
    w_eff = max(1, int(np.floor((maxx - minx) / dres + 0.5)))
    h_eff = max(1, int(np.floor((maxy - miny) / dres + 0.5)))
    return (minx, dres, 0.0, maxy, 0.0, -dres), h_eff, w_eff


def _reproject_lcc_iter(batches, epsg: int, dst_w: int, alg: str):
    p = srs.LCC_REGISTRY[epsg]
    for pdf in batches:
        rows = []
        for image_id, payload, lon, lat, w, h in zip(
            pdf["image_id"], pdf["bytes"], pdf["lon"], pdf["lat"],
            pdf["w"], pdf["h"],
        ):
            arr = codecs.decode_image(bytes(payload))
            lon, lat = float(lon), float(lat)
            w, h = int(w), int(h)
            res = 0.1 / w
            src_gt = (lon, res, 0.0, lat, 0.0, -res)
            dst_gt, dst_h, dst_w_eff = _suggest_grid_lcc(
                lon, lat, w, h, p, dst_w
            )

            def transform(gx, gy, p=p):
                return srs.lcc_inverse(gx, gy, p)

            warped = resample.warp_image(
                arr, src_gt, dst_gt, (dst_h, dst_w_eff), alg, transform
            )
            from .stats import gdal_checksum

            for c in range(warped.shape[2]):
                rows.append((image_id, c, gdal_checksum(warped[:, :, c])))
        yield pd.DataFrame(rows, columns=["image_id", "channel", "cks"])


def reproject_lcc(
    images: DataFrame, epsg: int = 2154, dst_w: int = DST_W,
    alg: str = "near",
) -> DataFrame:
    """Warp images onto a suggested Lambert-Conformal-Conic grid;
    per-channel GDAL checksums. One mapInPandas stage, zero shuffle."""
    out = images.select("image_id", "bytes", "lon", "lat", "w", "h").mapInPandas(
        lambda it: _reproject_lcc_iter(it, epsg, dst_w, alg),
        schema="image_id string, channel bigint, cks bigint",
    )
    return out


def oracle_reproject_lcc(
    n: int, max_i: int, epsg: int = 2154, dst_w: int = DST_W
) -> str:
    """Replays corners -> bbox -> grid -> per-pixel LCC inverse
    (fixed-point unrolled) -> nearest src pixel -> checksum. Runs over
    the hot-cell images (i % 4 = 0) — the subset inside the CRS's
    realistic service area."""
    p = srs.LCC_REGISTRY[epsg]
    corner_parts = []
    for suffix, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.lcc_forward_sql(lon_e, lat_e, p)
        corner_parts.append(f"{e_sql} AS e_{suffix}")
        corner_parts.append(f"{n_sql} AS n_{suffix}")
    keep = "i, image_id, ilon, ilat, w, h, fmt, xd, yd, dw, dh"
    inv_cte = srs.lcc_inverse_sql_cte("ec", "nc", p, "px2", keep)
    prime = (
        "(CASE ((yd * dw + xd) % 11) "
        "WHEN 0 THEN 7 WHEN 1 THEN 11 WHEN 2 THEN 13 WHEN 3 THEN 17 "
        "WHEN 4 THEN 19 WHEN 5 THEN 23 WHEN 6 THEN 29 WHEN 7 THEN 31 "
        "WHEN 8 THEN 37 WHEN 9 THEN 41 ELSE 43 END)"
    )
    val = synth.pixel_val_sql()
    return f"""
WITH img AS (SELECT i, image_id, lon AS ilon, lat AS ilat, lon, lat, w, h, fmt
             FROM ({synth.images_cte(n, 'duckdb')})
             WHERE i % 4 = 0 AND i < {max_i}),
crn AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
        {', '.join(corner_parts)} FROM img),
bbox AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
         least(e_tl, e_tr, e_bl, e_br) AS minx,
         greatest(e_tl, e_tr, e_bl, e_br) AS maxx,
         least(n_tl, n_tr, n_bl, n_br) AS miny,
         greatest(n_tl, n_tr, n_bl, n_br) AS maxy FROM crn),
grd AS (SELECT bbox.*,
        greatest(maxx - minx, maxy - miny) / {dst_w}.0E0 AS dres FROM bbox),
grd2 AS (SELECT grd.*,
         greatest(1, cast(floor((maxx - minx) / dres + 0.5E0) as bigint)) AS dw,
         greatest(1, cast(floor((maxy - miny) / dres + 0.5E0) as bigint)) AS dh
         FROM grd),
px2 AS (SELECT grd2.*, xd, yd,
        minx + (xd + 0.5E0) * dres AS ec,
        maxy - (yd + 0.5E0) * dres AS nc
        FROM grd2, range(0, {dst_w}) a(xd), range(0, {dst_w}) b(yd)
        WHERE xd < dw AND yd < dh),
{inv_cte},
sxy AS (SELECT i, image_id, w, h, fmt, xd, yd, dw,
        cast(floor((lon - ilon) / (0.1E0 / w) + 1.0E-10) as bigint) AS x,
        cast(floor((ilat - lat) / (0.1E0 / w) + 1.0E-10) as bigint) AS y
        FROM lccinv),
vals AS (SELECT image_id, xd, yd, dw, ch,
         (CASE WHEN x >= 0 AND x < w AND y >= 0 AND y < h
               THEN {val} ELSE 0 END) AS v
         FROM sxy, range(0, 3) c(ch))
SELECT image_id, ch AS channel,
       cast(sum(v % {prime}) % 65536 as bigint) AS cks
FROM vals GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# -tap (target-aligned pixels, apps/gdalwarp_lib.cpp -tap +
# GDALSuggestedWarpOutput border adjust): given a fixed target
# resolution, snap the suggested output extent OUTWARD to multiples
# of it, so neighboring jobs produce pixel-aligned grids.


def utm_tap_grid(images: DataFrame, tr: float = 100.0) -> DataFrame:
    """(image_id, zone, tap_minx, tap_maxy, tap_w, tap_h): the
    tap-aligned UTM output grid of every image footprint at ``tr``
    meters. Pure Catalyst (staged Krueger forward + floor/ceil
    arithmetic); coordinates are exact multiples of tr -> bigint."""
    from .. import synth as _synth

    base = images.selectExpr(
        "image_id", "lon", "lat", "w", "h", f"{ZONE_SQL} AS zone"
    ).selectExpr(
        "image_id", "lon", "lat", "w", "h", "zone",
        f"{LON0_SQL} AS lon0", f"{FN_SQL} AS fn",
    )
    corners = [
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ]
    df = _tm_forward_staged(base, corners)
    t = _synth.flit(tr)
    mnx = "least(e_tl, e_tr, e_bl, e_br)"
    mxx = "greatest(e_tl, e_tr, e_bl, e_br)"
    mny = "least(n_tl, n_tr, n_bl, n_br)"
    mxy = "greatest(n_tl, n_tr, n_bl, n_br)"
    return df.selectExpr(
        "image_id", "zone",
        f"cast(floor({mnx} / {t}) * {tr:.0f} as bigint) AS tap_minx",
        f"cast(ceil({mxy} / {t}) * {tr:.0f} as bigint) AS tap_maxy",
        f"cast(ceil({mxx} / {t}) - floor({mnx} / {t}) as bigint) AS tap_w",
        f"cast(ceil({mxy} / {t}) - floor({mny} / {t}) as bigint) AS tap_h",
    )


def oracle_utm_tap_grid(n: int, tr: float = 100.0) -> str:
    from .. import synth as _synth

    t = _synth.flit(tr)
    parts = []
    for suffix, e_sql, n_sql in _corner_exprs():
        parts.append(f"{e_sql} AS e_{suffix}")
        parts.append(f"{n_sql} AS n_{suffix}")
    mnx = "least(e_tl, e_tr, e_bl, e_br)"
    mxx = "greatest(e_tl, e_tr, e_bl, e_br)"
    mny = "least(n_tl, n_tr, n_bl, n_br)"
    mxy = "greatest(n_tl, n_tr, n_bl, n_br)"
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}), "
        f"z AS (SELECT image_id, lon, lat, w, h, {ZONE_SQL} AS zone FROM img), "
        f"g AS (SELECT image_id, lon, lat, w, h, zone, {LON0_SQL} AS lon0, "
        f"{FN_SQL} AS fn FROM z), "
        f"c AS (SELECT image_id, zone, {', '.join(parts)} FROM g) "
        f"SELECT image_id, zone, "
        f"cast(floor({mnx} / {t}) * {tr:.0f} as bigint) AS tap_minx, "
        f"cast(ceil({mxy} / {t}) * {tr:.0f} as bigint) AS tap_maxy, "
        f"cast(ceil({mxx} / {t}) - floor({mnx} / {t}) as bigint) AS tap_w, "
        f"cast(ceil({mxy} / {t}) - floor({mny} / {t}) as bigint) AS tap_h "
        f"FROM c"
    )


# ---------------------------------------------------------------------------
# EPSG:27700 corners — datum-shifted projected CRS (r4; the r3
# verdict's missing item 5). Chain per corner: WGS84 geodetic ->
# geocentric -> 7-param Helmert (negated TOWGS84) -> geodetic on
# Airy 1830 (fixed-point) -> Krueger TM forward with OSGB constants.
# Both engines run the SAME srs.tmd_stage_list stages; the Spark side
# keeps each non-cheap intermediate as a named column (staying inside
# whole-stage codegen without textual re-expansion), the oracle as
# MATERIALIZED CTE stages. Verified against the Ordnance Survey
# worked example (projection sub-mm; full chain within the published
# few-m difference between TOWGS84 and the OSTN grid).

OSGB_DOMAIN_SQL = (
    "lon > -12.0E0 AND lon < 8.0E0 AND lat > 35.0E0 AND lat < 65.0E0"
)
_OSGB_LON_CASE = (
    "CASE WHEN corner IN ('tr', 'br') THEN (lon_c + 0.1E0) "
    "ELSE lon_c END"
)
_OSGB_LAT_CASE = (
    "CASE WHEN corner IN ('bl', 'br') THEN (lat_c - 0.1E0 * "
    "cast(h as double) / cast(w as double)) ELSE lat_c END"
)


def osgb_corners(images: DataFrame, epsg: int = 27700) -> DataFrame:
    """(image_id, corner, e_dm, n_dm) of footprint corners in British
    National Grid — map-only, zero Python, dm-quantized."""
    p = srs.TMD_REGISTRY[epsg]
    df = images.filter(OSGB_DOMAIN_SQL).selectExpr(
        "image_id", "w", "h", "lon AS lon_c", "lat AS lat_c"
    ).selectExpr(
        "image_id", "w", "h", "lon_c", "lat_c",
        "explode(array('tl', 'tr', 'bl', 'br')) AS corner",
    ).selectExpr(
        "image_id", "corner",
        f"{_OSGB_LON_CASE} AS lon",
        f"{_OSGB_LAT_CASE} AS lat",
    )
    for col, expr in srs.tmd_stage_list(p, "spark"):
        df = df.selectExpr("*", f"{expr} AS {col}")
    return df.selectExpr(
        "image_id", "corner",
        "cast(floor(easting * 10.0E0) as bigint) AS e_dm",
        "cast(floor(northing * 10.0E0) as bigint) AS n_dm",
    )


def _suggest_grid_sinu(lon, lat, w, h, p, dst_w):
    """Suggested output grid in the sinusoidal CRS (same bounded-size
    GDALSuggestedWarpOutput shape as _suggest_grid_ps)."""
    res = 0.1 / w
    cx = np.array([lon, lon + w * res, lon, lon + w * res])
    cy = np.array([lat, lat, lat - h * res, lat - h * res])
    ex, ny = srs.sinu_forward(cx, cy, p)
    minx, maxx = ex.min(), ex.max()
    miny, maxy = ny.min(), ny.max()
    dres = max(maxx - minx, maxy - miny) / dst_w
    w_eff = max(1, int(np.floor((maxx - minx) / dres + 0.5)))
    h_eff = max(1, int(np.floor((maxy - miny) / dres + 0.5)))
    return (minx, dres, 0.0, maxy, 0.0, -dres), h_eff, w_eff


def _reproject_sinu_iter(batches, key: int, dst_w: int, alg: str):
    p = srs.SINU_REGISTRY[key]
    for pdf in batches:
        rows = []
        for image_id, payload, lon, lat, w, h in zip(
            pdf["image_id"], pdf["bytes"], pdf["lon"], pdf["lat"],
            pdf["w"], pdf["h"],
        ):
            arr = codecs.decode_image(bytes(payload))
            lon, lat = float(lon), float(lat)
            w, h = int(w), int(h)
            res = 0.1 / w
            src_gt = (lon, res, 0.0, lat, 0.0, -res)
            dst_gt, dst_h, dst_w_eff = _suggest_grid_sinu(
                lon, lat, w, h, p, dst_w
            )

            def transform(gx, gy, p=p):
                return srs.sinu_inverse(gx, gy, p)

            warped = resample.warp_image(
                arr, src_gt, dst_gt, (dst_h, dst_w_eff), alg, transform
            )
            from .stats import gdal_checksum

            for c in range(warped.shape[2]):
                rows.append((image_id, c, gdal_checksum(warped[:, :, c])))
        yield pd.DataFrame(rows, columns=["image_id", "channel", "cks"])


def reproject_sinu(
    images: DataFrame, key: int = 54008, dst_w: int = DST_W,
    alg: str = "near",
) -> DataFrame:
    """Warp images onto a suggested sinusoidal (MODIS-family) grid;
    per-channel GDAL checksums. One mapInPandas stage, zero shuffle —
    the fifth full pixel-warp projection family."""
    return images.select(
        "image_id", "bytes", "lon", "lat", "w", "h"
    ).mapInPandas(
        lambda it: _reproject_sinu_iter(it, key, dst_w, alg),
        schema="image_id string, channel bigint, cks bigint",
    )


def oracle_reproject_sinu(
    n: int, max_i: int, key: int = 54008, dst_w: int = DST_W
) -> str:
    """Replays corners -> bbox -> grid -> per-pixel sinusoidal inverse
    (meridional-arc Newton unrolled) -> nearest src pixel -> checksum,
    over the same hot-cell subset as the LCC/PS pixel paths."""
    p = srs.SINU_REGISTRY[key]
    corner_parts = []
    for suffix, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.sinu_forward_sql(lon_e, lat_e, p)
        corner_parts.append(f"{e_sql} AS e_{suffix}")
        corner_parts.append(f"{n_sql} AS n_{suffix}")
    keep = "i, image_id, ilon, ilat, w, h, fmt, xd, yd, dw, dh"
    inv_cte = srs.sinu_inverse_sql_cte("ec", "nc", p, "px2", keep)
    prime = (
        "(CASE ((yd * dw + xd) % 11) "
        "WHEN 0 THEN 7 WHEN 1 THEN 11 WHEN 2 THEN 13 WHEN 3 THEN 17 "
        "WHEN 4 THEN 19 WHEN 5 THEN 23 WHEN 6 THEN 29 WHEN 7 THEN 31 "
        "WHEN 8 THEN 37 WHEN 9 THEN 41 ELSE 43 END)"
    )
    val = synth.pixel_val_sql()
    return f"""
WITH img AS (SELECT i, image_id, lon AS ilon, lat AS ilat, lon, lat, w, h, fmt
             FROM ({synth.images_cte(n, 'duckdb')})
             WHERE i % 4 = 0 AND i < {max_i}),
crn AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
        {', '.join(corner_parts)} FROM img),
bbox AS (SELECT i, image_id, ilon, ilat, w, h, fmt,
         least(e_tl, e_tr, e_bl, e_br) AS minx,
         greatest(e_tl, e_tr, e_bl, e_br) AS maxx,
         least(n_tl, n_tr, n_bl, n_br) AS miny,
         greatest(n_tl, n_tr, n_bl, n_br) AS maxy FROM crn),
grd AS (SELECT bbox.*,
        greatest(maxx - minx, maxy - miny) / {dst_w}.0E0 AS dres FROM bbox),
grd2 AS (SELECT grd.*,
         greatest(1, cast(floor((maxx - minx) / dres + 0.5E0) as bigint)) AS dw,
         greatest(1, cast(floor((maxy - miny) / dres + 0.5E0) as bigint)) AS dh
         FROM grd),
px2 AS (SELECT grd2.*, xd, yd,
        minx + (xd + 0.5E0) * dres AS ec,
        maxy - (yd + 0.5E0) * dres AS nc
        FROM grd2, range(0, {dst_w}) a(xd), range(0, {dst_w}) b(yd)
        WHERE xd < dw AND yd < dh),
{inv_cte},
sxy AS (SELECT i, image_id, w, h, fmt, xd, yd, dw,
        cast(floor((lon - ilon) / (0.1E0 / w) + 1.0E-10) as bigint) AS x,
        cast(floor((ilat - lat) / (0.1E0 / w) + 1.0E-10) as bigint) AS y
        FROM sinuinv),
vals AS (SELECT image_id, xd, yd, dw, ch,
         (CASE WHEN x >= 0 AND x < w AND y >= 0 AND y < h
               THEN {val} ELSE 0 END) AS v
         FROM sxy, range(0, 3) c(ch))
SELECT image_id, ch AS channel,
       cast(sum(v % {prime}) % 65536 as bigint) AS cks
FROM vals GROUP BY 1, 2
"""


def sinu_corners(images: DataFrame) -> DataFrame:
    """Footprint corners in TWO sinusoidal CRSes at once: ESRI:54008
    (WGS84 ellipsoidal, Snyder eq. 30-8/30-9) and the MODIS production
    grid (SR-ORG:6974 authalic sphere). Map-only JVM stage, zero
    Python; dm-quantized like the other corner families."""
    pw = srs.SINU_REGISTRY[54008]
    pm = srs.SINU_REGISTRY[6974]
    df = images.selectExpr("image_id", "lon", "lat", "w", "h")
    exprs = ["image_id"]
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.sinu_forward_sql(lon_e, lat_e, pw)
        df = df.selectExpr("*", f"{e_sql} AS e_{sfx}", f"{n_sql} AS n_{sfx}")
        exprs.append(f"cast(floor(e_{sfx} * 10.0E0) as bigint) AS e_{sfx}_dm")
        exprs.append(f"cast(floor(n_{sfx} * 10.0E0) as bigint) AS n_{sfx}_dm")
    em, nm = srs.sinu_forward_sql("lon", "lat", pm)
    df = df.selectExpr("*", f"{em} AS e_mod", f"{nm} AS n_mod")
    exprs.append("cast(floor(e_mod * 10.0E0) as bigint) AS e_modis_dm")
    exprs.append("cast(floor(n_mod * 10.0E0) as bigint) AS n_modis_dm")
    return df.selectExpr(*exprs)


def oracle_sinu_corners(n: int) -> str:
    pw = srs.SINU_REGISTRY[54008]
    pm = srs.SINU_REGISTRY[6974]
    parts = []
    for sfx, lon_e, lat_e in (
        ("tl", "lon", "lat"),
        ("tr", LON2_SQL, "lat"),
        ("bl", "lon", LAT2_SQL),
        ("br", LON2_SQL, LAT2_SQL),
    ):
        e_sql, n_sql = srs.sinu_forward_sql(lon_e, lat_e, pw)
        parts.append(f"cast(floor({e_sql} * 10.0E0) as bigint) AS e_{sfx}_dm")
        parts.append(f"cast(floor({n_sql} * 10.0E0) as bigint) AS n_{sfx}_dm")
    em, nm = srs.sinu_forward_sql("lon", "lat", pm)
    parts.append(f"cast(floor({em} * 10.0E0) as bigint) AS e_modis_dm")
    parts.append(f"cast(floor({nm} * 10.0E0) as bigint) AS n_modis_dm")
    return (
        f"SELECT image_id, {', '.join(parts)} "
        f"FROM ({synth.images_cte(n, 'duckdb')})"
    )


def oracle_osgb_corners(n: int, epsg: int = 27700) -> str:
    p = srs.TMD_REGISTRY[epsg]
    stages = [
        f"img AS MATERIALIZED (SELECT image_id, lon, lat, w, h "
        f"FROM ({synth.images_cte(n, 'duckdb')}) "
        f"WHERE {OSGB_DOMAIN_SQL}), "
        f"c0 AS MATERIALIZED (SELECT image_id, corner, "
        f"{_OSGB_LON_CASE} AS lon, {_OSGB_LAT_CASE} AS lat "
        f"FROM (SELECT image_id, w, h, lon AS lon_c, lat AS lat_c "
        f"FROM img) i, (SELECT unnest(['tl', 'tr', 'bl', 'br']) "
        f"AS corner) cs)"
    ]
    prev = "c0"
    for k, (col, expr) in enumerate(srs.tmd_stage_list(p, "duckdb")):
        name = f"t{k}"
        stages.append(
            f"{name} AS MATERIALIZED (SELECT *, {expr} AS {col} "
            f"FROM {prev})"
        )
        prev = name
    return (
        "WITH " + ", ".join(stages)
        + f" SELECT image_id, corner, "
        f"cast(floor(easting * 10.0E0) as bigint) AS e_dm, "
        f"cast(floor(northing * 10.0E0) as bigint) AS n_dm FROM {prev}"
    )


# ---------------------------------------------------------------------------
# gdalmove: rewrite the geotransform in a new CRS without warping
# (osgeo_utils/gdalmove.py move() — transforms control points through
# the coordinate operation and fits an affine GT to them; with the
# three independent corners UL/UR/LL the least-squares fit is exact,
# so this is the skew-free closed form of the same operation)


def gdalmove_gt(images: DataFrame, epsg: int = 54008) -> DataFrame:
    """Per-image 6-coefficient geotransform re-expressed in the
    sinusoidal CRS: UL anchors the origin, (UR-UL)/w and (LL-UL)/h give
    the pixel vectors. Pure Catalyst closed form (sin/cos bit-match
    across engines) — map-only, zero Python, zero shuffle. Offsets in
    mm, per-pixel terms in um/px."""
    p = srs.SINU_REGISTRY[epsg]
    xul, yul = srs.sinu_forward_sql("lon", "lat", p)
    xur, yur = srs.sinu_forward_sql(LON2_SQL, "lat", p)
    xll, yll = srs.sinu_forward_sql("lon", LAT2_SQL, p)
    return images.selectExpr(
        "image_id", "lon", "lat", "w", "h",
        f"{xul} AS xul", f"{yul} AS yul",
        f"{xur} AS xur", f"{yur} AS yur",
        f"{xll} AS xll", f"{yll} AS yll",
    ).selectExpr(
        "image_id",
        "cast(floor(xul * 1000.0E0) as bigint) AS gt0_mm",
        "cast(floor((xur - xul) / cast(w as double) * 1000000.0E0) as bigint) "
        "AS gt1_um",
        "cast(floor((xll - xul) / cast(h as double) * 1000000.0E0) as bigint) "
        "AS gt2_um",
        "cast(floor(yul * 1000.0E0) as bigint) AS gt3_mm",
        "cast(floor((yur - yul) / cast(w as double) * 1000000.0E0) as bigint) "
        "AS gt4_um",
        "cast(floor((yll - yul) / cast(h as double) * 1000000.0E0) as bigint) "
        "AS gt5_um",
    )


def oracle_gdalmove_gt(n: int, epsg: int = 54008) -> str:
    p = srs.SINU_REGISTRY[epsg]
    xul, yul = srs.sinu_forward_sql("lon", "lat", p)
    xur, yur = srs.sinu_forward_sql(LON2_SQL, "lat", p)
    xll, yll = srs.sinu_forward_sql("lon", LAT2_SQL, p)
    return (
        f"WITH c AS (SELECT image_id, w, h, "
        f"{xul} AS xul, {yul} AS yul, {xur} AS xur, {yur} AS yur, "
        f"{xll} AS xll, {yll} AS yll "
        f"FROM ({synth.images_cte(n, 'duckdb')})) "
        f"SELECT image_id, "
        f"cast(floor(xul * 1000.0E0) as bigint) AS gt0_mm, "
        f"cast(floor((xur - xul) / cast(w as double) * 1000000.0E0) as bigint) "
        f"AS gt1_um, "
        f"cast(floor((xll - xul) / cast(h as double) * 1000000.0E0) as bigint) "
        f"AS gt2_um, "
        f"cast(floor(yul * 1000.0E0) as bigint) AS gt3_mm, "
        f"cast(floor((yur - yul) / cast(w as double) * 1000000.0E0) as bigint) "
        f"AS gt4_um, "
        f"cast(floor((yll - yul) / cast(h as double) * 1000000.0E0) as bigint) "
        f"AS gt5_um FROM c"
    )


# ---------------------------------------------------------------------------
# gdalwarp -crop_to_cutline (apps/gdalwarp_lib.cpp CropToCutline):
# the output extent is the cutline's envelope intersected with the
# source footprint, SNAPPED TO THE SOURCE PIXEL GRID (no -tr given ->
# the source geotransform's grid is kept, only the window shrinks).
# Pure Catalyst: per-image window arithmetic over the metadata scan —
# planning never decodes a pixel, exactly like the reference, which
# computes the window before the warper ever runs.

CROP_CUT_BOX = (11.3, 48.2, 11.5, 48.4)  # lon/lat cutline envelope


def crop_to_cutline_grid(
    images: DataFrame, box: tuple = CROP_CUT_BOX
) -> DataFrame:
    """(image_id, px0, py0, out_w, out_h) — the source-grid-aligned
    output window of each image whose footprint intersects the cutline
    envelope. gt = (lon, res, 0, lat, 0, -res), res = 0.1/w (the synth
    geotransform): px snapped with floor/ceil so the cutline is fully
    covered, then clamped to the image.

    Scale: metadata-only scan, zero shuffle; the filter prunes
    non-intersecting images before any pixel stage runs."""
    cx0, cy0, cx1, cy1 = box
    fl = synth.flit
    base = images.selectExpr(
        "image_id", "lon", "lat", "w", "h",
        "0.1E0 / cast(w as double) AS res",
    ).selectExpr(
        "image_id", "w", "h",
        f"greatest(0, least(cast(w as bigint), "
        f"cast(floor(({fl(cx0)} - lon) / res) as bigint))) AS px0",
        f"greatest(0, least(cast(w as bigint), "
        f"cast(ceil(({fl(cx1)} - lon) / res) as bigint))) AS px1",
        f"greatest(0, least(cast(h as bigint), "
        f"cast(floor((lat - {fl(cy1)}) / res) as bigint))) AS py0",
        f"greatest(0, least(cast(h as bigint), "
        f"cast(ceil((lat - {fl(cy0)}) / res) as bigint))) AS py1",
    )
    return base.selectExpr(
        "image_id", "px0", "py0",
        "px1 - px0 AS out_w", "py1 - py0 AS out_h",
    ).filter("out_w > 0 AND out_h > 0")


def oracle_crop_to_cutline_grid(n: int, box: tuple = CROP_CUT_BOX) -> str:
    cx0, cy0, cx1, cy1 = box
    fl = synth.flit
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}), "
        f"r AS (SELECT image_id, lon, lat, w, h, "
        f"0.1E0 / cast(w as double) AS res FROM img), "
        f"c AS (SELECT image_id, "
        f"greatest(0, least(cast(w as bigint), "
        f"cast(floor(({fl(cx0)} - lon) / res) as bigint))) AS px0, "
        f"greatest(0, least(cast(w as bigint), "
        f"cast(ceil(({fl(cx1)} - lon) / res) as bigint))) AS px1, "
        f"greatest(0, least(cast(h as bigint), "
        f"cast(floor((lat - {fl(cy1)}) / res) as bigint))) AS py0, "
        f"greatest(0, least(cast(h as bigint), "
        f"cast(ceil((lat - {fl(cy0)}) / res) as bigint))) AS py1 FROM r) "
        f"SELECT image_id, px0, py0, px1 - px0 AS out_w, "
        f"py1 - py0 AS out_h FROM c "
        f"WHERE px1 - px0 > 0 AND py1 - py0 > 0"
    )


# ---------------------------------------------------------------------------
# World equal-area CRS corners (r4): Mollweide (ESRI:54009, Newton
# forward, srs.moll_stage_list) and Equal Earth (EPSG:8857, authalic
# closed form, srs.eqearth_stage_list). Same staged-corner shape as
# osgb_corners: explode the 4 footprint corners to rows FIRST, then
# run the stage pipeline once — both engines execute identical SQL
# text per stage, Spark as named projections inside whole-stage
# codegen, DuckDB as MATERIALIZED CTE stages.

_WCORNER_LON_CASE = (
    "CASE WHEN corner IN ('tr', 'br') THEN (lon_c + 0.1E0) "
    "ELSE lon_c END"
)
_WCORNER_LAT_CASE = (
    "CASE WHEN corner IN ('bl', 'br') THEN (lat_c - 0.1E0 * "
    "cast(h as double) / cast(w as double)) ELSE lat_c END"
)


def _staged_corners(images: DataFrame, stages) -> DataFrame:
    df = images.selectExpr(
        "image_id", "w", "h", "lon AS lon_c", "lat AS lat_c"
    ).selectExpr(
        "image_id", "w", "h", "lon_c", "lat_c",
        "explode(array('tl', 'tr', 'bl', 'br')) AS corner",
    ).selectExpr(
        "image_id", "corner",
        f"{_WCORNER_LON_CASE} AS lon",
        f"{_WCORNER_LAT_CASE} AS lat",
    )
    for col, expr in stages:
        df = df.selectExpr("*", f"{expr} AS {col}")
    return df.selectExpr(
        "image_id", "corner",
        "cast(floor(easting * 10.0E0) as bigint) AS e_dm",
        "cast(floor(northing * 10.0E0) as bigint) AS n_dm",
    )


def _oracle_staged_corners(n: int, stages) -> str:
    cte = [
        f"img AS MATERIALIZED (SELECT image_id, w, h, lon AS lon_c, "
        f"lat AS lat_c FROM ({synth.images_cte(n, 'duckdb')})), "
        f"c0 AS MATERIALIZED (SELECT image_id, corner, "
        f"{_WCORNER_LON_CASE} AS lon, {_WCORNER_LAT_CASE} AS lat "
        f"FROM img, (SELECT unnest(['tl', 'tr', 'bl', 'br']) "
        f"AS corner) cs)"
    ]
    prev = "c0"
    for k, (col, expr) in enumerate(stages):
        name = f"w{k}"
        cte.append(
            f"{name} AS MATERIALIZED (SELECT *, {expr} AS {col} "
            f"FROM {prev})"
        )
        prev = name
    return (
        "WITH " + ", ".join(cte)
        + f" SELECT image_id, corner, "
        f"cast(floor(easting * 10.0E0) as bigint) AS e_dm, "
        f"cast(floor(northing * 10.0E0) as bigint) AS n_dm FROM {prev}"
    )


def moll_corners(images: DataFrame) -> DataFrame:
    """(image_id, corner, e_dm, n_dm) in World Mollweide (ESRI:54009)
    — map-only JVM stage, zero Python, dm-quantized."""
    return _staged_corners(
        images, srs.moll_stage_list(srs.MOLL_REGISTRY[54009])
    )


def oracle_moll_corners(n: int) -> str:
    return _oracle_staged_corners(
        n, srs.moll_stage_list(srs.MOLL_REGISTRY[54009])
    )


def eqearth_corners(images: DataFrame) -> DataFrame:
    """(image_id, corner, e_dm, n_dm) in Equal Earth (EPSG:8857,
    ellipsoidal via authalic latitude) — map-only, zero Python."""
    return _staged_corners(
        images, srs.eqearth_stage_list(srs.EQE_REGISTRY[8857])
    )


def oracle_eqearth_corners(n: int) -> str:
    return _oracle_staged_corners(
        n, srs.eqearth_stage_list(srs.EQE_REGISTRY[8857])
    )
