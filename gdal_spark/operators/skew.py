"""Skew handling: salted aggregation + adaptive cell splitting.

The north rule requires explicit skew machinery for dense cells (25%
of the corpus sits in one 0.5-deg hot cell):

- ``adaptive_cells`` — the distributed analog of the warper's
  recursive chunk split (CollectChunkListInternal,
  alg/gdalwarpoperation.cpp:1264: split the destination until each
  piece fits): base-zoom cells whose row count exceeds a threshold
  are re-keyed to their fine-zoom descendants, so downstream
  groupBy/applyInPandas stages see bounded per-key cardinality. Pure
  Catalyst (window count + conditional re-key), deterministic, and
  reproducible in SQL for the oracle.
- ``salted_count`` — classic two-phase salted aggregation: partial
  aggregate on (key, salt), final aggregate on key. The salt is a
  deterministic function of a row id (reproducible, no RNG), the
  result provably equals the unsalted aggregation (the oracle runs
  the plain GROUP BY).

AQE's skew-join splitting handles the join-side skew automatically
(enabled in session.py); these operators cover the aggregation /
grouped-map side where AQE cannot help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cells import cell_id_sql, geodetic_tile_sql, merc_tile_sql


def adaptive_cells(
    df: DataFrame,
    base_zoom: int,
    fine_zoom: int,
    threshold: int,
    grid_kind: str = "mercator",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Assign each row a ``cell_id`` at base_zoom, except rows whose
    base cell holds more than ``threshold`` rows — those are re-keyed
    at fine_zoom. Adds ``cell_id`` + ``cell_zoom`` columns."""
    if fine_zoom <= base_zoom:
        raise ValueError("fine_zoom must be deeper than base_zoom")
    fn = merc_tile_sql if grid_kind == "mercator" else geodetic_tile_sql
    bx = fn(lon_col, lat_col, base_zoom, "x")
    by = fn(lon_col, lat_col, base_zoom, "y")
    fx = fn(lon_col, lat_col, fine_zoom, "x")
    fy = fn(lon_col, lat_col, fine_zoom, "y")
    base = df.withColumn("base_cell", F.expr(cell_id_sql(bx, by, base_zoom)))
    counts = base.withColumn(
        "base_n", F.count("*").over(Window.partitionBy("base_cell"))
    )
    return counts.select(
        *df.columns,
        F.expr(
            f"CASE WHEN base_n > {threshold} "
            f"THEN {cell_id_sql(fx, fy, fine_zoom)} ELSE base_cell END"
        ).alias("cell_id"),
        F.expr(
            f"CASE WHEN base_n > {threshold} THEN {fine_zoom} "
            f"ELSE {base_zoom} END"
        ).alias("cell_zoom"),
    )


def oracle_adaptive_cells(
    images_cte: str, base_zoom: int, fine_zoom: int, threshold: int
) -> str:
    """Per-final-cell histogram of the adaptive assignment (DuckDB)."""
    bx = merc_tile_sql("lon", "lat", base_zoom, "x")
    by = merc_tile_sql("lon", "lat", base_zoom, "y")
    fx = merc_tile_sql("lon", "lat", fine_zoom, "x")
    fy = merc_tile_sql("lon", "lat", fine_zoom, "y")
    return (
        f"WITH b AS (SELECT *, {cell_id_sql(bx, by, base_zoom)} AS base_cell "
        f"FROM ({images_cte})), "
        f"c AS (SELECT *, count(*) OVER (PARTITION BY base_cell) AS base_n "
        f"FROM b), "
        f"f AS (SELECT CASE WHEN base_n > {threshold} "
        f"THEN {cell_id_sql(fx, fy, fine_zoom)} ELSE base_cell END AS cell_id, "
        f"CASE WHEN base_n > {threshold} THEN {fine_zoom} ELSE {base_zoom} END "
        f"AS cell_zoom FROM c) "
        f"SELECT cell_id, cell_zoom, count(*) AS n FROM f GROUP BY 1, 2"
    )


def salted_count(
    df: DataFrame, key_col: str, salt_col_expr: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase salted count + sum demonstration: partial aggregate
    on (key, salt), final on key. ``salt_col_expr`` must be a
    deterministic SQL expression (e.g. 'i % 16') so the plan is
    reproducible; result == the unsalted aggregation."""
    partial = (
        df.withColumn("salt", F.expr(f"({salt_col_expr}) % {n_salts}"))
        .groupBy(key_col, "salt")
        .agg(F.count("*").alias("pn"))
    )
    return partial.groupBy(key_col).agg(
        F.sum("pn").alias("n"), F.count("*").alias("n_salts_used")
    )


# ---------------------------------------------------------------------------
# STR spatial packing (Leutenegger, Lopez, Edgington 1997, "STR: A
# Simple and Efficient Algorithm for R-Tree Packing"): sort by x,
# slice into S vertical slabs of equal count, sort each slab by y,
# slice into S cells — P = S^2 spatially-coherent partitions with
# EQUAL row counts regardless of skew. This is the load-balancing
# complement to adaptive_cells: adaptive splitting bounds per-KEY
# cardinality for grid-keyed operators; STR packs arbitrary point/
# envelope sets into equal-size partitions for partition-parallel
# stages (the Sedona/ESRI spatial-partitioning pattern).


def str_pack(images: DataFrame, s: int = 8) -> DataFrame:
    """Exact rank-based STR over the image centroids: per-cell
    (slab, cell, n_rows, w_lon_key, e_lon_key, s_lat_key, n_lat_key)
    with 1e6-floor boundary keys. Every cell count is within 1 row of
    n/s^2 BY CONSTRUCTION — the balance the oracle verifies.

    Scale note: the exact variant ranks with a global sort (fine at
    gate scale and for driver-side boundary computation on a SAMPLE);
    the production path computes the slab/cell boundaries from this
    on a ~1e5-row sample, broadcasts them, and assigns the full table
    map-side (str_assign_bounds) — the standard sample-then-partition
    pattern."""
    n_expr = F.count("*").over(Window.partitionBy())
    ranked = (
        images.select("i", "lon", "lat")
        .withColumn("n", n_expr)
        .withColumn(
            "rx",
            F.row_number().over(Window.orderBy("lon", "i")) - 1,
        )
        .withColumn("slab", F.expr(f"rx div (((n + {s * s} - 1) div {s * s}) * {s})"))
        .withColumn(
            "ry",
            F.row_number().over(
                Window.partitionBy("slab").orderBy("lat", "i")
            ) - 1,
        )
        .withColumn("cell", F.expr(f"ry div ((n + {s * s} - 1) div {s * s})"))
    )
    return ranked.groupBy("slab", "cell").agg(
        F.expr("cast(count(*) as bigint) AS n_rows"),
        F.expr("cast(floor(min(lon) * 1000000.0E0) as bigint) AS w_lon_key"),
        F.expr("cast(floor(max(lon) * 1000000.0E0) as bigint) AS e_lon_key"),
        F.expr("cast(floor(min(lat) * 1000000.0E0) as bigint) AS s_lat_key"),
        F.expr("cast(floor(max(lat) * 1000000.0E0) as bigint) AS n_lat_key"),
    )


def oracle_str_pack(n: int, s: int = 8) -> str:
    from .. import synth

    chunk = f"((({n} + {s * s} - 1) // {s * s}))"
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}), "
        f"rx AS (SELECT i, lon, lat, "
        f"row_number() OVER (ORDER BY lon, i) - 1 AS rx FROM img), "
        f"sl AS (SELECT i, lon, lat, rx // ({chunk} * {s}) AS slab FROM rx), "
        f"ry AS (SELECT slab, lon, lat, "
        f"row_number() OVER (PARTITION BY slab ORDER BY lat, i) - 1 AS ry "
        f"FROM sl) "
        f"SELECT slab, ry // {chunk} AS cell, "
        f"cast(count(*) as bigint) AS n_rows, "
        f"cast(floor(min(lon) * 1000000.0E0) as bigint) AS w_lon_key, "
        f"cast(floor(max(lon) * 1000000.0E0) as bigint) AS e_lon_key, "
        f"cast(floor(min(lat) * 1000000.0E0) as bigint) AS s_lat_key, "
        f"cast(floor(max(lat) * 1000000.0E0) as bigint) AS n_lat_key "
        f"FROM ry GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key — the Iceberg/Delta data-layout
# sort order: interleaving tile-index bits makes spatially-near tiles
# file-near, so a spatial range scan prunes to O(few) key ranges.
# Pure integer bit arithmetic, identical in both dialects.

Z_BITS = 16


def zorder_sql(dialect: str, tx: str, ty: str, bits: int = Z_BITS) -> str:
    if dialect == "spark":
        return (
            f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
            f"(acc, b) -> acc + shiftleft(({tx} div shiftleft(cast(1 as bigint), b)) % 2, 2 * b) "
            f"+ shiftleft(({ty} div shiftleft(cast(1 as bigint), b)) % 2, 2 * b + 1))"
        )
    return (
        f"cast(list_sum(list_transform(range(0, {bits}), "
        f"b -> ((({tx} // (cast(1 as bigint) << b)) % 2) << (2 * b)) "
        f"+ ((({ty} // (cast(1 as bigint) << b)) % 2) << (2 * b + 1)))) as bigint)"
    )


def zorder_layout(images: DataFrame, zoom: int = 12, bucket_shift: int = 8) -> DataFrame:
    """Assign each image's z-``zoom`` mercator tile a Morton key and
    report per key-bucket (zkey >> bucket_shift) row counts + tile
    extents — the write-side clustering summary an Iceberg
    sort-order compaction would produce."""
    tx = merc_tile_sql("lon", "lat", zoom, "x")
    ty = merc_tile_sql("lon", "lat", zoom, "y")
    keyed = images.selectExpr(
        f"cast({tx} as bigint) AS tx", f"cast({ty} as bigint) AS ty"
    ).selectExpr("tx", "ty", f"{zorder_sql('spark', 'tx', 'ty')} AS zkey")
    return keyed.selectExpr(
        f"zkey div {1 << bucket_shift} AS zbucket", "tx", "ty", "zkey"
    ).groupBy("zbucket").agg(
        F.expr("cast(count(*) as bigint) AS n_rows"),
        F.expr("cast(min(zkey) as bigint) AS zmin"),
        F.expr("cast(max(zkey) as bigint) AS zmax"),
        F.expr("cast(min(tx) as bigint) AS tx_min"),
        F.expr("cast(max(tx) as bigint) AS tx_max"),
        F.expr("cast(min(ty) as bigint) AS ty_min"),
        F.expr("cast(max(ty) as bigint) AS ty_max"),
    )


def oracle_zorder_layout(n: int, zoom: int = 12, bucket_shift: int = 8) -> str:
    from .. import synth

    tx = merc_tile_sql("lon", "lat", zoom, "x")
    ty = merc_tile_sql("lon", "lat", zoom, "y")
    z = zorder_sql("duckdb", "tx", "ty")
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}), "
        f"t AS (SELECT cast({tx} as bigint) AS tx, "
        f"cast({ty} as bigint) AS ty FROM img), "
        f"k AS (SELECT tx, ty, {z} AS zkey FROM t) "
        f"SELECT zkey // {1 << bucket_shift} AS zbucket, "
        f"cast(count(*) as bigint) AS n_rows, "
        f"cast(min(zkey) as bigint) AS zmin, cast(max(zkey) as bigint) AS zmax, "
        f"cast(min(tx) as bigint) AS tx_min, cast(max(tx) as bigint) AS tx_max, "
        f"cast(min(ty) as bigint) AS ty_min, cast(max(ty) as bigint) AS ty_max "
        f"FROM k GROUP BY 1"
    )


def str_bounds_from_sample(sample_pdf, s: int = 8):
    """Driver-side STR boundaries from a sample (the production
    path): returns (lon_cuts [s-1], lat_cuts [s][s-1])."""
    import numpy as np

    lon = np.sort(sample_pdf["lon"].to_numpy())
    qs = [len(lon) * k // s for k in range(1, s)]
    lon_cuts = [float(lon[q]) for q in qs]
    lat_cuts = []
    slab_of = np.searchsorted(lon_cuts, sample_pdf["lon"].to_numpy(), "right")
    for k in range(s):
        lat = np.sort(sample_pdf["lat"].to_numpy()[slab_of == k])
        if len(lat) == 0:
            lat_cuts.append([0.0] * (s - 1))
            continue
        qs2 = [len(lat) * j // s for j in range(1, s)]
        lat_cuts.append([float(lat[q]) for q in qs2])
    return lon_cuts, lat_cuts


def str_assign(images: DataFrame, lon_cuts, lat_cuts) -> DataFrame:
    """Map-side STR partition assignment from broadcast boundaries:
    (.. original columns .., slab, cell) — no shuffle, no window; the
    full-table counterpart of the sampled bounds."""
    from ..synth import flit

    def arr(vals):
        return "array(" + ", ".join(flit(v) for v in vals) + ")"

    slab = f"size(filter({arr(lon_cuts)}, c -> c <= lon))"
    cases = " ".join(
        f"WHEN {k} THEN size(filter({arr(lat_cuts[k])}, c -> c <= lat))"
        for k in range(len(lat_cuts))
    )
    return images.withColumn("slab", F.expr(f"cast({slab} as int)")).withColumn(
        "cell", F.expr(f"cast(CASE slab {cases} END as int)")
    )
