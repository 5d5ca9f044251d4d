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
