"""Cloud-Optimized GeoTIFF layout planning + gdaladdo partial
overview refresh.

Reference semantics:

- ``cog_layout``: frmts/gtiff/cogdriver.cpp — the COG profile writes
  all IFDs up front, then tile data with overview levels BEFORE the
  full-resolution level (smallest overview first), row-major within a
  level, each tile block carrying the 4-byte "ghost leader" (payload
  size, enabling one-request range reads) and a 4-byte trailer
  (duplicated last bytes, enabling truncated-read detection). The
  planner computes every tile's byte offset BEFORE any byte is
  written — the property that lets a distributed writer emit tiles in
  parallel and a reader issue exact range requests from the header
  alone. Per-tile "compressed" size is a deterministic function of the
  covered full-resolution content (the sandbox has no real deflate;
  the layout arithmetic — the planner's actual job — is exact).

- ``overview_partial_refresh``: the GDAL 3.8+ gdaladdo
  ``--partial-refresh-from-projwin`` flag (upstream apps/gdaladdo.cpp;
  this reference checkout predates it — its gdaladdo.cpp rebuilds
  pyramids whole, and the overview machinery being refreshed is
  gcore/overview.cpp) — after an in-place edit of a window of the
  base raster, recompute ONLY the overview tiles whose footprint
  intersects the dirty window at each level, instead of rebuilding
  the pyramid.

Scale notes: cog_layout's cumulative-offset window is a GLOBAL ordered
prefix sum, but it runs over the TILE table (metadata scale: a 10^5 x
10^5-pixel raster at 256-px tiles is ~1.5e5 rows per level), never
over pixels; the per-tile content stats underneath are one
map-side-combined groupBy over the pixel table. partial_refresh is
pure closed-form range arithmetic — zero scans of clean data, which is
the whole point of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dem import DEM_VALUE_SQL

# cog_layout fixture: 64x64 raster, 16-px tiles, 3 levels (full res +
# 2 overviews; the coarsest level is a single tile, GDAL's stop rule).
COG_W = 64
COG_TILE = 16
COG_LEVELS = 3
COG_HEADER = 2048  # header ghost area (IFDs + ghost-leader block)
COG_LEADER = 4  # ghost leader: LE uint32 payload size before each tile
COG_TRAILER = 4  # ghost trailer: last 4 payload bytes repeated


def _cog_tiles_sql(dialect: str, width: int, levels: int) -> str:
    """Per-(level, ty, tx) content sum over the full-res pixels each
    overview tile covers. All-integer: tile span at level l is
    COG_TILE * 2^l full-res pixels; non-negative operands, so Spark
    ``div`` and DuckDB ``//`` agree."""
    if dialect == "spark":
        src = (
            f"(SELECT id % {width} AS gx, id div {width} AS gy "
            f"FROM range(0, {width * width})) AS p, "
            f"LATERAL explode(sequence(0, {levels - 1})) AS t(level)"
        )
        tdiv = f"div (cast({COG_TILE} as bigint) * shiftleft(1, level))"
    else:
        src = (
            f"(SELECT a.gx, b.gy FROM range(0, {width}) a(gx), "
            f"range(0, {width}) b(gy)) p, range(0, {levels}) t(level)"
        )
        tdiv = f"// (cast({COG_TILE} as bigint) * (1 << level))"
    return (
        f"SELECT cast(level as bigint) AS level, "
        f"cast(gy {tdiv} as bigint) AS ty, "
        f"cast(gx {tdiv} as bigint) AS tx, "
        f"cast(sum({DEM_VALUE_SQL}) as bigint) AS content_sum "
        f"FROM {src} "
        f"GROUP BY 1, 2, 3"
    )


def _payload_sql() -> str:
    """Deterministic fake-codec compressed size for a tile."""
    return "cast(128 + content_sum % 997 as bigint)"


def cog_layout(
    spark, width: int = COG_W, levels: int = COG_LEVELS
) -> DataFrame:
    """(level, ty, tx, payload_bytes, offset_bytes): the exact byte
    position of every tile's payload in the COG stream — overview
    levels first (coarsest first), row-major within a level; offset
    points at the payload (the 4-byte ghost leader sits immediately
    before it, as TIFF TileOffsets does)."""
    from pyspark.sql import Window

    t = spark.sql(_cog_tiles_sql("spark", width, levels)).selectExpr(
        "level", "ty", "tx", f"{_payload_sql()} AS payload_bytes"
    )
    # COG stream order: level DESC (smallest overview first), then
    # row-major. The window runs over the tile table (metadata scale).
    w = Window.orderBy(F.desc("level"), F.asc("ty"), F.asc("tx"))
    block = F.col("payload_bytes") + F.lit(COG_LEADER + COG_TRAILER)
    return (
        t.withColumn("cum", F.sum(block).over(w))
        .selectExpr(
            "level", "ty", "tx", "payload_bytes",
            f"cast({COG_HEADER} + cum - payload_bytes - {COG_TRAILER} "
            f"as bigint) AS offset_bytes",
        )
    )


def oracle_cog_layout(width: int = COG_W, levels: int = COG_LEVELS) -> str:
    return (
        f"WITH t AS ({_cog_tiles_sql('duckdb', width, levels)}), "
        f"p AS (SELECT level, ty, tx, {_payload_sql()} AS payload_bytes "
        f"FROM t) "
        f"SELECT level, ty, tx, payload_bytes, "
        f"cast({COG_HEADER} + sum(payload_bytes + "
        f"{COG_LEADER + COG_TRAILER}) OVER (ORDER BY level DESC, ty, tx) "
        f"- payload_bytes - {COG_TRAILER} as bigint) AS offset_bytes "
        f"FROM p"
    )


# ---------------------------------------------------------------------------
# gdaladdo --partial-refresh-from-projwin

PR_W = 512
PR_TILE = 64
PR_LEVELS = 3  # overview factors 2, 4, 8
# the dirty window (pixel coords in the base raster, half-open)
PR_X0, PR_Y0, PR_X1, PR_Y1 = 130, 200, 310, 266


def _pr_select(dialect: str) -> str:
    """Dirty overview tiles per level, closed-form: the dirty pixel
    rect maps to [x0//f, ceil(x1/f)) at factor f = 2^level, then to
    the covering tile range. Also emits the level's total tile count
    so the skipped-clean-tiles saving is visible. All operands
    non-negative -> // and div agree."""
    if dialect == "spark":
        seq = "explode(sequence({a}, {b}))"
        levels = f"(SELECT explode(sequence(1, {PR_LEVELS})) AS level)"
        f_expr = "shiftleft(1, level)"
        idiv = " div "
    else:
        seq = "unnest(range({a}, {b} + 1))"
        levels = f"(SELECT unnest(range(1, {PR_LEVELS + 1})) AS level)"
        f_expr = "(1 << level)"
        idiv = " // "
    return (
        f"WITH lv AS (SELECT level, {f_expr} AS f FROM {levels} t), "
        f"r AS (SELECT level, f, "
        f"({PR_X0}{idiv}f){idiv}{PR_TILE} AS txa, "
        f"((({PR_X1} + f - 1){idiv}f) - 1){idiv}{PR_TILE} AS txb, "
        f"({PR_Y0}{idiv}f){idiv}{PR_TILE} AS tya, "
        f"((({PR_Y1} + f - 1){idiv}f) - 1){idiv}{PR_TILE} AS tyb, "
        f"((({PR_W} + f - 1){idiv}f) + {PR_TILE} - 1){idiv}{PR_TILE} "
        f"AS ntiles_1d "
        f"FROM lv), "
        f"tx AS (SELECT level, tya, tyb, ntiles_1d, "
        f"{seq.format(a='txa', b='txb')} AS tx FROM r), "
        f"txy AS (SELECT level, ntiles_1d, tx, "
        f"{seq.format(a='tya', b='tyb')} AS ty FROM tx) "
        f"SELECT cast(level as bigint) AS level, cast(tx as bigint) AS tx, "
        f"cast(ty as bigint) AS ty, "
        f"cast(ntiles_1d * ntiles_1d as bigint) AS level_tiles_total "
        f"FROM txy"
    )


def overview_partial_refresh(spark) -> DataFrame:
    """(level, tx, ty, level_tiles_total): the overview tiles a dirty
    projwin invalidates, per pyramid level — everything else is
    skipped, which is the operator's entire value at 10^12 pixels."""
    return spark.sql(_pr_select("spark"))


def oracle_overview_partial_refresh() -> str:
    return _pr_select("duckdb")
