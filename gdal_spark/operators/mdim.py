"""Multidimensional-array operators (gdalmdimtranslate /
GDALMDArray::GetView).

Reference semantics: gcore/gdalmultidim.cpp `GDALMDArray::GetView`
(slicing, gcore/gdal_priv.h:2821) and `Transpose` (:2847);
apps/gdalmdimtranslate_lib.cpp `-subset d(min,max)` (trim a dimension
to an index range) and `-scaleaxes d(k)` (decimate a dimension by an
integer factor, keeping every k-th sample). SURVEY §2 declared the
multidim model out of scope for v1; this is the minimal honest slice
of it: the netCDF-style (t, y, x) cube as a TABLE of (dim indices,
value) rows — the layout a 100 TB Zarr/netCDF ingest lands as anyway
— with view operations as pure-Catalyst filters + index remaps, and
per-slice aggregates as the verification surface.

Spark shape: the cube never materializes driver-side. Index ranges
explode JVM-side (``explode(sequence(...))``), the view is a WHERE +
reindex projection (predicate-pushdown friendly), and the per-slice
checksum/stats are one map-side-combined groupBy. A trim/stride view
of a parquet-backed cube prunes row groups by the dim predicates —
the same effect GetView's lazy windowing has in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic synthetic cube value (kept integer; the mix constants
# are arbitrary primes, shared verbatim by both dialects)
_VAL = "((t * 131071 + y * 8191 + x * 127 + 7) % 251)"


def cube_sql(dialect: str, nt: int, ny: int, nx: int) -> str:
    """The synthesized (t, y, x, val) cube in either dialect."""
    if dialect == "spark":
        return (
            f"SELECT t, y, x, cast({_VAL} as bigint) AS val FROM "
            f"(SELECT id AS t FROM range(0, {nt})) "
            f"LATERAL VIEW explode(sequence(0, {ny - 1})) AS y "
            f"LATERAL VIEW explode(sequence(0, {nx - 1})) AS x"
        )
    return (
        f"SELECT t, y, x, cast({_VAL} as bigint) AS val "
        f"FROM range(0, {nt}) a(t), range(0, {ny}) b(y), range(0, {nx}) c(x)"
    )


def mdim_view_sql(
    dialect: str,
    nt: int,
    ny: int,
    nx: int,
    trim_y: tuple[int, int],
    stride_x: int,
) -> str:
    """gdalmdimtranslate view: -subset y(y0,y1) -scaleaxes x(k) —
    trim then decimate, with view indices rebased to 0 (GetView
    returns a 0-based array). Emits (t, vy, vx, val)."""
    y0, y1 = trim_y
    cube = cube_sql(dialect, nt, ny, nx)
    return (
        f"SELECT t, y - {y0} AS vy, x div {stride_x} AS vx, val "
        f"FROM ({cube}) WHERE y >= {y0} AND y <= {y1} "
        f"AND x % {stride_x} = 0"
        if dialect == "spark"
        else f"SELECT t, y - {y0} AS vy, x // {stride_x} AS vx, val "
        f"FROM ({cube}) WHERE y >= {y0} AND y <= {y1} "
        f"AND x % {stride_x} = 0"
    )


def mdim_translate(
    spark,
    nt: int = 4,
    ny: int = 64,
    nx: int = 64,
    trim_y: tuple[int, int] = (8, 39),
    stride_x: int = 2,
) -> DataFrame:
    """Per-t-slice verification aggregate of the trimmed/strided
    view: (t, n_cells, vmin, vmax, vsum, idx_cks). ``idx_cks`` folds
    the VIEW indices into the sum (catches off-by-one rebase errors
    that value stats alone would miss)."""
    view = spark.sql(mdim_view_sql("spark", nt, ny, nx, trim_y, stride_x))
    return (
        view.selectExpr(
            "t", "val", "(val * 31 + vy * 7 + vx) % 65536 AS ic"
        )
        .groupBy("t")
        .agg(
            *[
                F.expr(e)
                for e in (
                    "cast(count(*) as bigint) AS n_cells",
                    "cast(min(val) as bigint) AS vmin",
                    "cast(max(val) as bigint) AS vmax",
                    "cast(sum(val) as bigint) AS vsum",
                    "cast(sum(ic) % 65536 as bigint) AS idx_cks",
                )
            ]
        )
    )


def oracle_mdim_translate(
    nt: int = 4,
    ny: int = 64,
    nx: int = 64,
    trim_y: tuple[int, int] = (8, 39),
    stride_x: int = 2,
) -> str:
    view = mdim_view_sql("duckdb", nt, ny, nx, trim_y, stride_x)
    return (
        f"WITH v AS ({view}) "
        f"SELECT t, cast(count(*) as bigint) AS n_cells, "
        f"cast(min(val) as bigint) AS vmin, "
        f"cast(max(val) as bigint) AS vmax, "
        f"cast(sum(val) as bigint) AS vsum, "
        f"cast(sum((val * 31 + vy * 7 + vx) % 65536) % 65536 as bigint) "
        f"AS idx_cks FROM v GROUP BY t"
    )


def mdim_transpose(
    spark, nt: int = 4, ny: int = 16, nx: int = 16
) -> DataFrame:
    """GDALMDArray::Transpose (t,y,x) -> (x,t,y): a pure index
    projection; verified by aggregating along the NEW leading axis
    and checking it equals the source's x-axis aggregate."""
    cube = spark.sql(cube_sql("spark", nt, ny, nx))
    return (
        cube.selectExpr("x AS d0", "t AS d1", "y AS d2", "val")
        .groupBy("d0")
        .agg(
            *[
                F.expr(e)
                for e in (
                    "cast(count(*) as bigint) AS n_cells",
                    "cast(sum(val) as bigint) AS vsum",
                    "cast(sum((val * 17 + d1 * 5 + d2) % 65536) % 65536 "
                    "as bigint) AS idx_cks",
                )
            ]
        )
    )


def oracle_mdim_transpose(nt: int = 4, ny: int = 16, nx: int = 16) -> str:
    cube = cube_sql("duckdb", nt, ny, nx)
    return (
        f"WITH v AS (SELECT x AS d0, t AS d1, y AS d2, val FROM ({cube})) "
        f"SELECT d0, cast(count(*) as bigint) AS n_cells, "
        f"cast(sum(val) as bigint) AS vsum, "
        f"cast(sum((val * 17 + d1 * 5 + d2) % 65536) % 65536 as bigint) "
        f"AS idx_cks FROM v GROUP BY d0"
    )


def mdim_resampled_sql(
    dialect: str, nt: int, ny: int, nx: int, fy: int, fx: int
) -> str:
    """GDALMDArray::GetResampled (gcore/gdalmultidim.cpp:7502,
    GDALMDArrayResampled — resampling applies to the trailing (y, x)
    dims, other dims pass through): AVERAGE decimation by integer
    factors (fy, fx) expressed as a pure groupBy over the cube table —
    each output cell is the mean of its fy*fx block, kept exact as
    (vsum, n_in) plus the micro-scaled floor mean."""
    cube = cube_sql(dialect, nt, ny, nx)
    div = "div" if dialect == "spark" else "//"
    return (
        f"SELECT t, y {div} {fy} AS ry, x {div} {fx} AS rx, "
        f"cast(sum(val) as bigint) AS vsum, "
        f"cast(count(*) as bigint) AS n_in, "
        f"cast(floor(1000000.0E0 * cast(sum(val) as double) "
        f"/ cast(count(*) as double)) as bigint) AS mean_u "
        f"FROM ({cube}) GROUP BY 1, 2, 3"
    )


def mdim_resampled(
    spark, nt: int = 4, ny: int = 64, nx: int = 64,
    fy: int = 2, fx: int = 4,
) -> DataFrame:
    """Per-t verification aggregate of the average-resampled view:
    (t, n_cells, sum_mean_u, idx_cks) — the index checksum folds the
    RESAMPLED indices so axis mix-ups cannot cancel."""
    view = spark.sql(mdim_resampled_sql("spark", nt, ny, nx, fy, fx))
    return (
        view.selectExpr(
            "t", "mean_u", "(mean_u * 13 + ry * 7 + rx) % 65536 AS ic"
        )
        .groupBy("t")
        .agg(
            *[
                F.expr(e)
                for e in (
                    "cast(count(*) as bigint) AS n_cells",
                    "cast(sum(mean_u) as bigint) AS sum_mean_u",
                    "cast(sum(ic) % 65536 as bigint) AS idx_cks",
                )
            ]
        )
    )


def oracle_mdim_resampled(
    nt: int = 4, ny: int = 64, nx: int = 64, fy: int = 2, fx: int = 4
) -> str:
    view = mdim_resampled_sql("duckdb", nt, ny, nx, fy, fx)
    return (
        f"WITH v AS ({view}) "
        f"SELECT t, cast(count(*) as bigint) AS n_cells, "
        f"cast(sum(mean_u) as bigint) AS sum_mean_u, "
        f"cast(sum((mean_u * 13 + ry * 7 + rx) % 65536) % 65536 as bigint) "
        f"AS idx_cks FROM v GROUP BY t"
    )
