"""ogrlineref-style linear referencing: locate the point at measure m
along a line (reference: ``apps/ogrlineref.cpp`` — the -get_pos /
milepost machinery walks the line's segments, accumulating length
until the target measure falls inside a segment, then interpolates
linearly within it).

Here the lines are the outer rings of the SQL-representable synth
polygon kinds (box / hot_box / triangle) and the measures are fixed
perimeter fractions in ppm. Per the repo's cross-engine parity rule,
each segment length is integer-quantized (floor at 1e9) BEFORE the
cumulative walk — float summation order differs between Spark's
running window and DuckDB's segment-tree window, integers are
associative — so the segment choice and the interpolation parameter
are bit-identical across engines and the 1e6 floor keys need no
epsilon (sqrt itself is correctly rounded in both).

Scale: segments explode per feature (bounded fan-out), the cumulative
walk is a per-feature window, the measures are a tiny cross join —
one shuffle on the feature key, linear in layer size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..synth import polygons_sql_cte

FRAC_PPMS = (100_000, 350_000, 600_000, 850_000)
LEN_SCALE = 1_000_000_000  # 1e-9-degree length quanta

_KINDS = "('box', 'hot_box', 'triangle')"


def _segments_sql(dialect: str) -> str:
    """CASE expression: ring segments of the feature as a list of
    {s, x0, y0, x1, y1} structs, in ring order (CCW from the SW
    corner, matching the PIP oracle's vertex order)."""

    def st(s, x0, y0, x1, y1):
        if dialect == "spark":
            return (
                f"named_struct('s', cast({s} as bigint), 'x0', {x0}, "
                f"'y0', {y0}, 'x1', {x1}, 'y1', {y1})"
            )
        return (
            f"{{'s': cast({s} as bigint), 'x0': {x0}, 'y0': {y0}, "
            f"'x1': {x1}, 'y1': {y1}}}"
        )

    arr = "array" if dialect == "spark" else "list_value"
    tri = ", ".join(
        (
            st(0, "cx - hw", "cy - hh", "cx + hw", "cy - hh"),
            st(1, "cx + hw", "cy - hh", "cx", "cy + hh"),
            st(2, "cx", "cy + hh", "cx - hw", "cy - hh"),
        )
    )
    box = ", ".join(
        (
            st(0, "cx - hw", "cy - hh", "cx + hw", "cy - hh"),
            st(1, "cx + hw", "cy - hh", "cx + hw", "cy + hh"),
            st(2, "cx + hw", "cy + hh", "cx - hw", "cy + hh"),
            st(3, "cx - hw", "cy + hh", "cx - hw", "cy - hh"),
        )
    )
    return (
        f"(CASE WHEN kind = 'triangle' THEN {arr}({tri}) "
        f"ELSE {arr}({box}) END)"
    )


# dialect-neutral fragments (same text runs in both engines)
_SEG_LEN_U = (
    f"cast(floor({LEN_SCALE}.0E0 * "
    f"sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))) as bigint)"
)


def _m_u(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"((frac_ppm * total_u) {div} 1000000)"


def _point_sql(dialect: str) -> tuple[str, str]:
    m = _m_u(dialect)
    t = (
        f"(cast({m} - (cum_u - seg_len_u) as double) "
        f"/ cast(seg_len_u as double))"
    )
    return (
        f"x0 + {t} * (x1 - x0)",
        f"y0 + {t} * (y1 - y0)",
    )


def lineref_points(spark, m_polys: int) -> DataFrame:
    """(poly_id, frac_ppm, seg, px_key, py_key) — the point at each
    perimeter fraction, 1e6-floor keyed."""
    polys = spark.sql(polygons_sql_cte(m_polys, "spark"))
    segs = (
        polys.filter(F.expr(f"kind IN {_KINDS}"))
        .select("j", F.explode(F.expr(_segments_sql("spark"))).alias("u"))
        .select(
            "j", F.col("u.s").alias("s"),
            F.col("u.x0").alias("x0"), F.col("u.y0").alias("y0"),
            F.col("u.x1").alias("x1"), F.col("u.y1").alias("y1"),
        )
        .withColumn("seg_len_u", F.expr(_SEG_LEN_U))
    )
    w = Window.partitionBy("j").orderBy("s")
    segs = segs.withColumn(
        "cum_u",
        F.sum("seg_len_u").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("total_u", F.max("cum_u").over(Window.partitionBy("j")))
    fr = F.explode(
        F.expr(f"array({', '.join(f'{p}L' for p in FRAC_PPMS)})")
    ).alias("frac_ppm")
    m = _m_u("spark")
    px, py = _point_sql("spark")
    pts = (
        segs.select("*", fr)
        .filter(F.expr(f"{m} >= cum_u - seg_len_u AND {m} < cum_u"))
    )
    return pts.selectExpr(
        "concat('poly', lpad(cast(j as string), 4, '0')) AS poly_id",
        "frac_ppm",
        "s AS seg",
        f"cast(floor(1000000.0E0 * ({px})) as bigint) AS px_key",
        f"cast(floor(1000000.0E0 * ({py})) as bigint) AS py_key",
    )


def oracle_lineref_points(m_polys: int) -> str:
    fracs = ", ".join(str(p) for p in FRAC_PPMS)
    m = _m_u("duckdb")
    px, py = _point_sql("duckdb")
    return (
        f"WITH polys AS ({polygons_sql_cte(m_polys, 'duckdb')}), "
        f"segs0 AS (SELECT j, unnest({_segments_sql('duckdb')}) AS u "
        f"FROM polys WHERE kind IN {_KINDS}), "
        f"segs1 AS (SELECT j, u.s AS s, u.x0 AS x0, u.y0 AS y0, "
        f"u.x1 AS x1, u.y1 AS y1 FROM segs0), "
        f"segs AS (SELECT *, {_SEG_LEN_U} AS seg_len_u FROM segs1), "
        f"walk0 AS (SELECT *, cast(sum(seg_len_u) OVER (PARTITION BY j "
        f"ORDER BY s ROWS UNBOUNDED PRECEDING) as bigint) AS cum_u "
        f"FROM segs), "
        f"walk AS (SELECT *, max(cum_u) OVER (PARTITION BY j) AS total_u "
        f"FROM walk0), "
        f"pts AS (SELECT * FROM walk, (SELECT unnest([{fracs}]) AS frac_ppm) f "
        f"WHERE {m} >= cum_u - seg_len_u AND {m} < cum_u) "
        f"SELECT concat('poly', lpad(cast(j as varchar), 4, '0')) AS poly_id, "
        f"cast(frac_ppm as bigint) AS frac_ppm, s AS seg, "
        f"cast(floor(1000000.0E0 * ({px})) as bigint) AS px_key, "
        f"cast(floor(1000000.0E0 * ({py})) as bigint) AS py_key "
        f"FROM pts"
    )
