"""ogrdissolve: merge a layer's geometries per attribute key and
report the dissolved (union) area (reference: ``apps/ogrdissolve.cpp``
— accumulates each key's geometries through OGRGeometry::Union and
emits one feature per key).

Instead of iterated pairwise unions (quadratic, and serial per key),
the union area is computed by slab decomposition — the classic
sweep-line union-of-rectangles, expressed relationally:

1. per key, the distinct x edges of all boxes, ranked -> vertical
   slabs [x_k, x_{k+1});
2. each box explodes into exactly the slabs it covers (two equi-joins
   on its own edge values recover the rank range, then
   ``explode(sequence(r0, r1-1))`` — linear in coverage, never a
   range/cross join);
3. per (key, slab), overlapping y intervals merge via an ordered
   window scan (running max of ymax -> islands);
4. each island contributes ``floor(1e9 * (ytop-ybot) * width)`` —
   quantized BEFORE the final sum, so summation order cannot matter
   and the result is bit-identical across engines.

Covers the axis-aligned kinds (box / hot_box), the same subset every
SQL-side PIP oracle uses. Scale: two shuffles (key+edge rank, key+slab
window) — both on keys that subdivide hot categories by slab, so a
skewed key fans out instead of serializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..synth import polygons_sql_cte

_RECTS = "('box', 'hot_box')"


def dissolve_area(spark, m_polys: int) -> DataFrame:
    """(category, n_features, n_slabs, union_area_u) — dissolved area
    per category in 1e-9 deg^2 quanta."""
    polys = spark.sql(polygons_sql_cte(m_polys, "spark"))
    boxes = polys.filter(F.expr(f"kind IN {_RECTS}")).selectExpr(
        "category", "j",
        "cx - hw AS xmin", "cx + hw AS xmax",
        "cy - hh AS ymin", "cy + hh AS ymax",
    )
    edges = (
        boxes.selectExpr("category", "xmin AS x")
        .union(boxes.selectExpr("category", "xmax AS x"))
        .distinct()
    )
    wr = Window.partitionBy("category").orderBy("x")
    ranked = edges.withColumn("r", F.row_number().over(wr))
    slabs = ranked.withColumn("x1", F.lead("x").over(wr)).filter(
        F.col("x1").isNotNull()
    ).selectExpr("category", "r", "x AS x0", "x1")
    r0 = ranked.selectExpr("category AS c0", "x AS e0", "r AS r_lo")
    r1 = ranked.selectExpr("category AS c1", "x AS e1", "r AS r_hi")
    cov = (
        boxes.join(
            r0, (F.col("category") == F.col("c0")) & (F.col("xmin") == F.col("e0"))
        )
        .join(r1, (F.col("category") == F.col("c1")) & (F.col("xmax") == F.col("e1")))
        .select(
            "category", "j", "ymin", "ymax",
            F.explode(F.expr("sequence(r_lo, r_hi - 1)")).alias("r"),
        )
        .join(slabs, ["category", "r"])
    )
    ws = Window.partitionBy("category", "r").orderBy("ymin", "ymax", "j")
    isl = (
        cov.withColumn(
            "run_max",
            F.max("ymax").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "brk",
            F.when(
                F.coalesce(
                    F.col("ymin") > F.lag("run_max").over(ws), F.lit(True)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    pieces = isl.groupBy("category", "r", "island").agg(
        F.min("ymin").alias("ybot"),
        F.max("ymax").alias("ytop"),
        F.first("x0").alias("x0"),
        F.first("x1").alias("x1"),
    ).selectExpr(
        "category", "r",
        "cast(floor(1000000000.0E0 * (ytop - ybot) * (x1 - x0)) as bigint) "
        "AS piece_u",
    )
    counts = boxes.groupBy("category").agg(
        F.count("*").cast("bigint").alias("n_features")
    )
    out = pieces.groupBy("category").agg(
        F.sum("piece_u").cast("bigint").alias("union_area_u"),
        F.countDistinct("r").cast("bigint").alias("n_slabs"),
    )
    return counts.join(out, "category").select(
        "category", "n_features", "n_slabs", "union_area_u"
    )


def oracle_dissolve_area(m_polys: int) -> str:
    return (
        f"WITH polys AS ({polygons_sql_cte(m_polys, 'duckdb')}), "
        f"boxes AS MATERIALIZED (SELECT category, j, cx - hw AS xmin, "
        f"cx + hw AS xmax, cy - hh AS ymin, cy + hh AS ymax "
        f"FROM polys WHERE kind IN {_RECTS}), "
        f"edges AS (SELECT DISTINCT category, x FROM ("
        f"SELECT category, xmin AS x FROM boxes "
        f"UNION SELECT category, xmax AS x FROM boxes)), "
        f"ranked AS MATERIALIZED (SELECT category, x, row_number() OVER "
        f"(PARTITION BY category ORDER BY x) AS r FROM edges), "
        f"slabs AS (SELECT category, r, x AS x0, lead(x) OVER "
        f"(PARTITION BY category ORDER BY x) AS x1 FROM ranked), "
        f"cov AS (SELECT b.category, b.j, b.ymin, b.ymax, "
        f"unnest(range(lo.r, hi.r)) AS r "
        f"FROM boxes b JOIN ranked lo ON lo.category = b.category "
        f"AND lo.x = b.xmin JOIN ranked hi ON hi.category = b.category "
        f"AND hi.x = b.xmax), "
        f"covs AS (SELECT cov.*, s.x0, s.x1 FROM cov JOIN slabs s "
        f"ON s.category = cov.category AND s.r = cov.r), "
        f"scan AS (SELECT *, max(ymax) OVER (PARTITION BY category, r "
        f"ORDER BY ymin, ymax, j ROWS UNBOUNDED PRECEDING) AS run_max "
        f"FROM covs), "
        f"brks AS (SELECT *, CASE WHEN lag(run_max) OVER (PARTITION BY "
        f"category, r ORDER BY ymin, ymax, j) IS NULL "
        f"OR ymin > lag(run_max) OVER (PARTITION BY category, r "
        f"ORDER BY ymin, ymax, j) THEN 1 ELSE 0 END AS brk FROM scan), "
        f"isl AS (SELECT *, sum(brk) OVER (PARTITION BY category, r "
        f"ORDER BY ymin, ymax, j ROWS UNBOUNDED PRECEDING) AS island "
        f"FROM brks), "
        f"pieces AS (SELECT category, r, cast(floor(1000000000.0E0 * "
        f"(max(ymax) - min(ymin)) * (any_value(x1) - any_value(x0))) "
        f"as bigint) AS piece_u FROM isl GROUP BY category, r, island), "
        f"counts AS (SELECT category, cast(count(*) as bigint) "
        f"AS n_features FROM boxes GROUP BY category) "
        f"SELECT counts.category, n_features, "
        f"cast(count(DISTINCT pieces.r) as bigint) AS n_slabs, "
        f"cast(sum(piece_u) as bigint) AS union_area_u "
        f"FROM counts JOIN pieces ON pieces.category = counts.category "
        f"GROUP BY counts.category, n_features"
    )
