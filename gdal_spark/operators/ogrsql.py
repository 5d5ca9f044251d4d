"""OGR SQL surface — the reference's query engine, Catalyst-native.

OGR SQL (ogr/swq_parser.y grammar; evaluator ogr/swq_op_general.cpp;
execution ogr/ogrsf_frmts/generic/ogr_gensql.cpp) supports:
SELECT [DISTINCT] list, WHERE (LIKE/ILIKE, IN, BETWEEN, IS NULL,
logic, arithmetic), equi-JOIN/LEFT JOIN (index-nested-loop,
ogr_gensql.cpp:1176), whole-layer aggregates AVG/MIN/MAX/COUNT/SUM +
COUNT(DISTINCT) (PrepareSummary :818), ORDER BY (in-memory sort index
:1938), LIMIT/OFFSET (swq_parser.y:876), UNION ALL
(gdaldataset.cpp:6437), and scalar functions CONCAT/SUBSTR/CAST
(swq_op_registrar.cpp:44-75).

Every one of these maps 1:1 onto Catalyst operators — filter pushdown,
column pruning, broadcast-hash join (replacing the index-NL join),
partial+final aggregation, range-partitioned sort. These queries
exercise that mapping over the TPC-H-ish parquet tables and are
value-checked against DuckDB running the identical ANSI SQL.

Windowed ranking (absent from OGR SQL; listed in SURVEY 2.5 as free
in Spark) is included over the events table.

Double aggregates are scaled to integer cents BEFORE summation
(floor(x*100 + 0.5)) so sums are exact and order-independent — the
same trick the embedding ops use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

CENTS = "cast(floor(l_extendedprice * 100.0E0 + 0.5E0) as bigint)"
OCENTS = "cast(floor(o_totalprice * 100.0E0 + 0.5E0) as bigint)"
QKEY = "cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_where(spark, sf_dir):
    """WHERE: LIKE + BETWEEN + IN + boolean logic (SetAttributeFilter
    pushdown -> Catalyst filter + parquet predicate pushdown)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            "l_returnflag LIKE 'R%' AND l_quantity BETWEEN 10 AND 20 "
            "AND l_linenumber IN (1, 2, 3) AND l_discount IS NOT NULL"
        )
        .selectExpr("l_orderkey", "l_linenumber", f"{QKEY} AS qty_cents")
    )


ORACLE_WHERE = (
    "SELECT l_orderkey, l_linenumber, "
    "cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint) AS qty_cents "
    "FROM lineitem WHERE l_returnflag LIKE 'R%' "
    "AND l_quantity BETWEEN 10 AND 20 AND l_linenumber IN (1, 2, 3) "
    "AND l_discount IS NOT NULL"
)


def q_join(spark, sf_dir):
    """Equi-join orders->customer. OGR does per-row index-NL fetch
    (ogr_gensql.cpp:1303); Spark broadcasts the dim side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(f"sum({OCENTS})").alias("total_cents"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


ORACLE_JOIN = (
    "SELECT c_mktsegment, count(*) AS n_orders, "
    "cast(sum(cast(floor(o_totalprice * 100.0E0 + 0.5E0) as bigint)) as bigint) AS total_cents, "
    "count(DISTINCT o_custkey) AS n_custs "
    "FROM orders LEFT JOIN customer ON o_custkey = c_custkey "
    "GROUP BY c_mktsegment"
)


def q_agg(spark, sf_dir):
    """Whole-layer aggregates incl. COUNT(DISTINCT) — OGR
    PrepareSummary's single pass, as partial+final aggregation."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_returnflag").alias("min_flag"),
        F.max("l_returnflag").alias("max_flag"),
        F.expr(f"sum({CENTS})").alias("price_cents"),
        F.expr(f"min({QKEY})").alias("min_qty"),
        F.expr(f"max({QKEY})").alias("max_qty"),
    )


ORACLE_AGG = (
    "SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders, "
    "min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag, "
    "cast(sum(cast(floor(l_extendedprice * 100.0E0 + 0.5E0) as bigint)) as bigint) AS price_cents, "
    "min(cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint)) AS min_qty, "
    "max(cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint)) AS max_qty "
    "FROM lineitem"
)


def q_group_having(spark, sf_dir):
    """GROUP BY + HAVING (OGR SQL swq HAVING clause,
    ogr/swq_parser.y) — an aggregate-predicate filter after the
    partial+final aggregation, pushed as a post-agg Catalyst filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"sum({CENTS})").alias("price_cents"),
            F.expr(f"max({QKEY})").alias("max_qty"),
        )
        .filter("n > 100 AND max_qty >= 4000")
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_HAVING = (
    "SELECT l_returnflag, l_linestatus, count(*) AS n, "
    "cast(sum(cast(floor(l_extendedprice * 100.0E0 + 0.5E0) as bigint)) "
    "as bigint) AS price_cents, "
    "max(cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint)) AS max_qty "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus "
    "HAVING count(*) > 100 AND "
    "max(cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint)) >= 4000 "
    "ORDER BY l_returnflag, l_linestatus"
)


def q_orderby_limit(spark, sf_dir):
    """Multi-key ORDER BY + LIMIT + OFFSET (CreateOrderByIndex +
    swq LIMIT/OFFSET) — range-partitioned sort + row_number offset."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_linenumber", f"{QKEY} AS qty_cents"
    )
    win = Window.orderBy(
        F.desc("qty_cents"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(win))
        .filter("rn > 10 AND rn <= 60")
        .select("rn", "l_orderkey", "l_linenumber", "qty_cents")
    )


ORACLE_ORDERBY = (
    "SELECT rn, l_orderkey, l_linenumber, qty_cents FROM ("
    "SELECT l_orderkey, l_linenumber, "
    "cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint) AS qty_cents, "
    "row_number() OVER (ORDER BY "
    "cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint) DESC, "
    "l_orderkey, l_linenumber) AS rn FROM lineitem) "
    "WHERE rn > 10 AND rn <= 60"
)


def q_union_distinct(spark, sf_dir):
    """UNION ALL of chained selects + SELECT DISTINCT
    (swq_parser.y:632, SWQM_DISTINCT_LIST)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter("l_quantity < 5").selectExpr(
        "l_returnflag AS flag", "l_linestatus AS status"
    )
    b = li.filter("l_quantity > 45").selectExpr(
        "l_returnflag AS flag", "l_linestatus AS status"
    )
    return a.unionAll(b).distinct()


ORACLE_UNION = (
    "SELECT DISTINCT flag, status FROM ("
    "SELECT l_returnflag AS flag, l_linestatus AS status FROM lineitem "
    "WHERE l_quantity < 5 "
    "UNION ALL "
    "SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 45)"
)


def q_scalars(spark, sf_dir):
    """Scalar surface: CONCAT, SUBSTR, CAST, ILIKE, CASE
    (swq_op_registrar.cpp:44-75 -> Spark SQL builtins)."""
    return _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "concat(c_name, '/', c_mktsegment) AS tag",
        "substr(c_name, 1, 8) AS name8",
        "cast(c_acctbal as bigint) AS bal_trunc",
        "cast(c_custkey as string) AS key_str",
        "CASE WHEN c_name ILIKE '%a%' THEN 1 ELSE 0 END AS has_a",
        "length(c_mktsegment) AS seg_len",
    )


ORACLE_SCALARS = (
    "SELECT c_custkey, concat(c_name, '/', c_mktsegment) AS tag, "
    "substr(c_name, 1, 8) AS name8, "
    "cast(trunc(c_acctbal) as bigint) AS bal_trunc, "
    "cast(c_custkey as varchar) AS key_str, "
    "CASE WHEN c_name ILIKE '%a%' THEN 1 ELSE 0 END AS has_a, "
    "length(c_mktsegment) AS seg_len FROM customer"
)


def q_events_window(spark, sf_dir):
    """Analytic window functions over the events stream table
    (SURVEY 2.5: not in OGR SQL, free in Spark): per-user ranking by
    time + running event count."""
    ev = _t(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(win))
        .withColumn("prev_type", F.lag("event_type").over(win))
        .filter("rk <= 3")
        .selectExpr(
            "user_id",
            "rk",
            "event_id",
            "unix_micros(cast(ts as timestamp)) AS ts_us",
            "event_type",
            "coalesce(prev_type, '') AS prev_type",
        )
    )


ORACLE_EVENTS_WINDOW = (
    "SELECT user_id, rk, event_id, epoch_us(ts) AS ts_us, event_type, "
    "coalesce(prev_type, '') AS prev_type FROM ("
    "SELECT user_id, event_id, ts, event_type, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk, "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type FROM events) WHERE rk <= 3"
)


def q_union_layers(spark, sf_dir):
    """OGRUnionLayer: virtual concatenation with schema merge
    (ogr/ogrsf_frmts/generic/ogrunionlayer.cpp) — unionByName with
    allowMissingColumns; absent fields become NULL."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS k", "'lineitem' AS src", f"{QKEY} AS qty_cents"
    )
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k", "'orders' AS src", f"{OCENTS} AS price_cents"
    )
    return (
        li.unionByName(o, allowMissingColumns=True)
        .groupBy("src")
        .agg(
            F.count("*").alias("n"),
            F.sum("qty_cents").alias("qty_cents_sum"),
            F.sum("price_cents").alias("price_cents_sum"),
        )
    )


ORACLE_UNION_LAYERS = (
    "SELECT src, count(*) AS n, "
    "cast(sum(qty_cents) as bigint) AS qty_cents_sum, "
    "cast(sum(price_cents) as bigint) AS price_cents_sum FROM ("
    "SELECT l_orderkey AS k, 'lineitem' AS src, "
    "cast(floor(l_quantity * 100.0E0 + 0.5E0) as bigint) AS qty_cents, "
    "NULL AS price_cents FROM lineitem "
    "UNION ALL SELECT o_orderkey, 'orders', NULL, "
    "cast(floor(o_totalprice * 100.0E0 + 0.5E0) as bigint) FROM orders) "
    "GROUP BY src"
)


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization over the events stream (30-min
    inactivity gap): lag + cumulative new-session flags; per session
    (user_id, session_idx, n_events, start/end us). The stateful-
    streaming analog is applyInPandasWithState with a session
    timeout; batch and stream share these exact semantics."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "unix_micros(cast(ts as timestamp)) AS us"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = 30 * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_s",
        F.expr(
            f"CASE WHEN lag(us) OVER (PARTITION BY user_id "
            f"ORDER BY us, event_id) IS NULL THEN 1 "
            f"WHEN us - lag(us) OVER (PARTITION BY user_id "
            f"ORDER BY us, event_id) > {gap} THEN 1 ELSE 0 END"
        ),
    ).withColumn("session_idx", F.sum("new_s").over(w))
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


ORACLE_SESSIONIZE = (
    "WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), "
    "f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL THEN 1 "
    "WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s "
    "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
    "s AS (SELECT *, cast(sum(new_s) OVER (PARTITION BY user_id "
    "ORDER BY us, event_id) as bigint) AS session_idx FROM f) "
    "SELECT user_id, session_idx, count(*) AS n_events, "
    "min(us) AS start_us, max(us) AS end_us "
    "FROM s GROUP BY 1, 2"
)


def q_hstore(spark, sf_dir):
    """HSTORE_GET_VALUE (ogr/swq_op_registrar.cpp HSTORE) — keyed
    lookup inside a packed property column, as JSON extraction
    (MapType/element_at being the other Spark-native spelling)."""
    return (
        _t(spark, sf_dir, "events")
        .selectExpr(
            "event_id",
            "cast(get_json_object(props, '$.k') as bigint) AS k_val",
        )
        .filter("k_val >= 90")
    )


ORACLE_HSTORE = (
    "SELECT event_id, cast(json_extract(props, '$.k') as bigint) AS k_val "
    "FROM events WHERE cast(json_extract(props, '$.k') as bigint) >= 90"
)


QUERIES = {
    "ogr_sql_where": (q_where, ORACLE_WHERE),
    "ogr_sql_join": (q_join, ORACLE_JOIN),
    "ogr_sql_agg": (q_agg, ORACLE_AGG),
    "ogr_sql_orderby_limit": (q_orderby_limit, ORACLE_ORDERBY),
    "ogr_sql_union_distinct": (q_union_distinct, ORACLE_UNION),
    "ogr_sql_scalars": (q_scalars, ORACLE_SCALARS),
    "events_window_rank": (q_events_window, ORACLE_EVENTS_WINDOW),
    "ogr_union_layers": (q_union_layers, ORACLE_UNION_LAYERS),
    "events_sessionize": (q_sessionize, ORACLE_SESSIONIZE),
    "ogr_hstore_get": (q_hstore, ORACLE_HSTORE),
}
