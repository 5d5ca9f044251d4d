"""Independent checks: ogrdissolve slab union area and the
view->purchase attribution join (batch + stream-stream twin)."""

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

from gdal_spark import streaming, synth
from gdal_spark.operators import dissolve


# ---------------------------------------------------------------------------
# dissolve


def _brute_union_area_u(boxes):
    """Independent slab-free union area: y-interval merging per
    distinct x strip, intervals merged with plain python sets of
    (ybot, ytop) — same 1e-9 quantization applied per merged island
    per strip, mirroring the operator's contract."""
    out = 0
    xs = sorted({b[0] for b in boxes} | {b[1] for b in boxes})
    for x0, x1 in zip(xs, xs[1:]):
        ivs = sorted(
            (b[2], b[3]) for b in boxes if b[0] <= x0 and b[1] >= x1
        )
        merged = []
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        for lo, hi in merged:
            out += math.floor(1e9 * (hi - lo) * (x1 - x0))
    return out


def test_dissolve_area_brute(spark):
    m = 64
    got = {
        r.category: (r.n_features, r.union_area_u)
        for r in dissolve.dissolve_area(spark, m).collect()
    }
    pdf = duckdb.sql(synth.polygons_sql_cte(m, "duckdb")).df()
    rects = pdf[pdf.kind.isin(["box", "hot_box"])]
    assert set(got) == set(rects.category.unique())
    for cat, grp in rects.groupby("category"):
        boxes = [
            (p.cx - p.hw, p.cx + p.hw, p.cy - p.hh, p.cy + p.hh)
            for _, p in grp.iterrows()
        ]
        assert got[cat][0] == len(boxes)
        want = _brute_union_area_u(boxes)
        # the operator quantizes per (slab, island); the brute check
        # quantizes per (strip, island) over the same strip boundaries
        # -> identical decomposition, identical quanta
        assert got[cat][1] == want


def test_dissolve_union_bounds(spark):
    """Union area <= sum of areas; >= each single area; overlapping
    hot boxes strictly below their raw sum."""
    m = 64
    rows = dissolve.dissolve_area(spark, m).collect()
    pdf = duckdb.sql(synth.polygons_sql_cte(m, "duckdb")).df()
    rects = pdf[pdf.kind.isin(["box", "hot_box"])]
    for r in rows:
        grp = rects[rects.category == r.category]
        areas = [4.0 * p.hw * p.hh for _, p in grp.iterrows()]
        union = r.union_area_u / 1e9
        assert union <= sum(areas) + 1e-6
        assert union >= max(areas) - 1e-6


# ---------------------------------------------------------------------------
# attribution


def test_attribution_brute(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = ev.selectExpr(
        "event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) AS us",
    ).collect()
    views = [(r.user_id, r.event_id, r.us) for r in rows if r.event_type == "view"]
    buys = [(r.user_id, r.event_id, r.us) for r in rows if r.event_type == "purchase"]
    want = {}
    for u, bid, bus in buys:
        best = None
        for vu, vid, vus in views:
            if vu == u and vus <= bus and bus - vus <= streaming.ATTR_WINDOW_US:
                k = (vus, vid)
                if best is None or k > best[0]:
                    best = (k, vid, bus - vus)
        if best:
            want[bid] = (best[1], best[2])
    got = {
        r.purchase_event_id: (r.view_event_id, r.lag_us)
        for r in streaming.attribute_purchases(ev).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_attribution_pairs_equal_batch(spark, tmp_path):
    """Stream-stream interval join emits exactly the batch pair set."""
    import shutil

    src = str(tmp_path / "attr_dir")
    (tmp_path / "attr_dir").mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src + "/part-000.parquet")
    batch = spark.read.parquet(src)
    from pyspark.sql import functions as F

    base = batch.selectExpr(
        "event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) AS us",
    )
    views = base.filter("event_type = 'view'").selectExpr(
        "user_id", "event_id AS view_event_id", "us AS view_us"
    )
    buys = base.filter("event_type = 'purchase'").selectExpr(
        "user_id", "event_id AS purchase_event_id", "us AS buy_us"
    )
    exp = set(
        (r.purchase_event_id, r.view_event_id)
        for r in buys.join(views, "user_id")
        .filter(
            (F.col("view_us") <= F.col("buy_us"))
            & (F.col("buy_us") - F.col("view_us") <= streaming.ATTR_WINDOW_US)
        )
        .collect()
    )

    sdf = streaming.stream_attribute_pairs(spark, src, batch.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = set(
        (r.purchase_event_id, r.view_event_id)
        for r in spark.table("attr_pairs").collect()
    )
    assert got == exp
    assert len(got) > 0
