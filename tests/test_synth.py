"""Synthesis consistency: Spark SQL == DuckDB SQL == numpy replica,
and codec invariants (lossless exact, lossy PSNR >= 40 dB)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gdal_spark import codecs, synth, wkb


def test_images_spark_equals_duckdb_and_pandas(spark):
    n = 512
    sdf = spark.sql(synth.images_cte(n, "spark")).orderBy("i").toPandas()
    ddf = duckdb.sql(synth.images_cte(n, "duckdb")).df().sort_values("i").reset_index(drop=True)
    pdf = synth.images_pdf(n)
    for col in ["image_id", "fmt", "caption"]:
        assert (sdf[col] == ddf[col]).all(), col
        assert (sdf[col] == pdf[col]).all(), col
    for col in ["lon", "lat"]:
        # bit-identical doubles across all three engines
        assert (sdf[col].values == ddf[col].values).all(), col
        assert (sdf[col].values == pdf[col].values).all(), col
    for col in ["w", "h"]:
        assert (sdf[col].values.astype(np.int64) == ddf[col].values.astype(np.int64)).all()


def test_hot_cell_skew():
    pdf = synth.images_pdf(4096)
    hot = (
        (pdf.lon >= synth.HOT_LON0)
        & (pdf.lon <= synth.HOT_LON0 + 0.5)
        & (pdf.lat >= synth.HOT_LAT0)
        & (pdf.lat <= synth.HOT_LAT0 + 0.5)
    )
    assert hot.mean() >= 0.25  # the intentional skew cluster
    assert pdf.lon.between(-180, 180).all()
    assert pdf.lat.between(-85.1, 85.1).all()


def test_sites_spark_equals_duckdb():
    import duckdb

    from gdal_spark.session import get_spark

    spark = get_spark("t", cores=2)
    sdf = spark.sql(synth.sites_cte(32, "spark")).orderBy("j").toPandas()
    ddf = duckdb.sql(synth.sites_cte(32, "duckdb")).df().sort_values("j").reset_index(drop=True)
    assert (sdf["slon"].values == ddf["slon"].values).all()
    assert (sdf["slat"].values == ddf["slat"].values).all()
    p = synth.sites_pdf(32)
    assert (p["slon"].values == sdf["slon"].values).all()


def test_polygons_box_params_match_sql(spark):
    m = 64
    sdf = spark.sql(synth.polygons_sql_cte(m, "spark")).orderBy("j").toPandas()
    pdf = synth.polygons_pdf(m)
    boxes = pdf[pdf.kind.isin(["box", "hot_box"])]
    for rec in boxes.itertuples(index=False):
        rings = wkb.polygon_rings(bytes(rec.geom_wkb))
        ring = rings[0]
        row = sdf[sdf.j == rec.j].iloc[0]
        assert ring[:, 0].min() == row.cx - row.hw
        assert ring[:, 0].max() == row.cx + row.hw
        assert ring[:, 1].min() == row.cy - row.hh
        assert ring[:, 1].max() == row.cy + row.hh


def test_codec_lossless_roundtrip():
    arr = codecs.make_pixels(7, 64, 20)
    data = codecs.encode_image(arr, "png")
    out = codecs.decode_image(data)
    assert (out == arr).all()
    assert codecs.image_dims(data) == (64, 20, 3)


def test_codec_lossy_psnr():
    for i in (0, 3, 11):
        arr = codecs.make_pixels(i, 100, 64)
        out = codecs.decode_image(codecs.encode_image(arr, "jpeg"))
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2
        assert codecs.psnr(arr, out) >= 40.0


def test_phash_stable_under_lossy():
    arr = codecs.make_pixels(5, 256, 256)
    h_exact = codecs.phash64(arr)
    lossy = codecs.decode_image(codecs.encode_image(arr, "jpeg"))
    h_lossy = codecs.phash64(lossy)
    # hamming distance small under mild quantization
    ham = bin((h_exact ^ h_lossy) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 4


def test_images_with_pixels(spark):
    df = synth.images_df(spark, 16, with_pixels=True)
    rows = df.orderBy("i").collect()
    assert len(rows) == 16
    for r in rows:
        arr = codecs.decode_image(bytes(r.bytes))
        assert arr.shape == (r.h, r.w, 3)
        ref = codecs.make_pixels(r.i, r.w, r.h)
        if r.fmt == "png":
            assert (arr == ref).all()
        else:
            assert codecs.psnr(ref, arr) >= 40.0
        assert r.caption == f"caption for img{r.i:08d}"


def test_dhash_brute_force_and_brightness_invariance(spark):
    from gdal_spark.operators import multimodal

    df = synth.images_df(spark, 12, with_pixels=True)
    out = (
        multimodal.dhash64_int(df).toPandas().set_index("image_id")
    )
    assert len(out) == 12
    for i in range(12):
        rec = df.filter(f"i = {i}").collect()[0]
        arr = codecs.decode_image(bytes(rec.bytes)).astype(np.int64)
        h, w = arr.shape[:2]
        g = arr.sum(axis=2)
        yb = (np.arange(9) * h) // 8
        xb = (np.arange(10) * w) // 9
        bs = np.array(
            [
                [g[yb[a]: yb[a + 1], xb[b]: xb[b + 1]].sum() for b in range(9)]
                for a in range(8)
            ]
        )
        npx = np.array(
            [
                [
                    (yb[a + 1] - yb[a]) * (xb[b + 1] - xb[b])
                    for b in range(9)
                ]
                for a in range(8)
            ]
        )
        want_hi = want_lo = 0
        for a in range(8):
            for b in range(8):
                if bs[a, b + 1] * npx[a, b] > bs[a, b] * npx[a, b + 1]:
                    k = a * 8 + b
                    if k < 32:
                        want_lo |= 1 << k
                    else:
                        want_hi |= 1 << (k - 32)
        row = out.loc[rec.image_id]
        assert (row.dhash_hi, row.dhash_lo) == (want_hi, want_lo), i
        # gradient hashes are exactly invariant to a global brightness
        # shift (the +c*npx_l*npx_r term cancels on both sides of the
        # cross-multiplied comparison) — the property average-hash lacks
        g2 = g + 3 * 17
        bs2 = np.array(
            [
                [g2[yb[a]: yb[a + 1], xb[b]: xb[b + 1]].sum() for b in range(9)]
                for a in range(8)
            ]
        )
        for a in range(8):
            for b in range(8):
                assert (
                    bs2[a, b + 1] * npx[a, b] > bs2[a, b] * npx[a, b + 1]
                ) == (bs[a, b + 1] * npx[a, b] > bs[a, b] * npx[a, b + 1])


def test_ahash_brute_force_and_shift_invariance(spark):
    from gdal_spark.operators import multimodal

    df = synth.images_df(spark, 12, with_pixels=True)
    out = multimodal.ahash64_int(df).toPandas().set_index("image_id")
    assert len(out) == 12
    for i in range(12):
        rec = df.filter(f"i = {i}").collect()[0]
        arr = codecs.decode_image(bytes(rec.bytes)).astype(np.int64)
        h, w = arr.shape[:2]
        g = arr.sum(axis=2)
        yb = (np.arange(9) * h) // 8
        xb = (np.arange(9) * w) // 8
        tot, tn = int(g.sum()), h * w
        want_hi = want_lo = 0
        for a in range(8):
            for b in range(8):
                blk = g[yb[a]: yb[a + 1], xb[b]: xb[b + 1]]
                if int(blk.sum()) * tn > tot * blk.size:
                    k = a * 8 + b
                    if k < 32:
                        want_lo |= 1 << k
                    else:
                        want_hi |= 1 << (k - 32)
        row = out.loc[rec.image_id]
        assert (row.ahash_hi, row.ahash_lo) == (want_hi, want_lo), i
        # aHash is exactly invariant to an additive brightness shift:
        # bit = bs*TN > TS*npx, and shifting every pixel by c maps
        # bs -> bs + c*npx, TS -> TS + c*TN, adding c*npx*TN to BOTH
        # sides of the cross-multiplied comparison.
        c = 3 * 17
        g2 = g + c
        tot2 = int(g2.sum())
        for a in range(8):
            for b in range(8):
                blk = g[yb[a]: yb[a + 1], xb[b]: xb[b + 1]]
                blk2 = g2[yb[a]: yb[a + 1], xb[b]: xb[b + 1]]
                assert (int(blk2.sum()) * tn > tot2 * blk.size) == (
                    int(blk.sum()) * tn > tot * blk.size
                )
