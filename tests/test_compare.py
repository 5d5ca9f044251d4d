"""Dataset compare (gdalcompare analog + the north-rule re-encode
invariant): per-row integer PSNR gate, caption equality, summary
verdict — brute-force numpy oracle per image."""

import numpy as np

from gdal_spark import codecs, synth
from gdal_spark.operators import compare

N = 24
MAX_I = 12


def _golden(spark):
    imgs = synth.images_df(spark, N, with_pixels=True)
    from pyspark.sql import functions as F

    return imgs.filter(F.col("i") < MAX_I)


def test_compare_reencode_matches_numpy(spark):
    golden = _golden(spark)
    cand = compare.reencode(_golden(spark), "jpeg")
    out = (
        compare.compare_rows(golden, cand)
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    meta = synth.images_pdf(N)
    meta = meta[meta["i"] < MAX_I]
    assert len(out) == MAX_I
    for rec in meta.itertuples(index=False):
        g = codecs.decode_image(
            codecs.encode_image(codecs.make_pixels(rec.i, rec.w, rec.h), rec.fmt)
        )
        c = codecs.decode_image(codecs.encode_image(g, "jpeg"))
        diff = g.astype(np.int64) - c.astype(np.int64)
        row = out.loc[rec.image_id]
        assert row["npix"] == diff.size
        assert row["sse"] == int((diff * diff).sum())
        assert row["max_abs_diff"] == int(np.abs(diff).max())
        assert row["caption_equal"] == 1 and row["dims_equal"] == 1
        # integer gate == float PSNR definition
        want_ok = int(codecs.psnr(g, c) >= 40.0)
        assert row["psnr_ok"] == want_ok
        # fake-jpeg goldens are already bucket centers: exact roundtrip
        if rec.fmt == "jpeg":
            assert row["pixels_equal"] == 1
        else:
            assert row["pixels_equal"] == 0 and row["max_abs_diff"] <= 2


def test_compare_summary_verdict(spark):
    golden = _golden(spark)
    cand = compare.reencode(_golden(spark), "jpeg")
    per_row = compare.compare_rows(golden, cand)
    s = (
        compare.compare_summary(per_row, golden)
        .toPandas()
        .set_index("fmt")
        .sort_index()
    )
    assert set(s.index) == {"png", "jpeg"}
    # every image passes the lossy contract; jpeg goldens are exact
    assert (s["n_psnr_ok"] == s["n_images"]).all()
    assert (s["n_caption_ok"] == s["n_images"]).all()
    assert s.loc["jpeg", "n_exact"] == s.loc["jpeg", "n_images"]
    assert s.loc["png", "worst_abs_diff"] == 2


def test_compare_dim_mismatch_reports_not_raises(spark):
    golden = _golden(spark)
    shrunk = compare.reencode(_golden(spark), "png")
    from gdal_spark.operators import multimodal

    # resize the candidate so dims differ on every row
    small = multimodal.resize_nearest(shrunk, 8, 8)
    # resize drops caption; rejoin it so compare_rows sees the contract
    cand = small.join(_golden(spark).select("image_id", "caption"), "image_id")
    out = compare.compare_rows(golden, cand).toPandas()
    assert len(out) == MAX_I
    assert (out["dims_equal"] == 0).all()
    assert (out["psnr_ok"] == 0).all()
    assert (out["caption_equal"] == 1).all()
