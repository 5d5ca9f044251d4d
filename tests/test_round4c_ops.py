"""Independent brute-force checks for the round-4c operators:
geohash cell assignment, global SSIM, CLIP-score / aesthetic-probe
curation gates, and the exact distributed percentiles."""

import math

import numpy as np

from gdal_spark import geohash, synth
from gdal_spark.operators import clipscore, curation
from gdal_spark.operators import percentile as pctl

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------- geohash


def test_geohash_sql_matches_bisection_encoder(spark):
    got = (
        geohash.assign_geohash(synth.images_df(spark, 128))
        .join(synth.images_df(spark, 128).select("image_id", "lon", "lat"),
              "image_id")
        .collect()
    )
    assert len(got) == 128
    for r in got:
        exp = geohash.geohash_encode_py(r.lon, r.lat)
        assert r.gh == exp, (r.lon, r.lat, r.gh, exp)
        # gh_id is the interleaved-int form of the SAME cell
        gid = 0
        for ch in r.gh:
            gid = gid * 32 + geohash.GH_ALPHABET.index(ch)
        assert r.gh_id == gid


def test_geohash_boundary_points(spark):
    """Exact cell corners + the lon/lat domain edges — the clamp at
    +180/+90 and the >= mid bisection rule must agree."""
    pts = [
        (-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (-0.0000001, 0.0),
        (179.9999999, -89.9999999), (-45.0, 22.5), (11.25, -5.625),
    ]
    df = spark.createDataFrame(
        [(f"p{i}", lon, lat) for i, (lon, lat) in enumerate(pts)],
        "image_id string, lon double, lat double",
    )
    got = {r.image_id: r.gh for r in geohash.assign_geohash(df).collect()}
    for i, (lon, lat) in enumerate(pts):
        # the clamp maps the closed upper edge into the last cell, as
        # the bisection encoder does (lon >= mid forever picks hi)
        assert got[f"p{i}"] == geohash.geohash_encode_py(lon, lat)


def test_geohash_prefix_is_parent_cell(spark):
    imgs = synth.images_df(spark, 64)
    h6 = {r.image_id: r.gh
          for r in geohash.assign_geohash(imgs, 6).collect()}
    h3 = {r.image_id: r.gh
          for r in geohash.assign_geohash(imgs, 3).collect()}
    for k, v in h3.items():
        assert h6[k][:3] == v


# --------------------------------------------------------------- SSIM


def test_ssim_global_brute(spark):
    from gdal_spark import codecs

    imgs = synth.add_pixels(synth.images_df(spark, 64).filter("i < 6"))
    meta = synth.images_df(spark, 64).filter("i < 6").toPandas()
    got = (
        curation.ssim_global(imgs).toPandas().set_index("image_id")
    )
    assert len(got) == 6
    for _, row in meta.iterrows():
        arr = codecs.decode_image(
            codecs.encode_image(
                codecs.make_pixels(int(row.i), int(row.w), int(row.h)),
                row.fmt,
            )
        )
        x = arr[:, :, 0].astype(np.int64)
        y = (x // 8) * 8
        n = x.size
        mx, my = x.mean(), y.mean()
        vx, vy = (x * x).mean() - mx * mx, (y * y).mean() - my * my
        cxy = (x * y).astype(np.float64).mean() - mx * my
        ssim = ((2 * mx * my + 6.5025) * (2 * cxy + 58.5225)) / (
            (mx * mx + my * my + 6.5025) * (vx + vy + 58.5225)
        )
        g = got.loc[row.image_id]
        assert g.n_px == n and g.sx == x.sum() and g.sxy == (x * y).sum()
        # integer-moment finisher vs numpy float path: same value to
        # within one key unit (different FP sequences)
        assert abs(g.ssim_key - math.floor(1e6 * ssim)) <= 1
        assert 0 < g.ssim_key <= 1_000_000  # quantization: similar, not equal


def test_ssim_identity_is_one():
    # x == y -> SSIM exactly 1.0 -> key 10^6 (finisher sanity)
    key = curation._ssim_key(100, 5000, 5000, 260000, 260000, 260000)
    assert key == 1_000_000


# --------------------------------------------------------------- CLIP gate


def test_clip_score_brute(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = emb.toPandas().set_index("vec_id").sort_index()
    got = clipscore.clip_score_filter(
        emb).toPandas().set_index("pair_id").sort_index()
    assert len(got) == len(pdf) // 2
    for pair_id, r in got.iterrows():
        a = np.floor(np.asarray(pdf.loc[2 * pair_id].embedding,
                                dtype=np.float64) * 1e6).astype(np.int64)
        b = np.floor(np.asarray(pdf.loc[2 * pair_id + 1].embedding,
                                dtype=np.float64) * 1e6).astype(np.int64)
        cos = float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b)))
        assert r.clip_key == math.floor(1e6 * cos)
        assert r.kept == int(r.clip_key >= clipscore.CLIP_KEY_MIN)
        assert r.img_vec_id == 2 * pair_id and r.txt_vec_id == 2 * pair_id + 1
    # the gate must actually separate: both classes present
    assert 0 < got.kept.sum() < len(got)


def test_aesthetic_probe_brute(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = emb.toPandas().set_index("vec_id").sort_index()
    got = clipscore.aesthetic_probe(
        emb).toPandas().set_index("vec_id").sort_index()
    w = np.asarray(clipscore.probe_weights(), dtype=np.int64)
    wn = math.sqrt(float(w @ w))
    for vec_id, r in got.iterrows():
        v = np.floor(np.asarray(pdf.loc[vec_id].embedding,
                                dtype=np.float64) * 1e6).astype(np.int64)
        cos = float(v @ w) / (math.sqrt(float(v @ v)) * wn)
        assert r.aest_key == math.floor(1e6 * cos)
        assert r.bucket == math.floor((r.aest_key + 1e6) / 250000.0)
    assert set(got.bucket.unique()) <= set(range(9))


# --------------------------------------------------------------- percentiles


def test_exact_percentiles_brute(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vals = np.sort(docs.select("n_chars").toPandas().n_chars.to_numpy())
    n = len(vals)
    got = {int(r.pct): int(r.value)
           for r in pctl.exact_percentiles(spark, docs).collect()}
    for p in pctl.PCTS:
        r = -(-p * n // 100)  # ceil
        assert got[p] == int(vals[r - 1]), (p, got[p], vals[r - 1])


def test_exact_percentiles_small_and_skewed(spark):
    # duplicates + a bucket boundary value + n not divisible by 100
    data = [1] * 37 + [64] * 5 + [64000] * 3 + [7, 9, 11]
    df = spark.createDataFrame([(v,) for v in data], "n_chars int")
    vals = sorted(data)
    n = len(vals)
    got = {int(r.pct): int(r.value)
           for r in pctl.exact_percentiles(spark, df, pcts=(1, 50, 99)).collect()}
    for p in (1, 50, 99):
        r = -(-p * n // 100)
        assert got[p] == vals[r - 1]
