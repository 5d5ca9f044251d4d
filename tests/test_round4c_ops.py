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


# --------------------------------------------------------- geohash ring


def _gh_bounds(gh):
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    even = True
    for ch in gh:
        code = geohash.GH_ALPHABET.index(ch)
        for j in range(4, -1, -1):
            bit = (code >> j) & 1
            if even:
                mid = (lo_lon + hi_lon) / 2.0
                if bit:
                    lo_lon = mid
                else:
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2.0
                if bit:
                    lo_lat = mid
                else:
                    hi_lat = mid
            even = not even
    return lo_lon, hi_lon, lo_lat, hi_lat


def _gh_neighbor_py(gh, dx, dy):
    """Decode cell bounds, shift the center by one cell, re-encode.
    Returns None past a pole; wraps longitude."""
    lo_lon, hi_lon, lo_lat, hi_lat = _gh_bounds(gh)
    cx = (lo_lon + hi_lon) / 2.0 + dx * (hi_lon - lo_lon)
    cy = (lo_lat + hi_lat) / 2.0 + dy * (hi_lat - lo_lat)
    if cy < -90.0 or cy > 90.0:
        return None
    if cx >= 180.0:
        cx -= 360.0
    elif cx < -180.0:
        cx += 360.0
    return geohash.geohash_encode_py(cx, cy, len(gh))


def test_geohash_neighbors_brute(spark):
    imgs = synth.images_df(spark, 48)
    got = geohash.geohash_neighbors(imgs).collect()
    by_img = {}
    for r in got:
        by_img.setdefault(r.image_id, {})[(r.dx, r.dy)] = (r.gh, r.ngh)
    assert len(by_img) == 48
    for image_id, nbrs in by_img.items():
        for (dx, dy), (gh, ngh) in nbrs.items():
            exp = _gh_neighbor_py(gh, dx, dy)
            assert exp == ngh, (gh, dx, dy, ngh, exp)


def test_geohash_neighbors_polar_and_wrap(spark):
    df = spark.createDataFrame(
        [("pole", 10.0, 89.999), ("anti", 179.999, 0.0)],
        "image_id string, lon double, lat double",
    )
    rows = geohash.geohash_neighbors(df).collect()
    pole = [r for r in rows if r.image_id == "pole"]
    anti = [r for r in rows if r.image_id == "anti"]
    # top lat row: the 3 dy=+1 neighbors are dropped
    assert len(pole) == 5 and all(r.dy <= 0 for r in pole)
    # antimeridian: dx=+1 wraps to a hash on the west edge
    assert len(anti) == 8
    for r in anti:
        assert r.ngh == _gh_neighbor_py(r.gh, r.dx, r.dy)
    east = {r.ngh for r in anti if r.dx == 1}
    # wrapped neighbors decode to cells touching lon = -180
    for gh in east:
        lo_lon, _, _, _ = _gh_bounds(gh)
        assert lo_lon == -180.0


# ------------------------------------------------------- grayscale gate


def test_grayscale_gate_brute(spark):
    from gdal_spark import codecs

    imgs = synth.add_pixels(synth.images_df(spark, 64).filter("i < 5"))
    meta = synth.images_df(spark, 64).filter("i < 5").toPandas()
    got = curation.grayscale_gate(imgs).toPandas().set_index("image_id")
    for _, row in meta.iterrows():
        arr = codecs.decode_image(
            codecs.encode_image(
                codecs.make_pixels(int(row.i), int(row.w), int(row.h)),
                row.fmt,
            )
        ).astype(np.int64)
        drg = np.abs(arr[:, :, 0] - arr[:, :, 1])
        g = got.loc[row.image_id]
        assert g.sad_rg == drg.sum()
        assert g.max_diff == max(
            drg.max(),
            np.abs(arr[:, :, 1] - arr[:, :, 2]).max(),
            np.abs(arr[:, :, 0] - arr[:, :, 2]).max(),
        )
    # synthetic images are colorful by construction
    assert got.is_gray.sum() == 0


def test_grayscale_gate_flags_true_grayscale(spark):
    from gdal_spark import codecs

    a = np.tile(np.arange(64, dtype=np.uint8).reshape(64, 1, 1), (1, 32, 3))
    payload = codecs.encode_image(a, "png")
    df = spark.createDataFrame(
        [("g0", bytearray(payload))], "image_id string, bytes binary"
    )
    r = curation.grayscale_gate(df).collect()[0]
    assert r.is_gray == 1 and r.gray_key == 0 and r.max_diff == 0


# ---------------------------------------------------------------- Otsu


def test_otsu_threshold_exact_rational_argmax(spark):
    """The double-ordered argmax must equal the EXACT rational argmax
    of the between-class variance (Fraction arithmetic)."""
    from fractions import Fraction

    from gdal_spark import codecs

    imgs = synth.add_pixels(synth.images_df(spark, 64).filter("i < 6"))
    meta = synth.images_df(spark, 64).filter("i < 6").toPandas()
    got = curation.otsu_threshold(imgs).toPandas().set_index("image_id")
    for _, row in meta.iterrows():
        arr = codecs.decode_image(
            codecs.encode_image(
                codecs.make_pixels(int(row.i), int(row.w), int(row.h)),
                row.fmt,
            )
        )
        x = arr[:, :, 0].astype(np.int64).ravel()
        n, s = int(x.size), int(x.sum())
        hist = np.bincount(x, minlength=256)
        w0 = np.cumsum(hist)
        s0 = np.cumsum(hist * np.arange(256, dtype=np.int64))
        best_t, best = None, Fraction(-1)
        for t in range(256):
            if 0 < w0[t] < n:
                sc = Fraction(
                    int(s * w0[t] - n * s0[t]) ** 2,
                    int(w0[t]) * (n - int(w0[t])),
                )
                if sc > best:
                    best, best_t = sc, t
        g = got.loc[row.image_id]
        assert g.threshold == best_t
        assert g.w0 == w0[best_t] and g.s0 == s0[best_t]


def test_otsu_bimodal_splits_the_modes(spark):
    from gdal_spark import codecs

    a = np.zeros((32, 32, 3), dtype=np.uint8)
    a[:16] = 40
    a[16:] = 200
    df = spark.createDataFrame(
        [("b0", bytearray(codecs.encode_image(a, "png")))],
        "image_id string, bytes binary",
    )
    r = curation.otsu_threshold(df).collect()[0]
    assert 40 <= r.threshold < 200
    assert r.w0 == 16 * 32  # the low mode exactly
