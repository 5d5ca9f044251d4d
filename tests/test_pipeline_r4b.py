"""Independent checks for the round-4 session-3 pipeline operators:
per-domain document cap (RefinedWeb §3.3 shape), count-min-sketch
heavy hitters (Cormode & Muthukrishnan 2005), and the WebDataset/ustar
tar shard layout planner."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

from gdal_spark import synth
from gdal_spark.operators import dedup, multimodal, textops


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------------------
# domain_cap


def test_domain_cap_keeps_lowest_hash_per_source(spark):
    pdf = textops.domain_cap(_docs(spark), cap=5).toPandas()
    for src, g in pdf.groupby("source"):
        g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
        # rnk is the 1-based hash-order position
        assert (g.rnk.values == np.arange(1, len(g) + 1)).all()
        kept = set(g[g.keep == 1].doc_id)
        assert kept == set(g.doc_id.iloc[:5])
        assert len(kept) == min(5, len(g))


def test_domain_cap_membership_is_hash_deterministic(spark):
    """Re-running yields the identical keep set (no Spark-order
    dependence — the tie-break includes doc_id)."""
    a = textops.domain_cap(_docs(spark)).toPandas()
    b = textops.domain_cap(_docs(spark)).toPandas()
    ka = set(a[a.keep == 1].doc_id)
    assert ka == set(b[b.keep == 1].doc_id)


# ---------------------------------------------------------------------------
# count-min sketch


def test_cms_estimate_never_underestimates(spark):
    pdf = textops.cms_topk_estimate(_docs(spark)).toPandas()
    assert len(pdf) == textops.CMS_TOPK
    assert (pdf.est_cnt >= pdf.true_cnt).all()


def test_cms_matches_numpy_sketch_replay(spark):
    """Build the same D x W sketch in numpy from exact token counts
    and replay the min-over-rows point estimates."""
    docs = _docs(spark)
    toks = (
        textops._with_tokens(docs)
        .selectExpr("explode(toks) AS token")
        .groupBy("token").count().toPandas()
    )
    # same hash as str_hash_sql('spark', ...): replay via Spark once
    hashed = (
        textops._with_tokens(docs)
        .selectExpr("explode(toks) AS token")
        .groupBy("token").count()
        .selectExpr(
            "token", "count AS cnt",
            f"{textops.str_hash_sql('spark', 'token')} AS th",
        )
        .toPandas()
    )
    D, W = textops.CMS_D, textops.CMS_W
    sketch = np.zeros((D, W), dtype=np.int64)
    for r in hashed.itertuples():
        for d in range(D):
            wb = ((r.th * (2 * d + 3) + d * 9176) % 1000003) % W
            sketch[d, wb] += r.cnt
    got = textops.cms_topk_estimate(docs).toPandas()
    hmap = dict(zip(hashed.token, hashed.th))
    for r in got.itertuples():
        th = hmap[r.token]
        est = min(
            sketch[d, ((th * (2 * d + 3) + d * 9176) % 1000003) % W]
            for d in range(D)
        )
        assert r.est_cnt == est


# ---------------------------------------------------------------------------
# tar shard layout


def test_tar_layout_matches_serial_writer_replay(spark):
    """Replay each writer's shard stream serially (the actual
    ShardWriter behavior) and compare every byte offset."""
    imgs = synth.images_df(spark, 200)
    pdf = multimodal.tar_shard_layout(imgs, maxcount=7, n_writers=3).toPandas()
    src = imgs.selectExpr("image_id", "i", "w", "h").toPandas()
    member = {
        r.image_id: 512 + ((r.w * r.h * 3 + 511) // 512) * 512
        for r in src.itertuples()
    }
    src = src.sort_values("i")
    for wr in range(3):
        stream = src[src.i % 3 == wr]
        off, shard, idx = 0, 0, 0
        for r in stream.itertuples():
            if idx == 7:
                shard += 1
                idx = 0
                off = 0
            row = pdf[pdf.image_id == r.image_id].iloc[0]
            assert (row.writer, row.shard_id, row.idx_in_shard) == (wr, shard, idx)
            assert row.offset_bytes == off
            assert row.member_bytes == member[r.image_id]
            off += member[r.image_id]
            idx += 1


def test_tar_members_are_block_aligned(spark):
    pdf = multimodal.tar_shard_layout(synth.images_df(spark, 64)).toPandas()
    assert (pdf.offset_bytes % 512 == 0).all()
    assert (pdf.member_bytes % 512 == 0).all()
    # header + at least one payload block
    assert (pdf.member_bytes >= 1024).all()


# ---------------------------------------------------------------------------
# Bloom seen filter


def test_bloom_no_false_negatives(spark):
    pdf = dedup.bloom_seen_filter(_docs(spark)).toPandas()
    present = pdf[pdf.truth == 1]
    assert len(present) > 0
    assert (present.bloom_hit == 1).all()


def test_bloom_matches_python_replay(spark):
    """Replay the filter bit-set in pure Python from the corpus keys
    and check every probe verdict."""
    docs = _docs(spark)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    M, K = dedup.BLOOM_M_BITS, dedup.BLOOM_K

    def positions(key):
        kh = (key * dedup.BLOOM_KNUTH) % 1000003
        return [((kh * (2 * j + 3) + j * 7919) % 999983) % M for j in range(K)]

    bits = set()
    for d in ids:
        bits.update(positions(d))
    pdf = dedup.bloom_seen_filter(docs).toPandas()
    for r in pdf.itertuples():
        assert r.bloom_hit == int(all(p in bits for p in positions(r.key)))


def test_bloom_filter_table_is_bounded(spark):
    """The build output is <= M/32 rows whatever the corpus size —
    the property that makes the seen-filter shuffle O(M), not O(n)."""
    filt = dedup.bloom_build(_docs(spark)).toPandas()
    assert len(filt) <= dedup.BLOOM_M_BITS // 32
    assert filt.word_idx.between(0, dedup.BLOOM_M_BITS // 32 - 1).all()


# ---------------------------------------------------------------------------
# keep_best_variant


def test_keep_best_matches_brute_force(spark):
    from gdal_spark.operators import curation

    n = 512
    imgs = synth.images_df(spark, n)
    got = curation.keep_best_variant(imgs, n_images=n).toPandas()
    src = imgs.selectExpr("i", "image_id", "cast(w as long) * h AS px").toPandas()
    g = n // curation.VARIANTS_PER_KEY
    src["key"] = src.i % g
    for key, grp in src.groupby("key"):
        grp = grp.sort_values(["px", "i"], ascending=[False, True])
        row = got[got.content_key == key].iloc[0]
        assert row.keep_i == grp.iloc[0].i
        assert row.best_pixels == grp.iloc[0].px
        assert row.n_variants == len(grp)
    assert len(got) == g
