"""Gopher repetition signals — brute-force Counter oracle with the
same tie rule (max count, then lexicographically smallest gram)."""

from collections import Counter

from gdal_spark.operators import textops


ROWS = [
    ("d1", "a a a b c"),
    ("d2", "x y x y x y x"),
    ("d3", " ".join(f"tok{k}" for k in range(20))),  # all-unique, long
    ("d4", "solo"),  # 1 token: modal = 100%, flagged (Gopher filters
    # tiny docs on length upstream; the ppm rule itself fires)
    ("d5", "tie tie twin twin other a b c d e f g h"),
]


def _brute(text):
    toks = [t for t in text.split(" ") if t]
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def modal(grams):
        if not grams:
            return "", 0
        c = Counter(grams)
        # ties -> smallest gram
        top_n = max(c.values())
        top = min(g for g, n in c.items() if n == top_n)
        return top, top_n

    tt, tn = modal(toks)
    bt, bn = modal(bgs)
    t_ppm = (1_000_000 * tn) // len(toks) if toks else 0
    b_ppm = (1_000_000 * bn) // len(bgs) if bgs else 0
    flag = int(
        t_ppm > textops.TOP_UNIGRAM_PPM or b_ppm > textops.TOP_BIGRAM_PPM
    )
    return {
        "n_tokens": len(toks), "n_bigrams": len(bgs),
        "top_token": tt, "top_token_n": tn, "top_token_ppm": t_ppm,
        "top_bigram": bt, "top_bigram_n": bn, "top_bigram_ppm": b_ppm,
        "gopher_flag": flag,
    }


def test_repetition_profile_bruteforce(spark):
    df = spark.createDataFrame(ROWS, "doc_id string, text string")
    out = textops.repetition_profile(df).toPandas().set_index("doc_id")
    assert len(out) == len(ROWS)
    for doc_id, text in ROWS:
        want = _brute(text)
        got = out.loc[doc_id]
        for k, v in want.items():
            assert got[k] == v, (doc_id, k, got[k], v)
    # constructed flags: d1 (3/5 modal token), d2 (3/6 modal bigram)
    # and d4 (single-token degenerate) are repetitious; d3/d5 clean
    assert out["gopher_flag"].to_dict() == {
        "d1": 1, "d2": 1, "d3": 0, "d4": 1, "d5": 0,
    }


def test_repetition_profile_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textops.repetition_profile(docs.limit(50)).toPandas()
    assert len(out) == 50
    rows = docs.limit(50).toPandas()
    by_id = out.set_index("doc_id")
    for rec in rows.itertuples(index=False):
        want = _brute(rec.text)
        got = by_id.loc[rec.doc_id]
        assert got["top_token"] == want["top_token"]
        assert got["top_bigram_ppm"] == want["top_bigram_ppm"]
