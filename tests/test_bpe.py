"""BPE merge learning (gdal_spark/operators/bpe.py).

Independent reference: a pure-Python Sennrich implementation working
on symbol LISTS (get_stats over all adjacent positions; greedy
left-to-right merge application) — never the operator's string
encoding — must reproduce the learned merge table exactly, including
on the ``aaaaa``-style regrouping inputs where a separator-sharing
string encoding diverges from greedy list merging.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from gdal_spark.operators import bpe

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    words = {w: [ord(c) for c in w] for w in word_counts}
    next_id = bpe._NEW_BASE
    merges = []
    for r in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        (a, b), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, next_id, n))
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
        next_id += 1
    return merges


def _word_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pdf = docs.select("text").toPandas()
    cnt: Counter = Counter()
    for t in pdf.text:
        for w in t.split(" "):
            if w:
                cnt[w] += 1
    return dict(cnt)


def test_bpe_matches_list_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df, merges = bpe.bpe_train(docs, n_merges=8)
    got = [
        (m["rank"], m["a_id"], m["b_id"], m["new_id"], m["pair_count"])
        for m in merges
    ]
    want = _ref_bpe(_word_counts(spark), 8)
    assert got == want


def test_bpe_regrouping_matches_greedy_list_merge(spark):
    # 'aaaaa' must merge as [aa][aa][a]; a shared-separator string
    # encoding produces [aa][a][aa] and diverges on the NEXT round's
    # pair counts — this fixture discriminates the two
    rows = [("d1", "aaaaa aaaa baa aab"), ("d2", "aaaaa aa ab")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    df, merges = bpe.bpe_train(docs, n_merges=4)
    got = [
        (m["rank"], m["a_id"], m["b_id"], m["new_id"], m["pair_count"])
        for m in merges
    ]
    wc = Counter()
    for _, t in rows:
        for w in t.split(" "):
            wc[w] += 1
    want = _ref_bpe(dict(wc), 4)
    assert got == want


def test_bpe_surface_strings_compose(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    _, merges = bpe.bpe_train(docs, n_merges=6)
    for m in merges:
        assert m["new_sym"] == m["a_sym"] + m["b_sym"]
        assert len(m["new_sym"]) >= 2


def _ref_encode(word_counts, merges):
    """Reference encoder: Sennrich loop — repeatedly apply the
    LOWEST-rank merge present anywhere in the word until none apply
    (not the operator's single rank-ordered pass)."""
    out = {}
    ranks = {(a, b): (r, new) for r, a, b, new, _ in merges}
    for w in word_counts:
        syms = [ord(c) for c in w]
        while True:
            best = None
            for a, b in zip(syms, syms[1:]):
                if (a, b) in ranks:
                    r, new = ranks[(a, b)]
                    if best is None or r < best[0]:
                        best = (r, a, b, new)
            if best is None:
                break
            _, a, b, new = best
            nxt, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    nxt.append(new)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out[w] = syms
    return out


def test_bpe_encode_matches_sennrich_loop(spark):
    # the operator encodes via ONE rank-ordered replace pass; the
    # reference runs the full lowest-rank-first fixpoint loop — they
    # must agree (fresh-id argument in bpe.py)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = _word_counts(spark)
    _, merges = bpe.bpe_train(docs, n_merges=10)
    mg = [
        (m["rank"], m["a_id"], m["b_id"], m["new_id"], m["pair_count"])
        for m in merges
    ]
    enc = _ref_encode(wc, mg)
    # per-doc expected keys from the reference encoding
    pdf = docs.select("doc_id", "text").toPandas()
    want = {}
    for doc_id, t in zip(pdf.doc_id, pdf.text):
        toks = [w for w in t.split(" ") if w]
        n_bpe = sum(len(enc[w]) for w in toks)
        key = 0
        for pos, w in enumerate(toks):
            fp = 7
            for x in enc[w]:
                fp = (fp * 31 + x) % bpe.HASH_P
            key += ((pos + 1) * fp) % bpe.HASH_P
        want[doc_id] = (len(toks), n_bpe, key)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.ids_key)
        for r in bpe.bpe_encode(docs, n_merges=10).collect()
    }
    assert got == want


def test_bpe_oracle_sql_parity_small(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df, _ = bpe.bpe_train(docs)
    got = (
        df.select("rank", "a_id", "b_id", "new_id", "pair_count")
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = (
        con.sql(bpe.oracle_bpe())
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, ora)
