"""DSIR data selection (gdal_spark/operators/dsir.py).

Independent check: a pure-Python reimplementation (own tokenizer, own
rolling hash, own smoothed log-ratio in numpy) reproduces the Spark
top-k exactly; plan shape asserts the 100 TB posture (broadcast model
join, partial agg, TakeOrdered — no global sort, no cartesian).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators import dsir
from gdal_spark.operators.textops import HASH_P

SF = "/root/testdata/sf0.001"


def _hash(s: str) -> int:
    acc = 7
    for ch in s:
        acc = (acc * 31 + ord(ch)) % HASH_P
    return acc


def _brute(pdf: pd.DataFrame, buckets: int, k: int):
    per_doc: dict[str, list[int]] = {}
    rc = np.zeros(buckets, dtype=np.int64)
    tc = np.zeros(buckets, dtype=np.int64)
    for doc_id, text, lang in zip(pdf.doc_id, pdf.text, pdf.lang):
        toks = [t for t in text.split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bks = [_hash(g) % buckets for g in grams]
        per_doc[doc_id] = bks
        for b in bks:
            rc[b] += 1
            if lang == "en":
                tc[b] += 1
    rtot, ttot = int(rc.sum()), int(tc.sum())
    lrk = np.floor(
        1e9
        * (
            np.log((tc + 1).astype(float))
            - math.log(float(ttot + buckets))
            - np.log((rc + 1).astype(float))
            + math.log(float(rtot + buckets))
        )
    ).astype(np.int64)
    rows = [
        (doc_id, int(sum(lrk[b] for b in bks)))
        for doc_id, bks in per_doc.items()
        if bks
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_dsir_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r.doc_id, r.weight_key)
        for r in dsir.dsir_select(docs, buckets=64, k=25).collect()
    }
    want = set(_brute(docs.select("doc_id", "text", "lang").toPandas(), 64, 25))
    assert got == want


def test_dsir_weights_favor_target_language(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sel = dsir.dsir_select(docs, buckets=64, k=15).collect()
    langs = dict(
        docs.select("doc_id", "lang").toPandas()[["doc_id", "lang"]].values
    )
    en = sum(1 for r in sel if langs[r.doc_id] == "en")
    # the en target slice should dominate the selection
    assert en >= 0.8 * len(sel)


def test_dsir_plan_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = dsir.dsir_select(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-doc reduction must be a partial+final hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_dsir_nondefault_knobs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dsir.dsir_select(docs, buckets=16, k=5).collect()
    assert len(out) == 5
    got = [(r.doc_id, r.weight_key) for r in out]
    want = _brute(docs.select("doc_id", "text", "lang").toPandas(), 16, 5)
    assert sorted(got) == sorted(want)
