"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at sf0.01,
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df, duck_df, duck_types=None) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows: spark={len(a)} duck={len(b)}")
        return problems
    # dtype-strict: the driver's value hash distinguishes int64 from
    # HUGEINT/DECIMAL (DuckDB sum(BIGINT) -> HUGEINT); .df() would
    # silently coerce those to float64 and mask the mismatch.
    for c, t in (duck_types or {}).items():
        if pa.types.is_decimal(t):
            problems.append(
                f"col {c}: duckdb arrow type {t} (HUGEINT/DECIMAL) — "
                f"wrap the oracle aggregate in cast(... as bigint)"
            )
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind != bv.dtype.kind and not (
            av.dtype == object or bv.dtype == object
        ):
            problems.append(
                f"col {c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype}"
            )
            continue
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av == bv) | (av.isna() & bv.isna())).all()
            else:
                ok = (av.astype(object) == bv.astype(object)).all()
        except Exception as e:  # dtype mismatch etc.
            ok = False
            problems.append(f"col {c}: compare error {e}")
            continue
        if not ok:
            bad = (av.astype(object) != bv.astype(object)).to_numpy().nonzero()[0][:5]
            problems.append(
                f"col {c}: {len(bad)}+ mismatches, first rows {bad.tolist()} "
                f"spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}"
            )
    return problems


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({t1 - t0:.1f}s)")
            continue
        dtbl = con.execute(oracles[name]).fetch_arrow_table()
        ddf = dtbl.to_pandas()
        duck_types = {f.name: f.type for f in dtbl.schema}
        t2 = time.time()
        problems = compare(name, sdf, ddf, duck_types)
        status = "OK" if not problems else "FAIL"
        print(
            f"[{status}] {name}: {len(sdf)} rows "
            f"(spark {t1 - t0:.1f}s, duck {t2 - t1:.1f}s)"
        )
        for p in problems:
            failures += 1
            print(f"    {p}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
