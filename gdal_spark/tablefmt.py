"""Snapshot-log table format — the sandbox stand-in for an Iceberg
catalog (the container has no Iceberg jars; BASELINE.json names an
Iceberg table). Implements the parts of the public Iceberg table spec
(apache/iceberg spec.md, v2) the north rule actually exercises:

- **atomic commits**: each snapshot is a metadata version file
  published with ``os.link`` (atomic, refuses to overwrite an
  existing version); optimistic concurrency — a commit that loses
  the race re-reads the log and retries on the next version number,
  exactly Iceberg's compare-and-swap loop.
- **time travel**: any snapshot's full data-file list is recorded in
  its version file, so ``read_as_of`` reconstructs the table AS OF
  any snapshot id with no reliance on directory listing.
- **rollback**: a NEW commit whose file set is an older snapshot's
  (history is append-only, as in Iceberg — rollback never deletes).
- **per-partition lineage + metrics**: every commit summary records
  the writing job's per-partition row counts plus caller metrics —
  the checkpoint trail the north rule requires for resumable runs.
- **resume**: ``committed_keys`` + a left_anti join skips work already
  committed (the gdal2tiles --resume pattern over table snapshots).

The data files are plain parquet; on a real cluster the identical
call sequence targets an Iceberg REST/Hive catalog instead of a
directory — the commit/read/rollback shapes are 1:1.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, functions as F


class SnapshotLog:
    """Append-only metadata log rooted at ``root``/metadata/v{N}.json;
    data files live under ``root``/data/."""

    def __init__(self, root: str):
        self.root = root
        self.meta = os.path.join(root, "metadata")
        self.data = os.path.join(root, "data")
        os.makedirs(self.meta, exist_ok=True)
        os.makedirs(self.data, exist_ok=True)

    # -- log primitives -----------------------------------------------------

    def _version_path(self, n: int) -> str:
        return os.path.join(self.meta, f"v{n}.json")

    def current_snapshot(self) -> int | None:
        ids = [
            int(f[1:-5])
            for f in os.listdir(self.meta)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(ids) if ids else None

    def snapshot(self, snapshot_id: int) -> dict:
        with open(self._version_path(snapshot_id)) as fh:
            return json.load(fh)

    def files_as_of(self, snapshot_id: int | None = None) -> list[str]:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot()
        if snapshot_id is None:
            return []
        return self.snapshot(snapshot_id)["files"]

    def commit(self, files: list[str], op: str, summary: dict) -> int:
        """Atomically publish the next snapshot holding exactly
        ``files``. Optimistic retry: if another writer claimed the
        version number first, re-read and try the next one."""
        while True:
            parent = self.current_snapshot()
            nxt = 0 if parent is None else parent + 1
            payload = {
                "snapshot_id": nxt,
                "parent": parent,
                "op": op,
                "files": sorted(files),
                "summary": summary,
            }
            fd, tmp = tempfile.mkstemp(dir=self.meta, suffix=".tmp")
            with os.fdopen(fd, "w") as fh:
                json.dump(payload, fh)
            target = self._version_path(nxt)
            try:
                # atomic publish; os.link+unlink refuses to overwrite
                # an existing version (rename would silently clobber)
                os.link(tmp, target)
                os.unlink(tmp)
                return nxt
            except FileExistsError:
                os.unlink(tmp)  # lost the race — retry on the next id

    # -- table operations ---------------------------------------------------

    def append(self, df: DataFrame, op: str = "append",
               metrics: dict | None = None) -> int:
        """Write ``df`` as new data files and commit parent_files +
        new_files as the next snapshot, with per-partition lineage in
        the summary."""
        parent_files = self.files_as_of()
        nxt_dir = tempfile.mkdtemp(dir=self.data, prefix="s")
        lineage = {
            str(r["pid"]): r["rows"]
            for r in df.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count("*").alias("rows")).collect()
        }
        df.write.mode("overwrite").parquet(nxt_dir)
        new_files = [
            os.path.join(nxt_dir, f)
            for f in os.listdir(nxt_dir)
            if f.endswith(".parquet")
        ]
        summary = {
            "added_files": len(new_files),
            "added_rows": sum(lineage.values()),
            "partition_rows": lineage,
            **(metrics or {}),
        }
        return self.commit(parent_files + new_files, op, summary)

    def rollback(self, snapshot_id: int) -> int:
        """Roll the table back by committing a NEW snapshot whose file
        set equals ``snapshot_id``'s (append-only history)."""
        return self.commit(
            self.files_as_of(snapshot_id),
            "rollback",
            {"rolled_back_to": snapshot_id},
        )


def read_as_of(spark, log: SnapshotLog,
               snapshot_id: int | None = None) -> DataFrame:
    """The table AS OF ``snapshot_id`` (default: current)."""
    files = log.files_as_of(snapshot_id)
    if not files:
        raise ValueError("table has no snapshots")
    return spark.read.parquet(*files)


def committed_keys(spark, log: SnapshotLog, key_cols: list[str]) -> DataFrame:
    """Distinct committed keys (for resume anti-joins)."""
    return read_as_of(spark, log).select(*key_cols).distinct()


def resume_filter(pending: DataFrame, spark, log: SnapshotLog,
                  key_cols: list[str]) -> DataFrame:
    """Drop rows whose keys are already committed — the restartable-
    job pattern: plan everything, anti-join the done log, process the
    rest."""
    if log.current_snapshot() is None:
        return pending
    return pending.join(
        committed_keys(spark, log, key_cols), key_cols, "left_anti"
    )


# ---------------------------------------------------------------------------
# oracle-gated time-travel query: three batch commits over the
# synthesized image-metadata table, then a read AS OF the second
# snapshot — the result (per-batch row counts + integer sums) is
# closed-form from the synth CTE, so the whole commit/time-travel
# pipeline sits under the driver's value-hash gate.


def time_travel_query(spark, n: int) -> DataFrame:
    import shutil

    from . import synth

    root = tempfile.mkdtemp(prefix="gdal_spark_tt_")
    log = SnapshotLog(root)
    b = max(n // 8, 4)
    imgs = spark.sql(synth.images_cte(n, "spark"))
    for k in range(3):
        log.append(
            imgs.where(f"i >= {k * b} AND i < {(k + 1) * b}"),
            metrics={"batch": k},
        )
    out = (
        read_as_of(spark, log, snapshot_id=1)  # snapshots 0..1 = batches 0..1
        .selectExpr(
            f"i div {b} AS batch", "i",
            "cast(w as bigint) * h AS px",
        )
        .groupBy("batch")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("i").cast("bigint").alias("sum_i"),
            F.sum("px").cast("bigint").alias("sum_px"),
        )
        .localCheckpoint(eager=True)  # materialize before the cleanup
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def oracle_time_travel(n: int) -> str:
    from . import synth

    b = max(n // 8, 4)
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}) "
        f"SELECT i // {b} AS batch, count(*) AS n_rows, "
        f"cast(sum(i) as bigint) AS sum_i, "
        f"cast(sum(cast(w as bigint) * h) as bigint) AS sum_px "
        f"FROM img WHERE i < {2 * b} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# oracle-gated resume query: commit a PARTIAL run (batches 0..1 of a
# 4-batch plan, with per-partition lineage metrics), then anti-join
# the full plan against the committed keys — exactly the north rule's
# "resumable from checkpoint" semantics (gdal2tiles --resume /
# Iceberg job restart). The remaining-work summary is closed-form
# from the synth CTE, so commit -> lineage -> anti-join all sit under
# the value-hash gate.


def resume_query(spark, n: int) -> DataFrame:
    import shutil

    from . import synth

    root = tempfile.mkdtemp(prefix="gdal_spark_rs_")
    try:
        log = SnapshotLog(root)
        b = max(n // 8, 4)
        imgs = spark.sql(synth.images_cte(n, "spark"))
        for k in range(2):  # the interrupted run got through 2 of 4
            log.append(
                imgs.where(f"i >= {k * b} AND i < {(k + 1) * b}").select(
                    "i", "image_id", "w", "h"
                ),
                metrics={"batch": k},
            )
        plan = imgs.where(f"i < {4 * b}")
        todo = resume_filter(plan, spark, log, ["image_id"])
        out = (
            todo.selectExpr(f"i div {b} AS batch", "i",
                            "cast(w as bigint) * h AS px")
            .groupBy("batch")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("i").cast("bigint").alias("sum_i"),
                F.sum("px").cast("bigint").alias("sum_px"),
            )
        )
        rows = out.collect()  # materialize before the log dir vanishes
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def oracle_resume(n: int) -> str:
    from . import synth

    b = max(n // 8, 4)
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}) "
        f"SELECT i // {b} AS batch, count(*) AS n_rows, "
        f"cast(sum(i) as bigint) AS sum_i, "
        f"cast(sum(cast(w as bigint) * h) as bigint) AS sum_px "
        f"FROM img WHERE i >= {2 * b} AND i < {4 * b} GROUP BY 1"
    )

# ---------------------------------------------------------------------------
# MERGE INTO — copy-on-write upsert (Iceberg spec.md v2 row-level
# operations, copy-on-write mode; the ogrupdate.py semantics: source
# rows replace target rows sharing a key, unmatched source rows are
# inserted). File-granular rewrite, exactly Iceberg's COW: data files
# holding NO matched key survive into the next snapshot untouched;
# only touched files are rewritten (their unmatched rows + nothing
# else), and the source is appended as new files. At 10^12 rows the
# rewrite cost is proportional to the files the merge touches, never
# the table.


def merge_upsert(
    spark, log: SnapshotLog, source: DataFrame, key_cols: list[str],
    metrics: dict | None = None,
) -> int:
    """UPSERT ``source`` into the table by ``key_cols``; commits and
    returns the new snapshot id."""
    files = log.files_as_of()
    if not files:
        return log.append(source, op="merge", metrics=metrics)
    src = source.localCheckpoint(eager=True)  # read once, join twice
    skeys = src.select(*key_cols).distinct()
    from urllib.parse import unquote, urlparse

    tgt = spark.read.parquet(*files).withColumn(
        "_file", F.input_file_name()
    )
    touched = {
        unquote(urlparse(r["_file"]).path)
        for r in tgt.join(skeys, key_cols, "left_semi")
        .select("_file").distinct().collect()
    }
    # survivors: rows of touched files whose key does NOT match
    untouched_files = [f for f in files if f not in touched]
    nxt_dir = tempfile.mkdtemp(dir=log.data, prefix="s")
    keep = (
        spark.read.parquet(*sorted(touched)).join(
            skeys, key_cols, "left_anti"
        )
        if touched
        else None
    )
    out = src if keep is None else keep.unionByName(src)
    out.write.mode("overwrite").parquet(nxt_dir)
    new_files = [
        os.path.join(nxt_dir, f)
        for f in os.listdir(nxt_dir)
        if f.endswith(".parquet")
    ]
    summary = {
        "op_files_rewritten": len(touched),
        "op_files_kept": len(untouched_files),
        "added_files": len(new_files),
        **(metrics or {}),
    }
    return log.commit(untouched_files + new_files, "merge", summary)


# oracle-gated merge query: two appended batches (i in [0, 2b)), then
# MERGE a source covering [b, 3b) with a modified payload — rows in
# [b, 2b) are updated in place, [2b, 3b) inserted, [0, b) carried by
# untouched files. The final table state is closed-form from the
# synth CTE.


def merge_upsert_query(spark, n: int) -> DataFrame:
    import shutil

    from . import synth

    root = tempfile.mkdtemp(prefix="gdal_spark_mg_")
    try:
        log = SnapshotLog(root)
        b = max(n // 8, 4)
        imgs = spark.sql(synth.images_cte(n, "spark"))
        for k in range(2):
            log.append(
                imgs.where(f"i >= {k * b} AND i < {(k + 1) * b}").select(
                    "i", "image_id", "w", "h"
                ),
                metrics={"batch": k},
            )
        source = imgs.where(f"i >= {b} AND i < {3 * b}").selectExpr(
            "i", "image_id", "w + 7 AS w", "h"
        )
        merge_upsert(spark, log, source, ["image_id"])
        out = (
            read_as_of(spark, log)
            .selectExpr(f"i div {b} AS batch", "i", "w")
            .groupBy("batch")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("i").cast("bigint").alias("sum_i"),
                F.sum("w").cast("bigint").alias("sum_w"),
            )
        )
        rows = out.collect()  # materialize before the log dir vanishes
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def oracle_merge_upsert(n: int) -> str:
    from . import synth

    b = max(n // 8, 4)
    return (
        f"WITH img AS ({synth.images_cte(n, 'duckdb')}) "
        f"SELECT i // {b} AS batch, count(*) AS n_rows, "
        f"cast(sum(i) as bigint) AS sum_i, "
        f"cast(sum(CASE WHEN i >= {b} THEN w + 7 ELSE w END) as bigint) "
        f"AS sum_w "
        f"FROM img WHERE i < {3 * b} GROUP BY 1"
    )
