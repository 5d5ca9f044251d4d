"""spark-submit entry point for the north-rule job.

Usage (cluster or local):

    zip -r /tmp/gdal_spark.zip gdal_spark
    spark-submit --py-files /tmp/gdal_spark.zip \
        tools/submit_job.py --n-images 6000000 --n-polys 2048 [--zoom 12]

Runs tile assignment + the PIP spatial join over the synthesized
image table and prints one JSON result line. On a real cluster the
same command with --master yarn/k8s and N vs 4N executors produces
the two scaling measurements; `bench.py --scaling` is the local[N]
proxy. Checkpoint/lineage parquet paths are accepted so interrupted
runs resume via the anti-join (gdal2tiles --resume semantics)."""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=1_000_000)
    ap.add_argument("--n-polys", type=int, default=2048)
    ap.add_argument("--zoom", type=int, default=12)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    # spark-submit provides the session config (master, executors)
    spark = SparkSession.builder.appName("gdal_spark_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from gdal_spark import synth
    from gdal_spark.operators import cells
    from gdal_spark.operators.spatial_join import spatial_join

    t0 = time.time()
    imgs = synth.images_df(spark, args.n_images)
    polys = synth.polygons_df(spark, args.n_polys)
    assigned = cells.assign_cells(imgs, args.zoom, "mercator", engine="pandas")
    n_cells = assigned.select(F.countDistinct("cell_id")).collect()[0][0]
    pairs = spatial_join(
        imgs, polys, point_cols=["image_id"], poly_cols=["poly_id"]
    ).count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "n_images": args.n_images,
                "n_distinct_cells": n_cells,
                "join_pairs": pairs,
                "sec": round(dt, 2),
                "images_per_sec": round(args.n_images / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
