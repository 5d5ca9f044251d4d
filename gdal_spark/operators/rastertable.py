"""Raster-table utilities: tindex, mosaic planning, xyz export, probe.

The reference's raster-catalog tools, re-expressed over the images
table (each row a georeferenced raster; footprint = north-up affine
gt = (lon, 0.1/w, 0, lat, 0, -0.1/w), so every image spans exactly
0.1 deg in x and (h/w)*0.1 deg in y):

- tile_index      <- gdaltindex (apps/gdaltindex.cpp): footprint dim
                     table; pure Catalyst column math, no UDF.
- merge_mosaic    <- gdal_merge.py last-wins overwrite order
                     (osgeo_utils/gdal_merge.py): per cell, winner =
                     highest-priority overlapping image
                     (groupBy + max aggregation).
- mosaic_plan     <- gdalbuildvrt -resolution highest/lowest/average
                     (apps/gdalbuildvrt_lib.cpp:1886): per-cell
                     resolution statistics for the virtual mosaic.
- raster_to_xyz   <- gdal2xyz.py: raster -> long-format point table
                     (mapInPandas explode; the only stage here that
                     touches pixels in Python, Arrow-batched).
- point_probe     <- gdallocationinfo (apps/gdallocationinfo.cpp):
                     georef point -> inverse geotransform -> pixel
                     value; containment join first so only matched
                     images are decoded (the predicate-pushdown
                     shape: plan on metadata, decode late).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import codecs, synth

RES = "(0.1E0 / w)"
SPAN_Y = "(h * (0.1E0 / w))"


def tile_index(images: DataFrame) -> DataFrame:
    """(image_id, minx, miny, maxx, maxy, w, h) footprint table."""
    return images.selectExpr(
        "image_id",
        "lon AS minx",
        f"(lat - {SPAN_Y}) AS miny",
        "(lon + 0.1E0) AS maxx",
        "lat AS maxy",
        "w",
        "h",
    )


def oracle_tile_index(n: int) -> str:
    return (
        f"SELECT image_id, lon AS minx, (lat - {SPAN_Y}) AS miny, "
        f"(lon + 0.1E0) AS maxx, lat AS maxy, w, h "
        f"FROM ({synth.images_cte(n, 'duckdb')})"
    )


def merge_mosaic(images: DataFrame, zoom: int = 8) -> DataFrame:
    """Last-wins mosaic plan at cell granularity: for every mercator
    cell that contains at least one image center, the winning (= last
    in input order = max i) image + contributor count."""
    from . import cells

    with_cells = cells.assign_cells(images, zoom, "mercator", engine="sql")
    return with_cells.groupBy("cell_id").agg(
        F.max("i").alias("winner_i"),
        F.count("*").alias("n_images"),
    )


def oracle_merge_mosaic(n: int, zoom: int = 8) -> str:
    from . import cells

    tx = cells.merc_tile_sql("lon", "lat", zoom, "x")
    ty = cells.merc_tile_sql("lon", "lat", zoom, "y")
    return (
        f"SELECT {cells.cell_id_sql(tx, ty, zoom)} AS cell_id, "
        f"max(i) AS winner_i, count(*) AS n_images "
        f"FROM ({synth.images_cte(n, 'duckdb')}) GROUP BY 1"
    )


def mosaic_plan(images: DataFrame, zoom: int = 8) -> DataFrame:
    """gdalbuildvrt resolution selection per cell: highest (min res
    value), lowest (max), and average (integer-scaled sum / count)."""
    from . import cells

    with_cells = cells.assign_cells(images, zoom, "mercator", engine="sql")
    return with_cells.groupBy("cell_id").agg(
        F.expr(f"min(cast(floor({RES} * 1000000000.0E0) as bigint))").alias(
            "res_highest_nano"
        ),
        F.expr(f"max(cast(floor({RES} * 1000000000.0E0) as bigint))").alias(
            "res_lowest_nano"
        ),
        F.expr(f"sum(cast(floor({RES} * 1000000000.0E0) as bigint))").alias(
            "res_sum_nano"
        ),
        F.count("*").alias("n_images"),
    )


def oracle_mosaic_plan(n: int, zoom: int = 8) -> str:
    from . import cells

    tx = cells.merc_tile_sql("lon", "lat", zoom, "x")
    ty = cells.merc_tile_sql("lon", "lat", zoom, "y")
    r = f"cast(floor({RES} * 1000000000.0E0) as bigint)"
    return (
        f"SELECT {cells.cell_id_sql(tx, ty, zoom)} AS cell_id, "
        f"min({r}) AS res_highest_nano, max({r}) AS res_lowest_nano, "
        f"cast(sum({r}) as bigint) AS res_sum_nano, count(*) AS n_images "
        f"FROM ({synth.images_cte(n, 'duckdb')}) GROUP BY 1"
    )


def raster_to_xyz(images: DataFrame) -> DataFrame:
    """gdal2xyz: explode decoded pixels to (image_id, x, y, ch, val)
    long format — 1->N mapInPandas."""

    def explode_px(batches):
        for pdf in batches:
            for image_id, payload in zip(pdf["image_id"], pdf["bytes"]):
                arr = codecs.decode_image(bytes(payload))
                h, w, c = arr.shape
                yy, xx, cc = np.mgrid[0:h, 0:w, 0:c]
                yield pd.DataFrame(
                    {
                        "image_id": image_id,
                        "x": xx.ravel().astype(np.int64),
                        "y": yy.ravel().astype(np.int64),
                        "ch": cc.ravel().astype(np.int64),
                        "val": arr.ravel().astype(np.int64),
                    }
                )

    return images.select("image_id", "bytes").mapInPandas(
        explode_px, schema="image_id string, x bigint, y bigint, ch bigint, val bigint"
    )


def point_probe(spark: SparkSession, images_meta: DataFrame, sites: DataFrame) -> DataFrame:
    """gdallocationinfo: for each site, every image whose footprint
    contains it + the pixel value under the point (inverse
    geotransform + nearest lookup). Join on metadata first; pixels
    are generated/decoded only for matched images."""
    cond = (
        (F.col("slon") >= F.col("lon"))
        & (F.col("slon") < F.col("lon") + 0.1)
        & (F.col("slat") <= F.col("lat"))
        & (F.col("slat") > F.col("lat") - F.expr(SPAN_Y))
    )
    matched = images_meta.join(F.broadcast(sites), cond).selectExpr(
        "site_id",
        "image_id",
        "i",
        "w",
        "h",
        "fmt",
        f"cast(floor((slon - lon) / {RES}) as int) AS px",
        f"cast(floor((lat - slat) / {RES}) as int) AS py",
    )

    def probe(batches):
        for pdf in batches:
            rows = {"site_id": [], "image_id": [], "px": [], "py": [],
                    "ch": [], "val": []}
            for site_id, image_id, i, w, h, fmt, px, py in zip(
                pdf["site_id"], pdf["image_id"], pdf["i"], pdf["w"],
                pdf["h"], pdf["fmt"], pdf["px"], pdf["py"],
            ):
                arr = codecs.decode_image(
                    codecs.encode_image(
                        codecs.make_pixels(int(i), int(w), int(h)), fmt
                    )
                )
                for c in range(3):
                    rows["site_id"].append(site_id)
                    rows["image_id"].append(image_id)
                    rows["px"].append(int(px))
                    rows["py"].append(int(py))
                    rows["ch"].append(c)
                    rows["val"].append(int(arr[int(py), int(px), c]))
            yield pd.DataFrame(rows)

    return matched.mapInPandas(
        probe,
        schema="site_id string, image_id string, px int, py int, "
        "ch bigint, val bigint",
    )


def oracle_point_probe(n: int, n_sites: int = synth.N_SITES) -> str:
    return (
        f"WITH images AS ({synth.images_cte(n, 'duckdb')}), "
        f"sites AS ({synth.sites_cte(n_sites, 'duckdb')}), "
        f"m AS (SELECT site_id, image_id, i, w, h, fmt, "
        f"cast(floor((slon - lon) / {RES}) as int) AS px, "
        f"cast(floor((lat - slat) / {RES}) as int) AS py "
        f"FROM images JOIN sites ON slon >= lon AND slon < lon + 0.1E0 "
        f"AND slat <= lat AND slat > lat - {SPAN_Y}) "
        f"SELECT site_id, image_id, px, py, ch, {synth.pixel_val_sql()} AS val "
        f"FROM (SELECT m.*, px AS x, py AS y, ch FROM m, range(0, 3) tc(ch))"
    )
