"""Contour building block: iso-level edge crossings, tiled.

GDALContourGenerate (alg/contour.cpp, kernel alg/marching_squares/)
walks iso-lines through raster cells; every line segment enters/exits
through a pixel-pair edge where the value crosses the level. This
operator computes those crossings — the marching-squares edge
classification — distributed over tiles with a 1-px halo (right
column / bottom row from the neighbor), which is exactly the
information the cross-tile segment stitcher consumes. Counts are
integer-exact, so the whole-raster SQL oracle proves the tiling
introduces no seams. (Full ring assembly = the polygonize-style
label merge, future work.)

Crossing rule (marching squares, half-open): edge (a, b) crosses
level L iff (a < L) != (b < L).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dem import DEM_VALUE_SQL, _dem_value


def contour_crossings(
    spark, width: int, height: int, levels: tuple[int, ...] = (64, 128, 192),
    tile_px: int = 32,
) -> DataFrame:
    """Per (level, scanline): horizontal + vertical crossing counts
    over the deterministic global raster."""
    ntx = (width + tile_px - 1) // tile_px
    nty = (height + tile_px - 1) // tile_px
    tiles = spark.range(ntx * nty).selectExpr(
        f"cast(id % {ntx} as int) AS tx", f"cast(id div {ntx} as int) AS ty"
    )

    def compute(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        px0, py0 = tx * tile_px, ty * tile_px
        w = min(tile_px, width - px0)
        h = min(tile_px, height - py0)
        # tile + 1-px halo to the right/bottom (owned edges start here)
        hx1 = min(px0 + w + 1, width)
        hy1 = min(py0 + h + 1, height)
        gy, gx = np.mgrid[py0:hy1, px0:hx1]
        vals = _dem_value(gx, gy)
        rows = []
        for lv in levels:
            below = vals < lv
            # horizontal edges owned by this tile: (x, y)-(x+1, y),
            # x in [px0, px0+w-1] clipped to raster
            hc = below[: h, : w] != below[: h, 1 : w + 1] if hx1 > px0 + w else (
                below[: h, : w - 1] != below[: h, 1 : w]
            )
            vc = below[: h, : w] != below[1 : h + 1, : w] if hy1 > py0 + h else (
                below[: h - 1, : w] != below[1 : h, : w]
            )
            for yy in range(hc.shape[0]):
                rows.append((lv, py0 + yy, int(hc[yy].sum()), 0))
            for yy in range(vc.shape[0]):
                rows.append((lv, py0 + yy, 0, int(vc[yy].sum())))
        return pd.DataFrame(rows, columns=["level", "y", "h_cross", "v_cross"])

    part = tiles.groupby("tx", "ty").applyInPandas(
        compute, schema="level bigint, y bigint, h_cross bigint, v_cross bigint"
    )
    return part.groupBy("level", "y").agg(
        F.sum("h_cross").alias("h_cross"), F.sum("v_cross").alias("v_cross")
    )


def oracle_contour(width: int, height: int, levels=(64, 128, 192)) -> str:
    val = DEM_VALUE_SQL
    vr = val.replace("gx", "(gx + 1)")
    vd = val.replace("gy", "(gy + 1)")
    lvs = ", ".join(str(v) for v in levels)
    return (
        f"WITH g AS (SELECT gx, gy, lv FROM range(0, {width}) a(gx), "
        f"range(0, {height}) b(gy), (SELECT unnest([{lvs}]) AS lv)), "
        f"c AS (SELECT lv AS level, gy AS y, "
        f"CASE WHEN gx < {width - 1} AND (({val}) < lv) <> (({vr}) < lv) "
        f"THEN 1 ELSE 0 END AS hc, "
        f"CASE WHEN gy < {height - 1} AND (({val}) < lv) <> (({vd}) < lv) "
        f"THEN 1 ELSE 0 END AS vc FROM g) "
        f"SELECT level, y, cast(sum(hc) as bigint) AS h_cross, "
        f"cast(sum(vc) as bigint) AS v_cross "
        f"FROM c GROUP BY 1, 2"
    )
