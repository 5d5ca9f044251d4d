"""GDALComputeProximity — distance to the nearest target pixel.

Reference: alg/gdalproximity.cpp (two-pass scan propagating nearest
target coordinates; options MAXDIST / VALUES / DISTUNITS=PIXEL).
Semantics: for every pixel, the euclidean pixel distance to the
nearest pixel whose value is in the target set, capped at MAXDIST
(pixels farther than MAXDIST get the cap).

Distributed shape: ONE global raster split into tiles with a
MAXDIST-wide halo exchange — within the cap the computation is local
to tile+halo, so the result is exactly the whole-raster answer (the
same argument GDAL's docs make for chunked processing with MAXDIST).
Squared distances stay integers end-to-end -> the SQL oracle matches
bit-for-bit with zero fp.

At 10^12 px: halo width = MAXDIST keeps strips thin relative to
tiles; an uncapped proximity needs the iterative cross-tile chamfer
relaxation (future work, same strip machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dem import DEM_VALUE_SQL, _dem_value

TARGET_MOD = 97  # target pixels: dem value pattern % TARGET_MOD == 0


def proximity_d2(vals: np.ndarray, targets: np.ndarray, maxdist: int) -> np.ndarray:
    """Exact min squared distance to a target within ``maxdist``
    (chebyshev window prefilter + exact euclidean), else maxdist^2.
    Brute force over target list — targets are sparse."""
    h, w = vals.shape
    cap = maxdist * maxdist
    out = np.full((h, w), cap, dtype=np.int64)
    ty, tx = np.nonzero(targets)
    if len(ty) == 0:
        return out
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx in zip(ty, tx):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        np.minimum(out, d2, out=out)
    return np.minimum(out, cap)


def proximity_tiled(
    spark, width: int, height: int, maxdist: int = 6, tile_px: int = 32,
    target_values=None,
) -> DataFrame:
    """Tiled proximity over the deterministic global DEM raster.
    Default targets = value % TARGET_MOD == 0; ``target_values`` is
    the reference's VALUES option (gdalproximity.cpp pszValues —
    explicit list of raster values treated as targets). Output per
    global scanline: (y, n, d2_sum) with d2 capped at maxdist^2 —
    integer exact."""
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
        # tile + maxdist halo, clipped to the raster
        hx0, hy0 = max(px0 - maxdist, 0), max(py0 - maxdist, 0)
        hx1 = min(px0 + w + maxdist, width)
        hy1 = min(py0 + h + maxdist, height)
        gy, gx = np.mgrid[hy0:hy1, hx0:hx1]
        vals = _dem_value(gx, gy)
        if target_values is not None:
            targets = np.isin(vals, np.asarray(target_values, dtype=np.int64))
        else:
            targets = vals % TARGET_MOD == 0
        d2 = proximity_d2(vals, targets, maxdist)
        # own pixels only
        oy0, ox0 = py0 - hy0, px0 - hx0
        own = d2[oy0 : oy0 + h, ox0 : ox0 + w]
        return pd.DataFrame(
            {
                "y": np.arange(py0, py0 + h, dtype=np.int64),
                "n": np.full(h, w, dtype=np.int64),
                "d2_sum": own.sum(axis=1).astype(np.int64),
            }
        )

    part = tiles.groupby("tx", "ty").applyInPandas(
        compute, schema="y bigint, n bigint, d2_sum bigint"
    )
    return part.groupBy("y").agg(
        F.sum("n").alias("n"), F.sum("d2_sum").alias("d2_sum")
    )


def oracle_proximity(
    width: int, height: int, maxdist: int = 6, target_values=None
) -> str:
    """Whole-raster SQL oracle: per pixel, min d2 over target pixels
    within the chebyshev maxdist window, capped; summed per row."""
    val = DEM_VALUE_SQL
    tval = val.replace("gx", "tx2").replace("gy", "ty2")
    cap = maxdist * maxdist
    if target_values is not None:
        pred = f"({tval}) IN ({', '.join(str(int(v)) for v in target_values)})"
    else:
        pred = f"({tval}) % {TARGET_MOD} = 0"
    return (
        f"WITH t AS (SELECT tx2, ty2 FROM range(0, {width}) a(tx2), "
        f"range(0, {height}) b(ty2) WHERE {pred}), "
        f"g AS (SELECT gx, gy FROM range(0, {width}) c(gx), "
        f"range(0, {height}) d(gy)), "
        f"m AS (SELECT g.gx, g.gy, "
        f"coalesce(min((g.gx - t.tx2) * (g.gx - t.tx2) "
        f"+ (g.gy - t.ty2) * (g.gy - t.ty2)), {cap}) AS d2 "
        f"FROM g LEFT JOIN t ON abs(g.gx - t.tx2) <= {maxdist} "
        f"AND abs(g.gy - t.ty2) <= {maxdist} GROUP BY 1, 2) "
        f"SELECT gy AS y, count(*) AS n, "
        f"cast(sum(least(d2, {cap})) as bigint) AS d2_sum FROM m GROUP BY 1"
    )
