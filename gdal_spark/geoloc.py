"""Geolocation-array transformer (gdalwarp -geoloc semantics).

The reference's geoloc transformer (alg/gdalgeoloc.cpp) maps raster
(pixel, line) to georeferenced (X, Y) through a geolocation array — a
(usually subsampled) grid of per-sample lon/lat values tied to the
raster by PIXEL/LINE_OFFSET and PIXEL/LINE_STEP metadata:

- forward (GDALGeoLoc::Transform :625): geoloc-array coords
  pg = (P - PIXEL_OFFSET) / PIXEL_STEP - (0 if origin is the top-left
  corner else 0.5), same for the line axis;
- PixelLineToXY (:405): iX = int(clamp(pg, 0, nx-1)), bilinear blend
  of the four surrounding geoloc samples,
  X = (1-fy) * (X00 + fx*(X10-X00)) + fy * (X01 + fx*(X11-X01))
  (the ShiftGeoX longitude-wrap adjustment is the identity away from
  the antimeridian, as here);
- the inverse direction uses an iterated backmap (:665) — not needed
  for the forward driver query.

Spark-first shape (pure Catalyst, no Python in the plan):

1. the geolocation array is a TABLE (image_id, ix, iy, glx, gly) —
   at swath scale (full-resolution geoloc for a 100 TB L1 archive)
   this is billions of rows, so corner assembly must not collect;
2. the four cell corners are assembled with two window passes —
   lead() along ix within (image_id, iy), then lead() along iy
   within (image_id, ix) — one shuffle each, both streaming;
3. pixels equi-join their containing cell on (image_id, ix, iy) and
   evaluate the bilinear blend in whole-stage codegen.

Oracle parity: geoloc samples are exact small integers and the
subsampling step is 4, so fx, fy ∈ {0, 1/4, 1/2, 3/4} and every
bilinear output is an exact multiple of 1/16 — scaling by 16 yields
an exact BIGINT in both engines (no epsilon needed). The whole query
(grid, windows, join, blend) is ONE dual-dialect SQL string; only
the lateral-range syntax differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import synth

GL_N = 8  # geoloc grid is (GL_N+1) x (GL_N+1) samples
STEP = 4  # PIXEL_STEP = LINE_STEP (PIXEL/LINE_OFFSET = 0, top-left)
RASTER_W = 32  # raster footprint covered by the array

# per-sample geolocation values: integer swath-like surfaces (curved
# in iy, sheared in ix*iy) so the bilinear blend is non-trivial
GLX_EXPR = "(100000 + 37 * ix + 5 * iy + ix * iy + (i % 17))"
GLY_EXPR = "(200000 - 21 * iy + 3 * ix + 2 * iy * iy + (i % 13))"


def _lateral(dialect: str, hi: int, alias: str) -> str:
    if dialect == "spark":
        return f"LATERAL VIEW explode(sequence(0, {hi - 1})) {alias}_t AS {alias}"
    return f", range(0, {hi}) {alias}_t({alias})"


def geoloc_sql(dialect: str, n: int, max_i: int) -> str:
    """The full forward-transform query in either dialect."""
    imgs = synth.images_cte(n, dialect)
    gl_src = _lateral(dialect, GL_N + 1, "ix") + " " + _lateral(
        dialect, GL_N + 1, "iy"
    )
    px_src = _lateral(dialect, RASTER_W, "p") + " " + _lateral(
        dialect, RASTER_W, "l"
    )
    inv_step = 1.0 / STEP
    blend = (
        "(1.0E0 - fy) * ({c}00 + fx * ({c}10 - {c}00)) "
        "+ fy * ({c}01 + fx * ({c}11 - {c}01))"
    )
    return (
        f"WITH imgs AS (SELECT i, image_id FROM ({imgs}) WHERE i < {max_i}), "
        f"gl AS (SELECT image_id, ix, iy, "
        f"cast({GLX_EXPR} as double) AS glx, "
        f"cast({GLY_EXPR} as double) AS gly "
        f"FROM imgs {gl_src}), "
        # corner assembly: two window passes (lead along ix, then iy)
        f"c1 AS (SELECT image_id, ix, iy, glx, gly, "
        f"lead(glx) OVER (PARTITION BY image_id, iy ORDER BY ix) AS glx_r, "
        f"lead(gly) OVER (PARTITION BY image_id, iy ORDER BY ix) AS gly_r "
        f"FROM gl), "
        f"cells AS (SELECT image_id, ix, iy, "
        f"glx AS x00, glx_r AS x10, gly AS y00, gly_r AS y10, "
        f"lead(glx) OVER (PARTITION BY image_id, ix ORDER BY iy) AS x01, "
        f"lead(glx_r) OVER (PARTITION BY image_id, ix ORDER BY iy) AS x11, "
        f"lead(gly) OVER (PARTITION BY image_id, ix ORDER BY iy) AS y01, "
        f"lead(gly_r) OVER (PARTITION BY image_id, ix ORDER BY iy) AS y11 "
        f"FROM c1), "
        f"px AS (SELECT image_id, p, l, "
        f"p * {synth.flit(inv_step)} AS pg, l * {synth.flit(inv_step)} AS lg "
        f"FROM imgs {px_src}), "
        f"j AS (SELECT px.image_id, p, l, "
        f"pg - floor(pg) AS fx, lg - floor(lg) AS fy, "
        f"x00, x10, x01, x11, y00, y10, y01, y11 "
        f"FROM px JOIN cells ON cells.image_id = px.image_id "
        f"AND cells.ix = cast(floor(least(greatest(pg, 0.0E0), "
        f"{synth.flit(float(GL_N))})) as int) "
        f"AND cells.iy = cast(floor(least(greatest(lg, 0.0E0), "
        f"{synth.flit(float(GL_N))})) as int)) "
        f"SELECT image_id, p, l, "
        f"cast(floor(({blend.format(c='x')}) * 16.0E0) as bigint) AS gx16, "
        f"cast(floor(({blend.format(c='y')}) * 16.0E0) as bigint) AS gy16 "
        f"FROM j"
    )


def geoloc_transform_query(
    spark: SparkSession, n: int, max_i: int
) -> DataFrame:
    return spark.sql(geoloc_sql("spark", n, max_i))


def oracle_geoloc_transform(n: int, max_i: int) -> str:
    return geoloc_sql("duckdb", n, max_i)
