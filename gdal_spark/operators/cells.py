"""Cell/tile assignment stage — the engine's "H3/S2 cell assignment".

``assign_cells`` adds grid-tile columns to any DataFrame with lon/lat
columns, via a vectorized pandas UDF that batch-encodes cell ids over
whole Arrow batches (the north-star contract: no per-row Python).

Semantics = reference tile grids (osgeo_utils/gdal2tiles.py
GlobalMercator:337 / GlobalGeodetic:556), verified golden-exact in
tests/test_grid.py.

``merc_tile_sql`` / ``geodetic_tile_sql`` emit the *same* math as SQL
expressions (valid in Spark SQL and DuckDB) so the driver's oracle can
recompute assignments independently, and so a pure-Catalyst variant
(no Python at all) is available — ``assign_cells(..., engine="sql")``
uses it; the pandas-UDF path is the default per the north star, and
both are asserted equal in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import grid
from ..synth import flit


# ---------------------------------------------------------------------------
# SQL-expression variants (Spark SQL + DuckDB compatible)


def merc_tile_sql(lon: str, lat: str, zoom: int, axis: str) -> str:
    """TMS mercator tile index as a SQL expression (clipped)."""
    res = grid.INITIAL_RESOLUTION / (2.0**zoom)  # exact: division by 2^z
    n = 2**zoom
    shift = flit(grid.ORIGIN_SHIFT)
    if axis == "x":
        m = f"({lon} * {shift} / 180.0E0)"
    else:
        m = (
            f"(ln(tan((90.0E0 + {lat}) * pi() / 360.0E0)) / (pi() / 180.0E0) "
            f"* {shift} / 180.0E0)"
        )
    px = f"(({m} + {shift}) / {flit(res)})"
    t = f"(cast(ceil({px} / 256.0E0) as bigint) - 1)"
    return f"greatest(0, least({n - 1}, {t}))"


def geodetic_tile_sql(lon: str, lat: str, zoom: int, axis: str) -> str:
    """TMS-compatible geodetic tile index as a SQL expression (clipped)."""
    res = 180.0 / grid.TILE_SIZE / (2.0**zoom)
    if axis == "x":
        px = f"((180.0E0 + {lon}) / {flit(res)})"
        hi = 2 * 2**zoom - 1
    else:
        px = f"((90.0E0 + {lat}) / {flit(res)})"
        hi = 2**zoom - 1
    t = f"(cast(ceil({px} / 256.0E0) as bigint) - 1)"
    return f"greatest(0, least({hi}, {t}))"


def cell_id_sql(tx: str, ty: str, zoom: int) -> str:
    """Pack (zoom, tx, ty) into the int64 cell id in SQL — matches
    grid.pack_cell."""
    return f"(cast({zoom} as bigint) * {1 << 58} + {tx} * {1 << 29} + {ty})"


# ---------------------------------------------------------------------------
# pandas-UDF variant (the default engine)


def _make_tile_udfs(zoom: int, grid_kind: str):
    @F.pandas_udf(T.LongType())
    def tile_x(lon: pd.Series, lat: pd.Series) -> pd.Series:
        if grid_kind == "mercator":
            tx, _ = grid.lonlat_to_tile_merc(lon.values, lat.values, zoom)
        else:
            tx, _ = grid.lonlat_to_tile_geodetic(lon.values, lat.values, zoom)
        return pd.Series(tx)

    @F.pandas_udf(T.LongType())
    def tile_y(lon: pd.Series, lat: pd.Series) -> pd.Series:
        if grid_kind == "mercator":
            _, ty = grid.lonlat_to_tile_merc(lon.values, lat.values, zoom)
        else:
            _, ty = grid.lonlat_to_tile_geodetic(lon.values, lat.values, zoom)
        return pd.Series(ty)

    return tile_x, tile_y


def assign_cells(
    df: DataFrame,
    zoom: int,
    grid_kind: str = "mercator",
    lon_col: str = "lon",
    lat_col: str = "lat",
    engine: str = "pandas",
    with_quadkey: bool = False,
    prefix: str = "",
) -> DataFrame:
    """Add ``tile_x, tile_y`` (TMS) and packed ``cell_id`` columns.

    engine="pandas": vectorized pandas UDF (Arrow-batched numpy).
    engine="sql":    pure Catalyst expressions (JVM, codegen) — same
                     math, zero Python; used for oracle parity and as
                     the fastest path when quadkeys aren't needed.
    """
    cx, cy, cc = f"{prefix}tile_x", f"{prefix}tile_y", f"{prefix}cell_id"
    if engine == "sql":
        fn = merc_tile_sql if grid_kind == "mercator" else geodetic_tile_sql
        df = df.withColumn(cx, F.expr(fn(lon_col, lat_col, zoom, "x")))
        df = df.withColumn(cy, F.expr(fn(lon_col, lat_col, zoom, "y")))
    else:
        tile_x, tile_y = _make_tile_udfs(zoom, grid_kind)
        df = df.withColumn(cx, tile_x(F.col(lon_col), F.col(lat_col)))
        df = df.withColumn(cy, tile_y(F.col(lon_col), F.col(lat_col)))
    df = df.withColumn(cc, F.expr(cell_id_sql(cx, cy, zoom)))
    if with_quadkey:
        if grid_kind != "mercator":
            raise ValueError("quadkey is defined on the mercator grid")

        @F.pandas_udf(T.StringType())
        def qk(tx: pd.Series, ty: pd.Series) -> pd.Series:
            return pd.Series(grid.quadkey(tx.values, ty.values, zoom))

        df = df.withColumn(f"{prefix}quadkey", qk(F.col(cx), F.col(cy)))
    return df


def oracle_tile_xyz_quadkey(n: int, zoom: int) -> str:
    """DuckDB twin of the gdal2tiles --xyz flip + quadkey build: the
    quadkey digit at depth k is bit (zoom-k) of tx plus twice that bit
    of the y-flipped (google) row."""
    from .. import synth

    digits = " || ".join(
        f"cast(((tile_x >> {zoom - k}) & 1) + "
        f"2 * ((y_xyz >> {zoom - k}) & 1) as varchar)"
        for k in range(1, zoom + 1)
    )
    flip = 2**zoom - 1
    return (
        f"WITH t AS (SELECT image_id, "
        f"{merc_tile_sql('lon', 'lat', zoom, 'x')} AS tile_x, "
        f"{merc_tile_sql('lon', 'lat', zoom, 'y')} AS tile_y "
        f"FROM ({synth.images_cte(n, 'duckdb')})), "
        f"f AS (SELECT image_id, tile_x, tile_y, "
        f"cast({flip} - tile_y as bigint) AS y_xyz FROM t) "
        f"SELECT image_id, tile_x, tile_y, y_xyz, {digits} AS quadkey "
        f"FROM f"
    )
