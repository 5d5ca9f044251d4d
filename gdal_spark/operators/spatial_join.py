"""Point-in-polygon spatial join: cell-prefix equi-prefilter + exact
even-odd ray-cast refine.

Reference semantics: OGRLayer::FilterGeometry
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:1445) — envelope prefilter, then
exact geometry test — and the layer-algebra joins (ogrlayer.cpp:2278
Intersection etc.) which push the method layer's bbox into the input
layer scan. The even-odd parity rule matches GDAL's scanline fill
(alg/llrasterize.cpp:76).

Spark shape (scale-first):

1. polygons -> covering cells at an adaptive zoom (coarse cells for
   big polygons, capped at ``max_cells`` per polygon), exploded to
   (cell_id, poly row). The polygon side is usually the small side ->
   broadcast; above ``broadcast_max_rows`` exploded rows it shuffles.
2. points (the big table) -> ONE cell per zoom level via pure
   arithmetic on the packed cell id (no re-projection per level, no
   explode of the payload: only a narrow (key, lon, lat) projection is
   exploded, a semi-join pattern so image payload bytes never shuffle).
3. equi-join on cell_id -> candidate pairs.
4. exact refine: a vectorized pandas-UDF *filter* on the join output —
   no extra shuffle, no per-polygon grouping (so no skew from dense
   polygons); each Arrow batch factorizes its polygons and ray-casts
   all points per polygon at once.

At 100 TB: stage 2 is map-only; the only shuffle is the equi-join
(avoided entirely when the polygon side broadcasts); AQE skew-join
splits dense cells; adaptive polygon zoom keeps the build side small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import geom as geom_mod
from .. import grid, wkb
from .cells import assign_cells, cell_id_sql

DEFAULT_JOIN_ZOOM = 6
DEFAULT_MIN_ZOOM = 3


def polygon_cells(
    polys: DataFrame,
    join_zoom: int = DEFAULT_JOIN_ZOOM,
    min_zoom: int = DEFAULT_MIN_ZOOM,
    max_cells: int = 64,
) -> DataFrame:
    """Explode polygons to covering geodetic cells at a per-polygon
    adaptive zoom in [min_zoom, join_zoom]. Output: polygon columns +
    ``cell_id``."""
    out_schema = T.StructType(
        polys.schema.fields + [T.StructField("cell_id", T.LongType(), False)]
    )
    cols = [f.name for f in polys.schema.fields]

    def explode_cells(batches):
        for pdf in batches:
            rows = {c: [] for c in cols}
            cells = []
            for rec in pdf.itertuples(index=False):
                d = dict(zip(cols, rec))
                g = bytes(d["geom_wkb"])
                z = geom_mod.zoom_for_max_cells(g, max_cells, max_zoom=join_zoom)
                z = max(z, min_zoom)
                cids = geom_mod.covering_cells_geodetic(g, z)
                for c in cols:
                    rows[c].extend([d[c]] * len(cids))
                cells.append(cids)
            if cells:
                yield pd.DataFrame(
                    {**rows, "cell_id": np.concatenate(cells).astype(np.int64)}
                )

    return polys.mapInPandas(explode_cells, schema=out_schema)


def make_pip_udf():
    """Vectorized exact point-in-polygon refine (even-odd ray cast).
    Factorizes geometries per Arrow batch so each polygon's points are
    tested in one numpy pass."""

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, geom: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        if len(lon):
            codes, uniques = pd.factorize(geom)
            px = lon.values.astype(np.float64)
            py = lat.values.astype(np.float64)
            for code, g in enumerate(uniques):
                mask = codes == code
                out[mask] = geom_mod.points_in_wkb(px[mask], py[mask], bytes(g))
        return pd.Series(out)

    return pip


def spatial_join(
    points: DataFrame,
    polys: DataFrame,
    join_zoom: int = DEFAULT_JOIN_ZOOM,
    min_zoom: int = DEFAULT_MIN_ZOOM,
    max_cells: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast: bool | None = None,
    broadcast_max_rows: int = 2_000_000,
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
    engine: str = "pandas",
) -> DataFrame:
    """Inner PIP join: rows = (point, polygon) pairs where the point
    lies inside the polygon (even-odd rule)."""
    point_cols = point_cols or [
        c for c in points.columns if c not in (lon_col, lat_col)
    ]
    poly_cols = poly_cols or [c for c in polys.columns if c != "geom_wkb"]

    pcells = polygon_cells(polys, join_zoom, min_zoom, max_cells).select(
        "cell_id", "geom_wkb", *poly_cols
    )
    if broadcast is None:
        # decide from the un-exploded polygon count (cheap; bounded by
        # max_cells blowup) — explicit broadcast-or-shuffle decision
        n_poly = polys.count()
        broadcast = n_poly * max_cells <= broadcast_max_rows
    if broadcast:
        pcells = F.broadcast(pcells)

    # point side: cell at join_zoom (pandas UDF per north star), then
    # ancestors via pure int arithmetic, exploded on a narrow projection
    pts = assign_cells(
        points, join_zoom, grid_kind="geodetic", lon_col=lon_col,
        lat_col=lat_col, engine=engine,
    )
    levels = [
        F.expr(
            cell_id_sql(
                f"(tile_x >> {join_zoom - z})", f"(tile_y >> {join_zoom - z})", z
            )
        )
        for z in range(min_zoom, join_zoom + 1)
    ]
    pts = pts.select(
        lon_col, lat_col, *point_cols, F.explode(F.array(*levels)).alias("cell_id")
    )

    cand = pts.join(pcells, "cell_id", "inner")
    pip = make_pip_udf()
    refined = cand.filter(pip(F.col(lon_col), F.col(lat_col), F.col("geom_wkb")))
    return refined.select(lon_col, lat_col, *point_cols, *poly_cols)


def spatial_join_bruteforce(
    points: DataFrame,
    polys: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
) -> DataFrame:
    """Cross-join + exact refine — the oracle for tests (no cell
    prefilter, same PIP kernel)."""
    point_cols = point_cols or [
        c for c in points.columns if c not in (lon_col, lat_col)
    ]
    poly_cols = poly_cols or [c for c in polys.columns if c != "geom_wkb"]
    cand = points.select(lon_col, lat_col, *point_cols).crossJoin(
        F.broadcast(polys.select("geom_wkb", *poly_cols))
    )
    pip = make_pip_udf()
    return cand.filter(pip(F.col(lon_col), F.col(lat_col), F.col("geom_wkb"))).select(
        lon_col, lat_col, *point_cols, *poly_cols
    )
