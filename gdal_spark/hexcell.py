"""Hexagonal cell assignment — the hexagonal member of the engine's
"H3/S2" cell-index family (BASELINE north star; grid.py provides the
z/x/y quadkey grid, s2cell.py the spherical S2 scheme).

This is classic pointy-top axial hex binning on the plate-carree
plane (Uber H3's local aperture geometry without the icosahedral
face machinery — the published axial/cube coordinate construction,
e.g. Patel, "Hexagonal Grids", Red Blob Games 2013): each point maps
to fractional axial coordinates

    q = (sqrt(3)/3 * lon - 1/3 * lat) / size
    r = (2/3 * lat) / size

then CUBE ROUNDING snaps to the nearest hex center: round each of
(x, y, z) = (q, -q-r, r) and re-derive the coordinate with the
largest rounding error from the other two so x+y+z == 0 stays exact.
Equivalent to nearest-hex-center in the Euclidean plane (Voronoi
property, asserted brute-force in tests/test_round4_ops.py).

Engine notes:
- The WHOLE assignment is one dual-dialect SQL fragment shared
  textually by the Spark query and the DuckDB oracle, so parity is
  structural. Rounding is floor(v + 0.5) — identical IEEE semantics
  on both engines (engine round() tie rules never enter).
- Pure Catalyst staged columns (no Python), so at 100 TB the encode
  fuses into the parquet scan exactly like s2_cell_assign; the
  hex_id is a single shuffle-friendly BIGINT key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# circumradius in degrees of one hex cell at the default resolution:
# ~0.2 deg -> ~22 km hexes, comparable to the z=9 quadkey cells.
HEX_SIZE_DEG = 0.2

_SQRT3_OVER3 = "0.5773502691896258E0"  # sqrt(3)/3, fixed literal
_OFF = 1 << 20  # axial offset so packed ids stay positive


def hex_fragments(size: float = HEX_SIZE_DEG):
    """(cols_sql, id_sql): staged column expressions computing
    (hexq, hexr) from lon/lat, and the packed hex_id. The SAME text
    runs on Spark and DuckDB (names lon/lat must be in scope)."""
    fq = f"(({_SQRT3_OVER3} * lon - lat / 3.0E0) / {size!r}E0)"
    fr = f"((2.0E0 * lat / 3.0E0) / {size!r}E0)"
    # cube round with floor(v + 0.5); stage names hx_/hy_/hz_
    stages = [
        ("hfx", fq),
        ("hfz", fr),
        ("hfy", "(- hfx - hfz)"),
        ("hrx", "floor(hfx + 0.5E0)"),
        ("hry", "floor(hfy + 0.5E0)"),
        ("hrz", "floor(hfz + 0.5E0)"),
        ("hdx", "abs(hrx - hfx)"),
        ("hdy", "abs(hry - hfy)"),
        ("hdz", "abs(hrz - hfz)"),
        (
            "hexq",
            "cast(CASE WHEN hdx > hdy AND hdx > hdz THEN - hry - hrz "
            "ELSE hrx END as bigint)",
        ),
        (
            "hexr",
            "cast(CASE WHEN hdx > hdy AND hdx > hdz THEN hrz "
            "WHEN hdy > hdz THEN hrz "
            "ELSE - hrx - hry END as bigint)",
        ),
    ]
    id_sql = f"(hexq + {_OFF}) * {1 << 32} + (hexr + {_OFF})"
    return stages, id_sql


def hex_center(q: int, r: int, size: float = HEX_SIZE_DEG):
    """(lon, lat) of an axial hex center — inverse of the fractional
    map above (test helper)."""
    import math

    lon = size * math.sqrt(3.0) * (q + r / 2.0)
    lat = size * 1.5 * r
    return lon, lat


def assign_hex(images: DataFrame, size: float = HEX_SIZE_DEG) -> DataFrame:
    """(image_id, hexq, hexr, hex_id) — map-only, pure Catalyst."""
    stages, id_sql = hex_fragments(size)
    df = images.selectExpr("image_id", "lon", "lat")
    for name, sql in stages:
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df.selectExpr(
        "image_id", "hexq", "hexr", f"cast({id_sql} as bigint) AS hex_id"
    )


def oracle_hex_assign(n: int, size: float = HEX_SIZE_DEG) -> str:
    from . import synth

    stages, id_sql = hex_fragments(size)
    sel = f"SELECT image_id, lon, lat FROM ({synth.images_cte(n, 'duckdb')})"
    for name, sql in stages:
        sel = f"SELECT *, {sql} AS {name} FROM ({sel})"
    return (
        f"SELECT image_id, hexq, hexr, "
        f"cast({id_sql} as bigint) AS hex_id FROM ({sel})"
    )


def hex_density_topk(images: DataFrame, k: int = 64,
                     size: float = HEX_SIZE_DEG) -> DataFrame:
    """Densest hex cells — hot-cell skew surfaced on the hexagonal
    grid; map-only codegen assignment, one shuffle on hex_id."""
    from pyspark.sql import functions as F

    return (
        assign_hex(images, size)
        .groupBy("hex_id")
        .agg(F.count("*").alias("n_images"))
        .orderBy(F.desc("n_images"), "hex_id")
        .limit(k)
    )


def oracle_hex_density(n: int, k: int = 64,
                       size: float = HEX_SIZE_DEG) -> str:
    return (
        f"SELECT hex_id, cast(count(*) as bigint) AS n_images "
        f"FROM ({oracle_hex_assign(n, size)}) GROUP BY hex_id "
        f"ORDER BY n_images DESC, hex_id LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# H3-style polyfill + hex-keyed spatial join. Polyfill follows H3's
# published semantics (gridDisk/polygonToCells "containsCenter" mode):
# a hex belongs to a polygon's cover iff the HEX CENTER lies inside
# the polygon. The join (point's hex == one of the polygon's cover
# hexes) is therefore the H3 join — exact away from the boundary,
# center-rule at it (tests pin both properties). This is the
# BASELINE.json north-star composition: encode once, equi-join on the
# cell key — no geometry evaluated at join time, no BNLJ.

_SQRT3 = 1.7320508075688772

# closed-form center containment for the SQL-PIP polygon kinds
# (box / hot_box / triangle; params kind, cx, cy, hw, hh in scope)


def _contain_sql(lon: str, lat: str) -> str:
    return (
        f"({lon} >= cx - hw AND {lon} <= cx + hw "
        f"AND {lat} >= cy - hh AND {lat} <= cy + hh "
        f"AND (kind <> 'triangle' OR ("
        f"((cx + hw) - (cx - hw)) * ({lat} - (cy - hh)) >= 0 "
        f"AND (cx - (cx + hw)) * ({lat} - (cy - hh)) "
        f"- ((cy + hh) - (cy - hh)) * ({lon} - (cx + hw)) >= 0 "
        f"AND ((cx - hw) - cx) * ({lat} - (cy + hh)) "
        f"- ((cy - hh) - (cy + hh)) * ({lon} - cx) >= 0)))"
    )


def _range_fragments(size: float):
    """(rmin, rmax, qmin, qmax, clon, clat) SQL fragments; qmin/qmax
    expect hr in scope."""
    from .synth import flit
    import math

    k_r = flit(1.5 * size)
    k_q = flit(size * math.sqrt(3.0))
    rmin = f"cast(floor((cy - hh) / {k_r}) as bigint) - 1"
    rmax = f"cast(floor((cy + hh) / {k_r}) as bigint) + 1"
    qmin = f"cast(floor((cx - hw) / {k_q} - hr / 2.0E0) as bigint) - 1"
    qmax = f"cast(floor((cx + hw) / {k_q} - hr / 2.0E0) as bigint) + 1"
    clon = f"({k_q} * (hq + hr / 2.0E0))"
    clat = f"({k_r} * hr)"
    return rmin, rmax, qmin, qmax, clon, clat


_SQL_KINDS = "kind IN ('box', 'hot_box', 'triangle')"


def _polyfill_cells_df(spark, m: int, size: float = HEX_SIZE_DEG):
    """(j, hq, hr) cover cells for the SQL-PIP polygon kinds —
    explode candidate rows/columns from the bbox, keep centers that
    pass the exact containment test. Pure Catalyst."""
    from . import synth

    rmin, rmax, qmin, qmax, clon, clat = _range_fragments(size)
    p = spark.sql(
        f"SELECT * FROM ({synth.polygons_sql_cte(m, 'spark')}) "
        f"WHERE {_SQL_KINDS}"
    )
    return (
        p.selectExpr("*", f"explode(sequence({rmin}, {rmax})) AS hr")
        .selectExpr("*", f"explode(sequence({qmin}, {qmax})) AS hq")
        .selectExpr("*", f"{clon} AS clon", f"{clat} AS clat")
        .where(_contain_sql("clon", "clat"))
        .select("j", "hq", "hr")
    )


def hex_polyfill(spark, m: int, size: float = HEX_SIZE_DEG):
    """(j, n_cells, qsum, rsum) per polygon — the polyfill cover
    summarized to exact integers."""
    from pyspark.sql import functions as F

    return (
        _polyfill_cells_df(spark, m, size)
        .groupBy("j")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("hq").alias("qsum"),
            F.sum("hr").alias("rsum"),
        )
    )


def _oracle_polyfill_cells(m: int, size: float = HEX_SIZE_DEG) -> str:
    from . import synth

    rmin, rmax, qmin, qmax, clon, clat = _range_fragments(size)
    return (
        f"SELECT j, hq, hr FROM ("
        f"SELECT *, {clon} AS clon, {clat} AS clat FROM ("
        f"SELECT *, unnest(generate_series({qmin}, {qmax})) AS hq FROM ("
        f"SELECT *, unnest(generate_series({rmin}, {rmax})) AS hr "
        f"FROM (SELECT * FROM ({synth.polygons_sql_cte(m, 'duckdb')}) "
        f"WHERE {_SQL_KINDS}) p0) p1) p2) p3 "
        f"WHERE {_contain_sql('clon', 'clat')}"
    )


def oracle_hex_polyfill(m: int, size: float = HEX_SIZE_DEG) -> str:
    return (
        f"SELECT j, count(*) AS n_cells, "
        f"cast(sum(hq) as bigint) AS qsum, "
        f"cast(sum(hr) as bigint) AS rsum "
        f"FROM ({_oracle_polyfill_cells(m, size)}) GROUP BY j"
    )


def hex_spatial_join(spark, images: DataFrame, m: int,
                     size: float = HEX_SIZE_DEG) -> DataFrame:
    """(j, n_images): points joined to polygons purely on the hex
    key — assign once, equi-join, aggregate. The scale path for the
    10^12-image H3 join (cover side is tiny -> broadcast; no geometry
    at join time)."""
    from pyspark.sql import functions as F

    pts = assign_hex(images, size)
    cover = _polyfill_cells_df(spark, m, size)
    joined = pts.join(
        F.broadcast(cover),
        (pts.hexq == cover.hq) & (pts.hexr == cover.hr),
    )
    return joined.groupBy("j").agg(F.count("*").alias("n_images"))


def oracle_hex_spatial_join(n: int, m: int,
                            size: float = HEX_SIZE_DEG) -> str:
    return (
        f"SELECT j, cast(count(*) as bigint) AS n_images "
        f"FROM ({oracle_hex_assign(n, size)}) pts "
        f"JOIN ({_oracle_polyfill_cells(m, size)}) cov "
        f"ON pts.hexq = cov.hq AND pts.hexr = cov.hr "
        f"GROUP BY j"
    )
