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
