"""Deterministic synthesis of the engine's input tables.

BASELINE.json fixes the primary input: a table of image+caption pairs
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint)``, each image treated as a
geo-referenced raster tile. No such table ships with the testdata, so
it is synthesized deterministically (seed-free arithmetic — every
value is a pure IEEE-754 function of the row index), at a size keyed
to the scale factor.

Every numeric rule is expressed once as a SQL fragment string that
BOTH Spark SQL and DuckDB parse to the same double-precision
arithmetic, so the driver's DuckDB oracle can regenerate the exact
same table (bit-identical doubles: literals parse equal, and +,-,*,
floor are correctly-rounded IEEE ops in both engines).

Geo-referencing (the "treat each image as a geo-referenced raster
tile" rule): ``lon, lat`` are low-discrepancy (Kronecker golden-ratio)
points over the WebMercator-valid globe, with an intentionally skewed
hot cluster — 25% of rows inside a 0.5 deg x 0.5 deg cell — to
exercise salting / adaptive cell splitting. The per-image geotransform
is north-up affine: gt = (lon, res, 0, lat, 0, -res), res = 0.1/w
(reference geotransform semantics: gcore/gdal.h:1103).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codecs, wkb

# ---------------------------------------------------------------------------
# scale mapping (FIXTURES.md tiers)

N_IMAGES_FOR_SF = {"0.001": 256, "0.01": 4096, "0.1": 65536}
N_POLYGONS_FOR_SF = {"0.001": 64, "0.01": 128, "0.1": 2048}
N_SITES = 32


def sf_name(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01'."""
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return base[2:] if base.startswith("sf") else base


def n_images(sf_dir: str) -> int:
    name = sf_name(sf_dir)
    if name in N_IMAGES_FOR_SF:
        return N_IMAGES_FOR_SF[name]
    try:
        return max(256, int(4096 * float(name) / 0.01))
    except ValueError:
        return 4096


def n_polygons(sf_dir: str) -> int:
    name = sf_name(sf_dir)
    if name in N_POLYGONS_FOR_SF:
        return N_POLYGONS_FOR_SF[name]
    return 128


# ---------------------------------------------------------------------------
# images — shared SQL fragments (valid in Spark SQL AND DuckDB)


def flit(x: float) -> str:
    """A SQL DOUBLE literal both engines parse identically. Plain
    decimal literals are DECIMAL in Spark SQL (and DuckDB), which
    silently changes arithmetic — the E0 exponent forms an approximate
    (double) literal in both dialects."""
    s = np.format_float_positional(float(x), unique=True, trim="0")
    if s.endswith("."):
        s += "0"
    return s + "E0"


PHI = 0.6180339887498949  # frac(golden ratio)
SQ2 = 0.41421356237309515  # frac(sqrt 2)

U_EXPR = f"(i * {flit(PHI)} - floor(i * {flit(PHI)}))"
V_EXPR = f"(i * {flit(SQ2)} - floor(i * {flit(SQ2)}))"

HOT_LON0, HOT_LAT0 = 11.2, 48.1  # the 0.5x0.5 deg hot cell
LON_EXPR = (
    f"(CASE WHEN i % 4 = 0 THEN {flit(HOT_LON0)} + 0.5E0 * {U_EXPR} "
    f"ELSE -179.9E0 + 359.8E0 * {U_EXPR} END)"
)
LAT_EXPR = (
    f"(CASE WHEN i % 4 = 0 THEN {flit(HOT_LAT0)} + 0.5E0 * {V_EXPR} "
    f"ELSE -84.9E0 + 169.8E0 * {V_EXPR} END)"
)
W_EXPR = (
    "(CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 20 WHEN 2 THEN 64 "
    "WHEN 3 THEN 100 ELSE 256 END)"
)
H_EXPR = (
    "(CASE (i + 1) % 5 WHEN 0 THEN 16 WHEN 1 THEN 20 WHEN 2 THEN 64 "
    "WHEN 3 THEN 100 ELSE 256 END)"
)
FMT_EXPR = "(CASE WHEN i % 2 = 0 THEN 'png' ELSE 'jpeg' END)"


def _id_expr(dialect: str) -> str:
    cast = "varchar" if dialect == "duckdb" else "string"
    return f"concat('img', lpad(cast(i as {cast}), 8, '0'))"


def _caption_expr(dialect: str) -> str:
    cast = "varchar" if dialect == "duckdb" else "string"
    return f"concat('caption for img', lpad(cast(i as {cast}), 8, '0'))"


def images_cte(n: int, dialect: str = "duckdb") -> str:
    """A CTE body producing the images table (sans pixel payload) in
    either dialect. Columns: i, image_id, lon, lat, w, h, fmt, caption.
    """
    src = f"range(0, {n}) t(i)" if dialect == "duckdb" else f"range(0, {n}) AS t(i)"
    if dialect == "spark":
        # spark.range exposes `id`
        src = f"(SELECT id AS i FROM range(0, {n}))"
        return (
            f"SELECT i, {_id_expr('spark')} AS image_id, {LON_EXPR} AS lon, "
            f"{LAT_EXPR} AS lat, {W_EXPR} AS w, {H_EXPR} AS h, {FMT_EXPR} AS fmt, "
            f"{_caption_expr('spark')} AS caption FROM {src}"
        )
    return (
        f"SELECT i, {_id_expr('duckdb')} AS image_id, {LON_EXPR} AS lon, "
        f"{LAT_EXPR} AS lat, {W_EXPR} AS w, {H_EXPR} AS h, {FMT_EXPR} AS fmt, "
        f"{_caption_expr('duckdb')} AS caption FROM range(0, {n}) t(i)"
    )


def images_df(
    spark, n: int, with_pixels: bool = False,
    num_partitions: int | None = None,
):
    """The synthesized images DataFrame. Metadata columns are computed
    JVM-side (exact Catalyst expressions — no Python in the plan);
    pixel payload + phash, when requested, are generated in a
    vectorized ``mapInPandas`` stage (Arrow-batched, no per-row
    Python).  ``num_partitions`` pins the leaf range's task count
    (default: the session's leafNodeDefaultParallelism) — the
    per-branch granularity knob the scaling job A/Bs use."""
    if num_partitions is None:
        df = spark.sql(images_cte(n, "spark"))
    else:
        df = spark.range(0, n, 1, num_partitions).selectExpr(
            "id AS i"
        ).selectExpr(
            "i", f"{_id_expr('spark')} AS image_id", f"{LON_EXPR} AS lon",
            f"{LAT_EXPR} AS lat", f"{W_EXPR} AS w", f"{H_EXPR} AS h",
            f"{FMT_EXPR} AS fmt", f"{_caption_expr('spark')} AS caption",
        )
    if not with_pixels:
        return df
    return add_pixels(df)


def add_pixels(df):
    """Attach ``bytes`` (encoded payload) + ``phash`` to a metadata
    frame with (i, w, h, fmt) columns — Arrow-batched generation."""

    def gen_pixels(batches):
        for pdf in batches:
            payloads = []
            hashes = []
            for i, w, h, fmt in zip(pdf["i"], pdf["w"], pdf["h"], pdf["fmt"]):
                arr = codecs.make_pixels(int(i), int(w), int(h))
                payloads.append(codecs.encode_image(arr, fmt))
                hashes.append(codecs.phash64(codecs.decode_image(payloads[-1])))
            pdf = pdf.assign(bytes=payloads, phash=pd.array(hashes, dtype="int64"))
            yield pdf

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen_pixels, schema=f"{base}, bytes binary, phash bigint")


# SQL replica of codecs.make_pixels + the fake-codec decode: the
# per-pixel value as a function of (i, w, fmt, x, y, ch). numpy sin ==
# DuckDB/libm sin bit-for-bit on this platform (asserted in tests), so
# pixel-level operators get REAL value oracles on small subsets.
TWO_PI = 2.0 * np.pi


def pixel_val_sql(xe: str = "x", ye: str = "y") -> str:
    """SQL expression for the decoded pixel value; expects columns
    i, w, fmt, ch in scope plus x/y (or pass coordinate expressions
    via xe/ye — kernel operators instantiate the formula at shifted
    tap coordinates instead of self-joining the pixel table)."""
    arg = (
        f"{flit(TWO_PI)} * (cast(({xe}) as double) / w + (i % 17) / 17.0E0 "
        f"+ ch / 3.0E0)"
    )
    base = f"((({xe}) * 3 + ({ye}) * 5 + i * 7 + ch * 11) % 256)"
    raw = (
        f"cast(floor(greatest(0.0E0, least(255.0E0, {base} + 60.0E0 * "
        f"sin({arg})))) as bigint)"
    )
    return (
        f"(CASE WHEN fmt = 'jpeg' THEN cast(floor({raw} / 4.0E0) as bigint) "
        f"* 4 + 2 ELSE {raw} END)"
    )


def pixels_cte(n: int, max_i: int, dialect: str = "duckdb") -> str:
    """Long-format pixel table (image_id, i, w, h, fmt, x, y, ch, val)
    for images with i < max_i — the oracle's window into decoded
    pixels."""
    if dialect == "duckdb":
        src = (
            f"FROM ({images_cte(n, 'duckdb')}) i, range(0, 256) tx(x), "
            f"range(0, 256) ty(y), range(0, 3) tc(ch) "
            f"WHERE i.i < {max_i} AND x < i.w AND y < i.h"
        )
    else:
        src = (
            f"FROM ({images_cte(n, 'spark')}) i "
            f"JOIN (SELECT id AS x FROM range(0, 256)) tx ON x < i.w "
            f"JOIN (SELECT id AS y FROM range(0, 256)) ty ON y < i.h "
            f"CROSS JOIN (SELECT id AS ch FROM range(0, 3)) tc "
            f"WHERE i.i < {max_i}"
        )
    return (
        f"SELECT image_id, i.i AS i, w, h, fmt, x, y, ch, "
        f"{pixel_val_sql()} AS val {src}"
    )


def images_pdf(n: int) -> pd.DataFrame:
    """Driver-free pandas replica of the metadata columns (for unit
    tests); bit-identical to the SQL by construction."""
    i = np.arange(n, dtype=np.int64)
    u = i * PHI - np.floor(i * PHI)
    v = i * SQ2 - np.floor(i * SQ2)
    hot = i % 4 == 0
    lon = np.where(hot, HOT_LON0 + 0.5 * u, -179.9 + 359.8 * u)
    lat = np.where(hot, HOT_LAT0 + 0.5 * v, -84.9 + 169.8 * v)
    dims = np.array([16, 20, 64, 100, 256], dtype=np.int64)
    w = dims[i % 5]
    h = dims[(i + 1) % 5]
    fmt = np.where(i % 2 == 0, "png", "jpeg")
    ids = np.array([f"img{k:08d}" for k in i], dtype=object)
    captions = np.array([f"caption for img{k:08d}" for k in i], dtype=object)
    return pd.DataFrame(
        {"i": i, "image_id": ids, "lon": lon, "lat": lat, "w": w, "h": h,
         "fmt": fmt, "caption": captions}
    )


# ---------------------------------------------------------------------------
# polygons — vector layer for the spatial join. Kinds per j % 8:
#   0        -> hot box (inside/near the hot cell)
#   1, 4     -> box
#   2, 5     -> triangle (axis-symmetric, CCW)
#   3, 6     -> convex k-gon (k = 5 + j % 7)
#   7        -> alternating concave "C" / polygon-with-hole
# Boxes + triangles are reproducible in plain SQL (the oracle subset);
# all kinds are exercised by the pytest brute-force oracle.

A1 = 0.7548776662466927  # 2-D Kronecker (R2) sequence constants
A2 = 0.5698402909980532
C_HW = 0.3183098861837907  # 1/pi
C_HH = 0.36787944117144233  # 1/e

PU_EXPR = f"(j * {flit(A1)} - floor(j * {flit(A1)}))"
PV_EXPR = f"(j * {flit(A2)} - floor(j * {flit(A2)}))"
PHW_EXPR = f"(1.0E0 + 9.0E0 * (j * {flit(C_HW)} - floor(j * {flit(C_HW)})))"
PHH_EXPR = f"(1.0E0 + 9.0E0 * (j * {flit(C_HH)} - floor(j * {flit(C_HH)})))"
HOT_PHW_EXPR = f"(0.05E0 + 0.45E0 * (j * {flit(C_HW)} - floor(j * {flit(C_HW)})))"
HOT_PHH_EXPR = f"(0.05E0 + 0.45E0 * (j * {flit(C_HH)} - floor(j * {flit(C_HH)})))"
PCX_EXPR = f"(CASE WHEN j % 8 = 0 THEN 11.0E0 + 1.0E0 * {PU_EXPR} ELSE -170.0E0 + 340.0E0 * {PU_EXPR} END)"
PCY_EXPR = f"(CASE WHEN j % 8 = 0 THEN 47.8E0 + 1.0E0 * {PV_EXPR} ELSE -80.0E0 + 160.0E0 * {PV_EXPR} END)"
PHW_CASE = f"(CASE WHEN j % 8 = 0 THEN {HOT_PHW_EXPR} ELSE {PHW_EXPR} END)"
PHH_CASE = f"(CASE WHEN j % 8 = 0 THEN {HOT_PHH_EXPR} ELSE {PHH_EXPR} END)"
CATEGORY_EXPR = (
    "(CASE j % 4 WHEN 0 THEN 'urban' WHEN 1 THEN 'water' "
    "WHEN 2 THEN 'forest' ELSE 'other' END)"
)


def polygons_sql_cte(m: int, dialect: str = "duckdb") -> str:
    """SQL producing the *oracle subset* geometry parameters: every
    polygon row with kind + box params (j, kind, cx, cy, hw, hh,
    category). Only kinds 'box' and 'triangle' are meant for SQL-side
    point-in-polygon."""
    kind = (
        "(CASE WHEN j % 8 = 0 THEN 'hot_box' WHEN j % 8 IN (1, 4) THEN 'box' "
        "WHEN j % 8 IN (2, 5) THEN 'triangle' WHEN j % 8 IN (3, 6) THEN 'kgon' "
        "WHEN j % 16 = 7 THEN 'concave' ELSE 'holed' END)"
    )
    if dialect == "spark":
        src = f"(SELECT id AS j FROM range(0, {m}))"
        return (
            f"SELECT j, {kind} AS kind, {PCX_EXPR} AS cx, {PCY_EXPR} AS cy, "
            f"{PHW_CASE} AS hw, {PHH_CASE} AS hh, {CATEGORY_EXPR} AS category "
            f"FROM {src}"
        )
    return (
        f"SELECT j, {kind} AS kind, {PCX_EXPR} AS cx, {PCY_EXPR} AS cy, "
        f"{PHW_CASE} AS hw, {PHH_CASE} AS hh, {CATEGORY_EXPR} AS category "
        f"FROM range(0, {m}) t(j)"
    )


def _poly_params(m: int):
    j = np.arange(m, dtype=np.int64)
    u = j * A1 - np.floor(j * A1)
    v = j * A2 - np.floor(j * A2)
    fw = j * C_HW - np.floor(j * C_HW)
    fh = j * C_HH - np.floor(j * C_HH)
    hot = j % 8 == 0
    cx = np.where(hot, 11.0 + 1.0 * u, -170.0 + 340.0 * u)
    cy = np.where(hot, 47.8 + 1.0 * v, -80.0 + 160.0 * v)
    hw = np.where(hot, 0.05 + 0.45 * fw, 1.0 + 9.0 * fw)
    hh = np.where(hot, 0.05 + 0.45 * fh, 1.0 + 9.0 * fh)
    return j, cx, cy, hw, hh


def polygon_kind(j: int) -> str:
    r = j % 8
    if r == 0:
        return "hot_box"
    if r in (1, 4):
        return "box"
    if r in (2, 5):
        return "triangle"
    if r in (3, 6):
        return "kgon"
    return "concave" if j % 16 == 7 else "holed"


def kind_geom(kind: str, x: float, y: float, w_: float, h_: float, idx: int) -> bytes:
    """WKB geometry for one synth polygon kind at center (x, y)."""
    if kind in ("box", "hot_box"):
        ring = [(x - w_, y - h_), (x + w_, y - h_), (x + w_, y + h_), (x - w_, y + h_)]
        return wkb.encode_polygon(ring)
    if kind == "triangle":
        ring = [(x - w_, y - h_), (x + w_, y - h_), (x, y + h_)]
        return wkb.encode_polygon(ring)
    if kind == "kgon":
        k = 5 + idx % 7
        ang = 2.0 * np.pi * np.arange(k) / k + 0.1 * idx
        ring = np.stack([x + w_ * np.cos(ang), y + h_ * np.sin(ang)], axis=1)
        return wkb.encode_polygon(ring)
    if kind == "concave":
        # "C" shape opening to the right
        ring = [
            (x - w_, y - h_), (x + w_, y - h_), (x + w_, y - 0.6 * h_),
            (x - 0.4 * w_, y - 0.6 * h_), (x - 0.4 * w_, y + 0.6 * h_),
            (x + w_, y + 0.6 * h_), (x + w_, y + h_), (x - w_, y + h_),
        ]
        return wkb.encode_polygon(ring)
    # holed
    outer = [(x - w_, y - h_), (x + w_, y - h_), (x + w_, y + h_), (x - w_, y + h_)]
    inner = [
        (x - 0.4 * w_, y - 0.4 * h_), (x + 0.4 * w_, y - 0.4 * h_),
        (x + 0.4 * w_, y + 0.4 * h_), (x - 0.4 * w_, y + 0.4 * h_),
    ]
    return wkb.encode_polygon(outer, [inner])


def polygons_pdf(m: int) -> pd.DataFrame:
    """All polygons, with WKB geometry. Deterministic; box/triangle
    params match the SQL CTE bit-for-bit."""
    j, cx, cy, hw, hh = _poly_params(m)
    cats = np.array(["urban", "water", "forest", "other"], dtype=object)[j % 4]
    rows = []
    for idx in range(m):
        kind = polygon_kind(idx)
        x, y, w_, h_ = float(cx[idx]), float(cy[idx]), float(hw[idx]), float(hh[idx])
        geom = kind_geom(kind, x, y, w_, h_, idx)
        rows.append(
            {
                "poly_id": f"poly{idx:04d}",
                "j": idx,
                "kind": kind,
                "geom_wkb": geom,
                "category": str(cats[idx]),
                "srs": "EPSG:4326",
            }
        )
    return pd.DataFrame(rows)


def concave_clips_pdf(m: int) -> pd.DataFrame:
    """Concave/holed CLIP layer for the Greiner–Hormann driver query:
    the j%8==7 polygons re-centered onto box j-6 (kind 'box' for every
    j) at offset (+0.3*hw_b, -0.2*hh_b), guaranteeing box-clip
    overlaps at the sf0.01 oracle scale where the raw R2 placement
    keeps the kinds apart. Pure arithmetic, mirrored by the SQL
    oracle (oracle_overlay_concave_clip)."""
    j, cx, cy, hw, hh = _poly_params(m)
    rows = []
    for idx in range(7, m, 8):
        b = idx - 6
        ncx = float(cx[b] + 0.3 * hw[b])
        ncy = float(cy[b] - 0.2 * hh[b])
        kind = polygon_kind(idx)
        rows.append(
            {
                "clip_id": f"clip{idx:04d}",
                "kind": kind,
                "geom_wkb": kind_geom(
                    kind, ncx, ncy, float(hw[idx]), float(hh[idx]), idx
                ),
            }
        )
    return pd.DataFrame(rows)


def concave_clips_df(spark, m: int):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    return spark.createDataFrame(concave_clips_pdf(m), schema=schema)


def polygons_df(spark, m: int):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("poly_id", T.StringType(), False),
            T.StructField("j", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
            T.StructField("category", T.StringType(), False),
            T.StructField("srs", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(polygons_pdf(m), schema=schema)


# ---------------------------------------------------------------------------
# lattice — a DISJOINT rectangle method layer for the layer-algebra
# Identity/Update driver oracles: with pairwise-disjoint method
# features, area(A \ union(B_i)) = area(A) - sum_i area(A ∩ B_i) is
# closed-form SQL, so the geometric fold gets an exact value oracle.
# 8x4 world grid, 38 x 37.5 deg cells with 7 / 7.5 deg streets.

LATT_NX, LATT_NY = 8, 4
LATT_W, LATT_H = 38.0, 37.5
LATT_OX, LATT_OY = 3.0, 2.5


def lattice_cte(dialect: str = "duckdb") -> str:
    n = LATT_NX * LATT_NY
    src = (
        f"(SELECT id AS k FROM range(0, {n}))"
        if dialect == "spark"
        else f"range(0, {n}) t(k)"
    )
    cast_s = "string" if dialect == "spark" else "varchar"
    return (
        f"SELECT concat('latt', lpad(cast(k as {cast_s}), 2, '0')) AS latt_id, "
        f"-180.0E0 + 45.0E0 * cast(k % {LATT_NX} as double) + {flit(LATT_OX)} AS lx0, "
        f"-90.0E0 + 45.0E0 * cast(floor(cast(k as double) / {flit(float(LATT_NX))}) as double) + {flit(LATT_OY)} AS ly0, "
        f"-180.0E0 + 45.0E0 * cast(k % {LATT_NX} as double) + {flit(LATT_OX + LATT_W)} AS lx1, "
        f"-90.0E0 + 45.0E0 * cast(floor(cast(k as double) / {flit(float(LATT_NX))}) as double) + {flit(LATT_OY + LATT_H)} AS ly1 "
        f"FROM {src}"
    )


def lattice_pdf() -> pd.DataFrame:
    k = np.arange(LATT_NX * LATT_NY)
    x0 = -180.0 + 45.0 * (k % LATT_NX) + LATT_OX
    y0 = -90.0 + 45.0 * np.floor(k / float(LATT_NX)) + LATT_OY
    rows = []
    for i in range(len(k)):
        ring = [
            (x0[i], y0[i]),
            (x0[i] + LATT_W, y0[i]),
            (x0[i] + LATT_W, y0[i] + LATT_H),
            (x0[i], y0[i] + LATT_H),
        ]
        rows.append(
            {"latt_id": f"latt{i:02d}", "geom_wkb": wkb.encode_polygon(ring)}
        )
    return pd.DataFrame(rows)


def lattice_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("latt_id", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    return spark.createDataFrame(lattice_pdf(), schema=schema)


# ---------------------------------------------------------------------------
# sites — point layer for kNN (32 sites; 2 in the hot cell, 1 far from
# all data)

SU_EXPR = f"(j * {flit(PHI)} + 0.33E0 - floor(j * {flit(PHI)} + 0.33E0))"
SV_EXPR = f"(j * {flit(SQ2)} + 0.71E0 - floor(j * {flit(SQ2)} + 0.71E0))"
SX_EXPR = (
    f"(CASE WHEN j = 13 THEN 0.0E0 WHEN j % 16 = 0 THEN 11.3E0 + 0.3E0 * {SU_EXPR} "
    f"ELSE -170.0E0 + 340.0E0 * {SU_EXPR} END)"
)
SY_EXPR = (
    f"(CASE WHEN j = 13 THEN -89.5E0 WHEN j % 16 = 0 THEN 48.2E0 + 0.3E0 * {SV_EXPR} "
    f"ELSE -80.0E0 + 160.0E0 * {SV_EXPR} END)"
)


def sites_cte(n: int = N_SITES, dialect: str = "duckdb") -> str:
    sid = "concat('site', lpad(cast(j as varchar), 4, '0'))"
    if dialect == "spark":
        sid = "concat('site', lpad(cast(j as string), 4, '0'))"
        src = f"(SELECT id AS j FROM range(0, {n}))"
        return f"SELECT j, {sid} AS site_id, {SX_EXPR} AS slon, {SY_EXPR} AS slat FROM {src}"
    return (
        f"SELECT j, {sid} AS site_id, {SX_EXPR} AS slon, {SY_EXPR} AS slat "
        f"FROM range(0, {n}) t(j)"
    )


def sites_df(spark, n: int = N_SITES):
    return spark.sql(sites_cte(n, "spark"))


def sites_pdf(n: int = N_SITES) -> pd.DataFrame:
    j = np.arange(n, dtype=np.int64)
    su = j * PHI + 0.33
    su -= np.floor(su)
    sv = j * SQ2 + 0.71
    sv -= np.floor(sv)
    sx = np.where(j % 16 == 0, 11.3 + 0.3 * su, -170.0 + 340.0 * su)
    sy = np.where(j % 16 == 0, 48.2 + 0.3 * sv, -80.0 + 160.0 * sv)
    sx = np.where(j == 13, 0.0, sx)
    sy = np.where(j == 13, -89.5, sy)
    return pd.DataFrame(
        {"j": j, "site_id": [f"site{k:04d}" for k in j], "slon": sx, "slat": sy}
    )
