"""Geohash cell assignment — the base32 member of the engine's
cell-index family (grid.py: z/x/y + quadkey; s2cell.py: spherical S2;
hexcell.py: axial hex). Geohash (Niemeyer 2008, public domain; RFC-
style description at geohash.org) interleaves longitude/latitude bits
MSB-first and maps each 5-bit group to the alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``; a P-character hash is a cell of
5P bits, and every prefix is the containing parent cell — so a plain
``substr(gh, 1, k)`` aggregation IS the pyramid rollup, no re-encode.

Engine notes:
- The standard bisection encoder is equivalent to fixed-point
  quantization: the MSB-first binary expansion of
  ``floor((x - lo) / range * 2^bits)`` reproduces the per-level
  ``x >= mid`` decisions exactly (asserted against a literal
  bisection encoder in tests). That makes the whole encode a pure
  integer expression — one map-only Catalyst stage fused into the
  scan, identical text on DuckDB, zero Python.
- The hash is emitted BOTH as the base32 string (the interchange
  form) and as the raw interleaved BIGINT (the shuffle key form — at
  10^12 rows you join/aggregate on the int and render the string only
  at the edge).

Reference parity: GDAL has no geohash driver, but the cell-family
surface this completes is the north-star requirement ("H3/S2 index");
prefix rollup mirrors gdal2tiles overview semantics on quadkeys
(osgeo_utils/gdal2tiles.py quadtree keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GH_PRECISION = 6  # 30 bits -> ~0.61 x 0.61 km at the equator


def _bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # even positions start with lon
    return lon_bits, total - lon_bits


def geohash_fragments(precision: int = GH_PRECISION):
    """(stages, gh_sql, ghid_sql): staged dual-dialect column
    expressions. Expects lon/lat in scope; pure arithmetic, identical
    text on Spark and DuckDB (non-negative operands only, so `//` vs
    `div` truncation semantics never differ — both dialects get
    explicit floor-free integer division via the per-char formula
    below, which uses only floor/mod on non-negative ints)."""
    lon_bits, lat_bits = _bits(precision)
    stages = [
        (
            "ghlon",
            f"cast(least(floor((lon + 180.0E0) / 360.0E0 * "
            f"{float(1 << lon_bits)!r}E0), {float((1 << lon_bits) - 1)!r}E0) "
            f"as bigint)",
        ),
        (
            "ghlat",
            f"cast(least(floor((lat + 90.0E0) / 180.0E0 * "
            f"{float(1 << lat_bits)!r}E0), {float((1 << lat_bits) - 1)!r}E0) "
            f"as bigint)",
        ),
    ]
    enc_stages, gh_sql, ghid_sql = _encode_stages(precision)
    return stages + enc_stages, gh_sql, ghid_sql


def _encode_stages(
    precision: int,
    lon_col: str = "ghlon",
    lat_col: str = "ghlat",
    prefix: str = "ghc",
):
    """Interleave two already-quantized fixed-point ints into the
    base32 hash: per-char stage list + (gh, gh_id) output exprs.
    Parametrized over the source columns so the neighbor encode can
    run over shifted (nx, ny) in the same pipeline."""
    lon_bits, lat_bits = _bits(precision)
    stages, char_exprs, id_terms = [], [], []
    for c in range(precision):
        bit_terms = []
        for j in range(5):
            t = 5 * c + j  # global bit position, MSB-first
            if t % 2 == 0:
                src, nbits, k = lon_col, lon_bits, t // 2
            else:
                src, nbits, k = lat_col, lat_bits, (t - 1) // 2
            shift = 1 << (nbits - 1 - k)
            bit = f"(cast(floor({src} / {shift}.0E0) as bigint) % 2)"
            bit_terms.append(f"{bit} * {1 << (4 - j)}")
        code = " + ".join(bit_terms)
        stages.append((f"{prefix}{c}", f"cast({code} as bigint)"))
        char_exprs.append(
            f"substr('{GH_ALPHABET}', cast({prefix}{c} + 1 as int), 1)"
        )
        id_terms.append(f"{prefix}{c} * {1 << (5 * (precision - 1 - c))}")
    gh_sql = f"concat({', '.join(char_exprs)})"
    ghid_sql = f"cast({' + '.join(id_terms)} as bigint)"
    return stages, gh_sql, ghid_sql


def _staged_select(base_sql: str, precision: int) -> str:
    stages, gh_sql, ghid_sql = geohash_fragments(precision)
    sel = base_sql
    for name, sql in stages:
        sel = f"SELECT *, {sql} AS {name} FROM ({sel})"
    return (
        f"SELECT image_id, {gh_sql} AS gh, {ghid_sql} AS gh_id FROM ({sel})"
    )


def assign_geohash(images: DataFrame, precision: int = GH_PRECISION) -> DataFrame:
    """(image_id, gh, gh_id) — map-only, pure Catalyst; gh_id is the
    interleaved integer form of the same cell (the shuffle key)."""
    stages, gh_sql, ghid_sql = geohash_fragments(precision)
    df = images.selectExpr("image_id", "lon", "lat")
    for name, sql in stages:
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df.selectExpr(
        "image_id", f"{gh_sql} AS gh", f"{ghid_sql} AS gh_id"
    )


def oracle_geohash_assign(n: int, precision: int = GH_PRECISION) -> str:
    from . import synth

    base = f"SELECT image_id, lon, lat FROM ({synth.images_cte(n, 'duckdb')})"
    return _staged_select(base, precision)


def geohash_density_topk(
    images: DataFrame,
    k: int = 64,
    prefix: int = 4,
    precision: int = GH_PRECISION,
) -> DataFrame:
    """Hot-cell density at a PARENT level straight off the child hash:
    (gh_prefix, n_images) top-k. The rollup is substr() on the already
    computed hash — the geohash prefix-containment property — so the
    pyramid level costs one map-side-combined aggregation, never a
    re-encode. Deterministic order: (-n, prefix)."""
    from pyspark.sql import functions as F

    return (
        assign_geohash(images, precision)
        .selectExpr(f"substr(gh, 1, {prefix}) AS gh_prefix")
        .groupBy("gh_prefix")
        .agg(F.count("*").alias("n_images"))
        .orderBy(F.desc("n_images"), "gh_prefix")
        .limit(k)
    )


def oracle_geohash_density(
    n: int, k: int = 64, prefix: int = 4, precision: int = GH_PRECISION
) -> str:
    from . import synth

    base = f"SELECT image_id, lon, lat FROM ({synth.images_cte(n, 'duckdb')})"
    return (
        f"SELECT substr(gh, 1, {prefix}) AS gh_prefix, "
        f"cast(count(*) as bigint) AS n_images "
        f"FROM ({_staged_select(base, precision)}) "
        f"GROUP BY 1 ORDER BY n_images DESC, gh_prefix LIMIT {k}"
    )


def geohash_encode_py(lon: float, lat: float, precision: int = GH_PRECISION) -> str:
    """Reference bisection encoder (the textbook algorithm) — test
    helper only; the SQL path must match this bit-for-bit."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    out, code, even = [], 0, True
    for t in range(5 * precision):
        if even:
            mid = (lo_lon + hi_lon) / 2.0
            bit = 1 if lon >= mid else 0
            if bit:
                lo_lon = mid
            else:
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2.0
            bit = 1 if lat >= mid else 0
            if bit:
                lo_lat = mid
            else:
                hi_lat = mid
        code = (code << 1) | bit
        even = not even
        if t % 5 == 4:
            out.append(GH_ALPHABET[code])
            code = 0
    return "".join(out)


# --------------------------------------------------------------- neighbors

OFFSETS_8 = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)
)


def _neighbor_stages(precision: int):
    """Stage list for the shifted cell: nx wraps in longitude
    (antimeridian-adjacent cells ARE neighbors), ny clamps at the
    poles (rows past the pole are filtered out by the caller).
    Expects ghlon/ghlat/dx/dy in scope."""
    lon_bits, lat_bits = _bits(precision)
    m = 1 << lon_bits
    return [
        ("nx", f"cast((ghlon + dx + {m}) % {m} as bigint)"),
        ("ny", "cast(ghlat + dy as bigint)"),
    ], (1 << lat_bits)


def geohash_neighbors(
    images: DataFrame, precision: int = GH_PRECISION
) -> DataFrame:
    """(image_id, gh, dx, dy, ngh, ngh_id): the 8 adjacent cells of
    each row's geohash cell — the ring-expansion primitive (kNN seed
    rings, near-dup blocking across cell borders). Map-only pure
    Catalyst: quantize once, explode the 8 literal offsets, re-encode
    the shifted (nx, ny). Longitude wraps across the antimeridian;
    latitude rows past a pole are dropped (polar cells have 5
    neighbors)."""
    stages, gh_sql, _ = geohash_fragments(precision)
    nstages, lat_cells = _neighbor_stages(precision)
    enc, ngh_sql, nghid_sql = _encode_stages(precision, "nx", "ny", "nbc")
    df = images.selectExpr("image_id", "lon", "lat")
    for name, sql in stages:
        df = df.selectExpr("*", f"{sql} AS {name}")
    off = ", ".join(
        f"named_struct('dx', {dx}, 'dy', {dy})" for dx, dy in OFFSETS_8
    )
    df = df.selectExpr("*", f"inline(array({off}))")
    for name, sql in nstages:
        df = df.selectExpr("*", f"{sql} AS {name}")
    df = df.where(f"ny >= 0 AND ny < {lat_cells}")
    for name, sql in enc:
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df.selectExpr(
        "image_id", f"{gh_sql} AS gh", "cast(dx as int) AS dx",
        "cast(dy as int) AS dy", f"{ngh_sql} AS ngh", f"{nghid_sql} AS ngh_id",
    )


def oracle_geohash_neighbors(n: int, precision: int = GH_PRECISION) -> str:
    from . import synth

    stages, gh_sql, _ = geohash_fragments(precision)
    nstages, lat_cells = _neighbor_stages(precision)
    enc, ngh_sql, nghid_sql = _encode_stages(precision, "nx", "ny", "nbc")
    sel = f"SELECT image_id, lon, lat FROM ({synth.images_cte(n, 'duckdb')})"
    for name, sql in stages:
        sel = f"SELECT *, {sql} AS {name} FROM ({sel})"
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in OFFSETS_8)
    sel = f"SELECT * FROM ({sel}) CROSS JOIN (VALUES {offs}) o(dx, dy)"
    for name, sql in nstages + enc:
        sel = f"SELECT *, {sql} AS {name} FROM ({sel})"
    return (
        f"SELECT image_id, {gh_sql} AS gh, cast(dx as int) AS dx, "
        f"cast(dy as int) AS dy, {ngh_sql} AS ngh, {nghid_sql} AS ngh_id "
        f"FROM ({sel}) WHERE ny >= 0 AND ny < {lat_cells}"
    )
