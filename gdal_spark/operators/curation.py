"""Image+caption corpus curation filter (LAION-5B-style metadata
rules, Schuhmann et al. 2022): per-row keep/drop verdict with the
individual rule flags exposed, over the BASELINE.json input table
shape (image_id, w, h, fmt, caption).

Rules (all integer/string exact — no pixel decode needed, so at
10^12 rows this is a pure metadata scan: column-pruned parquet read,
whole-stage codegen, zero shuffle, zero Python):

- ``size_ok``    min(w, h) >= MIN_SIDE (LAION's min-dimension cut)
- ``aspect_ok``  max(w, h) * 10 <= ASPECT_X10 * min(w, h) (integer
                 cross-multiplied aspect-ratio bound, no division)
- ``cap_len_ok`` CAP_MIN_CHARS <= length(caption) <= CAP_MAX_CHARS
- ``cap_tok_ok`` caption has >= CAP_MIN_TOKENS whitespace tokens
- ``lossless``   fmt = 'png' (informational, not part of keep)
- ``keep``       all of size_ok, aspect_ok, cap_len_ok, cap_tok_ok
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..synth import images_cte

MIN_SIDE = 20
ASPECT_X10 = 32  # max aspect ratio 3.2:1
CAP_MIN_CHARS = 8
CAP_MAX_CHARS = 256
CAP_MIN_TOKENS = 2


def _flags_sql(dialect: str) -> list[str]:
    toks = (
        "size(filter(split(caption, ' '), t -> t <> ''))"
        if dialect == "spark"
        else "len(list_filter(string_split(caption, ' '), t -> t <> ''))"
    )
    return [
        f"cast(least(w, h) >= {MIN_SIDE} as int) AS size_ok",
        f"cast(greatest(w, h) * 10 <= {ASPECT_X10} * least(w, h) as int) "
        f"AS aspect_ok",
        f"cast(length(caption) BETWEEN {CAP_MIN_CHARS} AND {CAP_MAX_CHARS} "
        f"as int) AS cap_len_ok",
        f"cast({toks} >= {CAP_MIN_TOKENS} as int) AS cap_tok_ok",
        "cast(fmt = 'png' as int) AS lossless",
        f"cast(least(w, h) >= {MIN_SIDE} "
        f"AND greatest(w, h) * 10 <= {ASPECT_X10} * least(w, h) "
        f"AND length(caption) BETWEEN {CAP_MIN_CHARS} AND {CAP_MAX_CHARS} "
        f"AND {toks} >= {CAP_MIN_TOKENS} as int) AS keep",
    ]


def laion_filter(images: DataFrame) -> DataFrame:
    """Per-image curation flags over the metadata columns only."""
    return images.selectExpr(
        "image_id",
        "cast(w as bigint) AS w",
        "cast(h as bigint) AS h",
        "fmt",
        *_flags_sql("spark"),
    )


def oracle_laion_filter(n_images: int) -> str:
    return (
        f"SELECT image_id, cast(w as bigint) AS w, cast(h as bigint) AS h, "
        f"fmt, {', '.join(_flags_sql('duckdb'))} "
        f"FROM ({images_cte(n_images, 'duckdb')})"
    )
