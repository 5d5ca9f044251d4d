"""gdalenhance -equalize: per-band histogram equalization.

Reference semantics: ``apps/gdalenhance.cpp`` —
``ComputeEqualizationLUTs`` (apps/gdalenhance.cpp:509) builds, per
band, the default Byte histogram (256 bins, one per value), zeroes the
extreme bins (``panHistogram[0] = panHistogram[nHistSize-1] = 0`` —
nodata/saturation guard), forms the cumulative histogram with the
half-bin offset ``cum[i] = total_before_i + hist[i] / 2`` (integer
division), then ``LUT[i] = clamp((cum[i] * nLUTBins) / nTotal,
0, nLUTBins-1)``; ``EnhancerCallback`` (apps/gdalenhance.cpp:605)
applies the LUT per pixel (for Byte input with the default 256 bins
the bin index is the pixel value itself).

All arithmetic is integer, so the DuckDB oracle replays it bit-exactly:
histogram -> windowed cumulative sum -> LUT -> join back to pixels ->
GDAL checksum.

Spark shape: one ``mapInPandas`` pass — each image is one raster, its
histogram, LUT and application are local to the row, so the operator
is embarrassingly parallel (zero shuffle; at 10^12 images the plan is
a single map stage over the image table).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..synth import pixels_cte
from .stats import _decode_iter, gdal_checksum

LUT_BINS = 256


def _equalize_band(v: np.ndarray, lut_bins: int = LUT_BINS) -> np.ndarray:
    """Equalize one 2-D Byte band, replicating gdalenhance's integer
    LUT construction exactly."""
    hist = np.bincount(v.reshape(-1).astype(np.int64), minlength=lut_bins)
    hist[0] = 0
    hist[lut_bins - 1] = 0
    total = int(hist.sum())
    if total == 0:
        total = 1  # gdalenhance.cpp:577 zero-histogram guard
    cum = np.cumsum(hist) - hist + hist // 2
    lut = np.clip((cum * lut_bins) // total, 0, lut_bins - 1)
    return lut[v]


def equalize_checksums(images: DataFrame) -> DataFrame:
    """(image_id, channel, cks) — GDAL checksum of each equalized
    band. Decode + equalize + checksum in one Arrow-batched pass."""

    def fn(arr):
        for ch in range(arr.shape[2]):
            yield (ch, gdal_checksum(_equalize_band(arr[:, :, ch])))

    return images.select("image_id", "bytes").mapInPandas(
        lambda it: _decode_iter(it, fn, ["image_id", "channel", "cks"]),
        schema="image_id string, channel int, cks int",
    )


def oracle_equalize(n_images: int, max_i: int, cks_prime_case: str) -> str:
    """Bit-exact SQL replay: per-(image, channel) histogram with zeroed
    extremes, half-bin cumulative sum, integer LUT, pixel join, GDAL
    checksum. ``cks_prime_case`` is the shared prime-by-position CASE
    expression used by every checksum oracle."""
    px = pixels_cte(n_images, max_i, "duckdb")
    return (
        f"WITH px AS MATERIALIZED ({px}), "
        # per-value counts with the gdalenhance extreme-bin zeroing
        f"hist AS (SELECT image_id, ch, val, "
        f"CASE WHEN val IN (0, {LUT_BINS - 1}) THEN 0 ELSE count(*) END AS n "
        f"FROM px GROUP BY image_id, ch, val), "
        # cum[v] = (total below v) + n[v] // 2 ; total = per-band sum
        f"cum AS (SELECT image_id, ch, val, "
        f"sum(n) OVER (PARTITION BY image_id, ch ORDER BY val) - n + n // 2 "
        f"AS cum, sum(n) OVER (PARTITION BY image_id, ch) AS total "
        f"FROM hist), "
        f"lut AS (SELECT image_id, ch, val, greatest(0, least({LUT_BINS - 1}, "
        f"(cum * {LUT_BINS}) // (CASE WHEN total = 0 THEN 1 ELSE total END))) "
        f"AS eq FROM cum), "
        f"eqpx AS (SELECT px.image_id, px.ch, px.x, px.y, px.w, lut.eq AS val "
        f"FROM px JOIN lut ON px.image_id = lut.image_id "
        f"AND px.ch = lut.ch AND px.val = lut.val) "
        f"SELECT image_id, cast(ch as bigint) AS channel, "
        f"cast(sum(val % {cks_prime_case}) % 65536 as bigint) AS cks "
        f"FROM eqpx GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# histogram MATCHING against the corpus-wide band histogram — the
# mosaic radiometric-normalization companion of -equalize (same
# apps/gdalenhance.cpp LUT machinery, but the target CDF is the
# global band histogram instead of the uniform ramp; this is how a
# tiled mosaic is harmonized so seams vanish). Exact integer quantile
# mapping: LUT[v] = min u with cdfG(u) * nLocal >= cdfL(v) * nGlobal
# (cross-multiplied — no float division anywhere).
#
# Spark shape (the two-pass normalization a real pipeline runs):
#   pass 1: per-image histograms, map-only (local bincount) -> a
#           768-row global aggregate (map-side combined), collected —
#           the same tiny-reduce shape as Lloyd centroids;
#   pass 2: map-only LUT application per image with the global CDF in
#           the task closure. Zero pixel-level shuffles at any scale.


def _match_band(v: np.ndarray, g_cdf: np.ndarray, n_g: int) -> np.ndarray:
    """Match one 2-D Byte band to the global histogram with exact
    integer quantile mapping."""
    hist = np.bincount(v.reshape(-1).astype(np.int64), minlength=LUT_BINS)
    l_cdf = np.cumsum(hist)
    n_l = int(l_cdf[-1])
    # min u with g_cdf[u] * n_l >= l_cdf[v] * n_g
    lut = np.searchsorted(g_cdf * n_l, l_cdf * n_g, side="left")
    lut = np.minimum(lut, LUT_BINS - 1)
    return lut[v]


def match_histogram_checksums(images: DataFrame) -> DataFrame:
    """(image_id, channel, cks) — GDAL checksum of each band after
    matching to the global per-channel histogram."""
    from pyspark.sql import functions as F

    def hist_fn(arr):
        a = arr.astype(np.int64)
        for ch in range(a.shape[2]):
            hist = np.bincount(a[:, :, ch].reshape(-1), minlength=LUT_BINS)
            for val in np.nonzero(hist)[0]:
                yield (int(ch), int(val), int(hist[val]))

    local = images.select("image_id", "bytes").mapInPandas(
        lambda it: _decode_iter(it, hist_fn, ["image_id", "ch", "val", "n"]),
        schema="image_id string, ch int, val int, n long",
    )
    rows = (
        local.groupBy("ch", "val")
        .agg(F.sum("n").alias("n"))
        .collect()  # <= 768 rows: the global histogram, a scalar-sized reduce
    )
    g_hist = np.zeros((3, LUT_BINS), dtype=np.int64)
    for r in rows:
        g_hist[r["ch"], r["val"]] = r["n"]
    g_cdf = np.cumsum(g_hist, axis=1)

    def apply_fn(arr):
        for ch in range(arr.shape[2]):
            n_g = int(g_cdf[ch, -1])
            out = _match_band(arr[:, :, ch], g_cdf[ch], n_g)
            yield (ch, gdal_checksum(out))

    return images.select("image_id", "bytes").mapInPandas(
        lambda it: _decode_iter(it, apply_fn, ["image_id", "channel", "cks"]),
        schema="image_id string, channel int, cks int",
    )


def oracle_match_histogram(n_images: int, max_i: int,
                           cks_prime_case: str) -> str:
    """Bit-exact SQL replay of the global-histogram match: local CDF,
    global CDF, cross-multiplied min-u lookup, pixel join, checksum."""
    px = pixels_cte(n_images, max_i, "duckdb")
    return (
        f"WITH px AS MATERIALIZED ({px}), "
        f"lh AS (SELECT image_id, ch, val, count(*) AS n "
        f"FROM px GROUP BY 1, 2, 3), "
        f"lc AS MATERIALIZED (SELECT image_id, ch, val, "
        f"cast(sum(n) OVER (PARTITION BY image_id, ch ORDER BY val) "
        f"as bigint) AS lcum, "
        f"cast(sum(n) OVER (PARTITION BY image_id, ch) as bigint) AS nl "
        f"FROM lh), "
        f"gh AS (SELECT ch, val, cast(count(*) as bigint) AS n "
        f"FROM px GROUP BY 1, 2), "
        f"gc AS MATERIALIZED (SELECT ch, val, "
        f"cast(sum(n) OVER (PARTITION BY ch ORDER BY val) as bigint) "
        f"AS gcum, cast(sum(n) OVER (PARTITION BY ch) as bigint) AS ng "
        f"FROM gh), "
        f"lut AS (SELECT lc.image_id, lc.ch, lc.val, "
        f"min(gc.val) AS matched FROM lc JOIN gc ON lc.ch = gc.ch "
        f"AND gc.gcum * lc.nl >= lc.lcum * gc.ng "
        f"GROUP BY 1, 2, 3), "
        f"mpx AS (SELECT px.image_id, px.ch, px.x, px.y, px.w, "
        f"lut.matched AS val FROM px JOIN lut ON "
        f"px.image_id = lut.image_id AND px.ch = lut.ch "
        f"AND px.val = lut.val) "
        f"SELECT image_id, cast(ch as bigint) AS channel, "
        f"cast(sum(val % {cks_prime_case}) % 65536 as bigint) AS cks "
        f"FROM mpx GROUP BY 1, 2"
    )
