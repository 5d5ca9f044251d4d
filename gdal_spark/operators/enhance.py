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
