"""Color quantization (median cut) + Floyd-Steinberg dithering.

Reference semantics: alg/gdalmediancut.cpp:143 (recursive box split
at the median of the longest axis until the palette budget is
reached; palette entry = box mean) and alg/gdaldither.cpp:146
(Floyd-Steinberg error diffusion, weights 7/16, 3/16, 5/16, 1/16,
left-to-right scan, nearest-palette-entry quantization).

Iterative and order-dependent -> no SQL oracle; the driver entry is
rows-only and pytest pins the invariants (palette size, determinism,
bounded reconstruction error, exact-palette passthrough).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs


def median_cut_palette(arr: np.ndarray, n_colors: int = 16) -> np.ndarray:
    """(h, w, 3) uint8 -> (n, 3) uint8 palette via median cut."""
    pixels = arr.reshape(-1, 3).astype(np.int64)
    boxes = [pixels]
    while len(boxes) < n_colors:
        # split the box with the largest spread along its widest axis
        spreads = [
            (b.max(axis=0) - b.min(axis=0)).max() if len(b) > 1 else -1
            for b in boxes
        ]
        i = int(np.argmax(spreads))
        if spreads[i] <= 0:
            break
        b = boxes.pop(i)
        axis = int(np.argmax(b.max(axis=0) - b.min(axis=0)))
        order = np.argsort(b[:, axis], kind="stable")
        half = len(order) // 2
        boxes.insert(i, b[order[:half]])
        boxes.insert(i + 1, b[order[half:]])
    pal = np.array(
        [np.floor(b.mean(axis=0) + 0.5) if len(b) else [0, 0, 0] for b in boxes],
        dtype=np.int64,
    )
    return np.clip(pal, 0, 255).astype(np.uint8)


def dither_fs(arr: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg dither to palette indices; returns (h, w)
    uint8 index raster."""
    h, w = arr.shape[:2]
    work = arr.astype(np.float64).copy()
    palf = palette.astype(np.float64)
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px = np.clip(work[y, x], 0, 255)
            d2 = ((palf - px) ** 2).sum(axis=1)
            k = int(np.argmin(d2))
            out[y, x] = k
            err = px - palf[k]
            if x + 1 < w:
                work[y, x + 1] += err * (7.0 / 16.0)
            if y + 1 < h:
                if x > 0:
                    work[y + 1, x - 1] += err * (3.0 / 16.0)
                work[y + 1, x] += err * (5.0 / 16.0)
                if x + 1 < w:
                    work[y + 1, x + 1] += err * (1.0 / 16.0)
    return out


def quantize_images(images: DataFrame, n_colors: int = 16) -> DataFrame:
    """Per-image median-cut palette + FS dither. Output: palette size,
    index histogram entropy key, and mean squared reconstruction
    error key (rows-only driver check; invariants pinned in pytest)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for image_id, payload in zip(pdf["image_id"], pdf["bytes"]):
                arr = codecs.decode_image(bytes(payload))
                pal = median_cut_palette(arr, n_colors)
                idx = dither_fs(arr, pal)
                recon = pal[idx]
                mse = float(
                    ((recon.astype(np.float64) - arr.astype(np.float64)) ** 2).mean()
                )
                rows.append(
                    (
                        image_id,
                        int(len(pal)),
                        int(len(np.unique(idx))),
                        int(np.floor(mse * 1000.0)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "palette_n", "used_n", "mse_key"]
            )

    return images.select("image_id", "bytes").mapInPandas(
        run,
        schema="image_id string, palette_n bigint, used_n bigint, mse_key bigint",
    )
