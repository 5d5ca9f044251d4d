"""Image payload codecs + perceptual hash — deterministic, numpy-only.

The container has no Pillow/libjpeg, so the ``bytes`` column uses two
clearly-marked deterministic fake codecs with the same *contract* as
PNG/JPEG (reference decodes via format drivers keyed on magic bytes,
gcore/gdalopeninfo.cpp):

- fmt="png"  -> lossless:   b"GSP0" header + raw uint8 pixels
                (decoded == original exactly)
- fmt="jpeg" -> lossy:      b"GSJ0" header + 6-bit quantized pixels
                (max abs error 2 per sample => PSNR ~46 dB, satisfying
                the >=40 dB lossy invariant from BASELINE.json)

If Pillow is ever present, ``HAVE_PIL`` flags it; real codecs can be
swapped in behind the same encode/decode signatures. All functions are
batch-oriented for use inside pandas UDFs — never called per row from
Python driver loops.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - not present in this container
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_MAGIC_LOSSLESS = b"GSP0"
_MAGIC_LOSSY = b"GSJ0"
_HEADER = struct.Struct("<4sIII")  # magic, w, h, channels


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array per ``fmt``."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if fmt == "jpeg":
        payload = (arr >> 2).tobytes()  # 6-bit quantize (lossy)
        return _HEADER.pack(_MAGIC_LOSSY, w, h, c) + payload
    payload = arr.tobytes()
    return _HEADER.pack(_MAGIC_LOSSLESS, w, h, c) + payload


def decode_image(data: bytes) -> np.ndarray:
    """Decode to an (h, w, c) uint8 array."""
    magic, w, h, c = _HEADER.unpack_from(data, 0)
    raw = np.frombuffer(data, dtype=np.uint8, offset=_HEADER.size)
    arr = raw.reshape(h, w, c)
    if magic == _MAGIC_LOSSY:
        # dequantize to bucket centers: q*4 + 2, clipped into uint8
        return (arr.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    if magic == _MAGIC_LOSSLESS:
        return arr.copy()
    raise ValueError(f"unknown image magic {magic!r}")


def image_dims(data: bytes) -> tuple[int, int, int]:
    """(w, h, c) from the header without decoding pixels — the Spark
    analog of reading only the file header at plan time."""
    _, w, h, c = _HEADER.unpack_from(data, 0)
    return w, h, c


def make_pixels(i: int, w: int, h: int, channels: int = 3) -> np.ndarray:
    """Deterministic per-image test pattern keyed on image index ``i``:
    a diagonal gradient plus a per-image sinusoid (no RNG state, so any
    executor can regenerate any image independently)."""
    y, x = np.mgrid[0:h, 0:w]
    out = np.empty((h, w, channels), dtype=np.uint8)
    for ch in range(channels):
        base = (x * 3 + y * 5 + i * 7 + ch * 11) % 256
        wave = 60.0 * np.sin(2.0 * np.pi * (x / max(w, 1) + (i % 17) / 17.0 + ch / 3.0))
        out[:, :, ch] = np.clip(base + wave, 0, 255).astype(np.uint8)
    return out


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash: grayscale -> 8x8 block means -> bit per
    block (mean > global mean). Stable across lossless re-encodes and
    robust to the fake-jpeg quantization."""
    if arr.ndim == 3:
        gray = arr.mean(axis=2)
    else:
        gray = arr.astype(np.float64)
    h, w = gray.shape
    # nearest-index resample to a multiple of 8, then 8x8 block means
    yi = (np.arange(8)[:, None] * h) // 8
    yj = ((np.arange(8)[:, None] + 1) * h) // 8
    xi = (np.arange(8)[None, :] * w) // 8
    xj = ((np.arange(8)[None, :] + 1) * w) // 8
    means = np.empty((8, 8))
    for a in range(8):
        for b in range(8):
            means[a, b] = gray[yi[a, 0] : yj[a, 0], xi[0, b] : xj[0, b]].mean()
    bits = (means > means.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for k, bit in enumerate(bits):
        val |= bit << np.uint64(k)
    return int(val.astype(np.int64))  # signed for BIGINT columns


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (peak=255)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
