"""Minimal TIFF reader for the reference's golden fixtures
(test-only; handles exactly what autotest/alg/data needs: single-band
striped TIFFs, uncompressed or deflate, optional horizontal-differencing
predictor, uint8/int16/uint16/float32/float64)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I"}


def _read_values(data, bo, typ, cnt, raw):
    size = _TYPE_SIZE[typ] * cnt
    if size <= 4:
        buf = raw[:size]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off : off + size]
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        return buf
    return list(struct.unpack(bo + fmt * cnt, buf))


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (MSB-first, early-change) decompressor."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    table: list[bytes] = []
    width = 9

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev = None
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            reset()
            prev = None
            continue
        if prev is None:
            entry = table[code]
        else:
            entry = table[code] if code < len(table) else prev + prev[:1]
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def read_tiff(path: str) -> np.ndarray:
    data = open(path, "rb").read()
    bo = "<" if data[:2] == b"II" else ">"
    (ifd,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd : ifd + 2])
    tags = {}
    for k in range(n):
        e = data[ifd + 2 + 12 * k : ifd + 14 + 12 * k]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = _read_values(data, bo, typ, cnt, e[8:12])

    w, h = tags[256][0], tags[257][0]
    bits = tags.get(258, [8])[0]
    comp = tags.get(259, [1])[0]
    fmt = tags.get(339, [1])[0]
    pred = tags.get(317, [1])[0]
    spp = tags.get(277, [1])[0]
    rps = tags.get(278, [h])[0]
    offs = tags[273]
    cnts = tags[279]
    assert spp == 1, "single-band fixtures only"

    dtype = {
        (8, 1): np.uint8,
        (16, 1): np.uint16,
        (16, 2): np.int16,
        (32, 3): np.float32,
        (64, 3): np.float64,
        (32, 1): np.uint32,
        (32, 2): np.int32,
    }[(bits, fmt)]
    dtype = np.dtype(dtype).newbyteorder(bo)

    raw = bytearray()
    for off, cnt in zip(offs, cnts):
        chunk = data[off : off + cnt]
        if comp == 8:
            chunk = zlib.decompress(chunk)
        elif comp == 5:
            chunk = _lzw_decode(chunk)
        elif comp != 1:
            raise ValueError(f"unsupported compression {comp}")
        raw += chunk
    arr = np.frombuffer(bytes(raw), dtype=dtype, count=w * h).reshape(h, w)
    if pred == 2:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dtype)
    return np.ascontiguousarray(arr)
