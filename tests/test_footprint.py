"""gdal_footprint analog: pin the DuckDB oracle's pointer-jump round
count against a numpy BFS ground truth (the oracle under-merges if the
unrolled rounds don't converge — the winding 704-px component needs 48
rounds), and check the Spark path against the same ground truth.

Reference semantics: apps/gdal_footprint_lib.cpp (validity mask ->
polygonize -> min-ring-area filter -> georeferenced envelopes)."""

import collections

import duckdb
import numpy as np
import pytest

from gdal_spark.operators import footprint as fp
from gdal_spark.operators.polygonize import _eval_value


def _bfs_components(width: int, thresh: int, min_pixels: int):
    """4-conn components of the demvalid mask; returns
    {comp_id: (n_pixels, minx, maxx, miny, maxy)} for val=1 comps
    with >= min_pixels pixels. comp_id = min linearized index."""
    gy, gx = np.mgrid[0:width, 0:width]
    v = _eval_value(f"demvalid:{thresh}", gx, gy)
    lab = -np.ones((width, width), int)
    out = {}
    comp = 0
    for y in range(width):
        for x in range(width):
            if lab[y, x] != -1:
                continue
            val = v[y, x]
            q = collections.deque([(y, x)])
            lab[y, x] = comp
            pix = []
            while q:
                cy, cx = q.popleft()
                pix.append((cy, cx))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = cy + dy, cx + dx
                    if (
                        0 <= ny < width and 0 <= nx < width
                        and lab[ny, nx] == -1 and v[ny, nx] == val
                    ):
                        lab[ny, nx] = comp
                        q.append((ny, nx))
            if val == 1 and len(pix) >= min_pixels:
                ys = [p[0] for p in pix]
                xs = [p[1] for p in pix]
                cid = min(cy * width + cx for cy, cx in pix)
                out[cid] = (len(pix), min(xs), max(xs), min(ys), max(ys))
            comp += 1
    return out


@pytest.fixture(scope="module")
def truth():
    return _bfs_components(fp.FP_W, fp.FP_THRESH, fp.FP_MIN_PIXELS)


def test_oracle_rounds_converge(truth):
    """The unrolled DuckDB pointer jump must reach the BFS fixpoint —
    this is exactly the failure mode that made the 32-round default
    return 14 components instead of 10."""
    d = duckdb.connect().execute(fp.oracle_footprint()).fetchdf()
    got = {int(r.comp_id): int(r.n_pixels) for r in d.itertuples()}
    assert got == {cid: n for cid, (n, *_) in truth.items()}


def test_oracle_envelopes_exact(truth):
    """Geo envelopes through the dyadic geotransform are bit-exact."""
    d = duckdb.connect().execute(fp.oracle_footprint()).fetchdf()
    res, x0, y0 = 0.125, 10.0, 45.0
    for r in d.itertuples():
        n, minx, maxx, miny, maxy = truth[int(r.comp_id)]
        assert r.minx_um == int(np.floor((x0 + minx * res) * 1e6))
        assert r.maxx_um == int(np.floor((x0 + (maxx + 1) * res) * 1e6))
        assert r.miny_um == int(np.floor((y0 - (maxy + 1) * res) * 1e6))
        assert r.maxy_um == int(np.floor((y0 - miny * res) * 1e6))


def test_spark_footprint_matches_bfs(spark, truth):
    rows = fp.footprint(spark).collect()
    got = {r.comp_id: r.n_pixels for r in rows}
    assert got == {cid: n for cid, (n, *_) in truth.items()}
