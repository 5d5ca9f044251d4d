"""COG layout planner + gdaladdo partial refresh: independent numpy /
closed-form replays (reference: frmts/gtiff/cogdriver.cpp ghost
leader/trailer + overviews-first stream order; apps/gdaladdo.cpp
--partial-refresh-from-projwin)."""

import numpy as np
import pytest

from gdal_spark.operators import cog


def _replay_layout():
    W, T, L = cog.COG_W, cog.COG_TILE, cog.COG_LEVELS
    gy, gx = np.mgrid[0:W, 0:W]
    v = (gx * 3 + gy * 5 + ((gx * 7 + gy * 11) % 13) * 17) % 256
    out = {}
    off = cog.COG_HEADER
    for lvl in range(L - 1, -1, -1):  # coarsest first
        span = T << lvl
        nt = (W + span - 1) // span
        for ty in range(nt):
            for tx in range(nt):
                s = int(
                    v[ty * span:(ty + 1) * span, tx * span:(tx + 1) * span].sum()
                )
                pay = 128 + s % 997
                out[(lvl, ty, tx)] = (pay, off + cog.COG_LEADER)
                off += cog.COG_LEADER + pay + cog.COG_TRAILER
    return out


def test_cog_layout_matches_serial_writer(spark):
    exp = _replay_layout()
    rows = cog.cog_layout(spark).collect()
    assert len(rows) == len(exp)
    for r in rows:
        pay, off = exp[(r.level, r.ty, r.tx)]
        assert (r.payload_bytes, r.offset_bytes) == (pay, off)


def test_cog_blocks_do_not_overlap(spark):
    rows = sorted(cog.cog_layout(spark).collect(), key=lambda r: r.offset_bytes)
    prev_end = cog.COG_HEADER
    for r in rows:
        assert r.offset_bytes - cog.COG_LEADER >= prev_end
        prev_end = r.offset_bytes + r.payload_bytes + cog.COG_TRAILER


def test_partial_refresh_exactly_the_dirty_tiles(spark):
    got = {
        (r.level, r.tx, r.ty, r.level_tiles_total)
        for r in cog.overview_partial_refresh(spark).collect()
    }
    exp = set()
    for lvl in range(1, cog.PR_LEVELS + 1):
        f = 1 << lvl
        txa = (cog.PR_X0 // f) // cog.PR_TILE
        txb = ((cog.PR_X1 + f - 1) // f - 1) // cog.PR_TILE
        tya = (cog.PR_Y0 // f) // cog.PR_TILE
        tyb = ((cog.PR_Y1 + f - 1) // f - 1) // cog.PR_TILE
        n1d = ((cog.PR_W + f - 1) // f + cog.PR_TILE - 1) // cog.PR_TILE
        for tx in range(txa, txb + 1):
            for ty in range(tya, tyb + 1):
                exp.add((lvl, tx, ty, n1d * n1d))
    assert got == exp
    # the saving: dirty tiles are a small fraction of each level
    per_level = {}
    for lvl, tx, ty, tot in got:
        per_level.setdefault(lvl, [0, tot])[0] += 1
    assert per_level[1][0] < per_level[1][1]
