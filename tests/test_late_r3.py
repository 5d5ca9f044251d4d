"""Independent checks for the closing-round-3 operators whose driver
gates are SQL replays: cross-validate against *other* operators or
direct numpy recomputation."""

import numpy as np
import pandas as pd

from gdal_spark import codecs, synth
from gdal_spark.operators import translate, viewshed
from gdal_spark.operators.stats import gdal_checksum
from tests.conftest import SF_DIR


def test_viewshed_ground_consistent_with_visibility(spark):
    """GROUND mode vs the boolean viewshed: a cell is visible iff its
    required extra height is ~0 — the two queries must agree per
    scanline on the visible-cell count (ground keys of visible cells
    are exactly 0 because z_req <= terrain there)."""
    W, OX, OY = 48, 23, 21
    vis = (
        viewshed.viewshed_rows(spark, W, W, OX, OY)
        .toPandas()
        .set_index("y")
        .sort_index()
    )
    gnd = (
        viewshed.viewshed_ground_rows(spark, W, W, OX, OY)
        .toPandas()
        .set_index("y")
        .sort_index()
    )
    # recompute per-cell ground directly with the python LOS mirror
    from gdal_spark.operators.dem import _dem_value

    gy, gx = np.mgrid[0:W, 0:W]
    dem = _dem_value(gx, gy).astype(np.float64)
    eye = dem[OY, OX] + viewshed.OBS_HEIGHT
    for ty in (0, OY, W - 1):
        msum = 0
        nvis = 0
        for tx in range(W):
            K = max(abs(tx - OX), abs(ty - OY))
            if K == 0:
                nvis += 1
                continue
            if viewshed.los_visible(dem, OX, OY, tx, ty):
                nvis += 1
            if K <= 1:
                continue
            ks = np.arange(1, K, dtype=np.float64)
            f = ks / K
            px = OX + f * (tx - OX)
            py = OY + f * (ty - OY)
            x0 = np.floor(px).astype(np.int64)
            y0 = np.floor(py).astype(np.int64)
            fx, fy = px - x0, py - y0
            x1 = np.minimum(x0 + 1, W - 1)
            y1 = np.minimum(y0 + 1, W - 1)
            terr = (1.0 - fy) * (
                (1.0 - fx) * dem[y0, x0] + fx * dem[y0, x1]
            ) + fy * ((1.0 - fx) * dem[y1, x0] + fx * dem[y1, x1])
            zreq = (eye + (terr - eye) / f).max()
            msum += int(np.floor(max(0.0, zreq - dem[ty, tx]) * 1000.0 + 1e-9))
        assert int(vis.loc[ty, "n_visible"]) == nvis
        assert int(gnd.loc[ty, "ground_mkey_sum"]) == msum


def test_translate_projwin_matches_numpy(spark):
    """Driver projwin query vs a direct numpy window recompute."""
    import __spark_entry__ as m

    out = m.queries()["translate_projwin"](spark, SF_DIR).toPandas()
    ulx, uly, lrx, lry = m._PROJWIN
    imgs = synth.add_pixels(
        synth.images_df(spark, min(synth.n_images(SF_DIR), 4096)).filter(
            "i < 64"
        )
    ).toPandas()
    n_checked = 0
    for r in imgs.itertuples(index=False):
        res = 0.1 / r.w
        x0 = int(np.floor((ulx - r.lon) / res + 0.001))
        y0 = int(np.floor((r.lat - uly) / res + 0.001))
        cw = int(np.floor((lrx - ulx) / res + 0.5))
        ch = int(np.floor((uly - lry) / res + 0.5))
        xs, ys = max(x0, 0), max(y0, 0)
        xe, ye = min(x0 + cw, int(r.w)), min(y0 + ch, int(r.h))
        sub = out[out.image_id == r.image_id]
        if xe <= xs or ye <= ys:
            assert len(sub) == 0
            continue
        arr = codecs.decode_image(bytes(r.bytes))[ys:ye, xs:xe, :]
        assert len(sub) == 3
        for c in range(3):
            row = sub[sub.channel == c].iloc[0]
            assert int(row.cks) == gdal_checksum(arr[:, :, c])
            assert (int(row.out_w), int(row.out_h)) == (xe - xs, ye - ys)
        n_checked += 1
    assert n_checked >= 3  # several hot-cell images intersect


def test_calc_two_matches_numpy(spark):
    """Dual-raster calc vs the direct pair recompute."""
    import __spark_entry__ as m

    out = m.queries()["calc_two_rasters"](spark, SF_DIR).toPandas()
    imgs = synth.add_pixels(
        synth.images_df(spark, 64).filter("i < 21")
    ).toPandas().set_index("i")
    n = 0
    for i in range(16):
        a = codecs.decode_image(bytes(imgs.loc[i, "bytes"])).astype(np.float64)
        b = codecs.decode_image(bytes(imgs.loc[i + 5, "bytes"])).astype(
            np.float64
        )
        res = np.floor(np.clip((a + b) / 2.0, 0, 255) + 0.5).astype(np.uint8)
        sub = out[out.image_id == imgs.loc[i, "image_id"]]
        assert len(sub) == 3
        for c in range(3):
            assert int(sub[sub.channel == c].cks.iloc[0]) == gdal_checksum(
                res[:, :, c]
            )
        n += 1
    assert n == 16
