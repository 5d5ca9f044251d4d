"""Geoloc-array transformer vs an independent numpy bilinear."""

import numpy as np

from gdal_spark import geoloc, synth


def _gl_arrays(i: int):
    ix, iy = np.meshgrid(
        np.arange(geoloc.GL_N + 1), np.arange(geoloc.GL_N + 1), indexing="ij"
    )
    glx = 100000 + 37 * ix + 5 * iy + ix * iy + (i % 17)
    gly = 200000 - 21 * iy + 3 * ix + 2 * iy * iy + (i % 13)
    return glx.astype(np.float64), gly.astype(np.float64)


def _bilinear(gl, pg, lg):
    iX = np.clip(np.floor(pg), 0, geoloc.GL_N).astype(int)
    iY = np.clip(np.floor(lg), 0, geoloc.GL_N).astype(int)
    fx, fy = pg - iX, lg - iY
    g00 = gl[iX, iY]
    g10 = gl[iX + 1, iY]
    g01 = gl[iX, iY + 1]
    g11 = gl[iX + 1, iY + 1]
    return (1 - fy) * (g00 + fx * (g10 - g00)) + fy * (g01 + fx * (g11 - g01))


def test_geoloc_forward_vs_numpy(spark):
    n, max_i = 64, 2
    out = geoloc.geoloc_transform_query(spark, n, max_i).toPandas()
    ids = (
        synth.images_df(spark, n)
        .where(f"i < {max_i}")
        .select("i", "image_id")
        .toPandas()
    )
    id_to_i = dict(zip(ids["image_id"], ids["i"]))
    assert len(out) == max_i * geoloc.RASTER_W * geoloc.RASTER_W
    for image_id, grp in out.groupby("image_id"):
        glx, gly = _gl_arrays(int(id_to_i[image_id]))
        pg = grp["p"].to_numpy() / geoloc.STEP
        lg = grp["l"].to_numpy() / geoloc.STEP
        ex = np.floor(_bilinear(glx, pg, lg) * 16.0).astype(np.int64)
        ey = np.floor(_bilinear(gly, pg, lg) * 16.0).astype(np.int64)
        assert (grp["gx16"].to_numpy() == ex).all()
        assert (grp["gy16"].to_numpy() == ey).all()


def test_geoloc_plan_is_pure_jvm(spark):
    df = geoloc.geoloc_transform_query(spark, 64, 2)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s
    assert "CartesianProduct" not in s
