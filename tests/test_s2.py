"""S2-scheme cell ids (s2cell.py): curve validity, python<->SQL
parity, and assignment invariants."""

import numpy as np
import pytest

from gdal_spark import s2cell, synth


def test_hilbert_bijective_and_adjacent():
    """The per-level lower-bits formulation must be a genuine
    space-filling curve: a bijection onto [0, side^2) where
    consecutive positions are unit grid steps."""
    side = 32
    pos = {}
    for x in range(side):
        for y in range(side):
            d = s2cell.hilbert_xy2d(side, x, y)
            assert 0 <= d < side * side
            assert d not in pos
            pos[d] = (x, y)
    for d in range(1, side * side):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_s2_faces_partition_sphere():
    """Every synth image lands on exactly one face; all 6 faces are
    populated; leaf coords are in range."""
    pdf = synth.images_pdf(3000)
    faces = set()
    for lon, lat in zip(pdf.lon, pdf.lat):
        f, i, j, sid = s2cell.s2_id_py(lon, lat, 10)
        assert 0 <= f < 6 and 0 <= i < 1024 and 0 <= j < 1024
        assert sid == f * 4**10 + s2cell.hilbert_xy2d(1024, i, j)
        faces.add(f)
    assert faces == set(range(6))


def test_s2_locality():
    """Nearby points on the same face share high cell-id bits more
    often than far points — the property the curve exists for. Checked
    as: distance between ids of two points 0.01 deg apart is (median)
    far smaller than for antipodal-ish pairs."""
    rng = np.random.default_rng(7)
    near, far = [], []
    for _ in range(300):
        lon, lat = rng.uniform(-170, 170), rng.uniform(-80, 80)
        f1, _, _, s1 = s2cell.s2_id_py(lon, lat, 12)
        f2, _, _, s2 = s2cell.s2_id_py(lon + 0.01, lat + 0.01, 12)
        if f1 == f2:
            near.append(abs(s1 - s2))
        f3, _, _, s3 = s2cell.s2_id_py(-lon, -lat, 12)
        far.append(abs(s1 - s3))
    assert np.median(near) < np.median(far) / 100


def test_s2_spark_matches_python(spark):
    """The staged Catalyst chain reproduces the python replica
    bit-for-bit (same doubles, same CASE decisions) per image."""
    imgs = synth.images_df(spark, 600)
    out = (
        s2cell.assign_s2(imgs, 10, "i, lon, lat")
        .select("i", "lon", "lat", "face", "ci", "cj", "s2_id")
        .toPandas()
        .sort_values("i")
    )
    for r in out.itertuples(index=False):
        f, ci, cj, sid = s2cell.s2_id_py(r.lon, r.lat, 10)
        assert (r.face, r.ci, r.cj, r.s2_id) == (f, ci, cj, sid), r.i


def test_s2_plan_is_pure_codegen(spark):
    """No Python/Arrow stage and no exchange before the aggregation:
    assignment must fuse into the scan."""
    imgs = synth.images_df(spark, 1000)
    df = s2cell.assign_s2(imgs, 10, "image_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
