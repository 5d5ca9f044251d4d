"""makevalid (ogr2ogr -makevalid / OGRGeometry::MakeValid, linework
method): even-odd reconstruction of invalid ring sets.

Gates: (a) closed-form repaired areas on the driver fixtures,
(b) brute-force parity equivalence on random-ish invalid rings (the
repaired ring set must classify a dense probe grid exactly like the
ORIGINAL linework's even-odd rule — the defining property),
(c) boolop accepts repaired output without its Degeneracy
perturbation retry (the r3 verdict's robustness criterion)."""

import numpy as np
import pytest

from gdal_spark import geom, synth, wkb
from gdal_spark.operators import makevalid as mv
from tests.conftest import SF_DIR


def _parity_grid(rings, xs, ys):
    gx, gy = np.meshgrid(xs, ys)
    return geom.points_in_rings(
        gx.ravel(), gy.ravel(), [np.asarray(r) for r in rings]
    )


def test_fixture_areas_closed_form():
    pdf = mv.invalid_fixtures_pdf(128)
    _, cx, cy, hw, hh = synth._poly_params(128)
    assert len(pdf) == 32
    for _, row in pdf.iterrows():
        idx = int(row.fid[4:])
        out = mv.make_valid_rings(wkb.polygon_rings(bytes(row.geom_wkb)))
        area = mv.rings_area_evenodd(out)
        w, h = float(hw[idx]), float(hh[idx])
        expect = 2.0 * w * h if idx % 3 == 0 else 4.0 * w * h
        assert len(out) == (2 if idx % 3 == 0 else 1)
        assert int(np.floor(area * 1e6)) == int(np.floor(expect * 1e6))


@pytest.mark.parametrize(
    "ring",
    [
        # bowtie
        [(0, 0), (2, 2), (0, 2), (2, 0)],
        # pentagram-style multi-crossing
        [(0, 0), (4, 1), (1, 3), (2, -1), (3, 3)],
        # rectangle with spike + duplicate vertex
        [(0, 0), (2, 0), (2, 0), (2, 1), (1, 1), (1, 2.5), (1, 1), (0, 1)],
        # already-valid concave ring round-trips
        [(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3)],
    ],
)
def test_parity_equivalence_on_probe_grid(ring):
    """Repaired ring set <=> original linework under even-odd, on a
    probe grid that avoids the linework itself."""
    rings = [np.asarray(ring, dtype=np.float64)]
    out = mv.make_valid_rings(rings)
    xs = np.linspace(-0.487, 4.513, 41)
    ys = np.linspace(-1.493, 3.507, 41)
    want = _parity_grid(rings, xs, ys)
    got = _parity_grid(out, xs, ys)
    assert (want == got).all()


def test_holed_polygon_roundtrip():
    outer = [(0, 0), (4, 0), (4, 3), (0, 3)]
    inner = [(1, 1), (2, 1), (2, 2), (1, 2)]
    out = mv.make_valid_rings(
        wkb.polygon_rings(wkb.encode_polygon(outer, [inner]))
    )
    assert len(out) == 2
    assert abs(mv.rings_area_evenodd(out) - 11.0) < 1e-9


def test_boolop_accepts_repaired_output():
    """The r3 verdict's done criterion: boolop consumes makevalid
    output directly — no Degeneracy, exact lobe intersection area."""
    from gdal_spark import boolop

    out = mv.make_valid_rings(
        [np.array([(0, 0), (2, 2), (0, 2), (2, 0)], dtype=np.float64)]
    )
    # transversal clip (no shared vertices/edges with the lobes)
    clip = [np.array([(-1.0, 0.25), (3.0, 0.25), (3.0, 1.75), (-1.0, 1.75)])]
    ra = mv.rings_to_region(out)
    rb = boolop.region_of_rings(clip)
    inter = boolop.region_area(boolop.boolean_regions(ra, rb, "inter"))
    # each lobe is a height-1 triangle of area 1; the strip keeps
    # 0.5625 of each
    assert abs(inter - 1.125) < 1e-9


def test_makevalid_spark_query(spark):
    got = mv.makevalid_query(spark, synth.n_polygons(SF_DIR)).toPandas()
    assert (got.n_rings >= 1).all()
    assert (got.area_key > 0).all()


def test_wrapdateline_spatial_join_equivalence(spark):
    """r3 verdict dateline criterion: a lon-180-crossing polygon,
    after wrapdateline, joins the same points as its two manually
    split halves (and does NOT span the world)."""
    import pandas as pd
    from pyspark.sql import types as T

    from gdal_spark.operators import vector_ops as vo
    from gdal_spark.operators.spatial_join import spatial_join

    # box straddling the antimeridian: lon 176..184 -> west 176..180,
    # east -180..-176; lat 10..20
    ring = [(176.0, 10.0), (184.0, 10.0), (184.0, 20.0), (176.0, 20.0)]
    crossing = pd.DataFrame(
        {"fid": ["dl0"], "geom_wkb": [wkb.encode_polygon(ring)]}
    )
    schema = T.StructType(
        [
            T.StructField("fid", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    wrapped = vo.wrapdateline(
        spark.createDataFrame(crossing, schema=schema)
    ).selectExpr("fid AS poly_id", "part", "geom_wkb")

    halves = pd.DataFrame(
        {
            "poly_id": ["dl0", "dl0"],
            "part": ["w", "e"],
            "geom_wkb": [
                wkb.encode_polygon(
                    [(176.0, 10.0), (180.0, 10.0), (180.0, 20.0),
                     (176.0, 20.0)]
                ),
                wkb.encode_polygon(
                    [(-180.0, 10.0), (-176.0, 10.0), (-176.0, 20.0),
                     (-180.0, 20.0)]
                ),
            ],
        }
    )
    hschema = T.StructType(
        [
            T.StructField("poly_id", T.StringType(), False),
            T.StructField("part", T.StringType(), False),
            T.StructField("geom_wkb", T.BinaryType(), False),
        ]
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [f"p{i}" for i in range(8)],
                "lon": [177.5, 179.9, -179.9, -176.5, 0.0, 150.0, 178.0,
                        -178.0],
                "lat": [15.0, 12.0, 18.0, 11.0, 15.0, 15.0, 55.0, 15.0],
            }
        )
    )
    a = spatial_join(
        pts, wrapped, point_cols=["pid"], poly_cols=["poly_id", "part"],
        poly_count_hint=2,
    ).toPandas()
    b = spatial_join(
        pts, spark.createDataFrame(halves, schema=hschema),
        point_cols=["pid"], poly_cols=["poly_id", "part"],
        poly_count_hint=2,
    ).toPandas()
    key = ["pid", "poly_id", "part"]
    assert sorted(map(tuple, a[key].values)) == sorted(
        map(tuple, b[key].values)
    )
    # the in-range points join; the far-away ones don't
    assert set(a.pid) == {"p0", "p1", "p2", "p3", "p7"}
