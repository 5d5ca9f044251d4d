"""Polygon-polygon predicates — unit truths + cross-check vs the
overlay clipper on real synth geometry pairs."""

import numpy as np

from gdal_spark import synth, wkb
from gdal_spark.operators import overlay, predicates
from tests.test_overlay import _translated


def box(x0, y0, x1, y1):
    return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)]


def test_box_truth_table():
    a = box(0, 0, 4, 4)
    assert predicates.classify(box(1, 1, 3, 3), a) == "within"
    assert predicates.classify(a, box(1, 1, 3, 3)) == "contains"
    assert predicates.classify(a, box(2, 2, 6, 6)) == "intersects"
    assert predicates.classify(a, box(4, 0, 8, 4)) == "touches"  # shared edge
    assert predicates.classify(a, box(4, 4, 8, 8)) == "touches"  # corner
    assert predicates.classify(a, box(5, 5, 8, 8)) == "disjoint"
    # collinear shared-edge partial overlap (the degenerate case the
    # convex branch gets right): A=[0,2]x[0,1], B=[1,3]x[0,1]
    assert predicates.classify(box(0, 0, 2, 1), box(1, 0, 3, 1)) == "intersects"


def test_triangle_vs_box():
    tri = [np.array([(0.0, 0.0), (4.0, 0.0), (2.0, 3.0)])]
    assert predicates.classify(tri, box(-1, -1, 5, 4)) == "within"
    assert predicates.classify(box(-1, -1, 5, 4), tri) == "contains"
    assert predicates.classify(tri, box(3, 1, 6, 5)) == "intersects"
    assert predicates.classify(tri, box(10, 10, 12, 12)) == "disjoint"


def test_holed_subject():
    """A small box inside the hole of a holed polygon is disjoint;
    one inside the solid part is within."""
    shell = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
    hole = np.array([(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0)])
    holed = [shell, hole]
    assert predicates.classify(box(4, 4, 6, 6), holed) == "disjoint"
    assert predicates.classify(box(0.5, 0.5, 2.0, 2.0), holed) == "within"
    # crossing the hole boundary intersects
    assert predicates.classify(box(2, 2, 4, 4), holed) == "intersects"


def test_classify_consistent_with_clipper_on_synth_pairs():
    """For every synth subject kind vs convex clip kinds (translated
    into overlap), classify agrees with the S-H intersection area:
    intersects/within/contains <-> area > 0."""
    pdf = synth.polygons_pdf(128)
    for skind in ("box", "triangle", "kgon", "concave", "holed"):
        subs = pdf[pdf["kind"] == skind].head(4)
        clips = pdf[pdf["kind"] == "kgon"].head(3)
        for si, (_, sa) in enumerate(subs.iterrows()):
            for ci, (_, sb) in enumerate(clips.iterrows()):
                wa = bytes(sa["geom_wkb"])
                wc = _translated(bytes(sb["geom_wkb"]), wa, 0.2 + 0.2 * ((si + ci) % 3))
                ra = [overlay._open_ring(r) for r in wkb.polygon_rings(wa)]
                rb = [overlay._open_ring(r) for r in wkb.polygon_rings(wc)]
                pred = predicates.classify(ra, rb)
                _, area = overlay.clip_polygon_convex(ra, rb[0])
                overlapping = pred in ("intersects", "within", "contains")
                assert overlapping == (area > 1e-12), (
                    sa["poly_id"], sb["poly_id"], pred, area
                )


def test_spark_pipeline_matches_local(spark):
    polys = synth.polygons_df(spark, 128)
    out = predicates.predicates_boxes_query(polys).toPandas()
    pdf = synth.polygons_pdf(128)
    a = pdf[pdf["kind"].isin(["box", "hot_box"])]
    b = pdf[pdf["kind"] == "hot_box"]
    expect = {}
    for _, sa in a.iterrows():
        for _, sb in b.iterrows():
            if sa["poly_id"] == sb["poly_id"]:
                continue
            ra = [overlay._open_ring(r) for r in wkb.polygon_rings(bytes(sa["geom_wkb"]))]
            rb = [overlay._open_ring(r) for r in wkb.polygon_rings(bytes(sb["geom_wkb"]))]
            pred = predicates.classify(ra, rb)
            if pred != "disjoint":
                expect[(sa["poly_id"], sb["poly_id"])] = pred
    got = {(r["id_a"], r["id_b"]): r["predicate"] for _, r in out.iterrows()}
    assert got == expect


def test_equals_label():
    """Equal geometries classify as 'equals' (r2 labeled them
    'intersects' in the convex branch and 'touches' in the general
    branch)."""
    import numpy as np

    from gdal_spark import synth, wkb
    from gdal_spark.operators import predicates
    from gdal_spark.operators.overlay import _open_ring

    pdf = synth.polygons_pdf(64)
    for kind in ("box", "kgon", "concave", "holed"):
        g = bytes(pdf[pdf["kind"] == kind].iloc[0]["geom_wkb"])
        rings = [_open_ring(r) for r in wkb.polygon_rings(g)]
        assert predicates.classify(rings, rings) == "equals", kind
        # rotated vertex order still equal
        rot = [np.roll(r, 2, axis=0) for r in rings]
        assert predicates.classify(rings, rot) == "equals", kind


def test_general_branch_collinear_partial_overlap():
    """The case the pre-r3 general branch mislabeled: a concave
    polygon overlapping a rectangle with only collinear boundary
    contact (no proper crossing) must classify as 'intersects' —
    the GH-area branch sees interior overlap directly."""
    import numpy as np

    from gdal_spark.operators.predicates import classify

    # L-shape (concave): interior = [0,3]x[0,1] + [0,1]x[1,3]
    L = np.array(
        [[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0],
         [1.0, 3.0], [0.0, 3.0]]
    )
    # rect sharing the y=0 and y=1 lines over x in [2,4]: interiors
    # overlap on [2,3]x[0,1]; boundaries only meet collinearly
    R = np.array([[2.0, 0.0], [4.0, 0.0], [4.0, 1.0], [2.0, 1.0]])
    assert classify([L], [R]) == "intersects"
    assert classify([R], [L]) == "intersects"
    # containment through the general branch: rect strictly inside
    # the L's lower arm
    S = np.array([[1.5, 0.25], [2.5, 0.25], [2.5, 0.75], [1.5, 0.75]])
    assert classify([S], [L]) == "within"
    assert classify([L], [S]) == "contains"
    # far-away rect
    D = np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]])
    assert classify([L], [D]) == "disjoint"


def test_min_distance_matches_dense_sampling():
    """min_distance_pairs' vertex-edge minimum vs dense boundary
    sampling: the true min is <= any sampled distance, and dense
    sampling approaches it."""
    import numpy as np

    from gdal_spark.operators import predicates

    def boundary_points(ring, k=400):
        pts = []
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            t = np.linspace(0, 1, k, endpoint=False)[:, None]
            pts.append(a + t * (b - a))
        return np.concatenate(pts)

    rng = np.random.default_rng(9)
    for _ in range(5):
        c1 = rng.uniform(-5, 5, 2)
        c2 = c1 + rng.uniform(1.5, 3.0, 2)  # disjoint-ish offset
        A = np.array(
            [c1 + [-1, -0.5], c1 + [1, -0.5], c1 + [1, 0.5], c1 + [-1, 0.5]]
        )
        B = np.array([c2 + [-0.5, -1], c2 + [0.5, -1], c2 + [0.0, 1]])

        # exact vertex-edge min (the operator's kernel, re-driven here)
        def seg_min(P, R):
            best = np.inf
            n = len(R)
            for i in range(n):
                a, b = R[i], R[(i + 1) % n]
                e = b - a
                t = np.clip(((P - a) @ e) / (e @ e), 0, 1)
                q = a + t[:, None] * e
                best = min(best, float(((P - q) ** 2).sum(axis=1).min()))
            return best

        d2 = min(seg_min(A, B), seg_min(B, A))
        sa, sb = boundary_points(A), boundary_points(B)
        samp = float(
            ((sa[:, None, :] - sb[None, :, :]) ** 2).sum(axis=2).min()
        )
        assert d2 <= samp + 1e-12
        assert samp - d2 < 1e-3  # dense sampling converges to the min
