"""Greiner–Hormann region engine vs an independent fine-grid oracle.

The grid oracle rasterizes both polygons with the even-odd ray cast
(gdal_spark.geom — a different code path) and counts op-true cells;
agreement is bounded by perimeter-driven discretization error. Also
checks the closed-form inclusion–exclusion identities and the
degeneracy-perturbation fallback.
"""

import numpy as np
import pytest

from gdal_spark import boolop, geom, synth, wkb
from gdal_spark.operators import overlay


def _rings(data: bytes):
    return wkb.polygon_rings(bytes(data))


def _region(data: bytes):
    return overlay._region_of_wkb(bytes(data))


def _grid_op_area(rings_a, rings_b, op, bbox, n=512):
    x0, y0, x1, y1 = bbox
    xs = np.linspace(x0, x1, n, endpoint=False) + (x1 - x0) / n / 2
    ys = np.linspace(y0, y1, n, endpoint=False) + (y1 - y0) / n / 2
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    ina = geom.points_in_rings(gx, gy, rings_a)
    inb = geom.points_in_rings(gx, gy, rings_b)
    mask = {
        "inter": ina & inb,
        "union": ina | inb,
        "diff": ina & ~inb,
        "symdiff": ina ^ inb,
    }[op]
    cell = (x1 - x0) / n * (y1 - y0) / n
    return float(mask.sum()) * cell, cell


def _perimeter(rings):
    p = 0.0
    for r in rings:
        d = np.diff(np.asarray(r), axis=0)
        p += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return p


def _translated(clip_wkb: bytes, subj_wkb: bytes, frac: float) -> bytes:
    sx0, sy0, sx1, sy1 = wkb.envelope(subj_wkb)
    cx0, cy0, cx1, cy1 = wkb.envelope(clip_wkb)
    tx = (sx0 + frac * (sx1 - sx0)) - (cx0 + cx1) / 2
    ty = (sy0 + (1 - frac) * (sy1 - sy0)) - (cy0 + cy1) / 2
    rings = [np.asarray(r) + [tx, ty] for r in wkb.polygon_rings(clip_wkb)]
    return wkb.encode_polygon(rings[0], rings[1:])


def _joint_bbox(wa, wc):
    ax0, ay0, ax1, ay1 = wkb.envelope(wa)
    bx0, by0, bx1, by1 = wkb.envelope(wc)
    return (
        min(ax0, bx0) - 1e-9,
        min(ay0, by0) - 1e-9,
        max(ax1, bx1) + 1e-9,
        max(ay1, by1) + 1e-9,
    )


@pytest.mark.parametrize("op", ["inter", "union", "diff", "symdiff"])
@pytest.mark.parametrize("subject_kind", ["box", "kgon", "concave", "holed"])
@pytest.mark.parametrize("clip_kind", ["triangle", "concave", "holed"])
def test_region_ops_vs_grid_oracle(op, subject_kind, clip_kind):
    pdf = synth.polygons_pdf(256)
    subs = pdf[pdf["kind"] == subject_kind].head(3)
    clips = pdf[pdf["kind"] == clip_kind].head(2)
    tested = 0
    for si, (_, sa) in enumerate(subs.iterrows()):
        for ci, (_, sb) in enumerate(clips.iterrows()):
            wa = bytes(sa["geom_wkb"])
            wc = _translated(
                bytes(sb["geom_wkb"]), wa, 0.1 + 0.22 * ((si + 2 * ci) % 4)
            )
            A, B = _region(wa), _region(wc)
            out = boolop.boolean_regions(A, B, op)
            area = boolop.region_area(out)
            bbox = _joint_bbox(wa, wc)
            approx, cell = _grid_op_area(_rings(wa), _rings(wc), op, bbox)
            tol = (
                (_perimeter(_rings(wa)) + _perimeter(_rings(wc)))
                * max(bbox[2] - bbox[0], bbox[3] - bbox[1])
                / 512
                * 2.0
                + 4 * cell
            )
            assert abs(area - approx) <= tol, (
                sa["poly_id"], sb["poly_id"], op, area, approx, tol
            )
            # inclusion-exclusion cross-checks (exact identities)
            if op in ("union", "symdiff"):
                ia = boolop.region_area(boolop.boolean_regions(A, B, "inter"))
                aa, ab = boolop.region_area(A), boolop.region_area(B)
                want = aa + ab - (ia if op == "union" else 2 * ia)
                assert abs(area - want) <= 1e-9 * max(1.0, want)
            tested += 1
    assert tested > 0


def test_interlocking_union_has_hole():
    U1 = np.array(
        [(0, 0), (3, 0), (3, 2), (2.3, 2), (2.3, 0.7), (0.7, 0.7), (0.7, 2), (0, 2)],
        float,
    )
    U2 = (np.array([3.0, 2.7]) - U1) + np.array([0.0131, 0.0077])
    out = boolop.gh_ring_op(U1, U2, "union")
    assert len(out) == 1 and len(out[0][1]) == 1  # one shell, one hole
    ia = boolop.region_area(boolop.gh_ring_op(U1, U2, "inter"))
    want = abs(boolop.ring_area(U1)) + abs(boolop.ring_area(U2)) - ia
    assert abs(boolop.region_area(out) - want) < 1e-12


def test_containment_and_equal_special_cases():
    big = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
    small = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)])
    d = boolop.gh_ring_op(big, small, "diff")
    assert len(d) == 1 and len(d[0][1]) == 1
    assert abs(boolop.region_area(d) - 15.0) < 1e-12
    assert boolop.gh_ring_op(small, big, "diff") == []
    assert abs(boolop.region_area(boolop.gh_ring_op(big, small, "inter")) - 1.0) < 1e-12
    # equal rings (any rotation/orientation)
    rot = np.roll(big[::-1], 2, axis=0)
    assert abs(boolop.region_area(boolop.gh_ring_op(big, rot, "union")) - 16.0) < 1e-12
    assert boolop.gh_ring_op(big, rot, "diff") == []


def test_hole_recursion_subtract_across_hole():
    """Subtracting a ring that overlaps an existing hole: region area
    stays consistent with the grid oracle."""
    shell = np.array([(0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (0.0, 6.0)])
    hole = np.array([(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)])
    cut = np.array([(3.1, 3.1), (5.3, 3.3), (5.1, 5.2), (3.3, 5.1)])
    region = [(shell, [hole])]
    out = boolop.region_subtract_ring(region, cut)
    wa = wkb.encode_polygon(shell, [hole])
    wc = wkb.encode_polygon(cut)
    approx, cell = _grid_op_area(
        _rings(wa), _rings(wc), "diff", (-0.01, -0.01, 6.01, 6.01), n=1200
    )
    assert abs(boolop.region_area(out) - approx) < 24 * 6.02 / 1200 * 2 + 4 * cell


def test_degeneracy_raises_and_perturbation_recovers():
    a = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
    b = a + np.array([2.0, 0.0])  # shared edge x=2
    with pytest.raises(boolop.Degeneracy):
        boolop.gh_ring_op(a, b, "inter")
    out = boolop.boolean_regions([(a, [])], [(b, [])], "union")
    # perturbed union ~ 8.0 within the documented nano-shift
    assert abs(boolop.region_area(out) - 8.0) < 1e-6


def test_fold_matches_sequential_reference():
    """overlay_fold's sequential subtraction equals a brute-force
    region fold on overlapping hot boxes (pure python, no Spark)."""
    pdf = synth.polygons_pdf(128)
    hot = pdf[pdf["kind"] == "hot_box"]
    target = hot.iloc[0]
    partners = hot.iloc[1:6]
    A = _region(bytes(target["geom_wkb"]))
    out = A
    for _, prow in partners.iterrows():
        out = boolop.boolean_regions(out, _region(bytes(prow["geom_wkb"])), "diff")
    wa = bytes(target["geom_wkb"])
    bbox = wkb.envelope(wa)
    bbox = (bbox[0] - 1e-9, bbox[1] - 1e-9, bbox[2] + 1e-9, bbox[3] + 1e-9)
    x0, y0, x1, y1 = bbox
    n = 1000
    xs = np.linspace(x0, x1, n, endpoint=False) + (x1 - x0) / n / 2
    ys = np.linspace(y0, y1, n, endpoint=False) + (y1 - y0) / n / 2
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    mask = geom.points_in_rings(gx, gy, _rings(wa))
    for _, prow in partners.iterrows():
        mask &= ~geom.points_in_rings(gx, gy, _rings(bytes(prow["geom_wkb"])))
    approx = float(mask.sum()) * (x1 - x0) / n * (y1 - y0) / n
    perim = _perimeter(_rings(wa)) + sum(
        _perimeter(_rings(bytes(p["geom_wkb"]))) for _, p in partners.iterrows()
    )
    tol = perim * max(x1 - x0, y1 - y0) / n * 2.0 + 1e-6
    assert abs(boolop.region_area(out) - approx) <= tol
