"""OGRGeometry::Buffer (gdal_spark/operators/buffer.py).

Independent checks (never the oracle's own formula):
* distance parity — buffer membership == (inside input OR boundary
  distance <= r), sampled away from the chord-sagitta band;
* the convex DIRECT path and the general capsule-UNION path agree on
  the same convex input;
* closed-form convex area A + P*r + sum of inscribed corner sectors;
* hole semantics: holes shrink by r (and vanish when 2r >= width).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark import boolop, geom, synth, wkb
from gdal_spark.operators import buffer as B

R, Q = 0.375, 8
_BAND = R * (1 - math.cos((math.pi / 2 / Q) / 2)) + 2e-3


def _dist_to_rings(px, py, rings):
    best = np.inf
    for r in rings:
        r = np.asarray(r, float)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        a = r
        b = np.roll(r, -1, axis=0)
        d = b - a
        t = np.clip(
            ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1])
            / np.maximum(d[:, 0] ** 2 + d[:, 1] ** 2, 1e-300),
            0,
            1,
        )
        cx = a[:, 0] + t * d[:, 0]
        cy = a[:, 1] + t * d[:, 1]
        best = min(best, float(np.min(np.hypot(px - cx, py - cy))))
    return best


def _in_rings_evenodd(px, py, rings):
    return bool(
        geom.points_in_rings(
            np.array([px]), np.array([py]), [np.asarray(r, float) for r in rings]
        )[0]
    )


CASES = {
    "concave_c": [
        [(0, 0), (4, 0), (4, 0.8), (1.2, 0.8), (1.2, 3.2), (4, 3.2), (4, 4), (0, 4)]
    ],
    "holed": [[(0, 0), (6, 0), (6, 6), (0, 6)], [(2, 2), (4, 2), (4, 4), (2, 4)]],
    "box": [[(0, 0), (5, 0), (5, 3), (0, 3)]],
    "triangle": [[(0, 0), (4, 0), (1, 3)]],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_buffer_distance_parity(name):
    rings = [np.asarray(r, float) for r in CASES[name]]
    out, _ = B.buffer_rings(rings, R, Q)
    assert out
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(300):
        px, py = rng.uniform(-1.5, 7.5, 2)
        dist = _dist_to_rings(px, py, rings)
        inside_in = _in_rings_evenodd(px, py, rings)
        if not inside_in and abs(dist - R) < _BAND:
            continue  # inscribed-chord discretization band
        want = inside_in or dist <= R
        got = _in_rings_evenodd(px, py, out)
        assert got == want, (name, px, py, dist, inside_in)
        checked += 1
    assert checked > 200


def test_buffer_paths_agree_on_convex():
    ring = np.asarray(CASES["box"][0], float)
    direct, used_direct = B.buffer_rings([ring], R, Q)
    assert used_direct
    union_reg = B.buffer_region(boolop.region_of_rings([ring]), R, Q)
    a_direct = abs(boolop.ring_area(np.vstack([direct[0], direct[0][:1]])))
    a_union = boolop.region_area(union_reg)
    assert a_direct == pytest.approx(a_union, rel=1e-9)


def test_buffer_convex_closed_form_area():
    # direct-path area == A + P*r + n_corner inscribed sectors, each
    # steps * 0.5 r^2 sin(turn/steps)
    for name in ("box", "triangle"):
        ring = np.asarray(CASES[name][0], float)
        out, used_direct = B.buffer_rings([ring], R, Q)
        assert used_direct
        a0 = boolop.ring_area(np.vstack([ring, ring[:1]]))
        d = np.roll(ring, -1, axis=0) - ring
        per = float(np.sum(np.hypot(d[:, 0], d[:, 1])))
        normals = B._edge_normals(ring)
        sector = 0.0
        delta = (math.pi / 2) / Q
        n = len(ring)
        for i in range(n):
            nin, nout = normals[(i - 1) % n], normals[i]
            turn = math.atan2(
                float(nin[0] * nout[1] - nin[1] * nout[0]),
                float(nin[0] * nout[0] + nin[1] * nout[1]),
            )
            steps = max(1, int(math.ceil(turn / delta - 1e-9)))
            sector += steps * 0.5 * R * R * math.sin(turn / steps)
        want = a0 + per * R + sector
        got = abs(boolop.ring_area(np.vstack([out[0], out[0][:1]])))
        assert got == pytest.approx(want, rel=1e-12)


def test_buffer_hole_shrinks_and_vanishes():
    outer = [(0, 0), (6, 0), (6, 6), (0, 6)]
    # wide hole survives, shrunk by ~r each side
    out, _ = B.buffer_rings(
        [np.asarray(outer, float), np.array([(2, 2), (4, 2), (4, 4), (2, 4)], float)],
        R,
        Q,
    )
    areas = sorted(abs(boolop.ring_area(np.vstack([r, r[:1]]))) for r in out)
    assert len(out) == 2
    # hole 2x2 -> ~ (2-2r)^2 plus rounded corners bulging inward
    assert areas[0] < (2 - 2 * R) ** 2 + 4 * R * R
    assert areas[0] > (2 - 2 * R) ** 2 - 1e-6
    # narrow hole (width 0.5 < 2r) is filled
    out2, _ = B.buffer_rings(
        [
            np.asarray(outer, float),
            np.array([(2, 2), (2.5, 2), (2.5, 4), (2, 4)], float),
        ],
        R,
        Q,
    )
    assert len(out2) == 1


def test_erosion_distance_parity():
    rings = [np.asarray(CASES["concave_c"][0], float)]
    r = 0.3
    out, direct = B.buffer_rings_signed(rings, -r, Q)
    assert not direct and len(out) == 1
    band = r * (1 - math.cos((math.pi / 2 / Q) / 2)) + 2e-3
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(300):
        px, py = rng.uniform(-0.5, 4.5, 2)
        inside = _in_rings_evenodd(px, py, rings)
        d = _dist_to_rings(px, py, rings)
        if inside and abs(d - r) < band:
            continue
        want = inside and d >= r
        got = _in_rings_evenodd(px, py, out)
        assert got == want, (px, py, d, inside)
        checked += 1
    assert checked > 200


def test_erosion_convex_inset_and_collapse():
    # convex box: exact inset rectangle via the direct path
    out, direct = B.buffer_rings_signed(
        [np.array([(0, 0), (5, 0), (5, 3), (0, 3)], float)], -0.5, Q
    )
    assert direct and len(out) == 1
    a = abs(boolop.ring_area(np.vstack([out[0], out[0][:1]])))
    assert a == pytest.approx(4.0 * 2.0, rel=1e-12)
    # sub-2r-wide box erodes away entirely
    out2, _ = B.buffer_rings_signed(
        [np.array([(0, 0), (0.5, 0), (0.5, 5), (0, 5)], float)], -0.3, Q
    )
    assert out2 == []


def test_erosion_hole_grows():
    # eroding a holed square grows the hole by r on each side
    outer = np.array([(0, 0), (6, 0), (6, 6), (0, 6)], float)
    hole = np.array([(2, 2), (4, 2), (4, 4), (2, 4)], float)
    out, _ = B.buffer_rings_signed([outer, hole], -0.25, Q)
    region = boolop._classify_nested([np.asarray(r) for r in out])
    assert len(region) == 1 and len(region[0][1]) == 1
    area = boolop.region_area(region)
    # outer 5.5^2; hole grows to 2.5x2.5 minus the rounded corners' cut
    assert (5.5 * 5.5 - 2.5 * 2.5) < area < (5.5 * 5.5 - 2.25)


def test_buffer_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")
    m = synth.N_POLYGONS_FOR_SF["0.001"]
    pdf = B.box_fixtures_pdf(m)
    rows = {}
    for fid, g in zip(pdf.fid, pdf.geom_wkb):
        out, used_direct = B.buffer_rings(
            wkb.polygon_rings(bytes(g)), B._BUF_DIST, B._BUF_QSEGS
        )
        assert used_direct
        s, c = B._grid_shoelace(out[0])
        rows[fid] = (c, s)
    ora = duckdb.sql(B.oracle_buffer(m)).df()
    assert len(ora) == len(rows)
    for fid, nv, ak in zip(ora.fid, ora.n_vertices, ora.area2_key):
        assert rows[fid] == (int(nv), int(ak)), fid
