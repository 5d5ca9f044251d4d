"""Spatial join: cell-prefiltered join == brute force == independent
scalar oracle, across all polygon kinds (boxes, triangles, convex
k-gons, concave C, polygon-with-hole)."""

import numpy as np
import pytest

from gdal_spark import geom, synth, wkb
from gdal_spark.operators.spatial_join import spatial_join, spatial_join_bruteforce


def scalar_pip(px, py, rings):
    """Independent scalar even-odd ray cast (classic textbook loop) —
    deliberately a separate implementation from gdal_spark.geom."""
    inside = False
    for ring in rings:
        pts = [tuple(p) for p in ring]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for a in range(n):
            x1, y1 = pts[a]
            x2, y2 = pts[(a + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                if px < xint:
                    inside = not inside
    return inside


def expected_pairs(images_pdf, polys_pdf):
    out = set()
    for p in polys_pdf.itertuples(index=False):
        rings = wkb.polygon_rings(bytes(p.geom_wkb))
        minx, miny, maxx, maxy = wkb.envelope(bytes(p.geom_wkb))
        for im in images_pdf.itertuples(index=False):
            if not (minx <= im.lon <= maxx and miny <= im.lat <= maxy):
                continue
            if scalar_pip(im.lon, im.lat, rings):
                out.add((im.i, p.poly_id))
    return out


def test_pip_kernel_matches_scalar_oracle():
    polys = synth.polygons_pdf(32)
    imgs = synth.images_pdf(512)
    px, py = imgs.lon.values, imgs.lat.values
    for p in polys.itertuples(index=False):
        g = bytes(p.geom_wkb)
        fast = geom.points_in_wkb(px, py, g)
        rings = wkb.polygon_rings(g)
        slow = np.array([scalar_pip(x, y, rings) for x, y in zip(px, py)])
        np.testing.assert_array_equal(fast, slow, err_msg=p.poly_id)


def test_hole_and_concave_semantics():
    polys = synth.polygons_pdf(32)
    holed = polys[polys.kind == "holed"].iloc[0]
    rings = wkb.polygon_rings(bytes(holed.geom_wkb))
    outer, inner = rings
    cx = outer[:, 0].mean()
    cy = outer[:, 1].mean()
    # centroid is inside the hole -> outside by even-odd
    assert not geom.points_in_wkb([cx], [cy], bytes(holed.geom_wkb))[0]
    # a point between outer and inner ring is inside
    edge_x = (outer[:, 0].min() + inner[:, 0].min()) / 2
    assert geom.points_in_wkb([edge_x], [cy], bytes(holed.geom_wkb))[0]


def test_covering_cells_superset():
    polys = synth.polygons_pdf(16)
    for p in polys.itertuples(index=False):
        g = bytes(p.geom_wkb)
        z = geom.zoom_for_max_cells(g, 64, max_zoom=6)
        cells = geom.covering_cells_geodetic(g, z)
        assert 1 <= len(cells) <= 130  # envelope covering, modest blowup


def test_spatial_join_matches_bruteforce_and_oracle(spark):
    n_img, n_poly = 1024, 32
    imgs = synth.images_df(spark, n_img)
    polys = synth.polygons_df(spark, n_poly)

    joined = spatial_join(
        imgs, polys, point_cols=["i", "image_id"], poly_cols=["poly_id", "kind"]
    )
    got = {(r.i, r.poly_id) for r in joined.collect()}

    brute = spatial_join_bruteforce(
        imgs, polys, point_cols=["i"], poly_cols=["poly_id"]
    )
    got_brute = {(r.i, r.poly_id) for r in brute.collect()}
    assert got == got_brute

    exp = expected_pairs(synth.images_pdf(n_img), synth.polygons_pdf(n_poly))
    assert got == exp
    assert len(exp) > 0  # non-degenerate scene


def test_spatial_join_shuffle_path_equals_broadcast(spark):
    imgs = synth.images_df(spark, 512)
    polys = synth.polygons_df(spark, 16)
    a = spatial_join(imgs, polys, broadcast=True, point_cols=["i"], poly_cols=["poly_id"])
    b = spatial_join(imgs, polys, broadcast=False, point_cols=["i"], poly_cols=["poly_id"])
    assert {(r.i, r.poly_id) for r in a.collect()} == {
        (r.i, r.poly_id) for r in b.collect()
    }


def test_prepared_join_probe_matches_one_shot_and_is_reusable(spark):
    from gdal_spark.operators.spatial_join import prepare_spatial_join

    n_img, n_poly = 1024, 32
    imgs = synth.images_df(spark, n_img)
    polys = synth.polygons_df(spark, n_poly)
    one_shot = {
        (r.i, r.poly_id)
        for r in spatial_join(
            imgs, polys, point_cols=["i"], poly_cols=["poly_id"]
        ).collect()
    }

    prep = prepare_spatial_join(polys, poly_cols=["poly_id"], poly_count_hint=n_poly)
    # two probes against the same prepared layer: identical results,
    # and a second point batch reuses the cover without rebuilding it
    assert {
        (r.i, r.poly_id) for r in prep.probe(imgs, point_cols=["i"]).collect()
    } == one_shot
    assert {
        (r.i, r.poly_id) for r in prep.probe(imgs, point_cols=["i"]).collect()
    } == one_shot
    other = synth.images_df(spark, 256)
    exp = expected_pairs(synth.images_pdf(256), synth.polygons_pdf(n_poly))
    assert {
        (r.i, r.poly_id) for r in prep.probe(other, point_cols=["i"]).collect()
    } == exp
