"""Property-based (hypothesis) fuzz tests over the pure-Python
geometry/projection/resample kernels — the randomized counterpart of
the reference's autotest fuzz coverage. All tests are Spark-free and
fast; invariants, not goldens:

- boolop: inclusion–exclusion over random triangle/rect pairs
- makevalid: even-odd membership parity preserved on a probe grid;
  idempotence
- grid: mercator tile assignment contains its point; meters<->lonlat
  roundtrip
- srs: transverse-mercator forward/inverse roundtrip
- resample: partition of unity (constant in -> constant out) and
  positive-kernel boundedness
"""

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from gdal_spark import boolop, geom, grid, resample, srs
from gdal_spark.operators import makevalid

COORD = st.floats(
    min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
)


def _rect(cx, cy, hw, hh):
    return np.array(
        [
            (cx - hw, cy - hh),
            (cx + hw, cy - hh),
            (cx + hw, cy + hh),
            (cx - hw, cy + hh),
        ],
        dtype=np.float64,
    )


def _tri_area(p):
    return 0.5 * abs(
        (p[1][0] - p[0][0]) * (p[2][1] - p[0][1])
        - (p[2][0] - p[0][0]) * (p[1][1] - p[0][1])
    )


def _region_area(region):
    """Area of a boolop region [(shell, holes), ...]."""
    total = 0.0
    for shell, holes in region:
        total += abs(boolop.ring_area(np.asarray(shell)))
        for h in holes:
            total -= abs(boolop.ring_area(np.asarray(h)))
    return total


@settings(max_examples=40, deadline=None)
@given(
    cx=COORD, cy=COORD,
    hw=st.floats(min_value=0.5, max_value=20.0),
    hh=st.floats(min_value=0.5, max_value=20.0),
    cx2=COORD, cy2=COORD,
    hw2=st.floats(min_value=0.5, max_value=20.0),
    hh2=st.floats(min_value=0.5, max_value=20.0),
)
def test_boolop_inclusion_exclusion_rects(cx, cy, hw, hh, cx2, cy2, hw2, hh2):
    A = [(_rect(cx, cy, hw, hh), [])]
    B = [(_rect(cx2, cy2, hw2, hh2), [])]
    a, b = 4 * hw * hh, 4 * hw2 * hh2
    try:
        ai = _region_area(boolop.boolean_regions(A, B, "inter"))
        au = _region_area(boolop.boolean_regions(A, B, "union"))
        ad = _region_area(boolop.boolean_regions(A, B, "diff"))
    except boolop.Degeneracy:
        assume(False)  # perturbation retries exhausted — skip example
    tol = 1e-9 * max(1.0, a + b)
    assert abs(ai + au - (a + b)) < tol
    assert abs(ad - (a - ai)) < tol


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(st.tuples(COORD, COORD), min_size=6, max_size=6),
)
def test_boolop_inclusion_exclusion_triangles(pts):
    t1 = np.array(pts[:3], dtype=np.float64)
    t2 = np.array(pts[3:], dtype=np.float64)
    assume(_tri_area(t1) > 1.0 and _tri_area(t2) > 1.0)
    A = [(boolop.ensure_ccw(t1), [])]
    B = [(boolop.ensure_ccw(t2), [])]
    a, b = _tri_area(t1), _tri_area(t2)
    try:
        ai = _region_area(boolop.boolean_regions(A, B, "inter"))
        au = _region_area(boolop.boolean_regions(A, B, "union"))
        sd = _region_area(boolop.boolean_regions(A, B, "symdiff"))
    except boolop.Degeneracy:
        assume(False)
    tol = 1e-8 * max(1.0, a + b)
    assert abs(ai + au - (a + b)) < tol
    assert abs(sd - (au - ai)) < tol


def _min_seg_dist(px, py, ring):
    """Vectorized min distance from probe points to a ring's edges."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    d = b - a  # (E, 2)
    best = np.full(px.shape, np.inf)
    for k in range(len(a)):
        dx, dy = d[k]
        L2 = dx * dx + dy * dy
        if L2 == 0:
            dist = np.hypot(px - a[k, 0], py - a[k, 1])
        else:
            t = np.clip(((px - a[k, 0]) * dx + (py - a[k, 1]) * dy) / L2, 0, 1)
            dist = np.hypot(px - (a[k, 0] + t * dx), py - (a[k, 1] + t * dy))
        best = np.minimum(best, dist)
    return best


@settings(max_examples=30, deadline=None)
@given(pts=st.lists(st.tuples(COORD, COORD), min_size=5, max_size=7))
def test_makevalid_parity_preserved(pts):
    """Repair preserves even-odd membership at every probe point away
    from the linework, and is idempotent on its own output.

    Coordinates are quantized to 1e-3 so the fuzz explores STRUCTURE
    (self-crossings, collinear overlaps, spikes) inside the
    algorithm's resolution: near-parallel linework at ~1e-5 relative
    angles sits at the float-arrangement conditioning limit, where
    idempotence degrades by ~crossing-relocation * length (the
    sub-resolution cases the fuzz DID find are pinned as exact
    regressions below)."""
    pts = [(round(x, 3), round(y, 3)) for x, y in pts]
    ring = np.array(pts, dtype=np.float64)
    assume(len(set(pts)) == len(pts))
    try:
        fixed = makevalid.make_valid_rings([ring])
    except Exception:
        assume(False)
    gx, gy = np.meshgrid(
        np.linspace(-55.1234, 55.2345, 41), np.linspace(-55.3456, 55.1567, 41)
    )
    px, py = gx.ravel(), gy.ravel()
    keep = _min_seg_dist(px, py, ring) > 1e-3
    px, py = px[keep], py[keep]
    before = geom.points_in_rings(px, py, [ring])
    after = (
        geom.points_in_rings(px, py, fixed)
        if fixed
        else np.zeros(len(px), dtype=bool)
    )
    assert np.array_equal(before, after)
    again = makevalid.make_valid_rings(fixed) if fixed else []
    a1 = makevalid.rings_area_evenodd(fixed) if fixed else 0.0
    a2 = makevalid.rings_area_evenodd(again) if again else 0.0
    assert abs(a1 - a2) < 1e-6 * max(1.0, abs(a1))


@settings(max_examples=60, deadline=None)
@given(
    lon=st.floats(min_value=-179.9, max_value=179.9),
    lat=st.floats(min_value=-84.0, max_value=84.0),
    zoom=st.integers(min_value=0, max_value=14),
)
def test_grid_tile_contains_point(lon, lat, zoom):
    tx, ty = grid.lonlat_to_tile_merc(lon, lat, zoom)
    b = grid.tile_bounds_merc(tx, ty, zoom)
    mx, my = grid.lonlat_to_meters(lon, lat)
    eps = 1e-6 * max(1.0, abs(mx), abs(my))
    assert b[0] - eps <= mx <= b[2] + eps
    assert b[1] - eps <= my <= b[3] + eps
    lon2, lat2 = grid.meters_to_lonlat(mx, my)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    dlon=st.floats(min_value=-2.9, max_value=2.9),
    lat=st.floats(min_value=-79.0, max_value=79.0),
    zone=st.integers(min_value=1, max_value=60),
)
def test_srs_tm_roundtrip(dlon, lat, zone):
    lon0 = srs.utm_lon0(zone)
    x, y = srs.tm_forward(lon0 + dlon, lat, lon0)
    lon2, lat2 = srs.tm_inverse(x, y, lon0)
    assert abs(lon2 - (lon0 + dlon)) < 1e-9
    assert abs(lat2 - lat) < 1e-9


@settings(max_examples=25, deadline=None)
@given(
    const=st.integers(min_value=0, max_value=255),
    alg=st.sampled_from(["bilinear", "cubic", "cubicspline", "lanczos"]),
    scale=st.floats(min_value=0.3, max_value=3.0),
)
def test_resample_partition_of_unity(const, alg, scale):
    """Constant input -> constant output for every convolution kernel
    (weights renormalize to 1), at any up/down scale, away from the
    raster edge."""
    src = np.full((40, 40), float(const))
    n = 12
    sx = np.linspace(15.0, 25.0, n)[None, :].repeat(n, axis=0)
    sy = np.linspace(15.0, 25.0, n)[:, None].repeat(n, axis=1)
    vals, valid = resample._warp_conv_band(src, sx, sy, alg, scale, scale)
    assert valid.all()
    assert np.allclose(vals, const, atol=1e-9)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_resample_bilinear_bounded(seed):
    """Bilinear (non-negative kernel) never overshoots the source
    range."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(30, 30)).astype(np.float64)
    n = 10
    sx = rng.uniform(8.0, 22.0, size=(n, n))
    sy = rng.uniform(8.0, 22.0, size=(n, n))
    vals, valid = resample._warp_conv_band(src, sx, sy, "bilinear", 1.0, 1.0)
    assert valid.all()
    assert (vals >= src.min() - 1e-9).all()
    assert (vals <= src.max() + 1e-9).all()


def test_makevalid_fuzz_regressions():
    """Exact falsifying inputs the hypothesis fuzz found (denormal
    near-parallel edges; thin slivers under the one-sided parity
    probe): the repair must preserve even-odd membership on a probe
    grid. These drove the relative-tolerance parallel test and the
    two-sided shrinking probe in make_valid_rings."""
    from gdal_spark import geom
    from gdal_spark.operators import makevalid

    cases = [
        [(0.0, 1.1125369292536007e-308), (-1.0, 0.0), (0.0, 3.0),
         (3.0, 0.0), (-0.5, 0.0)],
        [(-2.0, 1e-05), (2.0078125, 0.0), (0.0, 42.0), (0.0, 0.0),
         (21.0, 0.0)],
        [(1.0, 0.0), (-1.0, 1e-05), (0.0, -35.0), (0.0, 0.0), (2.0, 0.0)],
        [(0.25, 0.0), (4.0, 0.0), (0.0, -1.0),
         (1.0, -5.960464477539063e-08), (0.0, 0.0)],
    ]
    for pts in cases:
        ring = np.array(pts, dtype=np.float64)
        fixed = makevalid.make_valid_rings([ring])
        lo = ring.min(axis=0) - 5.0
        hi = ring.max(axis=0) + 5.0
        gx, gy = np.meshgrid(
            np.linspace(lo[0] + 0.01234, hi[0] - 0.00567, 41),
            np.linspace(lo[1] + 0.00891, hi[1] - 0.01345, 41),
        )
        px, py = gx.ravel(), gy.ravel()
        keep = _min_seg_dist(px, py, ring) > 1e-3
        px, py = px[keep], py[keep]
        before = geom.points_in_rings(px, py, [ring])
        after = (
            geom.points_in_rings(px, py, fixed)
            if fixed
            else np.zeros(len(px), dtype=bool)
        )
        assert np.array_equal(before, after), pts


@settings(max_examples=30, deadline=None)
@given(
    cx=st.floats(min_value=-20.0, max_value=20.0),
    cy=st.floats(min_value=-20.0, max_value=20.0),
    hw=st.floats(min_value=4.0, max_value=15.0),
    hh=st.floats(min_value=4.0, max_value=15.0),
    fx=st.floats(min_value=0.15, max_value=0.6),
    fy=st.floats(min_value=0.15, max_value=0.6),
    bx=st.floats(min_value=-30.0, max_value=30.0),
    by=st.floats(min_value=-30.0, max_value=30.0),
    bw=st.floats(min_value=1.0, max_value=25.0),
    bh=st.floats(min_value=1.0, max_value=25.0),
)
def test_boolop_inclusion_exclusion_holed(
    cx, cy, hw, hh, fx, fy, bx, by, bw, bh
):
    """Inclusion–exclusion where A is an annulus (rect with a rect
    hole) — exercises the hole-aware overlay path."""
    shell = _rect(cx, cy, hw, hh)
    hole = _rect(cx, cy, hw * fx, hh * fy)[::-1]  # CW hole
    A = [(shell, [hole])]
    B = [(_rect(bx, by, bw, bh), [])]
    a = 4 * hw * hh - 4 * (hw * fx) * (hh * fy)
    b = 4 * bw * bh
    try:
        ai = _region_area(boolop.boolean_regions(A, B, "inter"))
        au = _region_area(boolop.boolean_regions(A, B, "union"))
        ad = _region_area(boolop.boolean_regions(A, B, "diff"))
    except boolop.Degeneracy:
        assume(False)
    tol = 1e-8 * max(1.0, a + b)
    assert abs(ai + au - (a + b)) < tol
    assert abs(ad - (a - ai)) < tol


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       n=st.integers(min_value=4, max_value=40))
def test_delaunay_covers_hull_and_empty_circumcircles(seed, n):
    """Triangulation area == convex hull area (no gaps/overlaps) and
    every circumcircle is empty (the Delaunay property), on random
    general-position point sets."""
    from gdal_spark import delaunay as dl

    rng = np.random.default_rng(seed)
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    tris = dl.delaunay(px, py)
    assume(tris)  # degenerate collinear draws are vanishingly rare
    tri_area = 0.0
    for i, j, k in tris:
        tri_area += 0.5 * abs(dl._ccw(px[i], py[i], px[j], py[j], px[k], py[k]))
    # hull area via monotone chain on the same points
    pts = sorted(zip(px, py))
    def half(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out
    hull = half(pts)[:-1] + half(pts[::-1])[:-1]
    hx = np.array([p[0] for p in hull]); hy = np.array([p[1] for p in hull])
    hull_area = 0.5 * abs(float(np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy)))
    assert abs(tri_area - hull_area) < 1e-6 * max(1.0, hull_area)
    for i, j, k in tris:
        for m in range(n):
            if m in (i, j, k):
                continue
            assert not dl._circumcircle_contains(
                px[i], py[i], px[j], py[j], px[k], py[k], px[m], py[m]
            ), (seed, n, (i, j, k), m)


@settings(max_examples=40, deadline=None)
@given(
    lon=st.floats(min_value=-10.0, max_value=15.0),
    lat=st.floats(min_value=38.0, max_value=55.0),
)
def test_srs_lcc_roundtrip(lon, lat):
    p = srs.LCC_REGISTRY[2154]
    x, y = srs.lcc_forward(lon, lat, p)
    lon2, lat2 = srs.lcc_inverse(x, y, p)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    lon=st.floats(min_value=-125.0, max_value=-65.0),
    lat=st.floats(min_value=20.0, max_value=55.0),
)
def test_srs_aea_roundtrip(lon, lat):
    p = srs.AEA_REGISTRY[5070]
    x, y = srs.aea_forward(lon, lat, p)
    lon2, lat2 = srs.aea_inverse(x, y, p)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    lon=st.floats(min_value=-179.0, max_value=179.0),
    lat=st.floats(min_value=-89.5, max_value=-60.0),
)
def test_srs_ps_roundtrip(lon, lat):
    p = srs.PS_REGISTRY[3031]
    x, y = srs.ps_forward(lon, lat, p)
    lon2, lat2 = srs.ps_inverse(x, y, p)
    dl = abs(lon2 - lon)
    dl = min(dl, 360.0 - dl)
    assert dl < 1e-9 and abs(lat2 - lat) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-180.0, max_value=180.0),
            st.floats(min_value=-90.0, max_value=90.0),
        ),
        min_size=3,
        max_size=12,
    ),
    nholes=st.integers(min_value=0, max_value=2),
)
def test_wkb_polygon_roundtrip(pts, nholes):
    from gdal_spark import wkb

    holes = [[(x * 0.1, y * 0.1) for x, y in pts]] * nholes
    data = wkb.encode_polygon(pts, holes)
    geom_type, rings = wkb.decode(data)
    assert geom_type == wkb.POLYGON
    got_ext = [tuple(p) for p in np.asarray(rings[0])]
    want = [tuple(map(float, p)) for p in pts]
    if want[-1] != want[0]:
        want = want + [want[0]]  # encoder closes an open ring
    assert got_ext == want
    assert got_ext[0] == got_ext[-1]
    assert len(rings) == 1 + nholes


@settings(max_examples=25, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=0.5, max_value=31.5),
            st.floats(min_value=0.5, max_value=31.5),
        ),
        min_size=3,
        max_size=3,
    )
)
def test_scanline_fill_matches_pixel_center_pip(pts):
    """GDALRasterizeGeometries default semantics: a pixel burns iff
    its CENTER is inside the polygon — the scanline fill must agree
    with the even-odd PIP kernel at every pixel center (random
    triangles; centers exactly on an edge are measure-zero for these
    draws)."""
    from gdal_spark import scanline

    tri = np.array(pts, dtype=np.float64)
    assume(_tri_area(pts) > 2.0)
    # keep centers off the edges: skip examples with a center within
    # 1e-6 of the linework
    arr = np.zeros((32, 32), dtype=np.float64)
    scanline.fill_polygon(arr, [tri], 1.0)
    cy, cx = np.meshgrid(
        np.arange(32) + 0.5, np.arange(32) + 0.5, indexing="ij"
    )
    d = _min_seg_dist(cx.ravel(), cy.ravel(), tri)
    inside = geom.points_in_rings(cx.ravel(), cy.ravel(), [tri])
    ok = d > 1e-6
    got = arr.ravel() > 0
    assert np.array_equal(got[ok], inside[ok])


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_viewshed_los_monotone_under_terrain_lowering(seed):
    """Line-of-sight monotonicity: lowering any intermediate terrain
    cell can never make a visible target invisible (GDALViewshed's
    defining invariant)."""
    from gdal_spark.operators import viewshed as vs

    rng = np.random.default_rng(seed)
    dem = rng.integers(0, 50, size=(15, 15)).astype(np.float64)
    ox, oy = 7, 7
    targets = [(int(rng.integers(0, 15)), int(rng.integers(0, 15)))
               for _ in range(10)]
    low = dem.copy()
    cells = rng.integers(0, 15, size=(8, 2))
    for cy, cx in cells:
        if (cx, cy) != (ox, oy) and (cx, cy) not in targets:
            low[cy, cx] -= rng.integers(1, 20)
    for tx, ty in targets:
        if (tx, ty) == (ox, oy):
            continue
        if (low[ty, tx] == dem[ty, tx]) and vs.los_visible(dem, ox, oy, tx, ty):
            assert vs.los_visible(low, ox, oy, tx, ty), (seed, tx, ty)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       threshold=st.integers(min_value=2, max_value=6))
def test_sieve_removes_small_and_preserves_large(seed, threshold):
    """GDALSieveFilter invariants: after sieving, no connected
    component smaller than the threshold remains, and components
    already >= threshold keep their value footprint."""
    from gdal_spark.operators import sieve as sv

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 3, size=(20, 20)).astype(np.int64)
    out = sv.sieve_filter(vals.copy(), threshold)

    def components(a):
        seen = np.zeros(a.shape, bool)
        comps = []
        for y in range(a.shape[0]):
            for x in range(a.shape[1]):
                if seen[y, x]:
                    continue
                stack, cells = [(y, x)], []
                seen[y, x] = True
                while stack:
                    cy, cx = stack.pop()
                    cells.append((cy, cx))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < a.shape[0] and 0 <= nx < a.shape[1]
                                and not seen[ny, nx]
                                and a[ny, nx] == a[cy, cx]):
                            seen[ny, nx] = True
                            stack.append((ny, nx))
                comps.append(cells)
        return comps

    for cells in components(out):
        assert len(cells) >= min(threshold, 400), len(cells)
    for cells in components(vals):
        if len(cells) >= threshold:
            y0, x0 = cells[0]
            for y, x in cells:
                assert out[y, x] == vals[y0, x0]


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_tps_interpolates_control_points(seed):
    """Thin-plate spline fundamental property: the fitted surface
    passes EXACTLY through its control points, and reduces to the
    affine map when the targets are affine in the sources."""
    from gdal_spark import gcp

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 12))
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    # min pairwise separation so the RBF system is well-conditioned
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    assume(d2.min() > 1.0)
    t = rng.uniform(-500, 500, n)
    sol = gcp.tps_fit(px, py, t)
    got = gcp.tps_apply_np(sol, px, py, px, py)
    assert np.allclose(got, t, atol=1e-6 * max(1.0, np.abs(t).max()))
    # affine targets -> affine surface everywhere
    a, b, c = rng.uniform(-3, 3, 3)
    sol2 = gcp.tps_fit(px, py, a + b * px + c * py)
    qx = rng.uniform(0, 100, 20)
    qy = rng.uniform(0, 100, 20)
    got2 = gcp.tps_apply_np(sol2, px, py, qx, qy)
    want2 = a + b * qx + c * qy
    assert np.allclose(got2, want2, atol=1e-5 * max(1.0, np.abs(want2).max()))


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_proximity_metric_properties(seed):
    """Proximity transform invariants: zero exactly at targets,
    1-Lipschitz in the euclidean metric between neighboring pixels
    (|sqrt(d2(p)) - sqrt(d2(q))| <= |p-q|), and capped at maxdist^2."""
    from gdal_spark.operators import proximity

    rng = np.random.default_rng(seed)
    targets = (rng.random((16, 16)) < 0.05).astype(np.int64)
    vals = np.ones((16, 16), dtype=np.int64)
    out = proximity.proximity_d2(vals, targets, maxdist=10)
    assert (out[targets > 0] == 0).all()
    assert out.max() <= 100
    d = np.sqrt(np.minimum(out, 100).astype(np.float64))
    assert (np.abs(d[1:, :] - d[:-1, :]) <= 1.0 + 1e-9).all()
    assert (np.abs(d[:, 1:] - d[:, :-1]) <= 1.0 + 1e-9).all()


# ---------------------------------------------------------------------------
# r4-verdict task 7: overlay/boolop on NEAR-DEGENERATE inputs —
# random rectilinear lattices (shared edges, collinear overlaps,
# identical rings: the Greiner–Hormann worst case, exercised through
# the degeneracy-perturbation fallback) and rotated copies, checked
# against an independent slab-decomposition union-area oracle (the
# same decomposition dissolve.py's SQL oracle uses, re-implemented
# here in pure numpy).


def _slab_union_area(rects):
    """Union area of axis-aligned rects [(x0, y0, x1, y1), ...] by
    x-slab decomposition + y-interval merge."""
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    total = 0.0
    for xa, xb in zip(xs, xs[1:]):
        ivals = sorted(
            (r[1], r[3]) for r in rects if r[0] <= xa and r[2] >= xb
        )
        y_cov = 0.0
        cur_lo = cur_hi = None
        for lo, hi in ivals:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    y_cov += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        if cur_hi is not None:
            y_cov += cur_hi - cur_lo
        total += y_cov * (xb - xa)
    return total


def _rect_ring(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], np.float64)


_LATTICE_RECT = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
)


@settings(max_examples=40, deadline=None)
@given(
    cells=st.lists(_LATTICE_RECT, min_size=2, max_size=6),
    theta=st.floats(min_value=0.0, max_value=1.5),
)
def test_boolop_union_lattice_vs_slab_oracle(cells, theta):
    """Integer-lattice rectangles share edges and corners by
    construction (identical rings, collinear overlaps — the GH
    degenerate cases).  Union area via the subtract-fold
    decomposition area(∪ᵢ rᵢ) = Σᵢ area(rᵢ − ∪ⱼ₍ⱼ₎ rⱼ) — each term a
    boolean_regions('diff') chain, the multi-part-capable op — both
    axis-aligned AND rotated, against the slab oracle (union area is
    rotation-invariant)."""
    rects = [
        (10.0 * i, 10.0 * j, 10.0 * (i + w), 10.0 * (j + h))
        for i, j, w, h in cells
    ]
    expect = _slab_union_area(rects)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    for use_rot in (False, True):
        rings = [
            _rect_ring(*r) @ rot.T if use_rot else _rect_ring(*r)
            for r in rects
        ]
        got = 0.0
        try:
            for i, ring in enumerate(rings):
                residual = [(boolop.ensure_ccw(ring), [])]
                for j in range(i):
                    residual = boolop.boolean_regions(
                        residual, [(boolop.ensure_ccw(rings[j]), [])], "diff"
                    )
                    if not residual:
                        break
                got += _region_area(residual)
        except boolop.Degeneracy:
            assume(False)
        assert abs(got - expect) < 1e-4 * max(1.0, expect), (
            use_rot, got, expect
        )


@settings(max_examples=40, deadline=None)
@given(
    a=_LATTICE_RECT, b=_LATTICE_RECT,
    theta=st.floats(min_value=0.0, max_value=1.5),
)
def test_boolop_symdiff_lattice_identity(a, b, theta):
    """symdiff == union - inter on lattice pairs, including the
    fully-degenerate identical-rectangle case (symdiff area 0)."""
    ra = (10.0 * a[0], 10.0 * a[1], 10.0 * (a[0] + a[2]), 10.0 * (a[1] + a[3]))
    rb = (10.0 * b[0], 10.0 * b[1], 10.0 * (b[0] + b[2]), 10.0 * (b[1] + b[3]))
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    A = [(boolop.ensure_ccw(_rect_ring(*ra) @ rot.T), [])]
    B = [(boolop.ensure_ccw(_rect_ring(*rb) @ rot.T), [])]
    try:
        au = _region_area(boolop.boolean_regions(A, B, "union"))
        ai = _region_area(boolop.boolean_regions(A, B, "inter"))
        sd = _region_area(boolop.boolean_regions(A, B, "symdiff"))
    except boolop.Degeneracy:
        assume(False)
    area_a = (ra[2] - ra[0]) * (ra[3] - ra[1])
    area_b = (rb[2] - rb[0]) * (rb[3] - rb[1])
    tol = 1e-4 * max(1.0, area_a + area_b)
    assert abs(au + ai - (area_a + area_b)) < tol
    assert abs(sd - (au - ai)) < tol
