"""GCP polynomial transformer: the fit must be the least-squares
solution (checked against numpy's independent lstsq), reproduce an
exact polynomial exactly, and the Spark distributed-agg fit must be
bit-identical to the pure-numpy fit."""

import numpy as np

from gdal_spark import gcp


def test_fit_matches_lstsq():
    E, N, xm, ym = gcp.fit_gcp_poly_np()
    px, py, e2, n2 = gcp.gcp_points()
    ec = px - xm
    nc = py - ym
    A = np.stack(
        [np.ones_like(ec), ec, nc, ec * ec, ec * nc, nc * nc], axis=1
    ).astype(np.float64)
    Eref, *_ = np.linalg.lstsq(A, e2.astype(np.float64), rcond=None)
    Nref, *_ = np.linalg.lstsq(A, n2.astype(np.float64), rcond=None)
    assert np.allclose(E, Eref, rtol=1e-9, atol=1e-9)
    assert np.allclose(N, Nref, rtol=1e-9, atol=1e-9)


def test_exact_polynomial_recovered():
    """If the ground coords ARE a quadratic polynomial of the pixel
    coords (no noise), the fit reproduces every GCP exactly."""
    px, py, _, _ = gcp.gcp_points()
    e2 = 10.0 + 2.0 * px - 3.0 * py + 0.25 * px * px
    n2 = -5.0 + 0.5 * px * py
    xm = float(px.sum()) / len(px)
    ym = float(py.sum()) / len(py)
    ec = (px - xm).astype(np.float64)
    nc = (py - ym).astype(np.float64)
    ts = [np.ones_like(ec), ec, nc, ec * ec, ec * nc, nc * nc]
    M = [[float((ts[i] * ts[j]).sum()) for j in range(6)] for i in range(6)]
    a = [float((ts[i] * e2).sum()) for i in range(6)]
    b = [float((ts[i] * n2).sum()) for i in range(6)]
    E, N = gcp.gauss_jordan(M, a, b)
    eh, nh = gcp.georef_apply_np(E, N, xm, ym, px, py)
    assert np.abs(eh - e2).max() < 1e-8
    assert np.abs(nh - n2).max() < 1e-8


def test_spark_fit_bit_identical(spark):
    En, Nn, xmn, ymn = gcp.fit_gcp_poly_np()
    Es, Ns, xms, yms = gcp.fit_gcp_poly_spark(spark)
    assert xms == xmn and yms == ymn
    assert all(a == b for a, b in zip(Es, En))
    assert all(a == b for a, b in zip(Ns, Nn))


def test_residuals_small(spark):
    """The integer pseudo-noise is bounded by 6, so LS residuals at
    the GCPs are below that bound."""
    E, N, xm, ym = gcp.fit_gcp_poly_np()
    px, py, e2, n2 = gcp.gcp_points()
    eh, nh = gcp.georef_apply_np(E, N, xm, ym, px, py)
    assert np.abs(eh - e2).max() < 7.0
    assert np.abs(nh - n2).max() < 5.0


def test_tps_exact_interpolation():
    """TPS passes exactly through every GCP (the defining property;
    thinplatespline.cpp solve() enforces it by construction)."""
    px, py, e2, n2 = gcp.gcp_points()
    se = gcp.tps_fit(px, py, e2)
    sn = gcp.tps_fit(px, py, n2)
    eh = gcp.tps_apply_np(se, px, py, px, py)
    nh = gcp.tps_apply_np(sn, px, py, px, py)
    assert np.abs(eh - e2).max() < 1e-7
    assert np.abs(nh - n2).max() < 1e-7


def test_tps_affine_targets_give_zero_weights():
    """If the targets are an affine function of the sources, the
    kernel weights vanish and TPS degenerates to that affine map."""
    px, py, _, _ = gcp.gcp_points()
    t = 4.0 + 2.5 * px - 1.5 * py
    sol = gcp.tps_fit(px, py, t)
    assert np.abs(sol[3:]).max() < 1e-8
    assert abs(sol[0] - 4.0) < 1e-8
    assert abs(sol[1] - 2.5) < 1e-8
    assert abs(sol[2] + 1.5) < 1e-8


def test_tps_moment_constraints():
    px, py, e2, _ = gcp.gcp_points()
    sol = gcp.tps_fit(px, py, e2)
    w = sol[3:]
    assert abs(w.sum()) < 1e-8
    assert abs((w * px).sum()) < 1e-6
    assert abs((w * py).sum()) < 1e-6


# ---------------------------------------------------------------------------
# gdalwarp -refine_gcps (apps/gdalwarp_lib.cpp; alg/gdal_crs.cpp
# remove_outliers)


def _refine_numpy_replay():
    import numpy as np
    from gdal_spark import gcp

    k = np.arange(gcp.REFINE_K)
    px = (k * 7) % 32
    py = (k * 13) % 32
    e2 = (3000 + 11 * px + 23 * py + px * py - 2 * px * px + ((k * 5) % 7)
          + np.where(k == 16, 400, 0) + np.where(k == 17, -350, 0))
    n2 = (-1500 + 17 * px - 9 * py + 3 * py * py + ((k * 3) % 5)
          + np.where(k == 17, 250, 0) + np.where(k == 16, -300, 0))

    def terms(e, n):
        return [np.ones_like(e), e, n, e * e, e * n, n * n]

    def fit(idx):
        ts = terms(px[idx].astype(float), py[idx].astype(float))
        M = [[float((ts[i] * ts[j]).sum()) for j in range(6)] for i in range(6)]
        a = [float((ts[i] * e2[idx]).sum()) for i in range(6)]
        b = [float((ts[i] * n2[idx]).sum()) for i in range(6)]
        return gcp.gauss_jordan(M, a, b)

    def resid2(E, N):
        ts = terms(px.astype(float), py.astype(float))
        fe = sum(c * t for c, t in zip(E, ts))
        fn = sum(c * t for c, t in zip(N, ts))
        return (e2 - fe) ** 2 + (n2 - fn) ** 2

    keep = np.ones(gcp.REFINE_K, bool)
    removed = {}
    E = N = None
    for rnd in range(gcp.REFINE_ROUNDS):
        E, N = fit(np.where(keep)[0])
        r2 = np.where(keep, resid2(E, N), -1)
        w = int(np.lexsort((k, -r2))[0])
        if r2[w] <= gcp.REFINE_TOL2:
            break
        keep[w] = False
        removed[w] = rnd
    return keep, removed, resid2(E, N)


def test_refine_gcps_drops_exactly_the_injected_outliers(spark):
    from gdal_spark import gcp

    rows = {r.k: r for r in gcp.refine_gcps_query(spark).collect()}
    keep, removed, final_r2 = _refine_numpy_replay()
    assert removed == {16: 0, 17: 1}  # the injected outliers, in order
    for i in range(gcp.REFINE_K):
        assert rows[i].kept == int(keep[i])
        assert rows[i].removed_round == removed.get(i, -1)
        import numpy as np
        assert rows[i].resid_mm == int(np.floor(final_r2[i] * 1000 + 0.0005))
    # survivors sit within tolerance (squared)
    for i in range(gcp.REFINE_K):
        if keep[i]:
            assert final_r2[i] <= gcp.REFINE_TOL2


def test_refine_converges_before_round_limit():
    """Round 3 must remove nothing (the clean quadratic set is within
    tolerance) — the unrolled oracle depends on this fixpoint."""
    keep, removed, _ = _refine_numpy_replay()
    assert int(keep.sum()) == gcp.REFINE_K - 2
    assert len(removed) == 2


def test_gcps2wld_matches_lstsq(spark):
    """World-file lines agree with numpy's float least-squares affine
    fit to ~1e-6, and the pixel-size sign conventions hold."""
    import numpy as np

    from gdal_spark import gcp

    got = {
        r.line_no: r.val_key / 1e6
        for r in gcp.gcps2wld_query(spark).collect()
    }
    px, py, e2, n2 = gcp.gcp_points()
    A = np.stack([np.ones_like(px), px, py], axis=1).astype(np.float64)
    E, *_ = np.linalg.lstsq(A, e2.astype(np.float64), rcond=None)
    N, *_ = np.linalg.lstsq(A, n2.astype(np.float64), rcond=None)
    exp = [
        E[1], N[1], E[2], N[2],
        E[0] + 0.5 * E[1] + 0.5 * E[2],
        N[0] + 0.5 * N[1] + 0.5 * N[2],
    ]
    for i, v in enumerate(exp):
        assert abs(got[i + 1] - v) < 2e-6, (i, got[i + 1], v)
