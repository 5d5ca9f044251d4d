"""gdal_spark.srs TMD — datum-shifted projected CRS (EPSG:27700).

Independent checks: the Ordnance Survey's published worked example for
the OSGB36 projection (sub-mm), EPSG round-trip invariants for the
geocentric/Helmert legs, and a magnitude gate on the WGS84->OSGB36
datum shift (~50-130 m over Great Britain, per OS "A guide to
coordinate systems in Great Britain").
Reference chain: ogr/ogrct.cpp -> PROJ +proj=tmerc +ellps=airy
+towgs84=446.448,...
"""

import numpy as np

from gdal_spark import srs

P = srs.TMD_REGISTRY[27700]


def test_osgb_projection_matches_os_worked_example():
    # OS worked example (Annexe C): Caister water tower, OSGB36
    # geodetic 52d39'27.2531"N 1d43'4.5177"E -> E 651409.903 m,
    # N 313177.270 m. This gates the TM-on-Airy projection alone
    # (no datum shift): sub-mm.
    lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
    lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
    e, n = srs.tmd_forward(np.array([lon]), np.array([lat]), P)
    assert abs(e[0] - 651409.903) < 1e-3
    assert abs(n[0] - 313177.270) < 1e-3


def test_geocentric_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-8.0, 2.0, 500)
    lat = rng.uniform(49.5, 61.0, 500)
    for a, e2 in ((srs.A, srs.E2), (P.a, P.e2)):
        x, y, z = srs.geodetic_to_cart(lon, lat, a, e2)
        lo, la = srs.cart_to_geodetic(x, y, z, a, e2)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-11


def test_helmert_roundtrip_within_linearization_error():
    # The EPSG reverse (negated parameters) is the linearized inverse;
    # the dominant second-order residual is the scale term
    # (1-m)^2 * R ~ (20.5 ppm)^2 * 6.4e6 m ~ 3 mm, plus scale x
    # rotation cross terms — bounded by 2 cm (measured max 1.3 cm).
    rng = np.random.default_rng(11)
    lon = rng.uniform(-8.0, 2.0, 300)
    lat = rng.uniform(49.5, 61.0, 300)
    x, y, z = srs.geodetic_to_cart(lon, lat, srs.A, srs.E2)
    x2, y2, z2 = srs.helmert_forward(*srs.helmert_inverse(x, y, z, P), P)
    err = np.sqrt((x2 - x) ** 2 + (y2 - y) ** 2 + (z2 - z) ** 2)
    assert err.max() < 2e-2


def test_datum_shift_magnitude_over_gb():
    # WGS84 coords interpreted with vs without the datum shift must
    # differ by the known OSGB36<->WGS84 offset: tens of metres,
    # bounded 40..160 m across Great Britain (largest in the far
    # north; OS guide quotes up to ~120 m on the mainland grid).
    rng = np.random.default_rng(13)
    lon = rng.uniform(-6.0, 1.5, 200)
    lat = rng.uniform(50.0, 58.5, 200)
    e_shift, n_shift = srs.tmd_from_wgs84(lon, lat, P)
    e_raw, n_raw = srs.tmd_forward(lon, lat, P)
    d = np.hypot(e_shift - e_raw, n_shift - n_raw)
    assert d.min() > 40.0 and d.max() < 160.0


def test_stage_list_mirrors_numpy_chain():
    # The dual-dialect stage list (what the Spark query and the DuckDB
    # oracle both execute) must reproduce the numpy chain to sub-mm
    # when evaluated row-wise in Python.
    stages = srs.tmd_stage_list(P, "spark")
    env = {
        "sin": np.sin, "cos": np.cos, "atan2": np.arctan2,
        "sqrt": np.sqrt, "radians": np.radians, "degrees": np.degrees,
        "sinh": np.sinh, "cosh": np.cosh, "atanh": np.arctanh,
        "asinh": np.arcsinh, "ln": np.log, "exp": np.exp,
    }
    rng = np.random.default_rng(17)
    lon = rng.uniform(-6.0, 1.5, 50)
    lat = rng.uniform(50.0, 58.5, 50)
    row = dict(env, lon=lon, lat=lat)
    for col, expr in stages:
        row[col] = eval(  # noqa: S307 - test-only, fixed expressions
            expr.replace("1.0E0", "1.0").replace("0.5E0", "0.5"), row
        )
    e_np, n_np = srs.tmd_from_wgs84(lon, lat, P)
    assert np.abs(row["easting"] - e_np).max() < 1e-3
    assert np.abs(row["northing"] - n_np).max() < 1e-3
