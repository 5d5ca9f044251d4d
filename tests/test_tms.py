"""OGC TileMatrixSet profile parsing + tile math."""

import numpy as np

from gdal_spark import tms


def test_json_parse_and_conventions():
    prof = tms.TileMatrixSet.from_json(tms.CUSTOM_PROFILE)
    assert prof.crs_epsg == 3857
    assert len(prof.matrices) == 3
    tm = prof.matrices[0]
    # resolution = scaleDenominator * 0.28mm (tilematrixset.cpp:268)
    assert tm.res == 250_000_000.0 * 0.28e-3
    assert tm.tile_width == 512


def test_tile_of_affine_truth():
    tm = tms.TileMatrix(
        id="t", scale_denominator=1000.0 / tms.OGC_PIXEL,
        top_left=(-100.0, 200.0), tile_width=10, tile_height=20,
        matrix_width=50, matrix_height=40,
    )
    assert tm.res == 1000.0
    # span x = 10000, span y = 20000
    tx, ty = tm.tile_of([-100.0, -90001.0 + 100000.0, 5.0e4], [200.0, 0.0, -1.0e5])
    assert tx.tolist() == [0, 1, 5]
    assert ty.tolist() == [0, 0, 5]
    # clipping
    tx2, ty2 = tm.tile_of([1e12], [-1e12])
    assert tx2[0] == 49 and ty2[0] == 39


def test_sql_twin_matches_numpy():
    import duckdb

    prof = tms.TileMatrixSet.from_json(tms.CUSTOM_PROFILE)
    tm = prof.matrices[2]
    con = duckdb.connect()
    n = 5000
    d = con.execute(
        "SELECT -20000000.0E0 + 40000000.0E0 * ((i*0.6180339887498949E0) "
        "- floor(i*0.6180339887498949E0)) AS x, "
        "-20000000.0E0 + 40000000.0E0 * ((i*0.41421356237309515E0) "
        "- floor(i*0.41421356237309515E0)) AS y, "
        f"{tm.tile_sql('x', 'y', 'x')} AS tx, "
        f"{tm.tile_sql('x', 'y', 'y')} AS ty "
        f"FROM range(1, {n + 1}) r(i)"
    ).df()
    tx, ty = tm.tile_of(d["x"].to_numpy(), d["y"].to_numpy())
    assert (d["tx"].to_numpy() == tx).all()
    assert (d["ty"].to_numpy() == ty).all()


def test_crs_object_form_and_geodetic_mpu():
    """TMS 2.0 object-form crs + derived metersPerUnit for geographic
    CRSes (r2 crashed on the dict and defaulted mpu to 1)."""
    import numpy as np

    from gdal_spark import tms

    doc = {
        "id": "GeodeticLike",
        "crs": {"uri": "http://www.opengis.net/def/crs/EPSG/0/4326"},
        "tileMatrices": [
            {
                "id": "0",
                # res should be 0.703125 deg/px-ish when mpu is the
                # degree arc length
                "scaleDenominator": 279541132.0143589,
                "topLeftCorner": [-180.0, 90.0],
                "tileWidth": 256,
                "tileHeight": 256,
                "matrixWidth": 2,
                "matrixHeight": 1,
            }
        ],
    }
    prof = tms.TileMatrixSet.from_json(doc)
    assert prof.crs_epsg == 4326
    tm = prof.matrices[0]
    assert abs(tm.meters_per_unit - 111319.49079327358) < 1e-6
    assert abs(tm.res - 0.703125) < 1e-9
    tx, ty = tm.tile_of(np.array([-90.0]), np.array([45.0]))
    assert (int(tx[0]), int(ty[0])) == (0, 0)
    tx, ty = tm.tile_of(np.array([90.0]), np.array([0.0]))
    assert (int(tx[0]), int(ty[0])) == (1, 0)
