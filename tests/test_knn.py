"""kNN cell-ring expansion == brute force, including the hot-cell
sites and the far-from-everything site."""

import pytest

from gdal_spark import synth
from gdal_spark.operators.knn import knn, knn_bruteforce


@pytest.mark.parametrize("k", [1, 4, 16])
def test_knn_matches_bruteforce(spark, k):
    imgs = synth.images_df(spark, 1024)
    sites_pdf = synth.sites_pdf(32)
    sites_df = spark.createDataFrame(sites_pdf)

    got = knn(imgs, sites_pdf, k).collect()
    exp = knn_bruteforce(imgs, sites_df, k).collect()

    def key(rows):
        return {(r.site_id, r.rank): (r.i, r.d2) for r in rows}

    gk, ek = key(got), key(exp)
    assert set(gk) == set(ek)
    for kk in ek:
        assert gk[kk][0] == ek[kk][0], kk
        assert gk[kk][1] == ek[kk][1], kk  # bit-identical distances
    # every site got exactly k results
    sites = {r.site_id for r in exp}
    assert len(sites) == 32
    assert len(exp) == 32 * k


def test_knn_df_path_10k_sites(spark):
    """Large site tables route through the DataFrame-native running
    top-k (knn.py round-2 merged per-round candidates driver-side in
    pandas): 10k sites, no driver materialization of candidates, same
    answers as brute force."""
    import numpy as np
    import pandas as pd

    imgs = synth.images_df(spark, 2048)
    n = 10_000
    j = np.arange(n)
    u = (j * 0.7548776662466927) % 1.0
    v = (j * 0.5698402909980532) % 1.0
    sites_pdf = pd.DataFrame(
        {
            "site_id": [f"s{i:05d}" for i in j],
            "slon": -170.0 + 340.0 * u,
            "slat": -80.0 + 160.0 * v,
        }
    )
    got = knn(imgs, sites_pdf, 3, zoom=3).toPandas()
    exp = knn_bruteforce(
        imgs, spark.createDataFrame(sites_pdf), 3
    ).toPandas()
    got = got.sort_values(["site_id", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["site_id", "rank"]).reset_index(drop=True)
    assert len(got) == n * 3
    assert (got["i"].to_numpy() == exp["i"].to_numpy()).all()
    assert (got["d2"].to_numpy() == exp["d2"].to_numpy()).all()
