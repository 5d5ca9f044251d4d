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
