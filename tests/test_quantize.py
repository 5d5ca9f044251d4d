"""Median cut + Floyd-Steinberg dither invariants."""

import numpy as np

from gdal_spark import codecs, synth
from gdal_spark.operators import quantize
from tests.conftest import SF_DIR


def test_palette_passthrough():
    """An image that already uses <= n distinct colors reconstructs
    exactly (palette covers it, dither finds exact matches)."""
    colors = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 0], [255, 255, 255]])
    idx = np.random.default_rng(1).integers(0, 4, size=(16, 16))
    arr = colors[idx].astype(np.uint8)
    # enough budget for median cut to isolate every distinct color
    # (unbalanced counts can need several splits per color)
    pal = quantize.median_cut_palette(arr, 64)
    out = quantize.dither_fs(arr, pal)
    assert np.array_equal(pal[out], arr)


def test_palette_size_and_error():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
    pal = quantize.median_cut_palette(arr, 16)
    assert len(pal) <= 16
    out = quantize.dither_fs(arr, pal)
    recon = pal[out]
    mse = ((recon.astype(float) - arr.astype(float)) ** 2).mean()
    # 16 colors on uniform noise: error bounded well below variance
    assert mse < ((255**2) / 12)
    # determinism
    assert np.array_equal(out, quantize.dither_fs(arr, pal))


def test_dither_diffuses_error():
    """A constant mid-gray image with a 2-color palette must dither
    to a mix whose mean approximates the input."""
    arr = np.full((32, 32, 3), 128, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    out = quantize.dither_fs(arr, pal)
    frac_white = out.mean()
    assert 0.45 <= frac_white <= 0.55


def test_dither_fixed_matches_direct_numpy(spark):
    """The driver entry's keys recomputed straight from dither_fs on
    the decoded crop."""
    import __spark_entry__ as m

    out = (
        m.queries()["dither_fs_fixed"](spark, SF_DIR)
        .toPandas()
        .set_index("image_id")
    )
    imgs = synth.add_pixels(
        synth.images_df(spark, 64).filter("i < 4")
    ).toPandas()
    assert len(out) == 4
    for _, r in imgs.iterrows():
        arr = codecs.decode_image(bytes(r["bytes"]))[
            : quantize.DITHER_N, : quantize.DITHER_N, :3
        ]
        idx = quantize.dither_fs(arr, quantize.FIXED_PAL).flatten().astype(int)
        p = np.arange(len(idx)) + 1
        row = out.loc[r.image_id]
        assert row.used_n == len(np.unique(idx))
        assert row.idx_sum == idx.sum()
        assert row.idx_wsum == (idx * p).sum()


def test_pct2rgb_channel_sums(spark):
    """pct2rgb = histogram(idx) . palette: the per-channel sums must
    equal the index histogram times the palette columns."""
    import __spark_entry__ as m

    out = (
        m.queries()["pct2rgb"](spark, SF_DIR).toPandas().set_index("image_id")
    )
    imgs = synth.add_pixels(
        synth.images_df(spark, 64).filter("i < 4")
    ).toPandas()
    assert len(out) == 4
    for _, r in imgs.iterrows():
        arr = codecs.decode_image(bytes(r["bytes"]))[
            : quantize.DITHER_N, : quantize.DITHER_N, :3
        ]
        idx = quantize.dither_fs(arr, quantize.FIXED_PAL).flatten()
        hist = np.bincount(idx, minlength=16).astype(np.int64)
        pal = quantize.FIXED_PAL.astype(np.int64)
        row = out.loc[r.image_id]
        assert row.r_sum == int((hist * pal[:, 0]).sum())
        assert row.g_sum == int((hist * pal[:, 1]).sum())
        assert row.b_sum == int((hist * pal[:, 2]).sum())
