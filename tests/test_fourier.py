"""Distributed 2-D DFT vs numpy's FFT: the fixed-point two-stage
transform must agree with numpy.fft.fft2 within the documented
quantization budget, and Parseval must hold."""

import numpy as np

from tests.conftest import SF_DIR

from gdal_spark import codecs, synth
from gdal_spark.operators import fourier


def _images(spark, max_i):
    imgs = synth.images_df(spark, 64)
    return synth.add_pixels(imgs.filter(f"i < {max_i}"))


def test_dft2d_matches_numpy_fft2(spark):
    got = fourier.dft2d(_images(spark, fourier.DFT_MAX_I)).toPandas()
    pdf = synth.images_pdf(fourier.DFT_MAX_I)
    for _, img in pdf.iterrows():
        arr = codecs.make_pixels(int(img["i"]), int(img["w"]), int(img["h"]))
        if img["fmt"] == "jpeg":
            arr = codecs.decode_image(
                codecs.encode_image(arr, "jpeg")
            )
        v = arr[:, :, 0].astype(np.float64)
        h, w = v.shape
        ref = np.fft.fft2(v).T  # numpy fft2 is [v, u]; ours is (u, v)
        sub = got[got["image_id"] == img["image_id"]]
        assert len(sub) == w * h
        re = np.zeros((w, h)); im = np.zeros((w, h))
        re[sub["u"], sub["v"]] = sub["re2"] / fourier.DFT_SCALE
        im[sub["u"], sub["v"]] = sub["im2"] / fourier.DFT_SCALE
        # error budget: stage-1 floor (w per bin) propagated through
        # h taps + tap quantization (<= 2*255*w*h*1e-6) + final fdiv
        tol = (w * h + 2 * 255 * w * h + h) / 1e6 + 1.0
        assert np.abs(re - ref.real).max() < tol, img["image_id"]
        assert np.abs(im - ref.imag).max() < tol, img["image_id"]
        # Parseval: sum |F|^2 == w*h * sum |f|^2 (to the same budget)
        pf = (re ** 2 + im ** 2).sum() / (w * h)
        assert abs(pf - (v ** 2).sum()) / (v ** 2).sum() < 1e-3
