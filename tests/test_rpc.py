"""RPC transformer: forward model sanity + iterative inverse
roundtrip at the reference's iteration budget."""

import numpy as np

from gdal_spark import rpc


def test_forward_center_maps_near_offsets():
    px, ln = rpc.rpc_forward_np(rpc.LONG_OFF, rpc.LAT_OFF, rpc.HEIGHT_OFF)
    # at the normalization origin all terms but c0 vanish: the result
    # is (c0_num/c0_den)*scale + off + 0.5
    assert abs(px - (0.004 * rpc.SAMP_SCALE + rpc.SAMP_OFF + 0.5)) < 1e-9
    assert abs(ln - (-0.002 * rpc.LINE_SCALE + rpc.LINE_OFF + 0.5)) < 1e-9


def test_denominators_bounded():
    """The synthetic model keeps both denominators in [0.95, 1.05] on
    the normalized cube (the RPC validity contract)."""
    u = np.linspace(-1.0, 1.0, 9)
    L, P, H = np.meshgrid(u, u, u)
    t = rpc._terms_np(L.ravel(), P.ravel(), H.ravel())
    for den in (rpc.SAMP_DEN, rpc.LINE_DEN):
        v = rpc._rpc_evaluate_np(t, den)
        assert v.min() > 0.95 and v.max() < 1.05


def test_inverse_roundtrip():
    rng = np.linspace(-0.75, 0.75, 12)
    L, P = np.meshgrid(rng, rng)
    lon = rpc.LONG_OFF + rpc.LONG_SCALE * L.ravel()
    lat = rpc.LAT_OFF + rpc.LAT_SCALE * P.ravel()
    h = np.full_like(lon, rpc.HEIGHT_OFF + 100.0)
    px, ln = rpc.rpc_forward_np(lon, lat, h)
    lo, la = rpc.rpc_inverse_np(px, ln, h)
    # sub-micro-degree after 10 linearized iterations
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_forward_monotone_in_lon():
    lon = np.linspace(rpc.LONG_OFF - 0.1, rpc.LONG_OFF + 0.1, 50)
    lat = np.full_like(lon, rpc.LAT_OFF)
    h = np.full_like(lon, rpc.HEIGHT_OFF)
    px, _ = rpc.rpc_forward_np(lon, lat, h)
    assert (np.diff(px) > 0).all()
