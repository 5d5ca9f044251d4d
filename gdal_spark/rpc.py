"""RPC (rational polynomial coefficient) transformer.

The reference's RPC model (alg/gdal_rpc.cpp) maps ground
(long, lat, height) to image (pixel, line) through ratios of two
cubic 20-term polynomials over NORMALIZED coordinates
(RPCComputeTerms:199 fixes the term basis; RPCEvaluate:? sums
even/odd-index products in two accumulators; RPCTransformPoint:367
normalizes inputs, divides num/den and denormalizes with the
+0.5 center-of-pixel shift). The image->ground direction has no
closed form; GDALRPCTransform iterates a linearized update
(gdal_rpc.cpp:1142, RPC_MAX_ITERATIONS).

Spark shape: the forward transform is pure arithmetic (+ * /) — a
whole-stage-codegen map expression with NO libm calls, so the DuckDB
oracle is bit-exact (term order and the two-accumulator summation
are replicated verbatim). The inverse is vectorized numpy for the
pytest roundtrip.
"""

from __future__ import annotations

import numpy as np

from .synth import flit

# deterministic synthetic RPC00B-style model: a dominant affine part
# plus bounded higher-order distortion; denominators stay within
# [0.95, 1.05] on the normalized cube so the ratio is well-behaved
LONG_OFF, LONG_SCALE = -122.35, 0.15
LAT_OFF, LAT_SCALE = 37.55, 0.12
HEIGHT_OFF, HEIGHT_SCALE = 200.0, 500.0
SAMP_OFF, SAMP_SCALE = 6000.0, 6200.0
LINE_OFF, LINE_SCALE = 4500.0, 4600.0


def _coef(base: list[tuple[int, float]]) -> list[float]:
    c = [0.0] * 20
    for i, v in base:
        c[i] = v
    return c


SAMP_NUM = _coef(
    [(0, 0.004), (1, 1.020), (2, -0.275), (3, 0.0091), (4, 0.00312),
     (5, -0.00178), (6, 0.00095), (7, 0.00214), (8, -0.00153),
     (9, 0.00042), (10, 0.00021), (11, 0.00033), (12, -0.00027),
     (13, 0.00012), (14, 0.00018), (15, -0.00011), (16, 0.00007),
     (17, 0.00009), (18, -0.00006), (19, 0.00003)]
)
SAMP_DEN = _coef(
    [(0, 1.0), (1, 0.0021), (2, -0.0017), (3, 0.0006), (4, 0.0004),
     (7, 0.0003), (8, -0.0002), (11, 0.0001)]
)
LINE_NUM = _coef(
    [(0, -0.002), (1, 0.298), (2, 1.015), (3, -0.0083), (4, -0.00271),
     (5, 0.00153), (6, -0.00088), (7, 0.00192), (8, 0.00147),
     (9, -0.00038), (10, -0.00019), (11, 0.00029), (12, 0.00024),
     (13, -0.00011), (14, 0.00016), (15, 0.00010), (16, -0.00006),
     (17, 0.00008), (18, 0.00005), (19, -0.00003)]
)
LINE_DEN = _coef(
    [(0, 1.0), (1, -0.0019), (2, 0.0023), (3, -0.0005), (5, 0.0003),
     (8, 0.0002), (9, -0.0001), (15, 0.0001)]
)


def _terms_np(L, P, H):
    """RPCComputeTerms order (gdal_rpc.cpp:199): L=norm long,
    P=norm lat, H=norm height."""
    return [
        np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P,
        H * H, L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
        P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
    ]


def _terms_sql(L: str, P: str, H: str) -> list[str]:
    return [
        "1.0E0", L, P, H, f"({L} * {P})", f"({L} * {H})", f"({P} * {H})",
        f"({L} * {L})", f"({P} * {P})", f"({H} * {H})",
        f"({L} * {P} * {H})", f"({L} * {L} * {L})", f"({L} * {P} * {P})",
        f"({L} * {H} * {H})", f"({L} * {L} * {P})", f"({P} * {P} * {P})",
        f"({P} * {H} * {H})", f"({L} * {L} * {H})", f"({P} * {P} * {H})",
        f"({H} * {H} * {H})",
    ]


def _rpc_evaluate_np(terms, coefs):
    """RPCEvaluate's two-accumulator summation, replicated exactly:
    sum1 accumulates even indices in order, sum2 odd, result
    sum1 + sum2."""
    s1 = np.zeros_like(terms[0])
    s2 = np.zeros_like(terms[0])
    for i in range(0, 20, 2):
        s1 = s1 + terms[i] * coefs[i]
        s2 = s2 + terms[i + 1] * coefs[i + 1]
    return s1 + s2


def _rpc_evaluate_sql(terms: list[str], coefs: list[float]) -> str:
    s1 = " + ".join(f"{terms[i]} * {flit(coefs[i])}" for i in range(0, 20, 2))
    s2 = " + ".join(f"{terms[i]} * {flit(coefs[i])}" for i in range(1, 20, 2))
    return f"(({s1}) + ({s2}))"


def rpc_forward_np(lon, lat, h):
    """(long, lat, height) -> (pixel, line), RPCTransformPoint
    semantics (no dateline wrap needed for the synthetic extent)."""
    L = (np.asarray(lon, np.float64) - LONG_OFF) / LONG_SCALE
    P = (np.asarray(lat, np.float64) - LAT_OFF) / LAT_SCALE
    H = (np.asarray(h, np.float64) - HEIGHT_OFF) / HEIGHT_SCALE
    t = _terms_np(L, P, H)
    x = _rpc_evaluate_np(t, SAMP_NUM) / _rpc_evaluate_np(t, SAMP_DEN)
    y = _rpc_evaluate_np(t, LINE_NUM) / _rpc_evaluate_np(t, LINE_DEN)
    return x * SAMP_SCALE + SAMP_OFF + 0.5, y * LINE_SCALE + LINE_OFF + 0.5


def rpc_forward_sql(lon: str, lat: str, h: str) -> tuple[str, str]:
    """Dual-dialect SQL twin of rpc_forward_np — pure + * / so the
    two engines agree bit-for-bit."""
    L = f"((({lon}) - {flit(LONG_OFF)}) / {flit(LONG_SCALE)})"
    P = f"((({lat}) - {flit(LAT_OFF)}) / {flit(LAT_SCALE)})"
    H = f"((({h}) - {flit(HEIGHT_OFF)}) / {flit(HEIGHT_SCALE)})"
    t = _terms_sql(L, P, H)
    x = f"({_rpc_evaluate_sql(t, SAMP_NUM)} / {_rpc_evaluate_sql(t, SAMP_DEN)})"
    y = f"({_rpc_evaluate_sql(t, LINE_NUM)} / {_rpc_evaluate_sql(t, LINE_DEN)})"
    return (
        f"({x} * {flit(SAMP_SCALE)} + {flit(SAMP_OFF)} + 0.5E0)",
        f"({y} * {flit(LINE_SCALE)} + {flit(LINE_OFF)} + 0.5E0)",
    )


RPC_MAX_ITERATIONS = 10  # the reference's default iteration budget


def rpc_inverse_np(pixel, line, h):
    """(pixel, line, height) -> (long, lat): linearized iteration as
    in GDALRPCTransform's reverse path (gdal_rpc.cpp:1142): build the
    pixel/line -> long/lat linear approximation at the image center
    from the forward model, then iterate forward + linear residual
    correction."""
    pixel = np.asarray(pixel, np.float64)
    line = np.asarray(line, np.float64)
    h = np.asarray(h, np.float64)
    # finite-difference jacobian of forward at the nominal center
    eps = 1e-6
    x0, y0 = rpc_forward_np(LONG_OFF, LAT_OFF, HEIGHT_OFF)
    xl, yl = rpc_forward_np(LONG_OFF + eps, LAT_OFF, HEIGHT_OFF)
    xp, yp = rpc_forward_np(LONG_OFF, LAT_OFF + eps, HEIGHT_OFF)
    dxdl, dydl = (xl - x0) / eps, (yl - y0) / eps
    dxdp, dydp = (xp - x0) / eps, (yp - y0) / eps
    det = dxdl * dydp - dxdp * dydl
    lon = np.full_like(pixel, LONG_OFF)
    lat = np.full_like(pixel, LAT_OFF)
    for _ in range(RPC_MAX_ITERATIONS):
        px, ln = rpc_forward_np(lon, lat, h)
        rx, ry = pixel - px, line - ln
        lon = lon + (rx * dydp - ry * dxdp) / det
        lat = lat + (ry * dxdl - rx * dydl) / det
    return lon, lat


# ---------------------------------------------------------------------------
# driver query: forward-project a deterministic ground grid

GRID_N = 32  # lon x lat grid
GRID_H = 4  # height levels


def _ground_sql(i: str, j: str, k: str) -> tuple[str, str, str]:
    """Ground coords from integer grid indices; (2*i - 31)/38.75
    spans the normalized range [-0.8, 0.8] (38.75 = 31/0.8 is exact
    in binary fp), heights span +/-0.6."""
    lon = (
        f"({flit(LONG_OFF)} + {flit(LONG_SCALE)} * "
        f"(cast(2 * ({i}) - 31 as double) / 38.75E0))"
    )
    lat = (
        f"({flit(LAT_OFF)} + {flit(LAT_SCALE)} * "
        f"(cast(2 * ({j}) - 31 as double) / 38.75E0))"
    )
    h = (
        f"({flit(HEIGHT_OFF)} + {flit(HEIGHT_SCALE)} * "
        f"(cast(2 * ({k}) - 3 as double) / 5.0E0))"
    )
    return lon, lat, h


def rpc_project_query(spark) -> "DataFrame":
    """One row per ground grid point: micro-pixel-quantized image
    coordinates. Pure Catalyst (+ * / only — bit-exact vs the
    oracle)."""
    n = GRID_N * GRID_N * GRID_H
    lon, lat, h = _ground_sql(
        f"id % {GRID_N}", f"(id div {GRID_N}) % {GRID_N}",
        f"id div {GRID_N * GRID_N}",
    )
    px, ln = rpc_forward_sql(lon, lat, h)
    return spark.range(n).selectExpr(
        "cast(id as bigint) AS gid",
        f"cast(floor({px} * 1000000.0E0) as bigint) AS px_u",
        f"cast(floor({ln} * 1000000.0E0) as bigint) AS line_u",
    )


def oracle_rpc_project() -> str:
    n = GRID_N * GRID_N * GRID_H
    lon, lat, h = _ground_sql(
        f"id % {GRID_N}", f"(id // {GRID_N}) % {GRID_N}",
        f"id // {GRID_N * GRID_N}",
    )
    px, ln = rpc_forward_sql(lon, lat, h)
    return (
        f"SELECT cast(id as bigint) AS gid, "
        f"cast(floor({px} * 1000000.0E0) as bigint) AS px_u, "
        f"cast(floor({ln} * 1000000.0E0) as bigint) AS line_u "
        f"FROM range(0, {n}) t(id)"
    )
