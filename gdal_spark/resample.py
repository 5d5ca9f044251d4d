"""Warp/reproject resampling engine — pure numpy, GDAL-parity.

Reimplements the *semantics* of GDAL's warp kernel (not its code):

- Output-driven inverse mapping: every destination pixel center is
  transformed into continuous source pixel space; the resampler
  gathers the kernel footprint around it
  (alg/gdalwarpkernel.cpp GWKResample, iSrcX = floor(srcX - 0.5),
  delta = srcX - 0.5 - iSrcX).
- Kernel weights (alg/gdalwarpkernel.cpp:3291-3480):
  bilinear 1-|x| (r=1); cubic = Catmull-Rom a=-0.5 (r=2);
  cubicspline = cubic B-spline, normalized by the weight sum (r=2);
  lanczos = sinc(x)*sinc(x/3) (r=3).
- Downsampling widens the kernel: scale = dst/src (snapped to 1/int
  when within 0.05), radius = ceil(filter/scale), weight arg
  (i - delta) * scale (alg/gdalwarpkernel.cpp:1041-1194). Lanczos
  uses GDAL's optimized downsample weights K(i*scale), delta only
  picks the anchor pixel.
- Edge handling: off-image taps are dropped and the accumulator is
  renormalized by the sum of used weights.
- Area resamplers (average/mode/max/min/med/q1/q3/sum/rms) integrate
  the exact source rectangle covered by each destination pixel, with
  fractional edge-pixel weights (GWKAverageOrModeThread,
  alg/gdalwarpkernel.cpp:6330-6500; quantile index
  ceil(q*n - 1) after sort; integer mode = first value to reach the
  max count in scan order).
- Integer outputs round half-up: unsigned (T)(v + 0.5), signed
  floor(v + 0.5), clamped to the dtype range
  (GWKRoundValueT/GWKClampValueT, alg/gdalwarpkernel.cpp:1434-1490).

Golden parity is asserted in tests/test_warp.py against the
reference's own autotest fixtures (autotest/alg/data/utmsmall_*.tiff)
with the same maxdiff<=1 gate the reference uses
(autotest/alg/warp.py:51-108).
"""

from __future__ import annotations

import numpy as np

FILTER_RADIUS = {"bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}
CONV_ALGS = tuple(FILTER_RADIUS)
AREA_ALGS = ("average", "mode", "max", "min", "med", "q1", "q3", "sum", "rms")
ALL_ALGS = ("near",) + CONV_ALGS + AREA_ALGS


# ---------------------------------------------------------------------------
# affine helpers (GDAL 6-double geotransform: x = g0 + px*g1 + py*g2,
#                 y = g3 + px*g4 + py*g5; gcore/gdal.h:1103)


def apply_gt(gt, px, py):
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + px * gt[4] + py * gt[5]


def invert_gt(gt):
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0:
        raise ValueError("non-invertible geotransform")
    inv1 = gt[5] / det
    inv2 = -gt[2] / det
    inv4 = -gt[4] / det
    inv5 = gt[1] / det
    inv0 = -(inv1 * gt[0] + inv2 * gt[3])
    inv3 = -(inv4 * gt[0] + inv5 * gt[3])
    return (inv0, inv1, inv2, inv3, inv4, inv5)


def dst_to_src(dst_gt, src_gt, xd, yd, transform=None):
    """Continuous dst pixel coords -> continuous src pixel coords,
    optionally through a georef->georef ``transform(x, y)`` (e.g.
    inverse WebMercator) between the two affine spaces."""
    gx, gy = apply_gt(dst_gt, xd, yd)
    if transform is not None:
        gx, gy = transform(gx, gy)
    inv = invert_gt(src_gt)
    return apply_gt(inv, gx, gy)


# ---------------------------------------------------------------------------
# kernel weight functions (vectorized)


def kernel_weight(alg: str, x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    if alg == "bilinear":
        return np.where(ax <= 1.0, 1.0 - ax, 0.0)
    if alg == "cubic":
        x2 = x * x
        w1 = x2 * (1.5 * ax - 2.5) + 1.0
        w2 = x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0
        return np.where(ax <= 1.0, w1, np.where(ax <= 2.0, w2, 0.0))
    if alg == "cubicspline":
        # unnormalized B-spline (the 1/6 factor cancels in the
        # weight-sum normalization, as in the reference)
        xp2 = x + 2.0
        xp1 = x + 1.0
        xm1 = x - 1.0
        acc = np.where(xp2 > 0.0, xp2**3, 0.0)
        acc += np.where(xp1 > 0.0, -4.0 * xp1**3, 0.0)
        acc += np.where(x > 0.0, 6.0 * x**3, 0.0)
        acc += np.where(xm1 > 0.0, -4.0 * xm1**3, 0.0)
        return acc
    if alg == "lanczos":
        out = np.ones_like(x)
        nz = x != 0.0
        pix = np.pi * x[nz]
        out[nz] = np.sin(pix) * np.sin(pix / 3.0) / (pix * pix / 3.0)
        ax = np.abs(x)
        return np.where(ax <= 3.0, out, 0.0)
    raise ValueError(f"unknown kernel {alg}")


def _snap_scale(scale: float) -> float:
    """GDAL snaps near-integer reciprocal scales (warp kernel init)."""
    if scale >= 1.0:
        return scale
    recip = 1.0 / scale
    nrecip = int(recip + 0.5)
    if abs(recip - nrecip) < 0.05:
        return 1.0 / nrecip
    return scale


def _round_to_dtype(vals: np.ndarray, dtype) -> np.ndarray:
    dt = np.dtype(dtype)
    if dt.kind == "f":
        return vals.astype(dt)
    info = np.iinfo(dt)
    v = np.clip(vals, info.min, info.max)
    if dt.kind == "u":
        return (v + 0.5).astype(dt)
    return np.floor(v + 0.5).astype(dt)


# ---------------------------------------------------------------------------
# convolution + nearest path


def _warp_conv_band(src, sx, sy, alg, xscale, yscale, src_valid=None):
    """General convolution resample of one band at continuous source
    coords (sx, sy) arrays. Returns float64 values + validity mask.
    ``src_valid``: optional bool mask — invalid (nodata) taps get zero
    weight and the remaining taps renormalize, GDALWarpNoDataMasker
    semantics (alg/gdalwarper.cpp GDALWarpNoDataMasker,
    gdalwarpkernel.cpp tap-skip + density renorm)."""
    h, w = src.shape
    isx = np.floor(sx - 0.5).astype(np.int64)
    isy = np.floor(sy - 0.5).astype(np.int64)
    dx = sx - 0.5 - isx
    dy = sy - 0.5 - isy
    radius = FILTER_RADIUS[alg]
    xr = int(np.ceil(radius / xscale)) if xscale < 1.0 else radius
    yr = int(np.ceil(radius / yscale)) if yscale < 1.0 else radius
    x0 = ((radius + 1) % 2) - xr  # nFiltInitX
    y0 = ((radius + 1) % 2) - yr

    lanczos_ds_x = alg == "lanczos" and xscale < 1.0
    lanczos_ds_y = alg == "lanczos" and yscale < 1.0

    acc = np.zeros(sx.shape, dtype=np.float64)
    accw = np.zeros(sx.shape, dtype=np.float64)
    srcf = src.astype(np.float64)
    for j in range(y0, yr + 1):
        yy = isy + j
        ymask = (yy >= 0) & (yy < h)
        if lanczos_ds_y:
            if abs(j * yscale) > radius:
                continue
            wy = np.full(sy.shape, float(kernel_weight(alg, np.array([j * yscale]))[0]))
        elif yscale < 1.0:
            wy = kernel_weight(alg, (j - dy) * yscale)
        else:
            wy = kernel_weight(alg, j - dy)
        yc = np.clip(yy, 0, h - 1)
        for i in range(x0, xr + 1):
            xx = isx + i
            xmask = (xx >= 0) & (xx < w) & ymask
            if lanczos_ds_x:
                if abs(i * xscale) > radius:
                    continue
                wx = np.full(sx.shape, float(kernel_weight(alg, np.array([i * xscale]))[0]))
            elif xscale < 1.0:
                wx = kernel_weight(alg, (i - dx) * xscale)
            else:
                wx = kernel_weight(alg, i - dx)
            xc = np.clip(xx, 0, w - 1)
            tap_ok = xmask
            if src_valid is not None:
                tap_ok = tap_ok & src_valid[yc, xc]
            wgt = np.where(tap_ok, wx * wy, 0.0)
            acc += srcf[yc, xc] * wgt
            accw += wgt
    valid = accw > 1e-6
    out = np.zeros_like(acc)
    np.divide(acc, accw, out=out, where=valid)
    # GDAL skips the division when the weight sum is ~1; the ratio is
    # within 1e-5 of a no-op there, inside the maxdiff<=1 gate.

    if alg == "cubic" and xscale >= 0.95 and yscale >= 0.95:
        # 4-sample formula path (alg/gdalwarpkernel.cpp:1166,2906):
        # when the 4x4 window is not fully inside the source, GDAL
        # falls back to bilinear at that pixel
        edge = (isx - 1 < 0) | (isx + 2 >= w) | (isy - 1 < 0) | (isy + 2 >= h)
        if edge.any():
            bl, blv = _warp_conv_band(
                src, sx, sy, "bilinear", xscale, yscale, src_valid
            )
            out = np.where(edge, bl, out)
            valid = np.where(edge, blv, valid)
    return out, valid


def _warp_near_band(src, sx, sy, src_valid=None):
    h, w = src.shape
    ix = np.floor(sx + 1e-10).astype(np.int64)
    iy = np.floor(sy + 1e-10).astype(np.int64)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc, iyc = np.clip(ix, 0, w - 1), np.clip(iy, 0, h - 1)
    if src_valid is not None:
        valid = valid & src_valid[iyc, ixc]
    out = src[iyc, ixc].astype(np.float64)
    return np.where(valid, out, 0.0), valid


# ---------------------------------------------------------------------------
# area path (average & friends)


def _area_bounds(x_min, x_max, n):
    """(iMin, iMax) per GWKAverageOrModeThread: floor(min+1e-10)
    clipped, ceil(max-1e-10) clipped, degenerate boxes widened."""
    imin = np.minimum(np.maximum(np.floor(x_min + 1e-10), 0.0), n).astype(np.int64)
    imax = np.minimum(np.ceil(x_max - 1e-10), n).astype(np.int64)
    widen = (imin == imax) & (imax < n)
    imax = imax + widen
    return imin, imax


def _edge_weight(idx, imin, imax, dmin, dmax):
    """Fractional coverage weight of source index ``idx`` inside
    [dmin, dmax] (COMPUTE_WEIGHT of the reference)."""
    single = imin + 1 == imax
    w_first = np.where(single, 1.0, 1.0 - (dmin - imin))
    w_last = 1.0 - (imax - dmax)
    return np.where(
        idx == imin, w_first, np.where(idx + 1 == imax, w_last, 1.0)
    )


def _warp_area_band(src, x0, y0, x1, y1, alg, src_valid=None):
    """Area resample of one band; (x0,y0)-(x1,y1) are the transformed
    dst pixel corner coords in source pixel space (arrays). Invalid
    (nodata) source pixels contribute neither value nor weight."""
    h, w = src.shape
    xlo, xhi = np.minimum(x0, x1), np.maximum(x0, x1)
    ylo, yhi = np.minimum(y0, y1), np.maximum(y0, y1)
    ixmin, ixmax = _area_bounds(xlo, xhi, w)
    iymin, iymax = _area_bounds(ylo, yhi, h)
    nx = int(np.max(ixmax - ixmin)) if ixmax.size else 0
    ny = int(np.max(iymax - iymin)) if iymax.size else 0
    srcf = src.astype(np.float64)

    if alg in ("med", "q1", "q3", "mode"):
        return _warp_area_sortish(
            srcf, ixmin, ixmax, iymin, iymax, nx, ny, alg, src.dtype,
            src_valid,
        )

    tot = np.zeros(x0.shape, dtype=np.float64)
    totw = np.zeros(x0.shape, dtype=np.float64)
    vmax = np.full(x0.shape, -np.inf)
    vmin = np.full(x0.shape, np.inf)
    any_valid = np.zeros(x0.shape, dtype=bool)
    for j in range(ny):
        yy = iymin + j
        ym = yy < iymax
        wy = _edge_weight(yy, iymin, iymax, ylo, yhi)
        yc = np.clip(yy, 0, h - 1)
        for i in range(nx):
            xx = ixmin + i
            m = ym & (xx < ixmax)
            if not m.any():
                continue
            xc = np.clip(xx, 0, w - 1)
            if src_valid is not None:
                m = m & src_valid[yc, xc]
            wgt = np.where(m, _edge_weight(xx, ixmin, ixmax, xlo, xhi) * wy, 0.0)
            v = srcf[yc, xc]
            tot += np.where(m, v * wgt, 0.0)
            totw += wgt
            vmax = np.where(m, np.maximum(vmax, v), vmax)
            vmin = np.where(m, np.minimum(vmin, v), vmin)
            any_valid |= m
    valid = any_valid & (totw > 0)
    out = np.zeros_like(tot)
    if alg == "average":
        np.divide(tot, totw, out=out, where=valid)
    elif alg == "sum":
        out = tot
    elif alg == "rms":
        # weighted mean of squares (re-accumulate squares)
        tot2 = np.zeros_like(tot)
        for j in range(ny):
            yy = iymin + j
            ym = yy < iymax
            wy = _edge_weight(yy, iymin, iymax, ylo, yhi)
            yc = np.clip(yy, 0, h - 1)
            for i in range(nx):
                xx = ixmin + i
                m = ym & (xx < ixmax)
                if not m.any():
                    continue
                xc = np.clip(xx, 0, w - 1)
                if src_valid is not None:
                    m = m & src_valid[yc, xc]
                wgt = np.where(
                    m, _edge_weight(xx, ixmin, ixmax, xlo, xhi) * wy, 0.0
                )
                v = srcf[yc, xc]
                tot2 += np.where(m, v * v * wgt, 0.0)
        np.divide(tot2, totw, out=out, where=valid)
        np.sqrt(out, out=out)
    elif alg == "max":
        out = np.where(valid, vmax, 0.0)
    elif alg == "min":
        out = np.where(valid, vmin, 0.0)
    else:
        raise ValueError(alg)
    return out, valid


def _warp_area_sortish(
    srcf, ixmin, ixmax, iymin, iymax, nx, ny, alg, src_dtype, src_valid=None
):
    """med/q1/q3 (sorted quantile, index ceil(q*n - 1)) and mode
    (first value to reach the max count in scan order). Invalid
    (nodata) pixels are dropped from the box before the sort/scan."""
    h, w = srcf.shape
    out = np.zeros(ixmin.shape, dtype=np.float64)
    valid = np.zeros(ixmin.shape, dtype=bool)
    q = {"q1": 0.25, "med": 0.5, "q3": 0.75}.get(alg)
    flat_shape = ixmin.shape
    it = np.nditer(np.zeros(flat_shape), flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        x0, x1 = int(ixmin[idx]), int(ixmax[idx])
        y0, y1 = int(iymin[idx]), int(iymax[idx])
        if x1 <= x0 or y1 <= y0:
            continue
        box = srcf[y0:y1, x0:x1].ravel()
        if src_valid is not None:
            box = box[src_valid[y0:y1, x0:x1].ravel()]
        if box.size == 0:
            continue
        valid[idx] = True
        if q is not None:
            s = np.sort(box, kind="stable")
            out[idx] = s[int(np.ceil(q * s.size - 1))]
        else:  # mode: first to reach max count in scan order
            counts: dict = {}
            best_v, best_c = box[0], 0
            for v in box:
                c = counts.get(v, 0) + 1
                counts[v] = c
                if c > best_c:
                    best_c, best_v = c, v
            out[idx] = best_v
    return out, valid


# ---------------------------------------------------------------------------
# public API


def _approx_grid(dst_gt, src_gt, dw, dh, transform, tol):
    """Per-scanline linearized dst->src pixel grids (the
    GDALApproxTransformer shape, alg/gdaltransformer.cpp:3615): the
    exact chain is evaluated only at recursively-subdivided control
    points; everything between is linear-interpolated within ``tol``
    source pixels."""
    from . import srs

    def px_fn(xd, yd):
        return dst_to_src(dst_gt, src_gt, xd, yd, transform)

    xs = np.arange(dw, dtype=np.float64) + 0.5
    sx = np.empty((dh, dw))
    sy = np.empty((dh, dw))
    for row in range(dh):
        ax, ay = srs.approx_transform_scanline(
            px_fn, xs, row + 0.5, max_err=tol
        )
        sx[row] = ax
        sy[row] = ay
    return sx, sy


def warp_band(
    src: np.ndarray,
    src_gt,
    dst_gt,
    dst_shape,
    alg: str = "near",
    transform=None,
    out_dtype=None,
    nodata=None,
    approx_tol: float | None = None,
) -> np.ndarray:
    """Warp one 2-D band to the destination grid. ``transform`` maps
    dst georef coords to src georef coords (None = same SRS).
    ``nodata``: source pixels equal to this value are masked out of
    every kernel (taps skipped + weights renormalized,
    GDALWarpNoDataMasker semantics, alg/gdalwarper.h:106); dst pixels
    with no valid tap are written as ``nodata``.
    ``approx_tol``: when set (and a non-affine ``transform`` is in
    play), the dst->src mapping is scanline-linearized to within this
    many source pixels (GDALApproxTransformer; GDAL's default is
    0.125) — applies to the point-sampled kernels (near/conv); the
    area family always transforms its corner grids exactly."""
    dh, dw = dst_shape
    yd, xd = np.mgrid[0:dh, 0:dw].astype(np.float64)
    out_dtype = out_dtype or src.dtype
    src_valid = None if nodata is None else (src != nodata)

    def _finish(vals, valid):
        if nodata is not None:
            vals = np.where(valid, vals, float(nodata))
        return _round_to_dtype(vals, out_dtype)

    if alg in AREA_ALGS:
        x0, y0 = dst_to_src(dst_gt, src_gt, xd, yd, transform)
        x1, y1 = dst_to_src(dst_gt, src_gt, xd + 1.0, yd + 1.0, transform)
        vals, valid = _warp_area_band(src, x0, y0, x1, y1, alg, src_valid)
        return _finish(vals, valid)

    if approx_tol is not None and transform is not None:
        sx, sy = _approx_grid(dst_gt, src_gt, dw, dh, transform, approx_tol)
    else:
        sx, sy = dst_to_src(dst_gt, src_gt, xd + 0.5, yd + 0.5, transform)
    if alg == "near":
        vals, valid = _warp_near_band(src, sx, sy, src_valid)
        return _finish(vals, valid)
    if alg in CONV_ALGS:
        # scale per GDALWarpKernel: dst window size / needed source
        # window size (alg/gdalwarpkernel.cpp:1041), snapped; derived
        # from the corner mapping so crops get the right ratio
        cx0, cy0 = dst_to_src(dst_gt, src_gt, 0.0, 0.0, transform)
        cx1, cy1 = dst_to_src(
            dst_gt, src_gt, float(dw), float(dh), transform
        )
        xscale = _snap_scale(dw / abs(cx1 - cx0)) if cx1 != cx0 else 1.0
        yscale = _snap_scale(dh / abs(cy1 - cy0)) if cy1 != cy0 else 1.0
        vals, valid = _warp_conv_band(src, sx, sy, alg, xscale, yscale, src_valid)
        return _finish(vals, valid)
    raise ValueError(f"unknown resampling {alg!r}")


def warp_image(
    src: np.ndarray, src_gt, dst_gt, dst_shape, alg="near", transform=None,
    nodata=None, approx_tol=None,
) -> np.ndarray:
    """Warp an (h, w) or (h, w, c) array channel-by-channel."""
    if src.ndim == 2:
        return warp_band(
            src, src_gt, dst_gt, dst_shape, alg, transform, nodata=nodata,
            approx_tol=approx_tol,
        )
    return np.stack(
        [
            warp_band(
                src[:, :, c], src_gt, dst_gt, dst_shape, alg, transform,
                nodata=nodata, approx_tol=approx_tol,
            )
            for c in range(src.shape[2])
        ],
        axis=2,
    )
