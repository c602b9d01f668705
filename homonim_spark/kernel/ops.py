"""Pure-numpy pixel-level primitives.

The reference implements these with OpenCV (``cv2.boxFilter`` /
``cv2.sqrBoxFilter`` / ``cv2.erode``) and rasterio (``warp.reproject``,
``fill.fillnodata``).  Neither library is a dependency here: every primitive
is re-derived in numpy with identical zero-border semantics, using integral
images (exact, O(HW) independent of kernel size — the numpy analogue of the
reference's DFT-for-large-kernels note at
``/root/reference/homonim/kernel_model.py:51-53``).

These run *inside* Arrow-batched pandas UDFs only — never on the driver for
real data.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def box_sum(arr: np.ndarray, kernel_shape: Tuple[int, int]) -> np.ndarray:
    """Unnormalized sliding-window sum with constant-zero borders.

    Semantics match ``cv2.boxFilter(arr, -1, ksize, normalize=False,
    borderType=cv2.BORDER_CONSTANT)`` as used throughout the reference
    (``/root/reference/homonim/kernel_model.py:255-258,331-342``): the kernel
    is centered (odd shapes only — enforced upstream like the reference's
    ``utils.validate_kernel_shape``), pixels outside the array count as 0.

    Accumulates in float64 (integral image) and returns float32.
    """
    kh, kw = int(kernel_shape[0]), int(kernel_shape[1])
    if kh == 1 and kw == 1:
        return arr.astype(np.float32, copy=True)
    return _box_sum_clipped(arr, kh, kw, kh // 2, kw // 2)


def _box_sum_clipped(arr: np.ndarray, kh: int, kw: int, ph: int, pw: int) -> np.ndarray:
    h, w = arr.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = arr
    np.cumsum(ii, axis=0, out=ii)
    np.cumsum(ii, axis=1, out=ii)
    r0 = np.clip(np.arange(h) - ph, 0, h)
    r1 = np.clip(np.arange(h) - ph + kh, 0, h)
    c0 = np.clip(np.arange(w) - pw, 0, w)
    c1 = np.clip(np.arange(w) - pw + kw, 0, w)
    out = ii[np.ix_(r1, c1)] - ii[np.ix_(r0, c1)] - ii[np.ix_(r1, c0)] + ii[np.ix_(r0, c0)]
    return out.astype(np.float32)


def sqr_box_sum(arr: np.ndarray, kernel_shape: Tuple[int, int]) -> np.ndarray:
    """``cv2.sqrBoxFilter`` analogue: sliding sum of squares, zero border."""
    return box_sum(arr * arr, kernel_shape)


def erode_rect(mask: np.ndarray, se_shape: Tuple[int, int]) -> np.ndarray:
    """Binary erosion by a centered rectangular structuring element with
    constant-zero border — matches ``cv2.erode(mask, MORPH_RECT(se),
    borderType=BORDER_CONSTANT, borderValue=0)`` as used by the reference's
    full-coverage (partial) masking
    (``/root/reference/homonim/kernel_model.py:407-408``).

    A pixel survives iff every pixel under the SE is 1 — i.e. the box sum of
    the 0/1 mask equals the SE area.
    """
    sh, sw = int(se_shape[0]), int(se_shape[1])
    s = box_sum(mask.astype(np.float32), (sh, sw))
    return (s >= (sh * sw) - 0.5).astype(np.uint8)


def downsample_average(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Integer-factor block-mean downsample with NaN-aware averaging.

    At the engine's canonical aligned grids this is exactly rasterio's
    ``Resampling.average`` with nodata=NaN (the reference's default
    downsampling, ``/root/reference/homonim/kernel_model.py:100``): nodata
    pixels are excluded from the mean; all-nodata blocks stay NaN.
    """
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    h, w = arr.shape
    assert h % fh == 0 and w % fw == 0, "tile not divisible by resample factor"
    # strided slice-adds instead of reshape+float64 nansum: ~4x less memory
    # traffic (the fuse group stage is bandwidth-bound); f² ≤ ~16 float32
    # adds per output pixel lose no precision that matters here
    valid = ~np.isnan(arr)
    v = np.where(valid, arr, np.float32(0.0))
    tot = np.zeros((h // fh, w // fw), dtype=np.float32)
    cnt = np.zeros((h // fh, w // fw), dtype=np.float32)
    for i in range(fh):
        for j in range(fw):
            tot += v[i::fh, j::fw]
            cnt += valid[i::fh, j::fw]
    out = np.full((h // fh, w // fw), np.nan, dtype=np.float32)
    np.divide(tot, cnt, out=out, where=cnt > 0)
    return out


def block_mean(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Plain block mean (nodata-naive) — used for mask coverage fractions,
    mirroring the reference's mask reproject with ``nodata=None`` +
    ``Resampling.average`` (``/root/reference/homonim/kernel_model.py:396-399``)."""
    fh, fw = int(factor[0]), int(factor[1])
    h, w = arr.shape
    out = np.zeros((h // fh, w // fw), dtype=np.float32)
    for i in range(fh):
        for j in range(fw):
            out += arr[i::fh, j::fw]
    out /= np.float32(fh * fw)
    return out


def upsample_nearest(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Integer-factor nearest upsample (Kronecker).

    DOCUMENTED DEVIATION: the reference upsamples parameters with
    ``Resampling.cubic_spline`` by default
    (``/root/reference/homonim/kernel_model.py:101``).  On the engine's
    aligned grids with spatially-smooth parameters the difference is well
    inside the reference's own test tolerances (abs 2 on corrected values,
    ``tests/test_fuse_api.py:114``); nearest is deterministic, exact at
    identity, and has no halo requirement.  A bilinear variant is provided
    below for smoother parameter fields.
    """
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    h, w = arr.shape
    out = np.empty((h * fh, w * fw), dtype=np.float32)
    for i in range(fh):  # strided assigns: ~10x faster than np.kron
        for j in range(fw):
            out[i::fh, j::fw] = arr
    return out


def upsample_bilinear(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Integer-factor bilinear upsample on pixel-center alignment (edge
    clamped). NaN propagates through interpolation like rasterio.

    Separable phase decomposition: for integer factors the interpolation
    weights repeat with period f, so the whole upsample is fh row passes +
    fh·fw strided column blends of float32 views — no fancy indexing, no
    float64 temporaries (the float64 ``np.ix_`` formulation measured ~2.5×
    slower on the fuse group stage; this is the hot apply path)."""
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    h, w = arr.shape
    a = np.ascontiguousarray(arr, dtype=np.float32)
    out = np.empty((h * fh, w * fw), dtype=np.float32)

    def phase(f: int, i: int):
        """(pair_offset, weight): output phase i interpolates input k+off →
        k+off+1 with this weight (edge handled by clamped shifts)."""
        o = (i + 0.5) / f - 0.5
        return (-1, np.float32(1.0 + o)) if o < 0 else (0, np.float32(o))

    for i in range(fh):
        roff, wy = phase(fh, i)
        if roff < 0:
            r0 = np.vstack([a[:1], a[:-1]])   # clamped up-shift
            r1 = a
        else:
            r0 = a
            r1 = np.vstack([a[1:], a[-1:]])   # clamped down-shift
        ri = r0 * (np.float32(1.0) - wy) + r1 * wy if wy != 0 else r0
        for j in range(fw):
            coff, wx = phase(fw, j)
            if coff < 0:
                c0 = np.hstack([ri[:, :1], ri[:, :-1]])
                c1 = ri
            else:
                c0 = ri
                c1 = np.hstack([ri[:, 1:], ri[:, -1:]])
            out[i::fh, j::fw] = (c0 * (np.float32(1.0) - wx) + c1 * wx
                                 if wx != 0 else c0)
    return out


def upsample_bilinear_masked(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """NaN-safe integer-factor bilinear upsample (normalized convolution).

    Plain bilinear propagates NaN into every output pixel whose 2×2 support
    touches nodata — at mask borders this eats a ring of valid output.  Here
    NaN inputs get zero weight instead (interpolate value·mask / mask), and
    output validity follows the *nearest* input pixel, matching how the
    reference masks reprojected parameters by the proc-grid mask
    (``/root/reference/homonim/kernel_model.py:138-140,396-409``).
    """
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    valid = ~np.isnan(arr)
    if valid.all():
        # fully-valid fast path (the common interior-chunk case): one
        # bilinear pass instead of value+weight passes + nearest mask
        return upsample_bilinear(arr, factor)
    v = np.where(valid, arr, np.float32(0.0)).astype(np.float32)
    num = upsample_bilinear(v, factor)
    den = upsample_bilinear(valid.astype(np.float32), factor)
    out = np.full(num.shape, np.nan, dtype=np.float32)
    np.divide(num, den, out=out, where=den > np.float32(1e-6))
    nv = upsample_nearest(valid.astype(np.float32), factor) >= 0.5
    out[~nv] = np.nan
    return out


def _shift_rows(a: np.ndarray, s: int) -> np.ndarray:
    """result[k] = a[clamp(k+s)] (edge-replicate shift along axis 0)."""
    if s == 0:
        return a
    if s > 0:
        return np.vstack([a[s:], np.repeat(a[-1:], s, axis=0)])
    return np.vstack([np.repeat(a[:1], -s, axis=0), a[:s]])


def _shift_cols(a: np.ndarray, s: int) -> np.ndarray:
    if s == 0:
        return a
    if s > 0:
        return np.hstack([a[:, s:], np.repeat(a[:, -1:], s, axis=1)])
    return np.hstack([np.repeat(a[:, :1], -s, axis=1), a[:, :s]])


def _catmull_rom_weights(t: float):
    """4-tap cubic-convolution weights at fraction ``t`` (a = −0.5, the
    Catmull-Rom spline — interpolating, reproduces linears exactly)."""
    t = float(t)
    t2, t3 = t * t, t * t * t
    return (np.float32(-0.5 * t3 + t2 - 0.5 * t),
            np.float32(1.5 * t3 - 2.5 * t2 + 1.0),
            np.float32(-1.5 * t3 + 2.0 * t2 + 0.5 * t),
            np.float32(0.5 * t3 - 0.5 * t2))


def _lanczos_weights(t: float, a: int = 3):
    """2a-tap Lanczos weights at fraction ``t``: w(d) = sinc(d)·sinc(d/a)
    for taps at distances d = t + (a−1) − m, m = 0..2a−1, normalized to
    sum 1 (the standard partition-of-unity correction for the windowed
    sinc).  a = 3 matches GDAL's ``Resampling.lanczos``."""
    d = float(t) + np.arange(a - 1, -a - 1, -1, dtype=np.float64)
    w = np.sinc(d) * np.sinc(d / a)
    w /= w.sum()
    return w.astype(np.float32)


def upsample_lanczos(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Integer-factor separable Lanczos-3 upsample on pixel-center
    alignment, edge-replicate borders — the analogue of the reference's
    ``Resampling.lanczos`` option (``raster_array.py:526-578`` exposes the
    full rasterio resampling enum; the engine's model paths default to
    cubic/average like the reference defaults, lanczos is the sharpest
    opt-in).  Same phase-decomposition strategy as :func:`upsample_cubic`:
    weights repeat with period f, so each pass is 6 clamped shifts per
    phase."""
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    h, w = arr.shape
    a = np.ascontiguousarray(arr, dtype=np.float32)
    out = np.empty((h * fh, w * fw), dtype=np.float32)

    def phase(f: int, i: int):
        o = (i + 0.5) / f - 0.5
        b = int(np.floor(o))
        return b, o - b

    row_cache = {}
    for i in range(fh):
        br, ty = phase(fh, i)
        wy = _lanczos_weights(ty)
        ri = row_cache.get((br, round(ty, 12)))
        if ri is None:
            ri = sum(wy[m] * _shift_rows(a, br - 2 + m) for m in range(6))
            row_cache[(br, round(ty, 12))] = ri
        for j in range(fw):
            bc, tx = phase(fw, j)
            wx = _lanczos_weights(tx)
            out[i::fh, j::fw] = sum(
                wx[m] * _shift_cols(ri, bc - 2 + m) for m in range(6))
    return out


def upsample_lanczos_masked(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """NaN-safe Lanczos-3 upsample (normalized convolution +
    nearest-validity), mirroring :func:`upsample_cubic_masked`; lanczos
    negative lobes are larger than cubic's, so the same enlarged
    weight-sum guard applies."""
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    valid = ~np.isnan(arr)
    if valid.all():
        return upsample_lanczos(arr, factor)
    v = np.where(valid, arr, np.float32(0.0)).astype(np.float32)
    num = upsample_lanczos(v, factor)
    den = upsample_lanczos(valid.astype(np.float32), factor)
    out = np.full(num.shape, np.nan, dtype=np.float32)
    np.divide(num, den, out=out, where=np.abs(den) > np.float32(1e-3))
    nv = upsample_nearest(valid.astype(np.float32), factor) >= 0.5
    out[~nv] = np.nan
    return out


def upsample_cubic(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """Integer-factor separable cubic (Catmull-Rom) upsample on pixel-center
    alignment, edge-replicate borders — the engine's smooth-interpolation
    analogue of the reference's default ``Resampling.cubic_spline``
    parameter upsampling (``/root/reference/homonim/kernel_model.py:101``).
    Same phase-decomposition strategy as :func:`upsample_bilinear`:
    weights repeat with period f, so the pass is 4 clamped shifts per phase.
    """
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    h, w = arr.shape
    a = np.ascontiguousarray(arr, dtype=np.float32)
    out = np.empty((h * fh, w * fw), dtype=np.float32)

    def phase(f: int, i: int):
        o = (i + 0.5) / f - 0.5
        b = int(np.floor(o))
        return b, o - b

    row_cache = {}
    for i in range(fh):
        br, ty = phase(fh, i)
        wy = _catmull_rom_weights(ty)
        ri = row_cache.get((br, round(ty, 12)))
        if ri is None:
            ri = sum(wy[m] * _shift_rows(a, br - 1 + m) for m in range(4))
            row_cache[(br, round(ty, 12))] = ri
        for j in range(fw):
            bc, tx = phase(fw, j)
            wx = _catmull_rom_weights(tx)
            out[i::fh, j::fw] = sum(
                wx[m] * _shift_cols(ri, bc - 1 + m) for m in range(4))
    return out


def upsample_cubic_masked(arr: np.ndarray, factor: Tuple[int, int]) -> np.ndarray:
    """NaN-safe cubic upsample (normalized convolution + nearest-validity),
    mirroring :func:`upsample_bilinear_masked`: NaN inputs get zero weight,
    output validity follows the nearest input pixel.  Note cubic weights are
    signed, so the weight-sum guard is larger than bilinear's."""
    fh, fw = int(factor[0]), int(factor[1])
    if fh == 1 and fw == 1:
        return arr.astype(np.float32, copy=True)
    valid = ~np.isnan(arr)
    if valid.all():
        return upsample_cubic(arr, factor)
    v = np.where(valid, arr, np.float32(0.0)).astype(np.float32)
    num = upsample_cubic(v, factor)
    den = upsample_cubic(valid.astype(np.float32), factor)
    out = np.full(num.shape, np.nan, dtype=np.float32)
    np.divide(num, den, out=out, where=np.abs(den) > np.float32(1e-3))
    nv = upsample_nearest(valid.astype(np.float32), factor) >= 0.5
    out[~nv] = np.nan
    return out


def param_upsampler(name: str):
    """proc→src parameter upsampling dispatch (``KernelModelParams.
    param_interp``): nearest (exact/fast), bilinear (NaN-safe smooth
    default), cubic (Catmull-Rom — the reference's cubic-spline analogue;
    needs 2 px of halo context, i.e. kernels ≥ 3 for chunk-invariance)."""
    return {"nearest": upsample_nearest,
            "bilinear": upsample_bilinear_masked,
            "cubic": upsample_cubic_masked,
            "lanczos": upsample_lanczos_masked}[name]


def fill_nodata(arr: np.ndarray, valid_mask: np.ndarray,
                max_search: int = 100) -> np.ndarray:
    """Inverse-distance-weighted fill of pixels where ``valid_mask`` is
    False, matching the semantics of rasterio/GDAL ``fillnodata`` that the
    reference uses for offset inpainting
    (``/root/reference/homonim/kernel_model.py:366``): each nodata pixel
    takes the 1/distance-weighted average of the nearest valid pixel in
    each of the four axis directions within ``max_search`` px (GDAL's
    default search distance; smoothing_iterations=0, the reference's
    call).  Four vectorized scanline passes — O(h·w), no iteration to a
    fixed point (the previous nearest-front mean fill was a documented
    deviation; this removes it).  Pixels with no valid pixel in reach keep
    their input value, like GDAL."""
    out = arr.astype(np.float32, copy=True)
    h, w = arr.shape
    v = np.where(valid_mask, arr.astype(np.float64), np.nan)
    vsum = np.zeros((h, w))
    wsum = np.zeros((h, w))

    def accumulate(val, dist):
        ok = (dist > 0) & (dist <= max_search) & ~np.isnan(val)
        wgt = np.where(ok, 1.0 / np.where(ok, dist, 1.0), 0.0)
        np.add(vsum, np.where(ok, wgt * val, 0.0), out=vsum)
        np.add(wsum, wgt, out=wsum)

    for axis, reverse in ((1, False), (1, True), (0, False), (0, True)):
        val = np.full((h, w), np.nan)
        dist = np.full((h, w), np.inf)
        n_lines = w if axis == 1 else h
        other = h if axis == 1 else w
        last_val = np.full(other, np.nan)
        last_d = np.full(other, np.inf)
        idx = range(n_lines - 1, -1, -1) if reverse else range(n_lines)
        for i in idx:
            line_valid = valid_mask[:, i] if axis == 1 else valid_mask[i]
            line_v = v[:, i] if axis == 1 else v[i]
            last_d = last_d + 1
            last_val = np.where(line_valid, line_v, last_val)
            last_d = np.where(line_valid, 0.0, last_d)
            if axis == 1:
                val[:, i] = last_val
                dist[:, i] = last_d
            else:
                val[i] = last_val
                dist[i] = last_d
        accumulate(val, dist)

    fill = (~valid_mask) & (wsum > 0)
    out[fill] = (vsum[fill] / wsum[fill]).astype(np.float32)
    return out
