"""Temporal autocovariance maxvar + exponential decay alpha (A11).

Graft of /root/reference/pyrate/core/covariance.py:65-196 (cvd /
cvd_from_phase): the reference computes the radial autocovariance of a
2D interferogram by the spectral method (Wiener-Khinchin) and fits
maxvar*exp(-alpha*r); the web graft's field is the per-url regular
TIME grid, so the same pipeline runs in 1D — NaN->0, |FFT|^2, inverse
FFT, normalise by the non-zero sample count (covariance.py:228-234),
fftshift, keep the first half of lags (covariance.py:140-147), maxvar
= max(acg) (covariance.py:193-194), and the alpha fit binned exactly
like covariance.py:175-190 with a deterministic Nelder-Mead standing
in for scipy.optimize.fmin (same objective, same x0, same tolerances).

The legacy oracle values of the reference's tests/test_covariance.py
:179-243 require its GDAL ingest chain (not available in this
runtime); parity here is established mathematically instead — the FFT
path must equal the direct circular-autocovariance sum (tested), which
is also what the SQL correctness oracle computes.
"""

from __future__ import annotations

import numpy as np


def _fmin_1d(obj, x0: float, xtol: float = 1e-6, ftol: float = 1e-6,
             maxiter: int = 200) -> float:
    """Deterministic 1-D Nelder-Mead with scipy fmin's defaults
    (initial simplex x0 and x0*1.05 — or 0.00025 when x0 == 0 —
    reflection/expansion/contraction/shrink coefficients 1/2/0.5/0.5)."""
    s = [x0, x0 * 1.05 if x0 != 0 else 0.00025]
    f = [obj(s[0]), obj(s[1])]
    for _ in range(maxiter):
        if f[0] > f[1]:
            s = s[::-1]
            f = f[::-1]
        if abs(s[1] - s[0]) <= xtol and abs(f[1] - f[0]) <= ftol:
            break
        xr = 2 * s[0] - s[1]               # reflect worst over best
        fr = obj(xr)
        if fr < f[0]:
            xe = 3 * s[0] - 2 * s[1]       # expand
            fe = obj(xe)
            s[1], f[1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < f[1]:
            s[1], f[1] = xr, fr
        else:
            xc = s[0] - 0.5 * (s[0] - s[1])   # contract toward best
            fc = obj(xc)
            if fc < f[1]:
                s[1], f[1] = xc, fc
            else:                              # shrink
                s[1] = s[0] + 0.5 * (s[1] - s[0])
                f[1] = obj(s[1])
    return s[0] if f[0] <= f[1] else s[1]


def autocov_grid(x: np.ndarray, nzc: int) -> np.ndarray:
    """fftshift(real(ifft(|fft(x)|^2)))/nzc — the 1D Wiener-Khinchin
    circular autocovariance (covariance.py:228-255)."""
    pspec = np.real(np.fft.fft(x)) ** 2 + np.imag(np.fft.fft(x)) ** 2
    return np.fft.fftshift(np.real(np.fft.ifft(pspec))) / nzc


def cvd_from_series(x: np.ndarray, dt: float = 1.0,
                    calc_alpha: bool = False):
    """(maxvar, alpha) of one regular-grid series. ``dt`` is the grid
    step in the distance unit of alpha (days here, km in the
    reference); missing samples NaN (zeroed like covariance.py:150-152).
    """
    x = np.asarray(x, dtype=np.float64)
    x = np.where(np.isnan(x), 0.0, x)
    n = len(x)
    nzc = int(np.count_nonzero(x))
    if n < 2 or nzc == 0:
        return np.nan, np.nan
    acg_full = autocov_grid(x, nzc)
    centre = n // 2
    r = np.abs(np.arange(n) - centre).astype(np.float64) * dt
    keep = int(np.ceil(n / 2.0)) + 1          # covariance.py:146-147
    keep = min(keep, n)
    acg, r = acg_full[:keep], r[:keep]
    m = r < (centre + 1) * dt                 # covariance.py:154-165
    acg, r = acg[m], r[m]
    maxvar = float(np.max(acg))
    if not calc_alpha:
        return maxvar, None
    bin_width = 2.0 * dt                      # covariance.py:176
    rbin = np.ceil(r / bin_width).astype(int)
    maxbin = int(rbin.max()) - 1              # covariance.py:180
    if maxbin < 1:
        return maxvar, np.nan
    rb = np.arange(maxbin + 1) * bin_width
    cv = np.array([acg[rbin == b].mean() if np.any(rbin == b) else np.nan
                   for b in range(maxbin + 1)])
    ok = np.isfinite(cv)
    mx = cv[0]

    def obj(a):
        return float(np.linalg.norm(cv[ok] - mx * np.exp(-a * rb[ok])))

    alpha = _fmin_1d(obj, x0=2.0 / (maxbin * bin_width))
    return maxvar, float(alpha)


def nn_fill_1d(x: np.ndarray) -> np.ndarray:
    """Nearest-neighbour NaN fill — the 1-D analog of the reference's
    pre-FFT interpolation (aps.py:232-244 _interpolate_nans_2d with
    method='nearest'). Equidistant ties break toward the LOWER index
    (deterministic; scipy's KDTree tie order is arbitrary, so the graft
    pins it). Returns a filled copy; all-NaN input returned as-is."""
    x = np.asarray(x, dtype=np.float64)
    good = np.flatnonzero(~np.isnan(x))
    if good.size == 0 or good.size == x.size:
        return x.copy()
    n = x.size
    idx = np.arange(n)
    pos = np.searchsorted(good, idx)
    left = good[np.clip(pos - 1, 0, good.size - 1)]
    right = good[np.clip(pos, 0, good.size - 1)]
    nearest = np.where(np.abs(idx - left) <= np.abs(right - idx),
                       left, right)
    out = x.copy()
    nan = np.isnan(x)
    out[nan] = x[nearest[nan]]
    return out


def gaussian_lowpass_grid(grid: np.ndarray, dt: float, cutoff: float,
                          nanfill: bool = True) -> np.ndarray:
    """1-D graft of the reference's spectral Gaussian low-pass
    (aps.py:266-318 gaussian_spatial_filter): NaN-mask the input,
    nearest-neighbour fill, FFT, multiply the fftshifted spectrum by
    ``exp(-0.5*(dist/sigma)^2)`` where ``dist = |i - n//2| * dt`` and
    ``sigma = std(dist) / cutoff`` (aps.py:298-311), inverse FFT, take
    the real part, re-insert NaNs (aps.py:315-317). Documented
    deviations: the field is the key's 1-D regular TIME grid (dt in
    days, cutoff in days) instead of a 2-D image in km, and the
    transform runs circularly over the key's own grid length instead
    of the reference's fixed zero-pad to 4096 (aps.py:290-293) — the
    pad there approximates linear convolution on an open image; a time
    grid has no analogous frame."""
    x = np.asarray(grid, dtype=np.float64)
    n = x.size
    mask = np.isnan(x)
    if n < 3 or mask.all():
        return x.copy()
    x = nn_fill_1d(x) if nanfill else np.where(mask, 0.0, x)
    c = n // 2
    dist = np.abs(np.arange(n) - c).astype(np.float64) * dt
    sigma = float(np.std(dist)) * (1.0 / cutoff)
    if sigma == 0.0:
        out = x
    else:
        wgt = np.exp(-0.5 * (dist / sigma) ** 2)
        xf = np.fft.fftshift(np.fft.fft(x))
        out = np.real(np.fft.ifft(np.fft.ifftshift(xf * wgt)))
    out = out.copy()
    out[mask] = np.nan
    return out


def series_to_grid(ts_seconds: np.ndarray, values: np.ndarray,
                   bucket_seconds: int):
    """(grid, t0): bucket-mean regular grid from the key's min to max
    bucket; empty buckets NaN. The per-key tiling step of the graft."""
    b = (ts_seconds // bucket_seconds).astype(np.int64)
    b0, b1 = int(b.min()), int(b.max())
    n = b1 - b0 + 1
    sums = np.zeros(n)
    cnts = np.zeros(n)
    ok = np.isfinite(values)
    np.add.at(sums, b[ok] - b0, values[ok])
    np.add.at(cnts, b[ok] - b0, 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        grid = np.where(cnts > 0, sums / cnts, np.nan)
    return grid, b0 * bucket_seconds
