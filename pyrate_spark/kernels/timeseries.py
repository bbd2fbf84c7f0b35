"""Per-key time-series inversion kernel.

Re-expresses the reference's per-pixel SBAS inversion
(/root/reference/pyrate/core/timeseries.py) as a function of one key's
observation vectors. Semantics preserved exactly:

- design matrix rows carry the per-interval year-fractions between the
  two epoch ids of each observation (timeseries.py:60-75);
- rank-deficiency repair loop via pivoted QR (timeseries.py:160-199);
- method 2 = SVD / Moore-Penrose pseudoinverse (timeseries.py:214-222,
  Berardino et al. 2002);
- method 1 = Laplacian-smoothed finite difference (timeseries.py:225-289,
  Schmidt & Buergmann 2003) with first/last constraint rows and
  cholesky(pinv(vcm)) whitening;
- velocities equal to exactly 0 become NaN, then tsincr = tsvel * span
  and tscuml = cumsum (timeseries.py:149-157);
- fewer than pthresh valid obs => all-NaN (timeseries.py:180,210-211).
"""

from __future__ import annotations

import numpy as np

from pyrate_spark.kernels.linalg import pivoted_qr


def design_matrix(ifirst: np.ndarray, isecond: np.ndarray, span: np.ndarray,
                  nvelpar: int) -> np.ndarray:
    """b0_mat[nobs, nvelpar]; row i has span[ifirst:isecond] in its
    interval slots, sign-flipped when the pair is reversed
    (timeseries.py:69-75)."""
    nobs = len(ifirst)
    b0 = np.zeros((nobs, nvelpar), dtype=np.float64)
    lo = np.minimum(ifirst, isecond)
    hi = np.maximum(ifirst, isecond)
    for i in range(nobs):
        b0[i, lo[i]:hi[i]] = span[lo[i]:hi[i]]
    rev = np.where(ifirst > isecond)[0]
    b0[rev, :] = -b0[rev, :]
    return b0


def _remove_rank_def_rows(b_mat, nvelpar, ifgv, sel):
    """timeseries.py:160-170 verbatim semantics (scipy qr -> pivoted_qr)."""
    _, _, e_var = pivoted_qr(b_mat)
    rank = np.linalg.matrix_rank(b_mat)
    licols = e_var[rank:nvelpar]
    rmrow, _ = np.where(b_mat[:, licols] != 0)
    rmrow = np.unique(rmrow)
    b_mat = np.delete(b_mat, rmrow, axis=0)
    ifgv = np.delete(ifgv, rmrow)
    sel = np.delete(sel, rmrow)
    return b_mat, ifgv, sel, rmrow


def _solve_ts_svd(nvelpar, velflag, ifgv, b_mat):
    """timeseries.py:214-222."""
    tsvel = np.full(nvelpar, np.nan, dtype=np.float32)
    tsvel[velflag != 0] = np.dot(np.linalg.pinv(b_mat), ifgv)
    return tsvel


def _solve_ts_lap(nvelpar, velflag, ifgv, mat_b, smorder, smfactor, sel, vcmt):
    """timeseries.py:225-289; smfactor is already 10**config value."""
    nlap = nvelpar - smorder
    b_lap0 = np.zeros((nlap, nvelpar))
    for i in range(nlap):
        if smorder == 1:
            b_lap0[i, i:i + 2] = [-1, 1]
        else:
            b_lap0[i, i:i + 3] = [1, -2, 1]
    b_lap0 *= smfactor

    nvelleft = int(np.count_nonzero(velflag))
    nlap = nvelleft - smorder

    b_lap1 = -np.ones(nvelleft) / (nvelleft - 1)
    b_lap1[0] = 1.0
    b_lapn = -np.ones(nvelleft) / (nvelleft - 1)
    b_lapn[-1] = 1.0

    b_lap = np.empty((nlap + 2, nvelleft))
    b_lap[0, :] = b_lap1
    b_lap[1:nlap + 1, :] = b_lap0[0:nlap, 0:nvelleft]
    b_lap[-1, :] = b_lapn
    nlap += 2

    mat_b = np.concatenate((mat_b, b_lap), axis=0)
    obsv = np.concatenate((ifgv, np.zeros(nlap)), axis=0)

    m = len(sel)
    nobs = m + nlap
    vcm_tmp = np.eye(nobs)
    vcm_tmp[:m, :m] = vcmt[sel, np.vstack(sel)]

    w = np.linalg.cholesky(np.linalg.pinv(vcm_tmp)).T
    wb = np.dot(w, mat_b)
    wl = np.dot(w, obsv)
    x = np.dot(np.linalg.pinv(wb, rcond=1e-8), wl)

    tsvel = np.full(nvelpar, np.nan, dtype=np.float32)
    tsvel[~np.isclose(velflag, 0.0, atol=1e-8)] = x[:nvelleft]
    return tsvel


def time_series_pixel(phase: np.ndarray, ifirst: np.ndarray,
                      isecond: np.ndarray, spans: np.ndarray, *,
                      method: int = 1, pthresh: int = 0, smorder: int = 2,
                      smfactor_log10: float = -0.25,
                      vcmt: np.ndarray | None = None,
                      mst_sel: np.ndarray | None = None,
                      interp: int = 0):
    """Full per-key inversion: returns (tsvel, tsincr, tscuml), each
    (nepochs-1,) float32. NaN phase values are excluded via the default
    mst mask (timeseries.py:81-82).

    spans: year-offsets of the sorted unique epochs (len = nepochs).
    """
    phase = np.asarray(phase, dtype=np.float64)
    nvelpar = len(spans) - 1
    span = np.diff(np.asarray(spans, dtype=np.float64))
    b0 = design_matrix(np.asarray(ifirst), np.asarray(isecond), span, nvelpar)

    if mst_sel is None:
        mst_sel = ~np.isnan(phase)
    sel = np.nonzero(np.asarray(mst_sel))[0]

    nanvec = np.full(nvelpar, np.nan, dtype=np.float32)
    if len(sel) < max(pthresh, 1):
        return nanvec, nanvec.copy(), nanvec.copy()

    ifgv = phase[sel]
    b_mat = b0[sel, :]

    if interp == 0:
        rmrow = np.asarray([0])
        while len(rmrow) > 0:
            if b_mat.shape[0] > 1:
                b_mat, ifgv, sel, rmrow = _remove_rank_def_rows(
                    b_mat, nvelpar, ifgv, sel)
            else:
                return nanvec, nanvec.copy(), nanvec.copy()
        velflag = np.sum(np.abs(b_mat), axis=0)
        b_mat = b_mat[:, ~np.isclose(velflag, 0.0)]
    else:
        velflag = np.ones(nvelpar)

    if method == 1:
        if vcmt is None:
            vcmt = np.eye(len(phase))
        tsvel = _solve_ts_lap(nvelpar, velflag, ifgv, b_mat, smorder,
                              10.0 ** smfactor_log10, sel, vcmt)
    elif method == 2:
        tsvel = _solve_ts_svd(nvelpar, velflag, ifgv, b_mat)
    else:
        raise ValueError("method must be 1 (Laplacian) or 2 (SVD)")

    # timeseries.py:149-157
    tsvel = np.where(tsvel == 0, np.nan, tsvel)
    tsincr = (tsvel * span).astype(np.float32)
    tscuml = np.cumsum(tsincr).astype(np.float32)
    # cumsum of NaN-bearing vector propagates NaN, as numpy cumsum does
    # in the reference (cumsum over axis=2, timeseries.py:153)
    return tsvel.astype(np.float32), tsincr, tscuml
