"""Per-key iterative weighted least-squares stacking (rate estimation).

Exact semantics of the reference's stack_rate_pixel
(/root/reference/pyrate/core/stack.py:92-165): whiten by the cholesky
factor of the observation VCM, solve the 1-parameter LSQ via pivoted QR,
iteratively drop the worst residual while max(|w r|) > nsig, give up
below pthresh observations. mask_rate semantics from stack.py:62-89.
"""

from __future__ import annotations

import numpy as np

from pyrate_spark.kernels.linalg import pivoted_qr


def stack_rate_pixel(obs: np.ndarray, mst: np.ndarray, vcmt: np.ndarray,
                     span: np.ndarray, nsig: float, pthresh: int):
    """obs: (nifgs,) with NaN replaced by 0 upstream (stack.py:179);
    mst: (nifgs,) bool selection; span: (1, nifgs) time spans in years.
    Returns (rate, error, samples)."""
    obs = np.asarray(obs, dtype=np.float64)
    span = np.atleast_2d(np.asarray(span, dtype=np.float64))
    ind = np.nonzero(np.asarray(mst).ravel())[0]
    default_no_samples = len(ind)

    diag_vcm = not (vcmt - np.diag(np.diagonal(vcmt))).any()

    while len(ind) >= pthresh:
        ifgv = obs[ind]
        B = span[:, ind]

        if diag_vcm:
            # diagonal VCM fast path: all the cholesky/inv factorisations
            # below reduce to elementwise scaling — O(n) instead of
            # O(n^3), which is what makes hot keys (thousands of obs)
            # feasible; identical math to the general branch
            d = np.diagonal(vcmt)[ind]
            sqd = np.sqrt(d)
            A = (B.T / sqd[:, None])
            b = ifgv / sqd
            Q, R, _ = pivoted_qr(A)
            z = Q.conj().T.dot(b)
            v = np.linalg.solve(R, np.atleast_1d(z))
            err2 = (B * (B / d)).sum()
            err = np.array([np.sqrt(1.0 / err2)])
            r = (B * v) - ifgv
            wr = np.abs(r / sqd)
        else:
            vcm_temp = vcmt[ind, np.vstack(ind)]
            # lower cholesky (stack.py:129, scipy cholesky(x, 1))
            T = np.linalg.cholesky(vcm_temp)
            A = np.linalg.solve(T, B.T)
            b = np.linalg.solve(T, ifgv.T)

            Q, R, _ = pivoted_qr(A)
            z = Q.conj().T.dot(b)
            v = np.linalg.solve(R, np.atleast_1d(z))

            err1 = np.linalg.inv(vcm_temp).dot(B.conj().T)
            err2 = B.dot(err1)
            err = np.sqrt(np.diag(np.linalg.inv(err2)))

            r = (B * v) - ifgv
            # reference stack.py:153 uses scipy cholesky default = UPPER
            # factor U (inv(V) = U^H U); numpy returns lower L, so .T
            w = np.linalg.cholesky(np.linalg.inv(vcm_temp)).T
            wr = np.abs(np.dot(w, r.T))

        max_val = wr.max()
        if max_val > nsig:
            ind = np.delete(ind, wr.argmax())
        else:
            return float(v[0]), float(err[0]), int(ifgv.shape[0])
    return np.nan, np.nan, int(default_no_samples)


def mask_rate(rate: np.ndarray, error: np.ndarray, maxsig: float):
    """NaN-out entries whose error exceeds maxsig (stack.py:62-89).
    Returns (rate, error, pct_masked)."""
    rate = np.array(rate, dtype=np.float64, copy=True)
    error = np.array(error, dtype=np.float64, copy=True)
    mask = ~np.isnan(error)
    orig = int(np.count_nonzero(mask))
    mask[mask] &= error[mask] > maxsig
    rate[mask] = np.nan
    error[mask] = np.nan
    pct = int(np.count_nonzero(mask) / orig * 100) if orig else 0
    return rate, error, pct
