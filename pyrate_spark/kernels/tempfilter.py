"""Temporal Gaussian low/high-pass filter for irregular sampling.

Exact semantics of /root/reference/pyrate/core/aps.py:322-397: for each
valid sample k, Gaussian weights over the (irregular) time offsets to
every valid sample, normalised to 1; low-pass = weighted sum; high-pass
= input - low-pass; all-NaN below the tlpf_pthr threshold.
"""

from __future__ import annotations

import numpy as np

from pyrate_spark import DAYS_PER_YEAR


def gaussian_temporal_filter(tsincr: np.ndarray, cutoff_yr: float,
                             span: np.ndarray, thr: int,
                             dtype=np.float32) -> np.ndarray:
    """Low-pass one series (aps.py:366-389). Vectorised over the k loop
    (the reference loops; the math is an (m, m) weight matrix).
    ``dtype`` defaults to the reference's float32 output; the Spark
    operator passes float64 so results are exactly SQL-reproducible
    (the DuckDB oracle computes in doubles)."""
    tsincr = np.asarray(tsincr, dtype=np.float64)
    span = np.asarray(span, dtype=np.float64)
    sel = np.nonzero(~np.isnan(tsincr))[0]
    ts_lp = np.full(tsincr.shape, np.nan, dtype=dtype)
    m = len(sel)
    if m >= thr:
        yr = span[sel][None, :] - span[sel][:, None]        # (m, m)
        wgt = np.exp(-0.5 * (yr / cutoff_yr) ** 2)          # aps.py:392-396
        wgt /= wgt.sum(axis=1, keepdims=True)
        ts_lp[sel] = (wgt * tsincr[sel][None, :]).sum(axis=1)
    return ts_lp


def temporal_high_pass(tsincr: np.ndarray, spans: np.ndarray,
                       cutoff_days: int, pthr: int, dtype=np.float32):
    """High-pass = tsincr - low-pass (aps.py:322-363). ``spans`` are the
    epoch year-offsets; the filter time axis is the interval midpoint
    accumulated time (aps.py:345-346)."""
    if cutoff_days < 1 or int(cutoff_days) != cutoff_days:
        raise ValueError("tlpf_cutoff must be an integer >= 1 day")
    cutoff_yr = cutoff_days / DAYS_PER_YEAR
    spans = np.asarray(spans, dtype=np.float64)
    intv = np.diff(spans)
    axis = spans[: len(tsincr)] + intv / 2.0
    ts_lp = gaussian_temporal_filter(tsincr, cutoff_yr, axis, pthr,
                                     dtype=dtype)
    return np.asarray(tsincr, dtype=np.float64) - ts_lp, ts_lp
