"""Epoch bookkeeping: dense ids + year-fraction spans.

Per-key analog of the reference's EpochList machinery
(/root/reference/pyrate/core/algorithm.py:191-237,
 /root/reference/pyrate/core/shared.py:744-761).
"""

from __future__ import annotations

import numpy as np

from pyrate_spark import DAYS_PER_YEAR

SECONDS_PER_YEAR = DAYS_PER_YEAR * 86400.0


def first_second_ids(dates):
    """date -> dense id, oldest first (algorithm.py:225-237)."""
    return {d: i for i, d in enumerate(sorted(set(dates)))}


def epoch_spans(epoch_seconds: np.ndarray) -> np.ndarray:
    """Years since the first epoch for each sorted unique epoch
    (algorithm.py:207-208: ``(dates[i]-dates[0]).days/365.25`` — here on
    a seconds axis, which subsumes the reference's whole-day grid)."""
    e = np.asarray(epoch_seconds, dtype=np.float64)
    return (e - e[0]) / SECONDS_PER_YEAR


def epochs_from_pairs(first_s: np.ndarray, second_s: np.ndarray):
    """Sorted unique epochs + (ifirst, isecond) id vectors from pair
    timestamps (seconds). Analog of get_epochs + first_second_ids
    (algorithm.py:191-237). Fully vectorised (np.unique inverse) — no
    per-element python; this runs once per key inside grouped kernels."""
    n = len(first_s)
    all_e = np.concatenate([first_s, second_s])
    dates, inv = np.unique(all_e, return_inverse=True)
    return dates, epoch_spans(dates), inv[:n], inv[n:]
