"""Temporal variance-covariance matrix (Biggs et al. 2007 pattern).

Exact semantics of /root/reference/pyrate/core/covariance.py:257-309:
C = 1 for identical pairs, +0.5 shared first-first or second-second,
-0.5 first-second crossover, 0 otherwise; vcm = sqrt(maxvar) outer
product elementwise-multiplied by the pattern. Note the reference's
assignment order means a pair that is both 'shared' and 'crossed'
resolves to -0.5, and the diagonal always ends at 1.0.
"""

from __future__ import annotations

import numpy as np


def vcm_pattern(ifirst: np.ndarray, isecond: np.ndarray) -> np.ndarray:
    ifirst = np.asarray(ifirst)
    isecond = np.asarray(isecond)
    same_first = ifirst[:, None] == ifirst[None, :]
    same_second = isecond[:, None] == isecond[None, :]
    cross = (ifirst[:, None] == isecond[None, :]) | \
            (isecond[:, None] == ifirst[None, :])
    pat = np.zeros((len(ifirst), len(ifirst)))
    pat[same_first | same_second] = 0.5
    pat[cross] = -0.5                       # overwrites, like the reference
    pat[same_first & same_second] = 1.0
    return pat


def get_vcmt(ifirst, isecond, maxvar) -> np.ndarray:
    """covariance.py:306-309."""
    std = np.sqrt(np.asarray(maxvar, dtype=np.float64)).reshape(-1, 1)
    return (std * std.T) * vcm_pattern(ifirst, isecond)
