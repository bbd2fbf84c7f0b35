"""numpy-only linear-algebra helpers.

The reference uses scipy (``scipy.linalg.qr(..., pivoting=True)``,
``scipy.stats.linregress``); scipy is not available in this runtime, so
these are exact functional replacements built on numpy. Semantics are
checked against the reference's published oracle values in
tests/test_kernels_timeseries.py and tests/test_kernels_stack.py.
"""

from __future__ import annotations

import numpy as np


def pivoted_qr(a: np.ndarray, need_q: bool = True):
    """Householder QR with greedy column pivoting.

    Functional replacement for ``scipy.linalg.qr(a, mode='economic',
    pivoting=True)`` as used by the reference's rank-deficiency repair
    (/root/reference/pyrate/core/timeseries.py:160-170): at step k the
    remaining column with the largest trailing norm is pivoted in (the
    same greedy rule LAPACK geqp3 follows).

    Returns (Q, R, piv) with A[:, piv] = Q @ R. ``need_q=False`` skips
    the Q accumulation (the O(m^2) part) — rank/pivot detection only
    needs R and piv.
    """
    R = np.asarray(a, dtype=np.float64).copy()
    m, n = R.shape
    piv = np.arange(n)
    kmin = min(m, n)
    Q = np.eye(m) if need_q else None
    for k in range(kmin):
        norms = np.sqrt((R[k:, k:] ** 2).sum(axis=0))
        j = int(np.argmax(norms)) + k
        if j != k:
            R[:, [k, j]] = R[:, [j, k]]
            piv[[k, j]] = piv[[j, k]]
        x = R[k:, k]
        nx = np.linalg.norm(x)
        if nx <= 1e-300:
            continue
        v = x.copy()
        v[0] += (1.0 if x[0] >= 0 else -1.0) * nx
        vn = np.linalg.norm(v)
        if vn <= 1e-300:
            continue
        v = v / vn
        R[k:, k:] -= 2.0 * np.outer(v, v @ R[k:, k:])
        if need_q:
            Q[:, k:] -= 2.0 * np.outer(Q[:, k:] @ v, v)
    return (Q[:, :kmin] if need_q else None), R[:kmin, :], piv


def gram_pivot_order(a: np.ndarray) -> np.ndarray:
    """Column-pivot order of a via pivoted Cholesky on the Gram matrix
    G = a.T @ a — the same greedy rule as QR column pivoting (at step k
    both pick the column with the largest residual norm; the Schur
    complement diagonal of G IS that squared norm), at a fraction of
    the memory traffic: the working set is the n x n Gram matrix (cache
    resident for n ~ hundreds) instead of the m x n factor streamed
    every iteration. Used by the rank-repair path where only the pivot
    ORDER matters (the dependent-column set), not Q or R values.

    r5: outer-product Schur-complement form (S <- S - col row / piv)
    instead of accumulating an L factor nobody reads. The per-step
    update has NO reductions, which is what lets the batched variant
    below run the identical elementwise arithmetic across a stack of
    Gram matrices (bit-equal pivot trajectories, batch-invariant).
    The greedy choice sequence can differ from the L-form only within
    exact ties / at the ~0-residual tail; the dependent-column SET —
    the only thing the repair consumes — is unchanged (checked over
    500 random incidence-structured matrices + the reference-value
    kernel tests + the full oracle gate).
    """
    G = np.asarray(a, dtype=np.float64)
    return _pivot_from_gram(G.T @ G)


def _pivot_from_gram(S: np.ndarray) -> np.ndarray:
    """Scalar greedy loop on one Gram matrix — the exact elementwise
    arithmetic of ``_gram_pivot_order_batch_core`` at B=1 (outer form,
    no reductions), so scalar and batched trajectories are bit-equal."""
    S = np.array(S, dtype=np.float64, copy=True)
    n = S.shape[0]
    piv = np.arange(n)
    d = np.diagonal(S).copy()
    for k in range(n - 1):
        j = int(np.argmax(d[k:])) + k
        if d[j] <= 1e-300:
            break    # residual space empty; remaining cols all dependent
        if j != k:
            piv[[k, j]] = piv[[j, k]]
            d[[k, j]] = d[[j, k]]
            S[[k, j], :] = S[[j, k], :]
            S[:, [k, j]] = S[:, [j, k]]
        row = S[k, k + 1:]
        col = S[k + 1:, k] / d[k]
        S[k + 1:, k + 1:] -= col[:, None] * row[None, :]
        d[k + 1:] -= col * row
        np.maximum(d[k + 1:], 0.0, out=d[k + 1:])
    return piv


def _pivot_chunk_size(n: int, budget_bytes: int = 2_000_000) -> int:
    """Matrices per batched sweep: sized so the chunk's working set
    stays cache-resident. Small tier-shaped matrices (n ~ 47, 18 KB)
    batch ~113 wide under the 2 MB budget (r8: the old cap of 16 left
    the python per-iteration overhead under-amortised — raising it to
    the budget limit measured 1.44x on a 400-matrix bench-shaped
    stack, results bit-identical since chunking is pure slicing);
    large epoch-rich matrices (n ~ 383, 1.2 MB each) already fill the
    cache alone — batching them streams memory and LOSES (measured 28%
    single-threaded, worse under 32 concurrent workers), so the chunk
    collapses to 1 and the scalar loop runs instead."""
    return max(1, min(128, budget_bytes // (n * n * 8)))


def gram_pivot_order_batched(grams: np.ndarray) -> np.ndarray:
    """Pivot orders for a (B, n, n) stack: cache-budgeted chunks
    through the vectorized core, or the bit-equal scalar loop when one
    matrix alone fills the budget."""
    grams = np.asarray(grams, dtype=np.float64)
    b, n, _ = grams.shape
    chunk = _pivot_chunk_size(n)
    if chunk <= 1:
        return np.stack([_pivot_from_gram(g) for g in grams], axis=0)
    if b <= chunk:
        return _gram_pivot_order_batch_core(grams)
    return np.concatenate(
        [_gram_pivot_order_batch_core(grams[i:i + chunk])
         for i in range(0, b, chunk)], axis=0)


def _gram_pivot_order_batch_core(grams: np.ndarray) -> np.ndarray:
    """Pivot orders for a (B, n, n) stack of Gram matrices in ONE
    elementwise-vectorized greedy loop: n iterations of batched
    argmax / symmetric swap / rank-1 Schur update, no per-matrix
    python loop. Every operation is elementwise or an independent
    per-matrix argmax — no cross-element reductions — so each
    matrix's pivot trajectory is bit-identical to running it alone
    (batch composition cannot change results; O4 determinism).

    Matrices whose residual space empties early (rank < n) keep
    their remaining columns in current order — only the SET past the
    rank index is consumed by the caller.
    """
    S = np.array(grams, dtype=np.float64, copy=True)
    b, n, _ = S.shape
    piv = np.broadcast_to(np.arange(n), (b, n)).copy()
    d = np.diagonal(S, axis1=1, axis2=2).copy()
    rows = np.arange(b)
    alive = np.ones(b, dtype=bool)
    for k in range(n - 1):
        j = np.argmax(d[:, k:], axis=1) + k
        alive = alive & (d[rows, j] > 1e-300)
        if not alive.any():
            break
        # freeze finished matrices by "swapping" k with k (no-op)
        j = np.where(alive, j, k)
        swap = j != k
        if swap.any():
            bs = rows[swap]
            js = j[swap]
            piv[bs, k], piv[bs, js] = piv[bs, js], piv[bs, k].copy()
            d[bs, k], d[bs, js] = d[bs, js], d[bs, k].copy()
            S[bs, k, :], S[bs, js, :] = S[bs, js, :], S[bs, k, :].copy()
            S[bs, :, k], S[bs, :, js] = S[bs, :, js], S[bs, :, k].copy()
        row = S[:, k, k + 1:]
        denom = np.where(alive, d[:, k], 1.0)[:, None]
        col = S[:, k + 1:, k] / denom
        upd = col[:, :, None] * row[:, None, :]
        # frozen matrices must not keep updating (their d[k] is junk)
        if not alive.all():
            upd[~alive] = 0.0
        S[:, k + 1:, k + 1:] -= upd
        dt = d[:, k + 1:]
        dt -= np.where(alive[:, None], col * row, 0.0)
        np.maximum(dt, 0.0, out=dt)
    return piv


def linregress(t: np.ndarray, y: np.ndarray):
    """Closed-form simple linear regression matching
    ``scipy.stats.linregress`` (slope, intercept, rvalue, stderr).

    Used by the reference's linear-rate estimator
    (/root/reference/pyrate/core/timeseries.py:292-329).
    """
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = t.size
    tm = t.mean()
    ym = y.mean()
    ssxm = ((t - tm) ** 2).mean()
    ssym = ((y - ym) ** 2).mean()
    ssxym = ((t - tm) * (y - ym)).mean()
    slope = ssxym / ssxm
    intercept = ym - slope * tm
    if ssxm == 0.0 or ssym == 0.0:
        r = 0.0
    else:
        r = ssxym / np.sqrt(ssxm * ssym)
        r = min(1.0, max(-1.0, r))
    df = n - 2
    if df > 0:
        stderr = np.sqrt((1.0 - r * r) * ssym / ssxm / df)
    else:
        stderr = 0.0
    return slope, intercept, r, stderr


def linregress_segments(t: np.ndarray, y: np.ndarray,
                        starts: np.ndarray):
    """Vectorised NaN-aware linregress over CONCATENATED per-key
    segments — the composition-invariant form of
    :func:`linregress_batch`.

    ``t``, ``y``: 1-D concatenations of every key's (time, value)
    series; ``starts``: segment start offsets (len = nkeys, starts[0]
    == 0). NaNs in y are excluded per segment; segments with < 2 valid
    points return NaNs.

    Why not the padded-matrix form: ``np.sum`` over a padded (nkeys,
    width) matrix uses pairwise summation whose reduction tree depends
    on ``width`` = the longest series IN THE FRAME, so a key's result
    could change by an ulp when its frame-mates change (bucket
    composition was fixed by the url hash, but the r8 shuffle-free
    mapInPandas path batches by PARTITION, and partition composition
    varies with cluster size). ``np.add.reduceat`` sums each segment
    sequentially in its own row order — a pure per-key function, so
    results are identical across partitionings, parallelism, and
    execution paths (O4 determinism).

    Returns (slope, intercept, rsquared, stderr, nsamp) each (nkeys,).
    """
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    starts = np.asarray(starts, dtype=np.intp)
    mask = ~np.isnan(y)
    tm_ = np.where(mask, t, 0.0)
    ym_ = np.where(mask, y, 0.0)
    n = np.add.reduceat(mask.astype(np.float64), starts)
    with np.errstate(invalid="ignore", divide="ignore"):
        tmean = np.add.reduceat(tm_, starts) / n
        ymean = np.add.reduceat(ym_, starts) / n
        # broadcast the per-segment means back to element positions
        seg_id = np.zeros(len(t), dtype=np.intp)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        dt = np.where(mask, t - tmean[seg_id], 0.0)
        dy = np.where(mask, y - ymean[seg_id], 0.0)
        ssxm = np.add.reduceat(dt * dt, starts) / n
        ssym = np.add.reduceat(dy * dy, starts) / n
        ssxym = np.add.reduceat(dt * dy, starts) / n
        slope = ssxym / ssxm
        intercept = ymean - slope * tmean
        denom = np.sqrt(ssxm * ssym)
        r = np.where(denom > 0,
                     ssxym / np.where(denom > 0, denom, 1.0), 0.0)
        r = np.clip(r, -1.0, 1.0)
        df = n - 2
        stderr = np.where(
            df > 0,
            np.sqrt((1.0 - r * r) * ssym / ssxm / np.maximum(df, 1)),
            0.0)
    bad = n < 2
    out = [slope, intercept, r * r, stderr]
    for arr in out:
        arr[bad] = np.nan
    nsamp = n.copy()
    nsamp[bad] = np.nan
    return out[0], out[1], out[2], out[3], nsamp


def linregress_batch(T: np.ndarray, Y: np.ndarray):
    """Vectorised NaN-aware linregress over many series at once.

    T, Y: (nseries, npoints); NaNs in Y (and matching T cells) are
    excluded per-series, mirroring the reference's per-pixel mask
    (/root/reference/pyrate/core/timeseries.py:312-318). Series with
    fewer than 2 valid points return NaNs (timeseries.py:322-324).

    Returns (slope, intercept, rsquared, stderr, nsamp) each (nseries,).
    """
    Y = np.asarray(Y, dtype=np.float64)
    T = np.asarray(T, dtype=np.float64)
    mask = ~np.isnan(Y)
    n = mask.sum(axis=1).astype(np.float64)
    Tm = np.where(mask, T, 0.0)
    Ym = np.where(mask, Y, 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        tmean = Tm.sum(1) / n
        ymean = Ym.sum(1) / n
        dt = np.where(mask, T - tmean[:, None], 0.0)
        dy = np.where(mask, Y - ymean[:, None], 0.0)
        ssxm = (dt * dt).sum(1) / n
        ssym = (dy * dy).sum(1) / n
        ssxym = (dt * dy).sum(1) / n
        slope = ssxym / ssxm
        intercept = ymean - slope * tmean
        denom = np.sqrt(ssxm * ssym)
        r = np.where(denom > 0, ssxym / np.where(denom > 0, denom, 1.0), 0.0)
        r = np.clip(r, -1.0, 1.0)
        df = n - 2
        stderr = np.where(
            df > 0, np.sqrt((1.0 - r * r) * ssym / ssxm / np.maximum(df, 1)), 0.0
        )
    bad = n < 2
    out = [slope, intercept, r * r, stderr]
    for arr in out:
        arr[bad] = np.nan
    nsamp = n.copy()
    nsamp[bad] = np.nan
    return out[0], out[1], out[2], out[3], nsamp
