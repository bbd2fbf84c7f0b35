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

from pyrate_spark.kernels.linalg import gram_pivot_order, pivoted_qr


def design_matrix(ifirst: np.ndarray, isecond: np.ndarray, span: np.ndarray,
                  nvelpar: int) -> np.ndarray:
    """b0_mat[nobs, nvelpar]; row i has span[ifirst:isecond] in its
    interval slots, sign-flipped when the pair is reversed
    (timeseries.py:69-75)."""
    lo = np.minimum(ifirst, isecond)
    hi = np.maximum(ifirst, isecond)
    cols = np.arange(nvelpar)
    mask = (cols[None, :] >= lo[:, None]) & (cols[None, :] < hi[:, None])
    b0 = mask * np.asarray(span, dtype=np.float64)[None, :]
    rev = ifirst > isecond
    b0[rev, :] = -b0[rev, :]
    return b0


def _rank_structure(ifirst, isecond, nvelpar):
    """O(E) incidence analysis of the selected design matrix.

    The SBAS design matrix is an epoch-difference incidence structure:
    obs (lo, hi) = prefix(hi) - prefix(lo), column-scaled by the
    (positive) interval spans. Hence its rank is EXACTLY
    (#epochs appearing in obs) - (#connected components) — the graph
    rank, unaffected by positive diagonal column scaling. Removable
    deficiency exists iff the number of *covered interval columns*
    exceeds that rank; equality means the reference's repair loop
    (timeseries.py:160-199) would remove nothing.

    Returns (covered_columns, structural_rank, full_rank: bool).
    """
    lo = np.minimum(ifirst, isecond)
    hi = np.maximum(ifirst, isecond)
    # covered interval columns via two bincounts (r8: one C pass each,
    # ~2x the np.add.at scatter this replaced; exact integer counts)
    cover = np.bincount(lo, minlength=nvelpar + 1)
    cover = cover - np.bincount(hi, minlength=nvelpar + 1)
    covered = int(np.count_nonzero(np.cumsum(cover)[:nvelpar] > 0))
    # connected components among epochs that appear: path-compressing
    # union-find over the edge list (r8; 1.55x the r5 vectorized
    # min-label propagation at the ~75-edge/40-epoch shape — the numpy
    # loop paid several array allocations per convergence round. The
    # result is an exact integer graph property, algorithm-invariant,
    # so no output can change; equality with the propagation form is
    # pinned over 2k random incidence structures).
    parent = list(range(nvelpar + 1))

    def _find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    comps = 0
    for a, b in zip(lo.tolist(), hi.tolist()):
        if a not in nodes:
            nodes.add(a)
            comps += 1
        if b not in nodes:
            nodes.add(b)
            comps += 1
        ra, rb = _find(a), _find(b)
        if ra != rb:
            parent[ra] = rb
            comps -= 1
    rank = len(nodes) - comps
    return covered, rank, covered == rank


def _remove_rank_def_rows(b_mat, nvelpar, ifgv, sel, rank):
    """timeseries.py:160-170 semantics. Differences from the reference
    mechanics (results equivalent, cited where they matter):
    - pivot order from Gram pivoted Cholesky (same greedy
      max-residual-norm rule as QR column pivoting, cache-resident);
    - rank passed in from the exact structural computation
      (_rank_structure) instead of an SVD matrix_rank — identical for
      these incidence-structured matrices.
    The grouped-map kernels don't reach this scalar path on repaired
    keys: ``operators.udf_kernels._inverted_keys`` runs the identical
    repair as batched rounds across every key in the Arrow batch
    (pinned bit-equal by tests/test_fused_rates.py's
    batched-vs-internal equivalence case) and hands this function's
    caller an already-repaired selection."""
    e_var = gram_pivot_order(b_mat)
    licols = e_var[rank:nvelpar]
    rmrow, _ = np.where(b_mat[:, licols] != 0)
    rmrow = np.unique(rmrow)
    b_mat = np.delete(b_mat, rmrow, axis=0)
    ifgv = np.delete(ifgv, rmrow)
    sel = np.delete(sel, rmrow)
    return b_mat, ifgv, sel, rmrow


def _solve_ts_svd(nvelpar, velflag, ifgv, b_mat):
    """timeseries.py:214-222. Fast path: the rank-repair loop
    (interp=0) guarantees b_mat has full column rank, so the unique LS
    solution comes from the normal equations + Cholesky — one gemm +
    one O(n^3/3) factorisation, measured 2.6x faster than the SVD
    lstsq at the hot-key shape (600x383) with agreement to 6e-15.
    Cholesky raises on a rank-deficient Gram (the interp=1 path skips
    the repair), which falls back to the minimum-norm SVD solution —
    identical to the reference's pinv(b) @ ifgv (timeseries.py:222).
    Below ~192 columns the three-call Cholesky path loses to one lstsq
    on call overhead (measured crossover), so small systems keep the
    single-SVD route."""
    tsvel = np.full(nvelpar, np.nan, dtype=np.float32)
    sol = None
    if b_mat.shape[1] >= 192:
        try:
            g = b_mat.T @ b_mat
            L = np.linalg.cholesky(g)
            # conditioning guard: normal equations square cond(b_mat);
            # a factorizable-but-ill-conditioned Gram can drift from
            # the pinv-equivalent answer beyond oracle rounding. The
            # Cholesky diagonal ratio is a free cond estimate —
            # min/max(diag(L)) < 1e-7 means cond(b_mat) >~ 1e7, so
            # fall back to the SVD route.
            dl = np.diagonal(L)
            if dl.min() / dl.max() >= 1e-7:
                z = np.linalg.solve(L, b_mat.T @ ifgv)
                sol = np.linalg.solve(L.T, z)
        except np.linalg.LinAlgError:
            sol = None
    if sol is None:
        sol = np.linalg.lstsq(b_mat, ifgv, rcond=None)[0]
    tsvel[velflag != 0] = sol
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
    vcm_sub = vcmt[sel, np.vstack(sel)]

    off_diag = vcm_sub - np.diag(np.diagonal(vcm_sub))
    if not off_diag.any():
        # diagonal VCM fast path: cholesky(pinv(diag d)) = diag(1/sqrt d)
        # — skips two O(n^3) factorisations; exact same whitening
        d = np.concatenate((np.diagonal(vcm_sub), np.ones(nlap)))
        wdiag = np.where(d > 0, 1.0 / np.sqrt(d), 0.0)
        wb = mat_b * wdiag[:, None]
        wl = obsv * wdiag
    else:
        vcm_tmp = np.eye(nobs)
        vcm_tmp[:m, :m] = vcm_sub
        w = np.linalg.cholesky(np.linalg.pinv(vcm_tmp)).T
        wb = np.dot(w, mat_b)
        wl = np.dot(w, obsv)
    # lstsq(rcond) == pinv(rcond) @ wl (minimum-norm LSQ, one SVD)
    x = np.linalg.lstsq(wb, wl, rcond=1e-8)[0]

    tsvel = np.full(nvelpar, np.nan, dtype=np.float32)
    tsvel[np.abs(velflag) > 1e-8] = x[:nvelleft]
    return tsvel


def time_series_pixel(phase: np.ndarray, ifirst: np.ndarray,
                      isecond: np.ndarray, spans: np.ndarray, *,
                      method: int = 1, pthresh: int = 0, smorder: int = 2,
                      smfactor_log10: float = -0.25,
                      vcmt: np.ndarray | None = None,
                      mst_sel: np.ndarray | None = None,
                      interp: int = 0,
                      known_full_rank: bool = False):
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
        # ``known_full_rank``: the caller already PROVED full structural
        # rank for this selection (the batched repair's exact incidence
        # check) and has > 1 rows — skip the redundant re-check. Purely
        # a recomputation skip: the loop below would run _rank_structure
        # once, see full, and break.
        if not known_full_rank:
            ifirst_a = np.asarray(ifirst)
            isecond_a = np.asarray(isecond)
            # the O(E) incidence check replaces the reference's extra
            # confirmation QR: loop only while removable deficiency
            # exists (each removal pass then drops at least one row)
            while True:
                _, rank, full = _rank_structure(ifirst_a[sel],
                                                isecond_a[sel], nvelpar)
                if full:
                    break
                if b_mat.shape[0] <= 1:
                    return nanvec, nanvec.copy(), nanvec.copy()
                b_mat, ifgv, sel, rmrow = _remove_rank_def_rows(
                    b_mat, nvelpar, ifgv, sel, rank)
                if len(rmrow) == 0:     # defensive: no progress -> bail
                    break
            if b_mat.shape[0] <= 1:
                return nanvec, nanvec.copy(), nanvec.copy()
        velflag = np.sum(np.abs(b_mat), axis=0)
        # |x| <= 1e-8 == np.isclose(x, 0.0) at rtol*|0| = 0 — same
        # booleans, no broadcasting machinery (r8)
        b_mat = b_mat[:, np.abs(velflag) > 1e-8]
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
