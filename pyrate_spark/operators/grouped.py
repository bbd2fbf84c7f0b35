"""Grouped-map pandas UDF wrappers: attach the per-key numpy kernels.

Execution model (this file is where the scale design lives):

- **Key-batched groups.** ``groupBy('url')`` would give one tiny pandas
  frame per key — millions of Arrow round-trips. Instead we group by a
  hash *bucket* of the url (``_bucket``): each Arrow batch carries many
  keys, and the kernel loops keys in numpy inside the worker. This is
  the survey's prescription ("batch keys per group", SURVEY.md §2.5)
  and the reference's own tiling idea (Tile/IfgPart, shared.py:1135-1161)
  recast for Spark: bucket ≈ tile.

- **Explicit hot-key salting.** A url with 100x the snapshots (the skew
  knob in FIXTURES.md F1) would dominate its bucket. ``salted_buckets``
  counts keys (one cheap agg), and every key above ``hot_factor`` x the
  mean row-count gets a dedicated bucket via a broadcast map join —
  BASELINE.json's "explicit salt-based skew handling for hot urls".
  Non-hot keys hash uniformly. AQE's skew-join splitting cannot help a
  grouped-map (a key is indivisible); isolating hot keys restores
  near-uniform task sizes.

- **No per-row Python.** Everything crosses the JVM/Python boundary as
  Arrow columns; inside, per-key slices are numpy views obtained from a
  single vectorised sort + boundary scan (no pandas groupby overhead).

Kernels preserve the reference semantics cited in pyrate_spark.kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from pyrate_spark.config import EngineConfig, DEFAULT
from pyrate_spark.kernels.epochs import epochs_from_pairs, SECONDS_PER_YEAR
from pyrate_spark.kernels.linalg import linregress_batch
from pyrate_spark.kernels.mst import mst_select_pixel, mst_stats
from pyrate_spark.kernels.stack import stack_rate_pixel
from pyrate_spark.kernels.tempfilter import temporal_high_pass
from pyrate_spark.kernels.timeseries import time_series_pixel
from pyrate_spark.kernels.vcm import get_vcmt


# --------------------------------------------------------------------------
# bucketing / salting
# --------------------------------------------------------------------------

def salted_buckets(df: DataFrame, key: str = "url",
                   n_buckets: int = 64, hot_factor: float = 20.0) -> DataFrame:
    """Append ``_bucket``: uniform hash bucket, except keys whose
    row-count exceeds hot_factor x mean get dedicated buckets."""
    counts = df.groupBy(key).count()
    stats = counts.agg(F.avg("count").alias("mean")).first()
    mean = stats["mean"] or 1.0
    hot = (counts.where(F.col("count") > F.lit(hot_factor * mean))
           .select(key).withColumn(
               "_hot_bucket",
               F.lit(n_buckets) + F.row_number().over(
                   Window.orderBy(key)) - 1))
    return (df.join(F.broadcast(hot), key, "left")
            .withColumn(
                "_bucket",
                F.coalesce(
                    F.col("_hot_bucket"),
                    F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))))
            .drop("_hot_bucket"))


def _group_slices(pdf: pd.DataFrame, key: str = "url"):
    """Yield (key, row-index array) per key from one bucket's frame,
    via a single argsort — cheaper than pandas groupby for many keys."""
    keys = pdf[key].to_numpy()
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    boundaries = np.flatnonzero(
        np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1])))
    for i, start in enumerate(boundaries):
        stop = boundaries[i + 1] if i + 1 < len(boundaries) else len(order)
        yield sorted_keys[start], order[start:stop]


def _ts_seconds(col: pd.Series) -> np.ndarray:
    return col.to_numpy().astype("datetime64[s]").astype(np.int64)


# --------------------------------------------------------------------------
# per-key VCM (A11-lite + J3)
# --------------------------------------------------------------------------

def _vcmt_for(cfg: EngineConfig, phase, ifirst, isecond):
    """vcm_mode via cfg: identity (fast default) or the Biggs pattern
    scaled by the per-key sample variance — the graft's maxvar analog
    (covariance.py:257-309; per-key variance replaces the FFT
    autocovariance peak of covariance.py:65-196)."""
    n = len(phase)
    if getattr(cfg, "vcm_mode", "identity") == "pattern":
        finite = np.isfinite(phase)
        mv = float(np.var(phase[finite], ddof=1)) if finite.sum() > 1 else 1.0
        mv = max(mv, 1e-9)
        return get_vcmt(ifirst, isecond, np.full(n, mv))
    return np.eye(n)


# --------------------------------------------------------------------------
# time-series inversion (T1-T5)
# --------------------------------------------------------------------------

TS_SCHEMA = ("url string, epoch_id int, epoch_ts timestamp, "
             "tsvel float, tsincr float, tscuml float")


def timeseries_per_url(pairs: DataFrame, cfg: EngineConfig = DEFAULT,
                       use_mst: bool = True,
                       n_buckets: Optional[int] = None) -> DataFrame:
    """Pairwise observations -> per-epoch incremental/cumulative series
    per url (timeseries.py:111-157 recast per key). Output rows: one per
    (url, epoch j>=1)."""
    method = cfg.ts_method
    pthr = cfg.ts_pthr
    smorder, smfactor = cfg.sm_order, cfg.sm_factor
    nb = n_buckets or cfg.salt_buckets

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        first_all = _ts_seconds(pdf["ts_first"])
        second_all = _ts_seconds(pdf["ts_second"])
        phase_all = pdf["delta_value"].to_numpy(dtype=np.float64)
        weight_all = pdf["nan_fraction"].to_numpy(dtype=np.float64) \
            if "nan_fraction" in pdf else np.zeros(len(pdf))
        for url, idx in _group_slices(pdf):
            fs, ss = first_all[idx], second_all[idx]
            phase, weight = phase_all[idx], weight_all[idx]
            dates, spans, ifirst, isecond = epochs_from_pairs(fs, ss)
            if len(dates) < 2:
                continue
            if use_mst:
                sel = mst_select_pixel(phase, fs.tolist(), ss.tolist(),
                                       weight.tolist())
                _, is_tree, _ = mst_stats(fs.tolist(), ss.tolist(),
                                          weight.tolist())
                interp = 0 if is_tree else 1   # timeseries.py:49
            else:
                sel = ~np.isnan(phase)
                interp = 0
            vcmt = _vcmt_for(cfg, phase, ifirst, isecond)
            try:
                _, tsincr, tscuml = time_series_pixel(
                    phase, ifirst, isecond, spans, method=method,
                    pthresh=pthr, smorder=smorder, smfactor_log10=smfactor,
                    vcmt=vcmt, mst_sel=sel, interp=interp)
            except np.linalg.LinAlgError:
                nv = len(dates) - 1
                tsincr = tscuml = np.full(nv, np.nan, dtype=np.float32)
            tsvel = np.where(np.diff(spans) != 0,
                             tsincr / np.diff(spans).astype(np.float32),
                             np.nan)
            # emit the zero epoch too (tscuml=0 at epoch 0), mirroring
            # the reference's np.insert(tscuml, 0, 0) before the linear
            # rate fit (timeseries.py:429)
            outs.append(pd.DataFrame({
                "url": url,
                "epoch_id": np.arange(0, len(dates), dtype=np.int32),
                "epoch_ts": pd.to_datetime(dates, unit="s"),
                "tsvel": np.concatenate(([np.nan], tsvel)).astype(np.float32),
                "tsincr": np.concatenate(([np.nan], tsincr)).astype(np.float32),
                "tscuml": np.concatenate(([0.0], tscuml)).astype(np.float32),
            }))
        if not outs:
            return pd.DataFrame({
                "url": pd.Series(dtype=object),
                "epoch_id": pd.Series(dtype=np.int32),
                "epoch_ts": pd.Series(dtype="datetime64[ns]"),
                "tsvel": pd.Series(dtype=np.float32),
                "tsincr": pd.Series(dtype=np.float32),
                "tscuml": pd.Series(dtype=np.float32)})
        return pd.concat(outs, ignore_index=True)

    return (salted_buckets(pairs, "url", nb)
            .groupBy("_bucket").applyInPandas(fn, TS_SCHEMA))


# --------------------------------------------------------------------------
# stacking (T9-T10) + mask (P4)
# --------------------------------------------------------------------------

STACK_SCHEMA = "url string, rate double, error double, samples int"


def stack_rate_per_url(pairs: DataFrame, cfg: EngineConfig = DEFAULT,
                       use_mst: bool = True,
                       n_buckets: Optional[int] = None) -> DataFrame:
    """Iterative WLS stacking per url (stack.py:92-165). ``error`` is
    already scaled by velerror_nsig (stack.py:60)."""
    nsig, pthr, nb = cfg.nsig, cfg.pthr, n_buckets or cfg.salt_buckets
    nsig_scale = cfg.velerror_nsig

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        first_all = _ts_seconds(pdf["ts_first"])
        second_all = _ts_seconds(pdf["ts_second"])
        phase_all = pdf["delta_value"].to_numpy(dtype=np.float64)
        span_all = pdf["time_span"].to_numpy(dtype=np.float64)
        weight_all = pdf["nan_fraction"].to_numpy(dtype=np.float64) \
            if "nan_fraction" in pdf else np.zeros(len(pdf))
        for url, idx in _group_slices(pdf):
            phase = phase_all[idx]
            span = span_all[idx]
            fs, ss, weight = first_all[idx], second_all[idx], weight_all[idx]
            if use_mst:
                sel = mst_select_pixel(phase, fs.tolist(), ss.tolist(),
                                       weight.tolist())
            else:
                sel = ~np.isnan(phase)
            # stack.py:179-185: NaN obs -> 0 and dropped from mst
            sel = sel & ~np.isnan(phase)
            obs = np.where(np.isnan(phase), 0.0, phase)
            _, _, ifirst, isecond = epochs_from_pairs(fs, ss)
            vcmt = _vcmt_for(cfg, phase, ifirst, isecond)
            try:
                rate, err, samp = stack_rate_pixel(
                    obs, sel, vcmt, span[None, :], nsig, pthr)
            except np.linalg.LinAlgError:
                rate, err, samp = np.nan, np.nan, int(sel.sum())
            rows.append((url, rate,
                         err * nsig_scale if np.isfinite(err) else err,
                         samp))
        return pd.DataFrame(rows, columns=["url", "rate", "error", "samples"])

    return (salted_buckets(pairs, "url", nb)
            .groupBy("_bucket").applyInPandas(fn, STACK_SCHEMA))


def mask_rate_df(rates: DataFrame, maxsig: float) -> DataFrame:
    """P4 relational form (stack.py:62-89): NULL-out rate/error where
    error > maxsig."""
    bad = F.col("error") > F.lit(float(maxsig))
    return (rates
            .withColumn("rate_masked",
                        F.when(bad, None).otherwise(F.col("rate")))
            .withColumn("error_masked",
                        F.when(bad, None).otherwise(F.col("error"))))


# --------------------------------------------------------------------------
# linear rate (T7-T8) — kernel path
# --------------------------------------------------------------------------

LR_SCHEMA = ("url string, rate double, intercept double, rsquared double, "
             "error double, samples double")


def linear_rate_per_url(tscuml_df: DataFrame, cfg: EngineConfig = DEFAULT,
                        n_buckets: Optional[int] = None,
                        value_col: str = "tscuml",
                        ts_col: str = "epoch_ts") -> DataFrame:
    """Linear regression of the cumulative series per url
    (timeseries.py:292-379). The input series should already contain the
    zero epoch (timeseries_per_url emits it, mirroring the reference's
    np.insert(tscuml, 0, 0) at timeseries.py:429).
    Fully vectorised across keys: series are padded into one matrix and
    run through linregress_batch. ``error`` scaled by velerror_nsig
    (timeseries.py:379)."""
    nb = n_buckets or cfg.salt_buckets
    err_scale = float(cfg.velerror_nsig)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ts_all = _ts_seconds(pdf[ts_col]).astype(np.float64)
        y_all = pdf[value_col].to_numpy(dtype=np.float64)
        slices = list(_group_slices(pdf))
        if not slices:
            return pd.DataFrame(columns=["url", "rate", "intercept",
                                         "rsquared", "error", "samples"])
        width = max(len(idx) for _, idx in slices)
        n = len(slices)
        T = np.zeros((n, width))
        Y = np.full((n, width), np.nan)
        urls = []
        for i, (url, idx) in enumerate(slices):
            order = np.argsort(ts_all[idx], kind="stable")
            t = ts_all[idx][order]
            y = y_all[idx][order]
            T[i, :len(t)] = (t - t[0]) / SECONDS_PER_YEAR
            Y[i, :len(y)] = y
            urls.append(url)
        s, i_, r2, se, ns = linregress_batch(T, Y)
        return pd.DataFrame({
            "url": urls, "rate": s, "intercept": i_, "rsquared": r2,
            "error": se * err_scale, "samples": ns})

    return (salted_buckets(tscuml_df, "url", nb)
            .groupBy("_bucket").applyInPandas(fn, LR_SCHEMA))


# --------------------------------------------------------------------------
# temporal high-pass (T11)
# --------------------------------------------------------------------------

THP_SCHEMA = ("url string, epoch_ts timestamp, value_hp double, "
              "value_lp double")


def temporal_highpass_per_url(series: DataFrame, cfg: EngineConfig = DEFAULT,
                              value_col: str = "value",
                              ts_col: str = "warc_ts",
                              n_buckets: Optional[int] = None) -> DataFrame:
    """Gaussian temporal high-pass per url on an irregular axis
    (aps.py:322-397). Data-dependent kernel weights rule out
    Window.rangeBetween; this is the canonical custom window-function
    via grouped-map."""
    cutoff, pthr = cfg.tlpf_cutoff_days, cfg.tlpf_pthr
    nb = n_buckets or cfg.salt_buckets

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        ts_all = _ts_seconds(pdf[ts_col])
        v_all = pdf[value_col].to_numpy(dtype=np.float64)
        for url, idx in _group_slices(pdf):
            order = np.argsort(ts_all[idx], kind="stable")
            t = ts_all[idx][order]
            v = v_all[idx][order]
            spans = (t - t[0]) / SECONDS_PER_YEAR
            # feed the epoch axis directly (irregular) — aps midpoint
            # convention needs the interval grid, use spans + half-step
            spans_full = np.concatenate(
                (spans, [spans[-1] + (spans[-1] - spans[-2] if len(spans) > 1
                                      else 1.0)]))
            hp, lp = temporal_high_pass(v, spans_full, cutoff, pthr)
            outs.append(pd.DataFrame({
                "url": url,
                "epoch_ts": pd.to_datetime(t, unit="s"),
                "value_hp": hp, "value_lp": lp}))
        if not outs:
            return pd.DataFrame({
                "url": pd.Series(dtype=object),
                "epoch_ts": pd.Series(dtype="datetime64[ns]"),
                "value_hp": pd.Series(dtype=np.float64),
                "value_lp": pd.Series(dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    return (salted_buckets(series, "url", nb)
            .groupBy("_bucket").applyInPandas(fn, THP_SCHEMA))


# --------------------------------------------------------------------------
# MST selection as a relational annotation (G1/G2)
# --------------------------------------------------------------------------

MST_SCHEMA = ("url string, ts_first timestamp, ts_second timestamp, "
              "delta_value double, time_span double, nan_fraction double, "
              "in_mst boolean")


def mst_annotate(pairs: DataFrame, cfg: EngineConfig = DEFAULT,
                 n_buckets: Optional[int] = None) -> DataFrame:
    """Annotate each observation with MST membership for its key
    (mst.py:146-170 boolean cube -> boolean column)."""
    nb = n_buckets or cfg.salt_buckets

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        first_all = _ts_seconds(pdf["ts_first"])
        second_all = _ts_seconds(pdf["ts_second"])
        phase_all = pdf["delta_value"].to_numpy(dtype=np.float64)
        weight_all = pdf["nan_fraction"].to_numpy(dtype=np.float64)
        in_mst = np.zeros(len(pdf), dtype=bool)
        for url, idx in _group_slices(pdf):
            sel = mst_select_pixel(
                phase_all[idx], first_all[idx].tolist(),
                second_all[idx].tolist(), weight_all[idx].tolist())
            in_mst[idx] = sel
        out = pdf[["url", "ts_first", "ts_second", "delta_value",
                   "time_span", "nan_fraction"]].copy()
        out["in_mst"] = in_mst
        return out

    return (salted_buckets(pairs, "url", nb)
            .groupBy("_bucket").applyInPandas(fn, MST_SCHEMA))
