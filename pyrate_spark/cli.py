"""Workflow CLI — the reference's ``pyrate <step> -f config`` surface
(main.py:55-160; step list constants.py CLI_DESCRIPTION) recast for the
Spark engine. Same six ordered steps, same colon-separated text config
format (configuration.py), same validate-before-run contract — with
parquet step products under ``out_dir`` instead of GeoTIFF/npy files,
and a params-hash manifest per step so a re-run with unchanged
parameters is skipped (the reference's cached-npy reuse,
orbital.py:392-407).

Steps::

    ingest      conv2tif analog: raw/demo pages -> normalised pages table
    prepifg     extract + unit conversion + quality mask -> observation series
    correct     ordered series corrections + pair network + closure selection
    timeseries  per-url inversion -> incremental/cumulative series
    stack       iterative WLS linear rate per url (+ maxsig mask)
    merge       tier rollup cascade + encoded tier sink + quicklook preview
    workflow    all of the above, in order (main.py:152-160)

Each step is a plain function taking ``(spark, run_cfg)`` so tests and
notebooks can drive it on an existing session; ``main()`` is the
``python -m pyrate_spark`` entry that builds the session itself.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrate_spark.config import EngineConfig

log = logging.getLogger("pyrate_spark")

#: reference config keys (default_parameters.py) accepted as aliases for
#: the engine's field names, so a switching user's PyRate config keeps
#: working unchanged.
REF_ALIASES = {
    "tsmethod": "ts_method",
    "smorder": "sm_order",
    "smfactor": "sm_factor",
    "tlpfcutoff": "tlpf_cutoff_days",
    "tlpfpthr": "tlpf_pthr",
    "noDataAveragingThreshold": "nan_thresh",
}

#: run-level (non-EngineConfig) keys and their types/defaults.
RUN_KEYS = {
    "out_dir": (str, None),            # required
    "pages_path": (str, ""),           # parquet of pages; "" = demo data
    "demo_urls": (int, 40),
    "demo_epochs": (int, 24),
    "demo_seed": (int, 42),
    "wavelength": (float, 0.0),        # >0 applies the radians->mm analog
    "coh_thr": (float, 0.0),           # >0 masks values where coh < thr
    "correct_order": (str, "orbfit refphase apscorrect maxvar"),
    "closure": (int, 1),               # 1 = closure edge selection on
    "stream_watermark": (str, "2 hours"),  # late-data bound, stream step
    "parallelism": (int, 0),           # 0 = session default
    "shuffle_partitions": (int, 0),
}

STEPS = ("ingest", "prepifg", "correct", "timeseries", "stack", "merge")

CLI_DESCRIPTION = """pyrate-spark workflow:

    Step 1: ingest
    Step 2: prepifg
    Step 3: correct
    Step 4: timeseries
    Step 5: stack
    Step 6: merge

Each step reads the previous step's parquet products from out_dir.
`stream` (no reference analog) runs one incremental continuous-
aggregate maintenance pass over the ingest table; `workflow` runs
steps 1-6 in order.
"""


@dataclasses.dataclass(frozen=True)
class RunConfig:
    engine: EngineConfig
    out_dir: str
    pages_path: str = ""
    demo_urls: int = 40
    demo_epochs: int = 24
    demo_seed: int = 42
    wavelength: float = 0.0
    coh_thr: float = 0.0
    correct_order: str = "orbfit refphase apscorrect maxvar"
    closure: int = 1
    stream_watermark: str = "2 hours"
    parallelism: int = 0
    shuffle_partitions: int = 0

    def order(self) -> tuple:
        return tuple(self.correct_order.replace(",", " ").split())

    def params_hash(self) -> str:
        """Engine hash + the run knobs that change step outputs (NOT
        out_dir/parallelism — moving a run or resizing the cluster must
        not invalidate its products)."""
        import hashlib
        run = {k: getattr(self, k) for k in
               ("pages_path", "demo_urls", "demo_epochs", "demo_seed",
                "wavelength", "coh_thr", "correct_order", "closure")}
        blob = self.engine.params_hash() + json.dumps(run, sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _coerce(raw: str, typ):
    if typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    if typ is tuple:   # tiers: comma-separated window strings
        return tuple(t.strip() for t in raw.split(",") if t.strip())
    return raw


def parse_config(path: str) -> RunConfig:
    """Parse a reference-style text config: ``key: value`` lines, ``#``
    comments (configuration.py:172-199 reads the same shape). Unknown
    keys and out-of-range values are rejected before any job is planned
    (configuration.py:47-69 validate_parameter_value)."""
    engine_fields = {f.name: f.type for f in
                     dataclasses.fields(EngineConfig)}
    engine_types = {f.name: type(f.default) if f.name != "tiers" else tuple
                    for f in dataclasses.fields(EngineConfig)}
    engine_kv: dict = {}
    run_kv: dict = {}
    with open(path) as fh:
        for lineno, line in enumerate(fh, 1):
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if ":" not in line:
                raise ValueError(
                    f"{path}:{lineno}: expected 'key: value', got {line!r}")
            key, raw = (s.strip() for s in line.split(":", 1))
            key = REF_ALIASES.get(key, key)
            try:
                if key in engine_fields:
                    engine_kv[key] = _coerce(raw, engine_types[key])
                elif key in RUN_KEYS:
                    run_kv[key] = _coerce(raw, RUN_KEYS[key][0])
                else:
                    valid = sorted(set(engine_fields) | set(RUN_KEYS)
                                   | set(REF_ALIASES))
                    raise ValueError(
                        f"unknown parameter {key!r}; valid: {valid}")
            except ValueError as e:
                raise ValueError(f"{path}:{lineno}: {e}") from None
    if "out_dir" not in run_kv:
        raise ValueError(f"{path}: required parameter 'out_dir' missing")
    # EngineConfig.__post_init__ range-validates the engine knobs
    return RunConfig(engine=EngineConfig(**engine_kv), **run_kv)


# ---------------------------------------------------------------- steps

def _product(rc: RunConfig, step: str) -> str:
    return os.path.join(rc.out_dir, step)


def _manifest_path(rc: RunConfig, step: str) -> str:
    return os.path.join(_product(rc, step), "_MANIFEST.json")


def _fresh(rc: RunConfig, step: str) -> bool:
    """True iff the step's product manifest matches the current params
    (the reference's reuse-if-params-unchanged gate)."""
    try:
        with open(_manifest_path(rc, step)) as fh:
            m = json.load(fh)
        return m.get("params_hash") == rc.params_hash() and m.get("done")
    except (OSError, json.JSONDecodeError):
        return False


def _finish(rc: RunConfig, step: str, outputs: dict) -> dict:
    os.makedirs(_product(rc, step), exist_ok=True)
    manifest = {"step": step, "params_hash": rc.params_hash(),
                "outputs": outputs, "done": True,
                "finished_unix": int(time.time())}
    tmp = _manifest_path(rc, step) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(rc, step))
    log.info("%s: done -> %s", step, _product(rc, step))
    return manifest


def _require(rc: RunConfig, step: str, needed: str) -> str:
    path = os.path.join(_product(rc, needed), _PRIMARY[needed])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"step '{step}' needs the '{needed}' product at {path}; "
            f"run `pyrate_spark {needed} -f <config>` first")
    return path


#: primary parquet product of each step (what the next step reads)
_PRIMARY = {"ingest": "pages", "prepifg": "series", "correct": "pairs",
            "timeseries": "tscuml", "stack": "rates"}


def step_ingest(spark: SparkSession, rc: RunConfig,
                force: bool = False) -> dict:
    """conv2tif analog (main.py:110-112): bring the raw input into the
    engine's normalised pages table. Demo mode synthesises the
    deterministic pages table (datagen) when no ``pages_path`` is
    configured."""
    if _fresh(rc, "ingest") and not force:
        log.info("ingest: up to date, skipping")
        return {"skipped": True}
    if rc.pages_path:
        pages = spark.read.parquet(rc.pages_path)
        # documents-table shape -> pages shape: tolerate either
        if "warc_ts" not in pages.columns and "ts" in pages.columns:
            pages = pages.withColumnRenamed("ts", "warc_ts")
    else:
        from pyrate_spark.datagen import generate_pages
        pages = generate_pages(spark, n_urls=rc.demo_urls,
                               epochs_per_url=rc.demo_epochs,
                               seed=rc.demo_seed)
    out = os.path.join(_product(rc, "ingest"), "pages")
    pages.write.mode("overwrite").parquet(out)
    return _finish(rc, "ingest", {"pages": out})


def step_prepifg(spark: SparkSession, rc: RunConfig,
                 force: bool = False) -> dict:
    """prepifg analog (main.py:114-116): pages -> observation series.
    nodata -> NULL happens inside extract_series; ``wavelength`` > 0
    applies the radians->mm unit projection (shared.py:764-787 analog);
    ``coh_thr`` > 0 masks low-quality observations when the input
    carries a ``coh`` column (coherence masking, prepifg step)."""
    if _fresh(rc, "prepifg") and not force:
        log.info("prepifg: up to date, skipping")
        return {"skipped": True}
    from pyrate_spark.operators.extract import extract_series, to_mm_analog
    pages = spark.read.parquet(_require(rc, "prepifg", "ingest"))
    series = extract_series(pages)
    if rc.wavelength > 0:
        series = to_mm_analog(series, rc.wavelength)
    if rc.coh_thr > 0 and "coh" in pages.columns:
        from pyrate_spark.operators.corrections import quality_mask
        coh = pages.select("url", "warc_ts", "coh")
        series = quality_mask(series.join(coh, ["url", "warc_ts"]),
                              "coh", rc.coh_thr).drop("coh")
    out = os.path.join(_product(rc, "prepifg"), "series")
    series.write.mode("overwrite").parquet(out)
    return _finish(rc, "prepifg", {"series": out})


def step_correct(spark: SparkSession, rc: RunConfig,
                 force: bool = False) -> dict:
    """correct analog (main.py:118-121): run the user-ordered series
    corrections (plans/pipeline.py registry), build the redundant pair
    network, then — when closure is on — keep only edges surviving the
    iterative closure fixpoint, refreshing the pair list exactly like
    the reference's update_params_due_to_ifg_selection (main.py:43-49:
    the filtered ifg list replaces the original for later steps)."""
    if _fresh(rc, "correct") and not force:
        log.info("correct: up to date, skipping")
        return {"skipped": True}
    from pyrate_spark.plans.pipeline import run_correct, validate_order
    from pyrate_spark.operators.pairs import network_pairs
    cfg = rc.engine
    order = rc.order()
    validate_order(order)
    series = spark.read.parquet(_require(rc, "correct", "prepifg"))
    corrected = run_correct(series, cfg, order)
    pairs = network_pairs(corrected,
                          max_span_days=cfg.max_pair_span_days,
                          max_pairs_per_epoch=cfg.max_pairs_per_epoch)
    series_out = os.path.join(_product(rc, "correct"), "series")
    pairs_out = os.path.join(_product(rc, "correct"), "pairs")
    corrected.write.mode("overwrite").parquet(series_out)
    if rc.closure:
        from pyrate_spark.operators.corrections import closure_fixpoint
        survivors = closure_fixpoint(pairs, cfg).select(
            "url", "ts_first", "ts_second")
        pairs = pairs.join(survivors, ["url", "ts_first", "ts_second"],
                           "left_semi")
    pairs.write.mode("overwrite").parquet(pairs_out)
    return _finish(rc, "correct", {"series": series_out,
                                   "pairs": pairs_out})


def step_timeseries(spark: SparkSession, rc: RunConfig,
                    force: bool = False) -> dict:
    """timeseries analog (main.py:123-127): per-url SVD/Laplacian
    inversion of the corrected pair network into incremental and
    cumulative per-epoch series."""
    if _fresh(rc, "timeseries") and not force:
        log.info("timeseries: up to date, skipping")
        return {"skipped": True}
    from pyrate_spark.operators.grouped import timeseries_per_url
    pairs = spark.read.parquet(_require(rc, "timeseries", "correct"))
    out = os.path.join(_product(rc, "timeseries"), "tscuml")
    timeseries_per_url(pairs, rc.engine).write.mode("overwrite").parquet(out)
    return _finish(rc, "timeseries", {"tscuml": out})


def step_stack(spark: SparkSession, rc: RunConfig,
               force: bool = False) -> dict:
    """stack analog (main.py:129-133): iterative weighted linear-rate
    stacking per url, then the maxsig error mask (stack.py:62-89)."""
    if _fresh(rc, "stack") and not force:
        log.info("stack: up to date, skipping")
        return {"skipped": True}
    from pyrate_spark.operators.grouped import (stack_rate_per_url,
                                                mask_rate_df)
    pairs = spark.read.parquet(_require(rc, "stack", "correct"))
    rates = mask_rate_df(stack_rate_per_url(pairs, rc.engine),
                         rc.engine.maxsig)
    out = os.path.join(_product(rc, "stack"), "rates")
    rates.write.mode("overwrite").parquet(out)
    return _finish(rc, "stack", {"rates": out})


def step_merge(spark: SparkSession, rc: RunConfig,
               force: bool = False) -> dict:
    """merge analog (main.py:135-139): assemble the user-facing
    products — the tier rollup cascade (raw -> hourly -> daily -> ...)
    with the Gorilla-encoded tier sink per tier, plus the quicklook
    PNG/KML preview of the stacked rates (merge.py quicklook outputs)."""
    if _fresh(rc, "merge") and not force:
        log.info("merge: up to date, skipping")
        return {"skipped": True}
    from pyrate_spark.operators.rollup import tier_rollup, cascade_rollup
    from pyrate_spark.operators.tiersink import encode_tier
    from pyrate_spark.operators.quicklook import rate_grid, quicklook_sink
    cfg = rc.engine
    series = spark.read.parquet(
        os.path.join(_product(rc, "correct"), "series"))
    outputs: dict = {}
    tier_df = None
    for i, tier in enumerate(cfg.tiers):
        tier_df = (tier_rollup(series, tier, thresh=cfg.nan_thresh)
                   if i == 0 else
                   cascade_rollup(tier_df, tier, thresh=cfg.nan_thresh))
        slug = tier.replace(" ", "_")
        plain = os.path.join(_product(rc, "merge"), f"tier_{slug}")
        tier_df.write.mode("overwrite").parquet(plain)
        # re-read so the cascade consumes the materialised parent, not a
        # re-computed lineage (each tier is read once, written once)
        tier_df = spark.read.parquet(plain)
        enc = os.path.join(_product(rc, "merge"), f"tier_{slug}_gorilla")
        encode_tier(tier_df, tier, cfg=cfg).write.mode(
            "overwrite").parquet(enc)
        outputs[f"tier_{slug}"] = plain
        outputs[f"tier_{slug}_gorilla"] = enc
    rates = spark.read.parquet(_require(rc, "merge", "stack"))
    ql_dir = os.path.join(_product(rc, "merge"), "quicklook")
    # render the maxsig-masked rate like the reference's merge products;
    # if the mask removed everything fall back to the raw rate so the
    # preview still exists (the reference writes an all-nodata tif)
    n_masked = rates.where(F.col("rate_masked").isNotNull()).limit(1).count()
    vcol = "rate_masked" if n_masked else "rate"
    grid = rate_grid(rates, value_col=vcol)
    stats = quicklook_sink(grid, ql_dir, "rate")
    outputs["quicklook"] = ql_dir
    outputs["quicklook_stats"] = stats
    return _finish(rc, "merge", outputs)


def step_stream(spark: SparkSession, rc: RunConfig,
                force: bool = False) -> dict:
    """Continuous-aggregate maintenance (the north-star's incremental
    tier upkeep; no reference analog — PyRate recomputes): ONE
    availableNow Structured-Streaming pass per invocation over the
    ingest pages table, appending newly-finalised buckets of the first
    tier under ``out_dir/stream``, then cascading each coarser tier
    incrementally from the finer tier's table. Idempotence comes from
    the per-tier streaming checkpoints, not a manifest: a re-run with
    no new input files appends nothing, and scheduling this step
    periodically IS the continuous aggregate. ``--force`` clears the
    stream products and checkpoints and reprocesses from scratch.

    Each pass runs as a single micro-batch (maxFilesPerTrigger is set
    above any realistic backlog): with a multi-batch split, append
    mode's watermark — advanced between batches — could silently drop
    buckets of not-actually-late rows whose files sorted later
    (documented in the streaming_rollup_hourly gate). Genuinely late
    data (older than ``stream_watermark`` behind the frontier at a
    later pass) is dropped by contract; route it through
    plans/backfill.py instead."""
    import shutil
    base = _product(rc, "stream")
    if force and os.path.exists(base):
        shutil.rmtree(base)
    pages_path = _require(rc, "stream", "ingest")
    from pyrate_spark.streaming.tiers import (streaming_tier_rollup,
                                              streaming_cascade_rollup)
    cfg = rc.engine
    ddl = spark.read.parquet(pages_path).schema
    outputs: dict = {}
    src_path, src_schema = pages_path, ddl
    tier_ddl = ("url string, bucket_start timestamp, value_avg double, "
                "null_fraction double, n_obs long")
    for i, tier in enumerate(cfg.tiers):
        slug = tier.replace(" ", "_")
        out = os.path.join(base, f"tier_{slug}")
        ckpt = os.path.join(base, f"_checkpoint_{slug}")
        stream = (spark.readStream.schema(src_schema)
                  .option("maxFilesPerTrigger", "1000000")
                  .parquet(src_path))
        tiers = (streaming_tier_rollup(stream, tier, thresh=cfg.nan_thresh,
                                       watermark=rc.stream_watermark)
                 if i == 0 else
                 streaming_cascade_rollup(stream, tier,
                                          thresh=cfg.nan_thresh,
                                          watermark="0 seconds"))
        job = (tiers.writeStream.format("parquet")
               .option("path", out).option("checkpointLocation", ckpt)
               .outputMode("append").trigger(availableNow=True).start())
        job.awaitTermination()
        outputs[f"tier_{slug}"] = out
        src_path, src_schema = out, tier_ddl
    log.info("stream: maintenance pass done -> %s", base)
    return {"outputs": outputs}


STEP_FNS = {"ingest": step_ingest, "prepifg": step_prepifg,
            "correct": step_correct, "timeseries": step_timeseries,
            "stack": step_stack, "merge": step_merge,
            "stream": step_stream}


def run_workflow(spark: SparkSession, rc: RunConfig,
                 force: bool = False) -> dict:
    """All steps in order (main.py:152-160 'workflow')."""
    results = {}
    for step in STEPS:
        t0 = time.time()
        results[step] = STEP_FNS[step](spark, rc, force=force)
        log.info("%s finished in %.1fs", step, time.time() - t0)
    return results


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="pyrate_spark", description=CLI_DESCRIPTION,
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("-v", "--verbosity", default="INFO",
                        choices=["DEBUG", "INFO", "WARNING", "ERROR"])
    sub = parser.add_subparsers(dest="command")
    sub.required = True
    for name in STEPS + ("stream", "workflow"):
        p = sub.add_parser(name)
        p.add_argument("-f", "--config_file", required=True)
        p.add_argument("--force", action="store_true",
                       help="re-run even if the product is up to date")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=args.verbosity,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    rc = parse_config(args.config_file)
    from pyrate_spark.session import get_session
    spark = get_session(
        f"pyrate-spark-{args.command}",
        parallelism=rc.parallelism or None,
        shuffle_partitions=rc.shuffle_partitions or None)
    t0 = time.time()
    try:
        if args.command == "workflow":
            run_workflow(spark, rc, force=args.force)
        else:
            STEP_FNS[args.command](spark, rc, force=args.force)
    finally:
        log.info("total wall time %.1fs", time.time() - t0)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
