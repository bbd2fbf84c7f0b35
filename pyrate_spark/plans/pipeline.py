"""Orderable correction pipeline — the reference's closest thing to a
query language: a linear logical plan over named operators
(correct.py:197-205 registry; user-orderable sequence
configuration.py:189-200; validation correct.py:237-241).

Stages are lazy DataFrame -> DataFrame transformations composed in the
user's order; nothing executes until an action runs, so Catalyst
optimises across stage boundaries (the reference re-writes GeoTIFFs to
disk between steps — here the 'files' are just plan nodes).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from pyrate_spark.config import EngineConfig, DEFAULT
from pyrate_spark.operators import corrections as C

# series-stage registry (correct.py:197-205 analog)
SERIES_STEPS: dict[str, Callable[[DataFrame, EngineConfig], DataFrame]] = {
    "orbfit": lambda df, cfg: C.orbital_detrend(df, cfg, degree=1),
    "refphase": lambda df, cfg: C.ref_phase_subtract(df, cfg),
    "apscorrect": lambda df, cfg: C.aps_temporal_filter(df, cfg),
    "maxvar": lambda df, cfg: C.maxvar_column(df, cfg),
}

DEFAULT_ORDER = ("orbfit", "refphase", "apscorrect", "maxvar")


def validate_order(order: Sequence[str]) -> None:
    """correct.py:237-241: unknown step names are a configuration
    error, not a silent no-op."""
    unknown = [s for s in order if s not in SERIES_STEPS]
    if unknown:
        raise ValueError(
            f"unknown correct step(s) {unknown}; "
            f"valid: {sorted(SERIES_STEPS)}")


def run_correct(series: DataFrame, cfg: EngineConfig = DEFAULT,
                order: Sequence[str] = DEFAULT_ORDER) -> DataFrame:
    """Apply the configured correction sequence to the series."""
    validate_order(order)
    out = series
    for step in order:
        out = SERIES_STEPS[step](out, cfg)
    return out
