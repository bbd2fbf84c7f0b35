"""Engine configuration.

Analog of the reference's validated params dict
(/root/reference/pyrate/configuration.py:172-324 and
pyrate/default_parameters.py) trimmed to the knobs the Spark engine
actually uses. Frozen dataclass so a config can key checkpoint manifests.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


@dataclass(frozen=True)
class EngineConfig:
    # --- time-series inversion (reference: pyrate/core/timeseries.py) ---
    ts_method: int = 1          # 1 = Laplacian-smoothed, 2 = SVD (tsmethod)
    ts_pthr: int = 0            # min valid obs per key (TIME_SERIES_PTHRESH)
    sm_order: int = 2           # Laplacian order 1|2 (TIME_SERIES_SM_ORDER)
    sm_factor: float = -0.25    # log10 smoothing factor (TIME_SERIES_SM_FACTOR)

    # --- stacking (reference: pyrate/core/stack.py) ---
    nsig: int = 3               # residual-ratio threshold (LR_NSIG)
    pthr: int = 3               # min obs for stacking (LR_PTHRESH)
    maxsig: int = 2             # error mask threshold (LR_MAXSIG)
    velerror_nsig: int = 2      # error scaling (VELERROR_NSIG, constants.py:283)

    # --- temporal VCM weighting (reference: pyrate/core/covariance.py) ---
    # "identity" = unweighted; "pattern" = Biggs pattern x per-key sample
    # variance; "maxvar" = Biggs pattern x FFT-autocovariance maxvar
    # (covariance.py:65-196 temporal analog)
    vcm_mode: str = "identity"

    # --- temporal filter (reference: pyrate/core/aps.py:322-397) ---
    tlpf_cutoff_days: int = 30  # Gaussian cutoff, days (TLPF_CUTOFF)
    tlpf_pthr: int = 1          # min valid obs (TLPF_PTHR)

    # --- rollup tiers (reference multilook: pyrate/core/gdal_python.py:296-324) ---
    nan_thresh: float = 0.5     # bucket NULL iff null_fraction >= thresh
    tiers: tuple = ("1 hour", "1 day", "1 week")

    # --- pairwise observation network (reference: ifg network) ---
    max_pair_span_days: int = 90   # range-join cap on temporal baseline
    max_pairs_per_epoch: int = 3   # forward-pair fanout per snapshot

    # --- closure (reference: pyrate/core/phase_closure) ---
    max_loop_length: int = 4
    max_loop_redundancy: int = 2
    closure_thr: float = 0.5       # large_dev_thr in cycles of the value unit
    min_loops_per_ifg: int = 2     # drop gate 1 (closure_check.py:96-115)
    ifg_drop_thr: float = 0.5      # breach-fraction drop gate 2

    # --- execution ---
    salt_buckets: int = 64      # key-batching buckets for grouped-map UDFs
    hot_key_salt: int = 8       # extra salt for skewed keys
    checkpoint_dir: str = ""    # per-partition checkpoint manifests; "" = off

    def params_hash(self) -> str:
        """Stable hash keying checkpoint manifests (analog of the
        reference's parameter-keyed npy reuse, orbital.py:392-407)."""
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]


DEFAULT = EngineConfig()
