"""One-shot 8v32 scaling attempt (r6 verdict ask #8).

The banked gate is the auto-picked pair in ``run_scaling.py`` (2v8 on
this box — larger pairs saturate the shared microVM's co-tenant
bandwidth, see pick_pair). BASELINE's north rule really wants a second
point on the curve, so this runner attempts the 8v32 pair explicitly
under the same documented criterion: the attempt is *admissible* when
the capacity probe says the box can deliver >= 3.3x headroom from 8 to
32 procs today, and otherwise recorded as a disclosed
capacity-limited attempt. Results go to BENCH_scaling_8v32.json and
are appended to BENCH.md by the caller — the 2v8 bank is never
overwritten.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scaling import (REPO, _combine_min, cpu_capacity,  # noqa: E402
                         run_level)


def main():
    n_urls = int(os.environ.get("PYRATE_SCALE_URLS", "4000"))
    epochs = int(os.environ.get("PYRATE_SCALE_EPOCHS", "384"))
    rel_urls = int(os.environ.get("PYRATE_SCALE_REL_URLS", "48000"))
    rel_epochs = int(os.environ.get("PYRATE_SCALE_REL_EPOCHS", "1600"))
    reps = int(os.environ.get("PYRATE_SCALE_REPS", "3"))
    rounds = int(os.environ.get("PYRATE_SCALE_ROUNDS", "2"))
    cap8 = cpu_capacity(8)
    cap32 = cpu_capacity(32)
    attainable = cap32 / cap8
    admissible = attainable >= 3.3
    runs_lo, runs_hi = [], []
    for _ in range(rounds):
        runs_lo.append(run_level(8, n_urls, epochs, reps,
                                 rel_urls, rel_epochs))
        runs_hi.append(run_level(32, n_urls, epochs, reps,
                                 rel_urls, rel_epochs))
    r_lo = _combine_min(runs_lo)
    r_hi = _combine_min(runs_hi)
    core_lo = sum(r_lo["stages"].values())
    core_hi = sum(r_hi["stages"].values())
    speedup = core_lo / core_hi
    eff_raw = speedup / 4.0
    # re-probe capacity after the runs: box state drifts on minute
    # scales and the stamp should bracket the measurement
    cap8_post = cpu_capacity(8)
    cap32_post = cpu_capacity(32)
    result = {
        "metric": "scaling_efficiency_8v32",
        "value": round(eff_raw, 3),
        "unit": "fraction",
        "n_cpus": 8, "n4_cpus": 32, "reps": reps, "rounds": rounds,
        "cpu_capacity_8_pre": round(cap8, 1),
        "cpu_capacity_32_pre": round(cap32, 1),
        "cpu_capacity_8_post": round(cap8_post, 1),
        "cpu_capacity_32_post": round(cap32_post, 1),
        "attainable_speedup_pre": round(attainable, 2),
        "admissible_pre": admissible,
        "measured_speedup": round(speedup, 2),
        "core_sec_8": round(core_lo, 2), "core_sec_32": round(core_hi, 2),
        "stages_8": r_lo["stages"], "stages_32": r_hi["stages"],
        "stage_efficiency_raw": {
            s: round((r_lo["stages"][s] / r_hi["stages"][s]) / 4.0, 3)
            for s in r_lo["stages"]},
        "pass_0_8": eff_raw >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_scaling_8v32.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
