"""Dump .explain('formatted') for the r8-touched declared queries into
plans/r08/<query>_{before,after}.txt.

'before' replays the r7 execution shape via PYRATE_NO_CLUSTER_REUSE=1
(the salted-bucket grouped-map path kept as the fallback); 'after' is
the current default. Run: python scripts/dump_plans_r08.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

QUERIES = [
    "linear_rate_kernel", "stack_rate_noiter", "mst_edge_count",
    "orbital_network", "closure_sums_tri", "closure_classmap",
    "closure_fixpoint", "maxvar_full", "dem_error", "temporal_highpass",
    "timeseries_chain", "orbital_detrend",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or QUERIES
    import __spark_entry__ as entrymod
    from pyrate_spark.session import get_session
    spark = get_session("plans-r08", parallelism=4, shuffle_partitions=8)
    qs = entrymod.queries()
    os.makedirs("plans/r08", exist_ok=True)
    for phase, env in (("before", "1"), ("after", "")):
        if env:
            os.environ["PYRATE_NO_CLUSTER_REUSE"] = env
        else:
            os.environ.pop("PYRATE_NO_CLUSTER_REUSE", None)
        for name in only:
            if name not in qs:
                print("skip (not declared):", name)
                continue
            try:
                df = qs[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(f"plans/r08/{name}_{phase}.txt", "w") as f:
                    f.write(buf.getvalue())
                print("wrote", name, phase)
            except Exception as exc:
                print("FAIL", name, phase, str(exc)[:200])
    spark.stop()


if __name__ == "__main__":
    main()
