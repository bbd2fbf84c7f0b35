"""SparkSession factory with the engine's standard configuration.

All knobs here are cluster-scale defaults: AQE on (runtime skew-join
splitting + partition coalescing), Arrow on (every grouped-map kernel is
Arrow-batched), explicit shuffle-partition count sized to the target
parallelism. On a real cluster the same code ships via
``spark-submit --py-files pyrate_spark.zip job.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "pyrate-spark",
                parallelism: int | None = None,
                shuffle_partitions: int | None = None,
                extra: dict | None = None) -> SparkSession:
    # one BLAS thread per python worker: with N workers already running
    # one task each, multi-threaded BLAS inside the numpy kernels would
    # oversubscribe N*N threads and thrash. Must be set before workers
    # fork (they inherit the driver env in local mode).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")
    # glibc: keep big numpy buffers on the heap (reused) instead of
    # per-allocation mmap/munmap cycles. On hosts where first-touch
    # page faulting is slow (measured ~2k faults/s on this microVM
    # under memory-manager pressure), refaulting a freed-and-remmapped
    # 100 MB kernel temporary costs SECONDS per allocation; heap reuse
    # pays it once per worker. Read by glibc at process start, so it
    # must be exported before the JVM forks the python workers.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        # AQE: runtime re-planning, skew-join mitigation, coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batch transfer for all pandas UDFs
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # r8: the grouped-list boundary ships one row per KEY with a
        # list column, so row-count alone no longer bounds batch
        # memory — cap the bytes too (Spark 4 knob; ~256 MB keeps a
        # worker's decode buffer bounded however long the lists get)
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str(256 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or (cpus or 32)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
                os.environ.get("PYRATE_SPARK_WAREHOUSE",
                               "/tmp/pyrate-spark-warehouse"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("PYRATE_SPARK_DRIVER_MEM", "12g"))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
