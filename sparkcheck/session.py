"""SparkSession factory tuned for the validation workload.

local[k] in the sandbox; the same confs apply unchanged under
spark-submit --py-files on a real cluster (shuffle partitions scale with
parallelism, AQE coalesces/re-plans at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | None = None, app: str = "sparkcheck",
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # proportional-to-cores policy (BASELINE.md protocol)
        shuffle_partitions = max(cores * 2, 8)
    # ONE BLAS thread per python worker — Spark supplies the parallelism.
    # Without this, N concurrent pandas-UDF workers × OpenBLAS's spin-wait
    # threads sched_yield-storm the box once two Arrow stages stack in one
    # task: measured 195.6s → ~8s on the composed ivf_topk at 1M vectors
    # (85% kernel time, task CPU ~2s of a 135s wall — the r5 VERDICT's
    # unreconciled ann_ivf_topk_1m row). Same setting a real cluster wants:
    # one BLAS thread per task slot, scale via tasks. Set via os.environ
    # (local mode: python workers inherit the driver JVM's env, which
    # snapshots THIS process's env at first launch) AND executorEnv (real
    # clusters).
    for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
              "MKL_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(v, "1")
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode = one JVM on the driver; this is the only memory knob.
        # Measured: a 48g heap is ~25-50% SLOWER than 16g at local[32] on
        # this box (GC ergonomics + cold heap pages) — keep it modest, the
        # persisted frame is small (columnar-compressed) and spills to disk.
        .config("spark.driver.memory", os.environ.get("SPARKCHECK_DRIVER_MEM",
                                                      "16g"))
        # pin -Xms: with the default tiny initial heap, the FIRST large
        # persist of a session pays repeated full GCs while the heap grows
        # (measured 4x slowdown of the first materialization at local[32])
        .config("spark.driver.extraJavaOptions", "-Xms12g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # cluster-mode mirror of the BLAS pinning above
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    # Iceberg runtime wiring (tests/test_iceberg.py un-skips when present):
    # point SPARKCHECK_ICEBERG_JAR at the runtime jar fetched by
    # scripts/fetch_iceberg.sh — this sandbox has no network (probe
    # documented in that script), but the same env var makes the round-trip
    # tests reproducible on any connected machine with zero code changes.
    jar = os.environ.get("SPARKCHECK_ICEBERG_JAR")
    if jar:
        wh = os.environ.get("SPARKCHECK_ICEBERG_WAREHOUSE",
                            "/tmp/sparkcheck-warehouse")
        builder = (
            builder
            .config("spark.jars", jar)
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions."
                    "IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.crawl",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.crawl.type", "hadoop")
            .config("spark.sql.catalog.crawl.warehouse", wh))
    return builder.getOrCreate()
