"""Iceberg source path (north-star input format).

The sandbox has no Iceberg runtime jars, so the full read path is exercised
only when the classpath provides them (skipped-with-reason otherwise); what
IS always tested: capability detection, the actionable error message, and
that the reader falls back to the parquet path used everywhere else.

To run against real Iceberg, submit with:
    spark-submit --py-files dist/sparkcheck.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.crawl.type=hadoop \
      --conf spark.sql.catalog.crawl.warehouse=<warehouse-uri> \
      spark_job.py --table crawl.db.pages
and pass fmt='iceberg', source='crawl.db.pages' (snapshot_id pins a
deterministic re-run — the natural drift-baseline anchor).
"""

from __future__ import annotations

import pytest

from sparkcheck.sources.reader import iceberg_available, read_pages_table

from .conftest import SF_SMALL


def test_iceberg_capability_detection_and_error_message(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — error-path test not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime not on the "
                                           "classpath"):
        read_pages_table(spark, "crawl.db.pages", fmt="iceberg")


def test_parquet_fallback_reads_documents(spark):
    df = read_pages_table(spark, f"{SF_SMALL}/documents.parquet")
    assert df.count() > 0 and "doc_id" in df.columns


def test_iceberg_read_smoke(spark, tmp_path):
    """Full Iceberg write/read/snapshot-pin smoke — runs only with the
    runtime jars on the classpath."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath (this "
                    "sandbox has no network — see scripts/fetch_iceberg.sh "
                    "for the pinned recipe; set SPARKCHECK_ICEBERG_JAR to "
                    "run un-skipped)")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    table = "iceberg_smoke"
    src.writeTo(table).using("iceberg").createOrReplace()
    got = read_pages_table(spark, table, fmt="iceberg")
    assert got.count() == src.count()


def test_iceberg_store_requires_runtime(spark):
    from sparkcheck.manifest import IcebergStore
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — error-path test not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime not on the "
                                           "classpath"):
        IcebergStore(spark, "crawl.db.ckpt")


def test_iceberg_store_roundtrip(spark, tmp_path):
    """write → resume → reconcile over Iceberg tables, mirroring
    test_manifest_resume — runs only with the runtime jars + a catalog."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath (this "
                    "sandbox has no network — see scripts/fetch_iceberg.sh; "
                    "SPARKCHECK_ICEBERG_JAR wires the jar AND the `crawl` "
                    "hadoop catalog this test's namespace expects)")
    import os

    from pyspark.sql import functions as F

    from sparkcheck import FieldConstraint, build_validator
    from sparkcheck.manifest import IcebergStore, run_resumable

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    inp = str(tmp_path / "docs")
    src.repartition(3).write.parquet(inp)

    def builder_fn(spark, pending):
        v = (build_validator()
             .input(constraints=[FieldConstraint(
                 "doc_id", "doc_id IS NOT NULL", "id required")],
                 key_col="doc_id")
             .provide())
        return v, pending

    store = IcebergStore(spark, "crawl.db.ckpt")
    _, n1, _ = run_resumable(spark, inp, builder_fn, store=store,
                             run_id="r1")
    assert n1 == 3
    # resume: nothing pending
    _, n2, res2 = run_resumable(spark, inp, builder_fn, store=store,
                                run_id="r2")
    assert n2 == 0 and res2 is None
    # orphan: write an output run with no manifest entry, reconcile drops it
    store.write(spark.table(store._tbl("verdicts")).drop("run_id").limit(1),
                "verdicts", "orphan-run")
    assert store.reconcile(spark) == ["orphan-run"]
    left = (spark.table(store._tbl("verdicts"))
            .filter(F.col("run_id") == "orphan-run").count())
    assert left == 0
