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
        pytest.skip("Iceberg runtime jars not on the classpath in this "
                    "sandbox (add --packages org.apache.iceberg:"
                    "iceberg-spark-runtime to enable)")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    table = "iceberg_smoke"
    src.writeTo(table).using("iceberg").createOrReplace()
    got = read_pages_table(spark, table, fmt="iceberg")
    assert got.count() == src.count()
