"""Input-table readers.

Production target is an Iceberg table of pages (BASELINE.json input_hint);
the sandbox has no Iceberg runtime jars, so the Iceberg path is gated behind
availability and the parquet path is the tested default. Both return plain
DataFrames — everything downstream is format-agnostic.

Iceberg specifics handled here when available:
- partition-transform pruning (e.g. days(warc_ts), bucket(url)) comes free
  from Catalyst once filters are plain Column predicates (SURVEY.md §4.2);
- snapshot pinning (VERSION AS OF) gives deterministic re-runs and is the
  natural unit for the drift baseline ("previous snapshot").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable")
        return True
    except Exception:
        return False


def read_pages_table(spark: SparkSession, source: str,
                     fmt: str = "parquet",
                     snapshot_id: int | None = None) -> DataFrame:
    """Read the pages input: parquet path or Iceberg table name.

    fmt='iceberg' requires the Iceberg runtime on the classpath; pass
    snapshot_id to pin a snapshot (resumable, deterministic re-runs)."""
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12 "
                "or use fmt='parquet'")
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source)
    return spark.read.parquet(source)
