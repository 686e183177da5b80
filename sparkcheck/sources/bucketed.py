"""Bucketed-table support: pre-shuffle the crawl ONCE at write time so every
later join/aggregate on the bucket key reads co-located data with NO
exchange (build brief: "repartition() / bucketing for co-located joins").

At 100 TB the dominant recurring cost of url-keyed work (uniqueness counts,
dup-list joins, resume anti-joins) is re-shuffling the corpus per query.
A table written with bucketBy(url) pays that shuffle once: the scan's output
partitioning already satisfies the hash-clustered distribution, so
groupBy(url) aggregates run exchange-free and joins between two tables
bucketed the same way are sort-merge joins with neither side shuffled
(sortBy makes them sort-free too). Plan-shape pinned in
tests/test_bucketed.py.

Bucket count guidance: pick buckets so one bucket ≈ one HDFS/object-store
block per final file (10^12 rows × ~1KB / 128MB ≈ 8192 buckets); bucket
counts that differ by an integer ratio still co-locate in Spark 4 when
spark.sql.bucketing.coalesceBucketsInJoin.enabled is on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str = "url",
                   buckets: int = 64, path: str | None = None,
                   mode: str = "overwrite", align: bool = True) -> None:
    """Write `df` as a parquet table bucketed (and sorted) by `bucket_col`.
    `path` makes it an external table (keeps test/temp data out of the
    default warehouse); bucket metadata lives in the session catalog.

    `align` repartitions the input by hash(bucket_col) to exactly `buckets`
    partitions first: without it every write task emits one file PER BUCKET
    it holds (tasks × buckets small files — measured 4097 files for a 64-
    task × 64-bucket write, a metadata/open-cost tax on every later read);
    aligned, Spark's repartition and bucketBy use the same murmur3 hash so
    each task holds exactly one bucket → `buckets` files. The shuffle this
    adds is the SAME pre-paid shuffle bucketing exists to amortize."""
    if align:
        from pyspark.sql import functions as F
        df = df.repartition(buckets, F.col(bucket_col))
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(buckets, bucket_col).sortBy(bucket_col))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec; plain
    spark.read.parquet on the files would lose it)."""
    return spark.table(table)
