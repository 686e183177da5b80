"""Per-column statistics in one aggregate pass (north_star metrics).

For each requested column: null-rate, distinct-count (HyperLogLog++ via
approx_count_distinct — mergeable sketches, partial+final hash aggregation),
min/max. String columns additionally get length histograms
(floor(length/bin_width) buckets) via a single groupBy.

Everything is built-in Spark aggregate expressions — map-side partial
aggregation means one shuffle of O(columns) partial states per partition, no
per-row Python, scales linearly with input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = ("col string, null_rate double, n_distinct bigint, "
                "min_value string, max_value string")


def column_stats(df: DataFrame, cols: list[str], hll_rsd: float = 0.05,
                 exact_distinct: bool = False) -> DataFrame:
    """Long-format stats table: (col, null_rate, n_distinct, min_value,
    max_value). One wide aggregate → unpivoted driver-side (k columns → k
    rows; the aggregate itself is a single Spark job)."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"nr_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c), rsd=hll_rsd)
                        .alias(f"nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"mx_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into long format with one stack() expr —
    # still lazy, no collect
    parts = ", ".join(
        f"'{c}', `nr_{c}`, `nd_{c}`, `mn_{c}`, `mx_{c}`" for c in cols)
    long = wide.selectExpr(
        f"stack({len(cols)}, {parts}) as "
        "(col, null_rate, n_distinct, min_value, max_value)")
    return long


def length_histogram(df: DataFrame, col: str, bin_width: int = 50) -> DataFrame:
    """Histogram of string lengths: (bucket bigint, n bigint); bucket =
    floor(length(col)/bin_width). NULLs excluded (they're in null_rate)."""
    return (df.filter(F.col(col).isNotNull())
              .groupBy(F.floor(F.length(F.col(col)) / bin_width).alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n")))


def length_histograms(df: DataFrame, cols: list[str],
                      bin_width: int = 50) -> DataFrame:
    """Multi-column length histograms, long format: (col, bucket, n).
    One map-side-combining groupBy per column, unioned — each column's
    histogram is an independent O(buckets) aggregate, no cross-column
    shuffle. Backs ColumnStatsRule.hist_cols (ValidationResult.hists)."""
    parts = [length_histogram(df, c, bin_width)
             .select(F.lit(c).alias("col"), "bucket", "n") for c in cols]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def column_sketches(df: DataFrame, cols: list[str],
                    lg_k: int = 12) -> DataFrame:
    """Mergeable HLL sketches, long format: (col, sketch binary).

    Resume correctness (SURVEY.md §7 hard part e): distinct counts cannot be
    merged from final numbers, but Datasketches HLL sketches can — each
    incremental run stores its sketches; the global distinct estimate is
    hll_union_agg over all runs' sketches."""
    aggs = [F.hll_sketch_agg(F.col(c).cast("string"), lg_k).alias(f"sk_{c}")
            for c in cols]
    wide = df.agg(*aggs)
    parts = ", ".join(f"'{c}', `sk_{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) as (col, sketch)")


def merge_sketch_estimates(sketches: DataFrame) -> DataFrame:
    """(col, n_distinct) from a union of per-run sketch tables."""
    return (sketches.groupBy("col")
            .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
                 .alias("n_distinct")))


def numeric_quantiles(df: DataFrame, cols: list[str],
                      probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)) \
        -> DataFrame:
    """Exact interpolated quantiles per numeric column, long format:
    (col, p, q). Spark's `percentile` and DuckDB's `quantile_cont` share the
    same linear-interpolation definition (value at rank (n-1)·p), so the
    oracle matches at 4dp. For sketch-based approximation at 10^12 rows use
    `approx_percentile` instead — same plan shape, mergeable partials —
    traded here for cross-engine exactness."""
    probs_sql = ", ".join(str(p) for p in probs)
    aggs = [F.expr(f"percentile({c}, array({probs_sql}))").alias(f"q_{c}")
            for c in cols]
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        for i, p in enumerate(probs):
            # NB: in SQL text `10000.0` parses as DECIMAL (unlike the python
            # API where a float literal is double) — divide by a cast double
            rows.append(f"'{c}', cast({p} as double), "
                        f"floor(`q_{c}`[{i}] * 10000 + 0.5) "
                        f"/ cast(10000 as double)")
    return wide.selectExpr(
        f"stack({len(cols) * len(probs)}, {', '.join(rows)}) as (col, p, q)")


def numeric_quantiles_approx(df: DataFrame, cols: list[str],
                             probs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                         0.95),
                             accuracy: int = 10000) -> DataFrame:
    """Sketch-based quantiles — the 10^12-row drop-in for numeric_quantiles
    (same output shape (col, p, q), same single-agg plan): approx_percentile
    builds mergeable Greenwald-Khanna sketches with rank error ≤ n/accuracy,
    so partial aggregation and resume-merging work where exact `percentile`
    would buffer every value. Tolerance-tested against the exact operator in
    tests/test_sketches.py."""
    probs_sql = ", ".join(str(p) for p in probs)
    aggs = [F.expr(f"approx_percentile({c}, array({probs_sql}), {accuracy})")
            .alias(f"q_{c}") for c in cols]
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        for i, p in enumerate(probs):
            rows.append(f"'{c}', cast({p} as double), "
                        f"cast(`q_{c}`[{i}] as double)")
    return wide.selectExpr(
        f"stack({len(cols) * len(probs)}, {', '.join(rows)}) as (col, p, q)")


def partition_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition row counts + null counts keyed by spark_partition_id()
    (per-partition verdict/metrics lineage for the checkpoint manifest)."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    return (df.withColumn("_pid", F.spark_partition_id())
              .groupBy("_pid").agg(*aggs)
              .withColumnRenamed("_pid", "partition_id"))
