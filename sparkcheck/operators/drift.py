"""Distribution-drift detection: KL divergence vs a baseline snapshot
(north_star: "KL-divergence distribution-drift tests against a baseline
snapshot").

Current distribution = one groupBy over the bucket expression (hash aggregate,
map-side partial). Baseline is a tiny (col, bucket, p) snapshot — broadcast
full-outer join on bucket, additive smoothing on both sides so unseen buckets
don't produce infinities, then KL(P_current || Q_baseline) = Σ p·ln(p/q).
The joined histogram is O(buckets) — the final sum happens on a DataFrame of
at most a few hundred rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, bucket_expr: Column) -> DataFrame:
    """Normalized histogram: (bucket string, p double), p sums to 1.

    The global window runs AFTER the groupBy — over the O(buckets) aggregated
    frame, not the input — so the single-partition window is a few hundred
    rows regardless of input scale."""
    counts = (df.groupBy(bucket_expr.cast("string").alias("bucket"))
                .agg(F.count(F.lit(1)).alias("n")))
    total = F.sum("n").over(_full_window())
    return counts.select("bucket", (F.col("n") / total).alias("p"))


def _full_window():
    from pyspark.sql import Window
    return Window.partitionBy()


def baseline_snapshot(df: DataFrame, specs: dict[str, Column]) -> DataFrame:
    """Write-side of the drift check: for each logical column name → bucket
    expression, produce the (col, bucket, p) snapshot table."""
    parts = []
    for name, expr in specs.items():
        parts.append(histogram(df, expr).select(
            F.lit(name).alias("col"), "bucket", "p"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def kl_divergence(df: DataFrame, col: str, bucket_expr: Column,
                  baseline: DataFrame, smoothing: float = 1e-9) -> float:
    """KL(current || baseline) for one tracked column. `baseline` has
    (col, bucket, p); rows are filtered to `col`. Returns a python float
    (the histograms are tiny — safe to reduce)."""
    cur = histogram(df, bucket_expr).withColumnRenamed("p", "p_cur")
    base = (baseline.filter(F.col("col") == col)
                    .select("bucket", F.col("p").alias("p_base")))
    joined = cur.join(base, on="bucket", how="full_outer").select(
        F.coalesce("p_cur", F.lit(0.0)).alias("p"),
        F.coalesce("p_base", F.lit(0.0)).alias("q"))
    s = F.lit(smoothing)
    term = (F.col("p") + s) * F.log((F.col("p") + s) / (F.col("q") + s))
    row = joined.agg(F.sum(term).alias("kl")).collect()[0]
    return float(row["kl"]) if row["kl"] is not None else 0.0


def psi(df: DataFrame, col: str, bucket_expr: Column,
        baseline: DataFrame, smoothing: float = 1e-6) -> float:
    """Population Stability Index vs the baseline snapshot —
    Σ (p−q)·ln(p/q), the symmetric drift metric scorecard monitoring uses
    (rule of thumb: <0.1 stable, 0.1–0.25 moderate shift, >0.25 major).
    Same O(buckets) plan shape as kl_divergence."""
    cur = histogram(df, bucket_expr).withColumnRenamed("p", "p_cur")
    base = (baseline.filter(F.col("col") == col)
                    .select("bucket", F.col("p").alias("p_base")))
    joined = cur.join(base, on="bucket", how="full_outer").select(
        F.coalesce("p_cur", F.lit(0.0)).alias("p"),
        F.coalesce("p_base", F.lit(0.0)).alias("q"))
    s = F.lit(smoothing)
    term = ((F.col("p") + s) - (F.col("q") + s)) \
        * F.log((F.col("p") + s) / (F.col("q") + s))
    row = joined.agg(F.sum(term).alias("psi")).collect()[0]
    return float(row["psi"]) if row["psi"] is not None else 0.0
