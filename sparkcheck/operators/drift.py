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


KL_SCALE = 1_000_000  # KL terms quantized to integer micro-nats (ADVICE r5)


def windowed_kl(df: DataFrame, bucket_expr: Column,
                epoch_col: str = "warc_epoch", bucket_s: int = 86400,
                smoothing: float = 1e-9) -> DataFrame:
    """(day, kl4) — drift TREND: KL(day d ‖ day d-1) of the bucket
    distribution for every day with a predecessor in the data. Where
    kl_divergence compares one run against a stored baseline, this tracks
    the crawl against its own recent past — the signal that catches a
    mid-ingest distribution break (a source switching language mix, a
    parser regression skewing lengths) without any snapshot management.

    Scale shape: one map-side-combining (day, bucket) count; per-day
    totals are an O(days) re-aggregate; the day-over-day comparison is a
    full-outer self-join of the O(days×buckets) histogram frame against
    itself shifted by one day — never the input. First days (no
    predecessor) are excluded by a semi-join against the shifted day set.

    Cross-engine determinism: a per-day SUM of double KL terms is
    order-dependent and Spark/DuckDB (and Spark run-to-run under AQE) may
    combine partials in different orders — a value landing exactly on a
    4dp boundary could flip. Each term is therefore quantized to integer
    micro-nats (floor(term·1e6 + 0.5) as bigint) BEFORE the per-day sum —
    integer addition commutes exactly (the unigram_logppl convention) —
    and the 4dp result is derived from the exact integer sum."""
    rows = (df.filter(F.col(epoch_col).isNotNull())
              .select(F.expr(f"CAST({epoch_col} AS BIGINT) div "
                             f"{int(bucket_s)}").alias("day"),
                      bucket_expr.cast("string").alias("b")))
    counts = rows.groupBy("day", "b").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("day").agg(F.sum("n").alias("tot"))
    h = (counts.join(totals, "day")
               .select("day", "b", (F.col("n") / F.col("tot")).alias("p")))
    prev = h.select((F.col("day") + 1).alias("day"), "b",
                    F.col("p").alias("q"))
    j = (h.join(prev, ["day", "b"], "full_outer")
          .select("day", F.coalesce("p", F.lit(0.0)).alias("p"),
                  F.coalesce("q", F.lit(0.0)).alias("q")))
    days = h.select("day").distinct()
    valid = days.join(days.select((F.col("day") + 1).alias("day")),
                      "day", "left_semi")
    s = F.lit(smoothing)
    term = (F.col("p") + s) * F.log((F.col("p") + s) / (F.col("q") + s))
    term_u = F.floor(term * KL_SCALE + F.lit(0.5)).cast("bigint")
    # kl4 from the exact integer micro-nat sum: sum_u/(1e6/1e4) = sum_u/100
    out = j.groupBy("day").agg(
        (F.floor(F.sum(term_u) / F.lit(float(KL_SCALE // 10_000))
                 + F.lit(0.5)) / 1e4).alias("kl4"))
    return out.join(valid, "day", "left_semi").select("day", "kl4")
