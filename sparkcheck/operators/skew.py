"""Key-skew diagnostics: the operator that JUSTIFIES the engine's salting
design (north_rule: "skew on hot url-prefixes is handled by key salting and
AQE"). Before salting a join or aggregate you want evidence of WHICH keys are
hot and how hot — this module reports it from one map-side-combining pass.

Scale notes: heavy_hitters is groupBy(key).count() (partial aggregation
collapses each task's rows to its local distinct keys before the shuffle)
followed by TakeOrdered(k) — no full sort, no collect, the driver holds k
rows. The grand total is a second O(distinct-keys) aggregate of the already
grouped frame joined back as a one-row broadcast, not a second scan of the
input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key, k: int = 20,
                  key_name: str = "key") -> DataFrame:
    """Top-k hottest values of `key` (a column name or Column expression):
    (key, cnt, share) with share = cnt/total floored to 4dp, ordered by
    cnt desc then key asc (deterministic under ties). NULL keys count as a
    (reported) group of their own — a null-heavy column IS a skew hazard:
    every NULL lands in one reducer unless salted."""
    kc = F.col(key) if isinstance(key, str) else key
    counts = (df.select(kc.alias(key_name))
                .groupBy(key_name)
                .agg(F.count(F.lit(1)).alias("cnt")))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
                  .select(key_name, "cnt",
                          (F.floor(F.col("cnt") / F.col("_total")
                                   * 10000 + F.lit(0.5)) / 10000.0)
                          .alias("share"))
                  .orderBy(F.desc("cnt"), F.asc(key_name))
                  .limit(k))


def skew_stats(df: DataFrame, key, key_name: str = "key") -> DataFrame:
    """One-row skew summary of the key distribution: number of distinct
    keys, hottest-key count, mean count, and the hot/mean ratio (the factor
    a single reducer would be overloaded by without salting). Drives the
    decision `salt_buckets ≈ ratio` for the two-phase aggregate in
    operators/uniqueness.py."""
    kc = F.col(key) if isinstance(key, str) else key
    counts = (df.select(kc.alias(key_name))
                .groupBy(key_name)
                .agg(F.count(F.lit(1)).alias("cnt")))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        (F.floor(F.avg("cnt") * 10000 + F.lit(0.5)) / 10000.0)
        .alias("mean_cnt"),
        (F.floor(F.max("cnt") / F.avg("cnt") * 10000 + F.lit(0.5)) / 10000.0)
        .alias("skew_ratio"))
