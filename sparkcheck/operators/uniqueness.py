"""Uniqueness / duplicate detection at scale (archetype C3).

Reference semantics: key already present → violation
(/root/reference/src/test.spec.ts:407-446 duplicate-email-check).

Scale design (north_rule: "uniqueness checks on url via salted
repartition-and-count"): hot keys (skewed url prefixes) are handled by an
explicit two-phase aggregation — phase 1 counts per (key, salt) so a hot key's
rows are pre-aggregated across `salt_buckets` reducers instead of one, phase 2
sums the partial counts per key. The salt is derived deterministically from the
whole row hash, so the same input always produces the same partials. AQE skew
handling stays on as a second line of defense; the resulting duplicate-key list
is small and is broadcast back to flag rows (no skewed shuffle join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, col: str, salt_buckets: int = 64) -> DataFrame:
    """Keys of `col` appearing more than once → DataFrame(col, cnt).

    Two-phase salted count: groupBy(col, salt) partial → groupBy(col) final.

    The salt only needs to SPREAD a hot key's rows across reducers — the
    final per-key sum is identical for any salt assignment — so it hashes
    (key, partition id) only: cheap, prunable to one column, deterministic
    for a fixed input partitioning.
    """
    salt = F.pmod(F.xxhash64(F.col(col), F.spark_partition_id()),
                  F.lit(salt_buckets)).alias("_salt")
    partial = (df.select(F.col(col), salt)
                 .groupBy(col, "_salt")
                 .agg(F.count(F.lit(1)).alias("_pc")))
    return (partial.groupBy(col)
                   .agg(F.sum("_pc").alias("cnt"))
                   .filter(F.col("cnt") > 1))


def duplicate_rows(df: DataFrame, col: str, salt_buckets: int = 64) -> DataFrame:
    """All rows whose `col` value duplicates. No broadcast hint on the
    dup-key list — its size is data-dependent (unbounded under mass
    duplication); AQE converts to a runtime broadcast only when it measures
    small, else keeps a shuffled join with skew splitting."""
    dups = duplicate_keys(df, col, salt_buckets).select(col)
    return df.join(dups, on=col, how="inner")
