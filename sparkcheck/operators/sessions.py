"""Gap-based sessionization over an event stream — the classic batch
companion to the streaming windowed aggregates (streaming/__init__.py): a
new session starts when a user's inter-event gap exceeds `gap_s`.

Scale shape: exactly ONE shuffle. The window functions (lag + running sum)
hash-partition on the user key; the closing session-level aggregate groups
by (user, session_seq), and HashPartitioning(user) already satisfies that
clustering, so Catalyst plans NO second exchange (plan-pinned in
tests/test_sessions_asof.py). Per-user state is a sort within the
partition — skew is bounded by the busiest single user, the same bound any
sessionizer has.

Timestamps compare on unix MICROseconds (session tz is UTC, so Spark's
unix_micros == DuckDB's epoch_us bit-for-bit); second-truncated epochs
would disagree with the oracle on sub-second boundary gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 21600  # 6h — the synthetic events average ~9h between a
                       # user's events, so this yields real multi-event
                       # sessions without collapsing everything to one


def ts_micros(col) -> "F.Column":
    """unix micros from a (possibly NTZ) timestamp: the NTZ→TZ cast is
    instant-preserving under the UTC session tz, matching DuckDB's
    naive-as-UTC epoch_us bit-for-bit."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", order_col: str = "event_id",
               gap_s: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_seq, n_events, start_us, end_us, duration_us) —
    one row per session; session_seq numbers a user's sessions from 1 in
    time order. Ties on ts are broken by order_col so the numbering is
    total and engine-independent."""
    gap_us = int(gap_s) * 1_000_000
    # NULL users/timestamps are unsessionizable — and the window ORDER BY
    # would place NULLs first in Spark but last in DuckDB, silently
    # renumbering every session of an affected user
    base = (df.filter(F.col(user_col).isNotNull()
                      & F.col(ts_col).isNotNull())
              .select(F.col(user_col).alias("user_id"),
                      F.col(order_col).alias("_ord"),
                      ts_micros(F.col(ts_col)).alias("ts_us")))
    w = Window.partitionBy("user_id").orderBy("ts_us", "_ord")
    prev = F.lag("ts_us").over(w)
    new_s = F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us),
                   F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (base.withColumn("_new", new_s)
             .withColumn("session_seq", F.sum("_new").over(run)))
    return (s.groupBy("user_id", "session_seq")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("ts_us").alias("start_us"),
                  F.max("ts_us").alias("end_us"))
             .withColumn("duration_us", F.col("end_us") - F.col("start_us")))


def funnel(df: DataFrame, steps: tuple[str, ...] = ("view", "click",
                                                    "purchase"),
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """(step, path, n_users) — ordered-funnel analysis: step k counts users
    whose first step-(k-1) completion is followed (>=, simultaneous counts)
    by a step-k event. Each stage is a map-side-combining min-aggregate on
    the user key joined to the previous frontier — len(steps) shuffles on
    the same key (Catalyst reuses the user-hash partitioning between
    stages), never a per-user event sort."""
    ev = df.select(F.col(user_col).alias("u"),
                   ts_micros(F.col(ts_col)).alias("t"),
                   F.col(type_col).alias("y"))
    reached = (ev.filter(F.col("y") == steps[0])
                 .groupBy("u").agg(F.min("t").alias("tp")))
    out = []
    for i, s in enumerate(steps):
        if i > 0:
            reached = (ev.filter(F.col("y") == s)
                         .join(reached, "u")
                         .filter(F.col("t") >= F.col("tp"))
                         .groupBy("u").agg(F.min("t").alias("tp")))
        path = ">".join(steps[:i + 1])
        out.append(reached.agg(F.count(F.lit(1)).alias("n_users"))
                   .select(F.lit(i + 1).alias("step"),
                           F.lit(path).alias("path"), "n_users"))
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f)
    return res


def event_rate_anomaly(df: DataFrame, type_col: str = "event_type",
                       ts_col: str = "ts", bucket_s: int = 3600,
                       z: float = 2.0) -> DataFrame:
    """(event_type, hr, cnt, z4, anomaly) — per-type bucketed event rates
    with a z-score against that type's own mean/stddev. Moments are computed
    from integer sums (sum, sum-of-squares, bucket count) so both engines
    derive bit-identical doubles — engine-native stddev implementations
    (Welford vs two-pass) would diverge in the last ulp and flip boundary
    flags. The per-type stats frame is broadcast: the type domain is bounded
    (it's an enum), unlike data-dependent dup lists."""
    bucket_us = int(bucket_s) * 1_000_000
    hourly = (df.select(F.col(type_col).alias("event_type"),
                        ts_micros(F.col(ts_col)).alias("t"))
                .withColumn("hr", F.expr(f"t div {bucket_us}"))
                .groupBy("event_type", "hr")
                .agg(F.count(F.lit(1)).alias("cnt")))
    stats = (hourly.groupBy("event_type")
             .agg(F.sum("cnt").alias("s"),
                  F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
                  F.count(F.lit(1)).alias("k")))
    mu = F.col("s") / F.col("k")
    var = F.col("ss") / F.col("k") - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    zscore = F.when(sd > 0, (F.col("cnt") - mu) / sd).otherwise(F.lit(0.0))
    from .textstats import round4
    return (hourly.join(F.broadcast(stats), "event_type")
            .select("event_type", "hr", "cnt",
                    round4(zscore).alias("z4"),
                    (zscore > z).alias("anomaly")))


def retention(df: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", bucket_s: int = 86400) -> DataFrame:
    """(day, n_users, n_retained, retention4) — classic day-over-day
    retention: of the distinct users active in bucket d, the fraction also
    active in d+1 (days with no successor bucket report 0 retained — a
    LEFT join, so quiet-next-day cohorts still appear).

    Scale shape: one map-side-combining distinct per (day, user), a
    self-equi-join on (day+1, user) — both sides the same small
    daily-actives frame — then an O(days) aggregate."""
    day = F.expr(f"t div {int(bucket_s) * 1_000_000}")
    actives = (df.filter(F.col(user_col).isNotNull()
                         & F.col(ts_col).isNotNull())
                 .select(F.col(user_col).alias("u"),
                         ts_micros(F.col(ts_col)).alias("t"))
                 .withColumn("day", day)
                 .select("day", "u").distinct())
    from .textstats import round4
    a = actives.alias("a")
    n = (actives.select((F.col("day") - 1).alias("day"),
                        F.col("u").alias("u2"))
                .alias("n"))
    joined = a.join(n, (F.col("a.day") == F.col("n.day"))
                    & (F.col("a.u") == F.col("n.u2")), "left")
    return (joined.groupBy(F.col("a.day").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.count("u2").alias("n_retained"))
            .select("day", "n_users", "n_retained",
                    round4(F.col("n_retained")
                           / F.col("n_users").cast("double"))
                    .alias("retention4")))
