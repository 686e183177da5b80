"""As-of join — the time-series operator Spark's DataFrame API lacks (the
build brief's canonical example): for every left row, the most recent right
row with the same key and right.ts <= left.ts. DuckDB has it natively
(ASOF JOIN), which makes the driver oracle a genuinely independent
formulation.

Formulation: union-then-window, NOT a range join. Both sides are tagged and
unioned on (key, ts_us, side), and `last(right_payload, ignorenulls=True)`
over (partitionBy key, orderBy ts_us, side, payload; rows unbounded→current)
forward-fills the latest right payload into every left row. At equal ts the
right row sorts FIRST (side 0 < 1), so an exactly-simultaneous right row is
visible to the left row — the ASOF `>=` convention.

Scale shape: ONE hash shuffle on the key + a per-partition sort — works
when BOTH sides are huge (a broadcast-and-filter formulation dies when the
right side grows, and a range join explodes on wide intervals). No state
beyond the sort; skew bounded by the hottest key, same as any keyed join.
Left rows with no preceding right row are dropped (inner as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import ts_micros


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              left_cols: list[str], right_cols: list[str],
              right_ts_name: str = "asof_ts_us") -> DataFrame:
    """Columns out: *left_cols, right_ts_name, *right_cols. Timestamps
    compare on unix micros (UTC session tz == DuckDB epoch_us). Duplicate
    (key, ts) right rows are collapsed to max(payload) BEFORE the union —
    lexicographic over right_cols, matching the oracle's GROUP BY + max —
    so both engines see a tie-free right side by construction instead of
    relying on each engine's (unspecified, for DuckDB ASOF) tie choice.
    The dedupe is a map-side-combining aggregate on the right side only."""
    r_payload = F.struct(
        ts_micros(F.col(ts_col)).alias(right_ts_name),
        *[F.col(c) for c in right_cols])
    # SQL join semantics: NULL keys (or NULL timestamps) never match — drop
    # them on both sides, or the union-window would forward-fill NULL-key
    # right rows into NULL-key left rows where the ASOF JOIN oracle returns
    # nothing
    right = right.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull())
    left = left.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull())
    rt = (right.select(F.col(on).alias("_k"),
                       ts_micros(F.col(ts_col)).alias("_ts"),
                       r_payload.alias("_r"))
               .groupBy("_k", "_ts").agg(F.max("_r").alias("_r"))
               .select("_k", "_ts", F.lit(0).alias("_side"), "_r"))
    r_ddl = rt.schema["_r"].dataType.simpleString()
    l_payload = F.struct(*[F.col(c) for c in left_cols])
    lt = left.select(F.col(on).alias("_k"),
                     ts_micros(F.col(ts_col)).alias("_ts"),
                     F.lit(1).alias("_side"),
                     l_payload.alias("_l"))
    l_ddl = lt.schema["_l"].dataType.simpleString()
    u = (lt.withColumn("_r", F.lit(None).cast(r_ddl))
           .unionByName(rt.withColumn("_l", F.lit(None).cast(l_ddl))))
    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_r")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn("_fill", F.last("_r", ignorenulls=True).over(w))
    return (filled.filter((F.col("_side") == 1) & F.col("_fill").isNotNull())
                  .select(*[F.col(f"_l.{c}").alias(c) for c in left_cols],
                          F.col(f"_fill.{right_ts_name}")
                           .alias(right_ts_name),
                          *[F.col(f"_fill.{c}").alias(c)
                            for c in right_cols]))
