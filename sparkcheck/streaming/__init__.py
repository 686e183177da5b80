"""Incremental validation.

The reference has NO streaming surface (SURVEY.md §2.D) and the north_rule
demands batch-at-rest resumability (manifest.py). This module adds the
natural Spark-native increment on top:

- `run_resumable` (re-export): file-lineage incremental batch — the primary
  resumability mechanism (checkpoint manifest, anti-join completed files).
- `validate_stream`: Structured Streaming wrapper — a file-source readStream
  whose micro-batches run the SAME compiled validator via foreachBatch and
  append verdicts/violations parquet. Spark's streaming checkpoint tracks
  consumed files; trigger=availableNow drains the backlog and stops, making
  it usable as an incremental batch scheduler too.
- `windowed_failure_counts`: native streaming windowed aggregation — per
  event-time window (watermarked, late rows beyond the watermark dropped by
  Spark's state store) count rows failing a compiled predicate set.
- `stateful_unique_stream`: custom stateful operator via
  applyInPandasWithState — cross-micro-batch uniqueness on a key column
  (state = first-seen count per key, Arrow-batched per group), something
  per-batch foreachBatch validation cannot express.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..manifest import CheckpointManifest, run_resumable  # noqa: F401

__all__ = ["run_resumable", "CheckpointManifest", "validate_stream",
           "windowed_failure_counts", "stateful_unique_stream"]


def validate_stream(spark: SparkSession, input_dir: str, schema_ddl: str,
                    build_validator_fn, out_base: str,
                    checkpoint: str | None = None, available_now: bool = True):
    """Stream-validate files arriving in `input_dir`.

    build_validator_fn(spark, batch_df) -> (bound ValidatorBuilder, df) —
    same contract as manifest.run_resumable.

    Returns the StreamingQuery (awaitTermination is the caller's choice;
    with available_now=True the query stops after draining the backlog).
    """
    checkpoint = checkpoint or os.path.join(out_base, "_checkpoint")
    stream = (spark.readStream.schema(schema_ddl)
              .parquet(input_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        validator, df = build_validator_fn(spark, batch_df)
        result = validator.validate(df, persist=False)
        # foreachBatch is at-least-once: a crash after the write but before
        # the checkpoint commit replays the batch. Both sinks carry batch_id
        # and are written with DYNAMIC partition overwrite on it, so a replay
        # rewrites its own partition instead of appending duplicates —
        # idempotent, exactly-once output per batch_id.
        for name, frame in (("verdicts", result.verdicts),
                            ("violations", result.violations)):
            (frame.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(os.path.join(out_base, name)))

    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_failure_counts(stream, fail_expr: str, ts_col: str,
                            window: str = "1 hour",
                            watermark: str = "2 hours"):
    """Streaming windowed failure counts with late-data handling: per
    event-time window, total rows and rows failing `fail_expr` (a boolean SQL
    expression over the stream's columns — e.g. a disjunction of compiled
    rule-failure predicates). The watermark bounds the state store: windows
    older than max(event_time) − watermark are finalized and late rows beyond
    it are dropped — the standard Spark treatment of out-of-order web-crawl
    timestamps. Returns a streaming DataFrame
    (window struct, n_rows, n_failed) for any sink/outputMode."""
    w = F.window(F.col(ts_col), window)
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(w.alias("window"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.expr(fail_expr).cast("long")).alias("n_failed")))


UNIQUE_STATE_SCHEMA = "cnt bigint"
UNIQUE_OUT_SCHEMA = ("key string, batch_seen bigint, total_seen bigint, "
                     "is_duplicate boolean")


def stateful_unique_stream(stream, key_col: str,
                           timeout: str = "NoTimeout",
                           ttl_ms: int | None = None):
    """Cross-micro-batch uniqueness — a custom stateful operator
    (applyInPandasWithState): per key, state carries the running count of
    rows seen across ALL previous micro-batches; a key re-appearing in a
    later batch is flagged is_duplicate even though no single batch saw it
    twice. foreachBatch validation is per-batch-scoped and cannot express
    this. Arrow-batched per group, state O(distinct keys) in the state store
    (RocksDB on a real cluster). Emits one row per (key, batch) occurrence
    set.

    State TTL (the one 100-TB hazard of this operator, VERDICT r3 item 7):
    without eviction the state store grows with every distinct key FOREVER
    on an unbounded crawl stream. `ttl_ms` switches the operator to
    ProcessingTimeTimeout and arms a per-key idle timer on every update: a
    key silent for ttl_ms is evicted on a subsequent micro-batch (nothing
    emitted for the eviction), after which a re-appearance counts from 1
    again — the uniqueness guarantee becomes 'unique within a ttl_ms idle
    window', the standard trade for bounded state. ttl_ms=None keeps the
    exact unbounded semantics (NoTimeout)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    if ttl_ms is not None:
        timeout = "ProcessingTimeTimeout"

    def update(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # idle-timer expiry: drop the key's state, emit nothing
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        prev = state.get[0] if state.exists else 0
        total = prev + n
        state.update((total,))
        if ttl_ms is not None:
            # re-arm on every touch: TTL is idle time, not absolute age
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({
            "key": [key[0]], "batch_seen": [n], "total_seen": [total],
            "is_duplicate": [total > 1]})

    # applyInPandasWithState requires a real grouping COLUMN (an alias-only
    # grouping expression fails analysis) — project it first
    keyed = stream.withColumn("key", F.col(key_col).cast("string"))
    return (keyed.groupBy("key")
            .applyInPandasWithState(update, UNIQUE_OUT_SCHEMA,
                                    UNIQUE_STATE_SCHEMA, "update", timeout))


def session_counts_stream(stream, user_col: str = "user_id",
                          ts_col: str = "ts", gap: str = "30 minutes",
                          watermark: str = "1 hour"):
    """Streaming sessionization via Spark's NATIVE session_window — the
    incremental counterpart of operators/sessions.sessionize: sessions merge
    while events arrive within `gap` and are finalized once the watermark
    passes their end, so state is bounded by the active-session count (not
    history). Returns (user_id, session_start, session_end, n_events) in
    update/append per the chosen output mode.

    Boundary note vs the batch operator: session_window starts a NEW session
    when the inter-event gap is >= the window gap (its window is half-open
    [ts, ts+gap)), while sessions.sessionize keeps an exactly-gap event in
    the same session (strict >). Identical everywhere except gaps that land
    exactly on the boundary."""
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col(user_col),
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))
