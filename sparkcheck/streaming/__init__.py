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
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..manifest import CheckpointManifest, run_resumable  # noqa: F401

__all__ = ["run_resumable", "CheckpointManifest", "validate_stream"]


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
