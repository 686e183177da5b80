"""Checkpoint manifest + resumable runs (north_rule: "resumable from a
checkpoint manifest recording per-partition lineage and metrics").

Batch resumability without Structured Streaming (SURVEY.md §2.D): the unit of
lineage is the INPUT FILE (≙ an Iceberg file-scan task). A run writes, per
input file: row count, verdict counts, and status — plus the run-level
outputs. On resume, files already marked complete are anti-joined away and
only the remainder is processed; outputs append. Aggregate outputs (stats,
drift) are recomputed per increment and stored per run_id — mergeable because
per-file lineage partitions the input disjointly.

Layout under <base>/:
    verdicts/     parquet, partitioned by run_id
    violations/   parquet, partitioned by run_id
    stats/        parquet, per run_id
    manifest.json lines: one record per (run_id, input_file)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class FileEntry:
    run_id: str
    input_file: str
    rows: int
    failed_rows: int
    status: str  # 'complete'
    wall_sec: float


class CheckpointManifest:
    def __init__(self, base: str) -> None:
        self.base = base
        self.path = os.path.join(base, "manifest.json")
        os.makedirs(base, exist_ok=True)

    def completed_files(self) -> set[str]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["status"] == "complete":
                        done.add(rec["input_file"])
        return done

    def append(self, entries: list[FileEntry]) -> None:
        with open(self.path, "a") as f:
            for e in entries:
                f.write(json.dumps(asdict(e)) + "\n")


def global_distinct(spark: SparkSession, base: str):
    """Global distinct estimates across ALL runs so far: union of the per-run
    mergeable HLL sketches (no double counting on overlapping/partial runs)."""
    from .operators.stats import merge_sketch_estimates
    sketches = spark.read.parquet(os.path.join(base, "sketches"))
    return merge_sketch_estimates(sketches)


def run_resumable(spark: SparkSession, input_glob: str, build_validator_fn,
                  base: str, run_id: str | None = None,
                  key_col: str = "url", sketch_cols: list[str] | None = None):
    """Validate only not-yet-completed input files; append outputs + manifest.

    build_validator_fn(spark, df) -> (ValidatorBuilder bound via provide, df)
    — the caller derives the actual validation input from the raw file scan
    (e.g. documents → pages).

    Returns (run_id, n_files_processed, ValidationResult | None).
    """
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    manifest = CheckpointManifest(base)
    done = manifest.completed_files()

    raw = spark.read.parquet(input_glob) \
        .withColumn("_input_file", F.input_file_name())
    all_files = [r["_input_file"] for r in
                 raw.select("_input_file").distinct().collect()]
    todo = [f for f in all_files if f not in done]
    if not todo:
        return run_id, 0, None

    pending = raw.filter(F.col("_input_file").isin(todo))
    t0 = time.perf_counter()
    validator, df = build_validator_fn(spark, pending)
    result = validator.validate(df)

    # per-file lineage metrics come from the verdicts frame itself — the
    # engine carries _input_file through as an ordinary column
    vd = result.verdicts
    per_file = (result.annotated
                .groupBy("_input_file")
                .agg(F.count(F.lit(1)).alias("rows"),
                     F.sum(F.col("_fail").isNotNull().cast("long"))
                     .alias("failed_rows"))
                .collect())
    wall = time.perf_counter() - t0

    (vd.withColumn("run_id", F.lit(run_id))
       .write.mode("append").partitionBy("run_id")
       .parquet(os.path.join(base, "verdicts")))
    (result.violations.withColumn("run_id", F.lit(run_id))
       .write.mode("append").partitionBy("run_id")
       .parquet(os.path.join(base, "violations")))
    if result.stats is not None:
        (result.stats.withColumn("run_id", F.lit(run_id))
           .write.mode("append").partitionBy("run_id")
           .parquet(os.path.join(base, "stats")))
    if sketch_cols:
        from .operators.stats import column_sketches
        (column_sketches(df, sketch_cols).withColumn("run_id", F.lit(run_id))
           .write.mode("append").partitionBy("run_id")
           .parquet(os.path.join(base, "sketches")))

    manifest.append([
        FileEntry(run_id=run_id, input_file=r["_input_file"],
                  rows=r["rows"], failed_rows=r["failed_rows"] or 0,
                  status="complete", wall_sec=round(wall, 3))
        for r in per_file])
    result.unpersist()
    return run_id, len(todo), result
