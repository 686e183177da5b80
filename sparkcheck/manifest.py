"""Checkpoint manifest + resumable runs (north_rule: "resumable from a
checkpoint manifest recording per-partition lineage and metrics").

Batch resumability without Structured Streaming (SURVEY.md §2.D): the unit of
lineage is the INPUT FILE (≙ an Iceberg file-scan task). A run writes, per
input file: row count, verdict counts, and status — plus the run-level
outputs. On resume, completed files are removed with a DataFrame ANTI-JOIN
(never a driver-side file list — at 10^12 rows the input has millions of
files) and only the remainder is processed. Aggregate outputs (stats, drift)
are recomputed per increment and stored per run_id — mergeable because
per-file lineage partitions the input disjointly.

Crash consistency: output parquet is written FIRST, the manifest entries
LAST — the manifest append is the commit point. A crash between the two
leaves output partitions whose run_id has no manifest entries; `reconcile`
drops those orphan partitions on the next resume before reprocessing, so
re-validated files never produce duplicate output rows. Single concurrent
writer per checkpoint base is assumed (same as a Structured Streaming
checkpoint dir).

Layout under <base>/:
    verdicts/     parquet, partitioned by run_id
    violations/   parquet, partitioned by run_id
    stats/        parquet, per run_id
    hists/        parquet, per run_id (hist_cols length histograms)
    sketches/     parquet, per run_id (mergeable HLL)
    manifest/     parquet: one row per (run_id, input_file) — commit records
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import invariant

OUTPUT_DIRS = ("verdicts", "violations", "stats", "hists", "sketches")


@dataclass
class FileEntry:
    run_id: str
    input_file: str
    rows: int
    failed_rows: int
    status: str  # 'complete'
    wall_sec: float  # run-level wall clock (same value on every entry of a run)


ENTRY_DDL = ("run_id string, input_file string, rows bigint, "
             "failed_rows bigint, status string, wall_sec double")


class CheckpointManifest:
    def __init__(self, base: str) -> None:
        self.base = base
        self.dir = os.path.join(base, "manifest")
        os.makedirs(base, exist_ok=True)

    def _read(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.dir)
        except Exception:
            return None  # no manifest yet

    def completed_files_df(self, spark: SparkSession) -> DataFrame | None:
        """DataFrame(input_file) of completed files — the anti-join side.
        None when no manifest exists yet."""
        m = self._read(spark)
        if m is None:
            return None
        return (m.filter(F.col("status") == "complete")
                 .select("input_file").distinct())

    def completed_files(self) -> set[str]:
        """Driver-side convenience view (tests / small checkpoints only —
        run_resumable itself never collects the file list)."""
        spark = SparkSession.getActiveSession()
        df = self.completed_files_df(spark)
        return set() if df is None else {r["input_file"] for r in df.collect()}

    def run_ids(self, spark: SparkSession) -> set[str]:
        m = self._read(spark)
        if m is None:
            return set()
        return {r["run_id"] for r in m.select("run_id").distinct().collect()}

    def append_df(self, entries: DataFrame) -> None:
        """THE commit point: manifest rows are written only after all of the
        run's outputs are durable."""
        entries.write.mode("append").parquet(self.dir)

    def append(self, entries: list[FileEntry]) -> None:
        spark = SparkSession.getActiveSession()
        rows = [(e.run_id, e.input_file, e.rows, e.failed_rows, e.status,
                 e.wall_sec) for e in entries]
        self.append_df(spark.createDataFrame(rows, ENTRY_DDL))

    def reconcile(self, spark: SparkSession) -> list[str]:
        """Drop output partitions whose run_id never reached the manifest
        (a run crashed between the output writes and the commit). Local-fs
        implementation removes `run_id=<x>` partition dirs; on an object
        store / Iceberg this is the same operation against the table
        metadata. Returns the orphaned run_ids removed."""
        committed = self.run_ids(spark)
        orphans: set[str] = set()
        for sub in OUTPUT_DIRS:
            d = os.path.join(self.base, sub)
            if not os.path.isdir(d):
                continue
            for part in os.listdir(d):
                if not part.startswith("run_id="):
                    continue
                rid = part.split("=", 1)[1]
                if rid not in committed:
                    shutil.rmtree(os.path.join(d, part), ignore_errors=True)
                    orphans.add(rid)
        return sorted(orphans)


class ParquetStore:
    """Checkpoint output store over the parquet directory layout above —
    the tested default. IcebergStore implements the same contract against
    lakehouse tables."""

    def __init__(self, base: str) -> None:
        self.base = base
        self.manifest = CheckpointManifest(base)

    def write(self, df: DataFrame, name: str, run_id: str) -> None:
        (df.withColumn("run_id", F.lit(run_id))
           .write.mode("append").partitionBy("run_id")
           .parquet(os.path.join(self.base, name)))

    def completed_files_df(self, spark: SparkSession) -> DataFrame | None:
        return self.manifest.completed_files_df(spark)

    def append_manifest(self, entries: DataFrame) -> None:
        self.manifest.append_df(entries)

    def manifest_df(self, spark: SparkSession) -> DataFrame | None:
        return self.manifest._read(spark)

    def reconcile(self, spark: SparkSession) -> list[str]:
        return self.manifest.reconcile(spark)


class IcebergStore:
    """The same checkpoint contract over Iceberg tables
    (<namespace>.verdicts / violations / stats / hists / sketches /
    manifest, each partitioned by run_id).

    Differences from ParquetStore that matter at lakehouse scale:
    - appends are Iceberg snapshot commits (atomic, readers never see a
      half-written run);
    - reconcile() runs against TABLE METADATA — `DELETE ... WHERE run_id NOT
      IN (manifest)` is a partition-level metadata delete, not an
      os.listdir filesystem walk (VERDICT r02 item 3).

    Requires the Iceberg runtime jars + a configured catalog; submit with
        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...
          --conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog
          --conf spark.sql.catalog.<cat>.type=hadoop
          --conf spark.sql.catalog.<cat>.warehouse=<uri>
    and pass namespace='<cat>.<db>.<prefix>' (tables are created on first
    write). Exercised by tests/test_iceberg.py when the runtime is present,
    skipped-with-reason otherwise."""

    def __init__(self, spark: SparkSession, namespace: str) -> None:
        from .sources.reader import iceberg_available
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime and a "
                "configured catalog, or use ParquetStore")
        self.spark = spark
        self.ns = namespace

    def _tbl(self, name: str) -> str:
        return f"{self.ns}_{name}" if "." not in self.ns \
            else f"{self.ns}.{name}"

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    def _ensure(self, name: str, df: DataFrame) -> None:
        ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                        for f in df.schema.fields)
        self.spark.sql(f"CREATE TABLE IF NOT EXISTS {self._tbl(name)} "
                       f"({ddl}) USING iceberg PARTITIONED BY (run_id)")

    def write(self, df: DataFrame, name: str, run_id: str) -> None:
        df = df.withColumn("run_id", F.lit(run_id))
        self._ensure(name, df)
        df.writeTo(self._tbl(name)).append()

    def completed_files_df(self, spark: SparkSession) -> DataFrame | None:
        if not self._exists("manifest"):
            return None
        return (spark.table(self._tbl("manifest"))
                .filter(F.col("status") == "complete")
                .select("input_file").distinct())

    def append_manifest(self, entries: DataFrame) -> None:
        # THE commit point — an atomic Iceberg snapshot commit
        self._ensure("manifest", entries)
        entries.writeTo(self._tbl("manifest")).append()

    def manifest_df(self, spark: SparkSession) -> DataFrame | None:
        return spark.table(self._tbl("manifest")) \
            if self._exists("manifest") else None

    @staticmethod
    def _run_ids(spark: SparkSession, tbl: str) -> set[str]:
        """Distinct run_ids of an output table WITHOUT a data scan where
        possible: run_id is the partition column, so Iceberg's `partitions`
        metadata table carries the value set; fall back to a distinct scan
        if the metadata table is unreadable (older runtimes)."""
        try:
            return {r["rid"] for r in
                    spark.table(f"{tbl}.partitions")
                         .select(F.col("partition.run_id").alias("rid"))
                         .distinct().collect()}
        except Exception:
            return {r["run_id"] for r in
                    spark.table(tbl).select("run_id").distinct().collect()}

    def reconcile(self, spark: SparkSession) -> list[str]:
        """Metadata-level orphan cleanup: drop output rows whose run_id never
        reached the manifest (crash between output append and commit)."""
        m = self.manifest_df(spark)
        committed = {r["run_id"] for r in
                     m.select("run_id").distinct().collect()} if m is not None \
            else set()
        orphans: set[str] = set()
        for name in OUTPUT_DIRS:
            if not self._exists(name):
                continue
            tbl = self._tbl(name)
            for rid in sorted(self._run_ids(spark, tbl) - committed):
                # run_id is the partition column → a metadata delete.
                # Single-quote escaping: run_id is caller-supplied and lands
                # in a SQL literal
                lit = rid.replace("'", "''")
                spark.sql(f"DELETE FROM {tbl} WHERE run_id = '{lit}'")
                orphans.add(rid)
        return sorted(orphans)


def global_distinct(spark: SparkSession, base: str):
    """Global distinct estimates across ALL runs so far: union of the per-run
    mergeable HLL sketches (no double counting on overlapping/partial runs)."""
    from .operators.stats import merge_sketch_estimates
    sketches = spark.read.parquet(os.path.join(base, "sketches"))
    return merge_sketch_estimates(sketches)


def _norm_uri(col):
    """input_file_name() yields file:///x while the binaryFile lister yields
    file:/x — normalize to the input_file_name form so joins/commits agree."""
    return F.regexp_replace(col, "^file:/+", "file:///")


def input_files_df(spark: SparkSession, input_glob: str) -> DataFrame:
    """One row per INPUT FILE (including zero-row files), listed as a
    DataFrame via the binaryFile source with content pruned — distributed,
    never a driver-side python list. Mirrors the parquet reader's listing:
    recursive lookup (so zero-row files inside nested/partitioned layouts
    are seen too) restricted to `*.parquet` data files — Spark-internal
    files (_SUCCESS etc.) and non-parquet sidecars are excluded, so a
    sidecar can never be committed as a rows=0 data file. A data file
    WITHOUT a .parquet suffix still validates fine (the parquet scan reads
    it and the row-derived manifest side commits it); only the
    zero-row+suffix-less corner keeps rescanning. On a lakehouse this is
    the files() metadata table instead."""
    bf = (spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .load(input_glob))
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return (bf.filter(~name.startswith("_") & ~name.startswith(".")
                      & name.endswith(".parquet"))
              .select(_norm_uri(F.col("path")).alias("input_file")))


def run_resumable(spark: SparkSession, input_glob: str, build_validator_fn,
                  base: str | None = None, run_id: str | None = None,
                  key_col: str = "url", sketch_cols: list[str] | None = None,
                  store=None):
    """Validate only not-yet-completed input files; append outputs, then
    commit via the manifest.

    build_validator_fn(spark, df) -> (ValidatorBuilder bound via provide, df)
    — the caller derives the actual validation input from the raw file scan
    (e.g. documents → pages).

    Outputs go through `store` (default ParquetStore(base); pass
    IcebergStore(spark, namespace) on a lakehouse — same commit protocol,
    Iceberg snapshot commits + metadata-level reconcile).

    Returns (run_id, n_files_processed, ValidationResult | None).
    """
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    if store is None:
        invariant(base is not None, "run_resumable needs base or store")
        store = ParquetStore(base)
    store.reconcile(spark)  # drop uncommitted leftovers before reprocessing

    # pending FILE list from the (distributed) lister — includes zero-row
    # files, which produce no rows and would otherwise never commit and be
    # re-planned on every resume (ADVICE r02). Listed BEFORE the parquet
    # index is built: a file that holds rows at scan time is then either in
    # this listing too (normal) or newer than it (committed from the
    # row-derived side below) — a listing-only file can only be genuinely
    # zero-row or deleted-before-read, never silently-skipped data.
    pending_files = input_files_df(spark, input_glob)
    raw = spark.read.parquet(input_glob) \
        .withColumn("_input_file", _norm_uri(F.input_file_name()))
    done = store.completed_files_df(spark)
    if done is not None:
        # anti-join instead of a collected isin() list: `done` is O(files),
        # broadcast by AQE when small, shuffled join when a checkpoint has
        # millions of completed files
        pending = raw.join(done,
                           raw["_input_file"] == done["input_file"],
                           "left_anti")
        pending_files = pending_files.join(
            done, on="input_file", how="left_anti")
    else:
        pending = raw

    def _commit_empty_only() -> int:
        """Only zero-row files pending: commit them so they stop rescanning."""
        empties = (pending_files
                   .select(F.lit(run_id).alias("run_id"), "input_file",
                           F.lit(0).cast("bigint").alias("rows"),
                           F.lit(0).cast("bigint").alias("failed_rows"),
                           F.lit("complete").alias("status"),
                           F.lit(0.0).alias("wall_sec")))
        n = empties.count()
        if n:
            store.append_manifest(empties)
        return n

    if pending.limit(1).isEmpty():
        return run_id, _commit_empty_only(), None

    t0 = time.perf_counter()
    validator, df = build_validator_fn(spark, pending)
    result = validator.validate(df)

    store.write(result.verdicts, "verdicts", run_id)
    store.write(result.violations, "violations", run_id)
    if result.stats is not None:
        store.write(result.stats, "stats", run_id)
    if result.hists is not None:
        store.write(result.hists, "hists", run_id)
    if sketch_cols:
        from .operators.stats import column_sketches
        store.write(column_sketches(df, sketch_cols), "sketches", run_id)
    wall = time.perf_counter() - t0

    # per-file lineage metrics from the (persisted) annotated frame — built
    # and written as a DataFrame, never collected to the driver. FULL OUTER
    # against the pending FILE list: row-derived-only files (added between
    # the listing and the scan) still commit exactly-once with their real
    # counts; listing-only files (genuinely zero-row parquet, or deleted
    # before the scan) commit with rows=0 so they are never re-scanned.
    per_file = (result.annotated
                .groupBy("_input_file")
                .agg(F.count(F.lit(1)).alias("rows"),
                     F.coalesce(
                         F.sum(F.col("_fail").isNotNull().cast("long")),
                         F.lit(0)).alias("failed_rows"))
                .withColumnRenamed("_input_file", "input_file"))
    entries = (pending_files
               .join(per_file, on="input_file", how="full_outer")
               .select(F.lit(run_id).alias("run_id"), "input_file",
                       F.coalesce(F.col("rows"), F.lit(0)).alias("rows"),
                       F.coalesce(F.col("failed_rows"), F.lit(0))
                       .alias("failed_rows"),
                       F.lit("complete").alias("status"),
                       F.lit(round(wall, 3)).alias("wall_sec")))
    store.append_manifest(entries)  # commit point
    n_files = (store.manifest_df(spark)
               .filter(F.col("run_id") == run_id)
               .select("input_file").distinct().count())
    result.unpersist()
    return run_id, n_files, result
