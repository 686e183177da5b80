"""Resumability (SURVEY.md §5.2 item 4): kill after a partial manifest →
resume processes only remaining input files; the union of outputs is
identical to a single full run. Determinism: two full runs → identical
violation sets.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkcheck import FieldConstraint, build_validator
from sparkcheck.manifest import CheckpointManifest, run_resumable

from .conftest import SF_SMALL


def _make_input(spark, tmp_path, n_files=4):
    """Write documents as several files so file-level lineage is exercised."""
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    path = str(tmp_path / "docs")
    src.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def _builder_fn(spark, pending):
    v = (build_validator()
         .input(constraints=[
             FieldConstraint("doc_id", "doc_id IS NOT NULL", "id required"),
         ], key_col="doc_id")
         .field_rule("lang-known", "lang IN ('en','es','de','fr')",
                     "unexpected lang", key="lang", value="lang")
         .field_rule("text-min", "n_chars >= 60", "too short", key="text",
                     value="n_chars")
         .provide())
    return v, pending


def _collect_outputs(spark, base):
    verd = spark.read.parquet(os.path.join(base, "verdicts"))
    viol = spark.read.parquet(os.path.join(base, "violations"))
    v = sorted((r["doc_id"], r["success"], r["rule_id"]) for r in
               verd.collect())
    w = sorted((r["doc_id"], r["rule_id"], r["key"], r["message"]) for r in
               viol.collect())
    return v, w


def test_resume_processes_only_remaining_files(spark, tmp_path):
    inp = _make_input(spark, tmp_path)
    full_base = str(tmp_path / "full")
    part_base = str(tmp_path / "partial")

    # one-shot full run
    _, n_full, _ = run_resumable(spark, inp, _builder_fn, full_base,
                                 run_id="full")
    assert n_full == 4

    # simulate a killed run: mark 2 files complete WITHOUT their outputs
    # being needed (we pre-run those 2 files for real, then resume)
    files = sorted(os.path.join(inp, f) for f in os.listdir(inp)
                   if f.endswith(".parquet"))
    # real partial run over first 2 files only
    run_resumable(spark, files[0], _builder_fn, part_base, run_id="r1")
    run_resumable(spark, files[1], _builder_fn, part_base, run_id="r1b")
    m = CheckpointManifest(part_base)
    assert len(m.completed_files()) == 2

    # resume over the full glob → must process exactly the 2 remaining
    _, n_resumed, _ = run_resumable(spark, inp, _builder_fn, part_base,
                                    run_id="r2")
    assert n_resumed == 2

    # union of outputs ≡ the one-shot run
    assert _collect_outputs(spark, part_base) == \
        _collect_outputs(spark, full_base)

    # idempotent: nothing left to do
    _, n_again, _ = run_resumable(spark, inp, _builder_fn, part_base)
    assert n_again == 0


def test_crash_between_outputs_and_commit_does_not_duplicate(spark, tmp_path):
    """The manifest append is the commit point: outputs written by a run that
    died before committing (orphan run_id partitions) are reconciled away on
    resume, so the re-processed files don't produce duplicate rows."""
    inp = _make_input(spark, tmp_path)
    base = str(tmp_path / "crash")
    full_base = str(tmp_path / "full")
    run_resumable(spark, inp, _builder_fn, full_base, run_id="oneshot")

    files = sorted(os.path.join(inp, f) for f in os.listdir(inp)
                   if f.endswith(".parquet"))
    run_resumable(spark, files[0], _builder_fn, base, run_id="ok1")
    run_resumable(spark, files[1], _builder_fn, base, run_id="ok2")

    # simulate a crash: run 'zombie' wrote its outputs for file 3 but died
    # before the manifest commit
    v, df = _builder_fn(
        spark, spark.read.parquet(files[2])
        .withColumn("_input_file", F.input_file_name()))
    res = v.validate(df, persist=False)
    for name, frame in (("verdicts", res.verdicts),
                        ("violations", res.violations)):
        (frame.withColumn("run_id", F.lit("zombie"))
         .write.mode("append").partitionBy("run_id")
         .parquet(os.path.join(base, name)))

    m = CheckpointManifest(base)
    assert len(m.completed_files()) == 2  # zombie never committed

    # resume: zombie partitions dropped, files 3+4 processed exactly once
    _, n, _ = run_resumable(spark, inp, _builder_fn, base, run_id="r3")
    assert n == 2
    assert m.run_ids(spark) == {"ok1", "ok2", "r3"}
    assert _collect_outputs(spark, base) == _collect_outputs(spark, full_base)


def test_two_full_runs_identical(spark, tmp_path):
    inp = _make_input(spark, tmp_path)
    b1, b2 = str(tmp_path / "a"), str(tmp_path / "b")
    run_resumable(spark, inp, _builder_fn, b1, run_id="x")
    run_resumable(spark, inp, _builder_fn, b2, run_id="x")
    assert _collect_outputs(spark, b1) == _collect_outputs(spark, b2)


def test_zero_row_input_files_commit_and_stop_rescanning(spark, tmp_path):
    """ADVICE r02: a zero-row parquet file produces no rows, so row-derived
    lineage never committed it and every resume re-planned it. The pending
    FILE list (binaryFile lister) commits it with rows=0; n_files agrees
    with the files actually consumed."""
    inp = _make_input(spark, tmp_path, n_files=3)
    # drop a zero-row parquet file into the same input dir
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    empty_dir = str(tmp_path / "empty")
    src.limit(0).coalesce(1).write.parquet(empty_dir)
    import shutil
    part = next(f for f in os.listdir(empty_dir) if f.endswith(".parquet"))
    shutil.copy(os.path.join(empty_dir, part),
                os.path.join(inp, "zero-rows.parquet"))

    base = str(tmp_path / "ckpt")
    _, n1, _ = run_resumable(spark, inp, _builder_fn, base, run_id="r1")
    assert n1 == 4  # 3 data files + the zero-row file all committed

    # second resume: nothing pending — including the zero-row file
    _, n2, res2 = run_resumable(spark, inp, _builder_fn, base, run_id="r2")
    assert n2 == 0 and res2 is None
    m = spark.read.parquet(os.path.join(base, "manifest"))
    zero = m.filter(F.col("input_file").contains("zero-rows")).collect()
    assert len(zero) == 1 and zero[0]["rows"] == 0 \
        and zero[0]["status"] == "complete"
