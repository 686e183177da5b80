"""Production Command.run: gate policies (run_checks vs any_violation),
execution-step attribution, and sink writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkcheck import build_validator
from sparkcheck.errors import ErrorBag

from .conftest import SF_SMALL


def _validator(spark, drift_fail=False):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    baseline = spark.createDataFrame(
        [("lang", "en", 1.0)] if drift_fail else
        [("lang", l, p) for l, p in
         [("en", 0.44), ("zh", 0.15), ("es", 0.14), ("de", 0.14),
          ("fr", 0.13)]],
        "col string, bucket string, p double")
    v = (build_validator()
         .input(constraints=[], key_col="doc_id")
         .deps("baseline_stats")
         .field_rule("short-text", "n_chars >= 50", "too short", key="text")
         .drift_kl("lang", "lang", baseline="baseline_stats", threshold=0.05)
         .provide(baseline_stats=baseline))
    return v, docs


def test_run_checks_gate_passes_despite_row_violations(spark, tmp_path):
    v, docs = _validator(spark)
    out = str(tmp_path / "out")

    def execute(data, deps, context, bag: ErrorBag):
        data.verdicts.write.parquet(os.path.join(out, "verdicts"))
        return {"written": True}

    validation, res = v.command(execute).run(docs)
    assert res.success and res.result == {"written": True}
    n = spark.read.parquet(os.path.join(out, "verdicts")).count()
    assert n == docs.count()
    # row violations existed but the run-checks gate let the action run
    assert validation.violations.count() > 0


def test_drift_breach_fails_validation_step(spark):
    v, docs = _validator(spark, drift_fail=True)
    called = []
    validation, res = v.command(lambda **kw: called.append(1)).run(docs)
    assert not res.success
    assert res.step == "validation"
    assert res.rule["id"] == "drift-lang"
    assert called == []  # action never ran


def test_any_violation_gate_blocks(spark):
    v, docs = _validator(spark)
    validation, res = v.command(lambda **kw: None).run(
        docs, gate="any_violation")
    assert not res.success and res.step == "validation"


def test_execution_bag_write_attributes_execution_step(spark):
    v, docs = _validator(spark)

    def execute(data, deps, context, bag: ErrorBag):
        bag.add_global_error("sink unavailable")

    _, res = v.command(execute).run(docs)
    assert not res.success and res.step == "execution"
    assert res.errors.global_error == "sink unavailable"
