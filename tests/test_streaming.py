"""Structured Streaming incremental validation: availableNow drains the file
backlog through foreachBatch; new files are picked up by a later run using
the same checkpoint; results equal the batch engine's."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkcheck import FieldConstraint, build_validator
from sparkcheck.streaming import validate_stream

from .conftest import SF_SMALL

DOCS_DDL = ("doc_id bigint, text string, lang string, source string, "
            "n_chars bigint")


def _builder_fn(spark, pending):
    v = (build_validator()
         .input(constraints=[], key_col="doc_id")
         .field_rule("lang-known", "lang IN ('en','es','de','fr')",
                     "unexpected lang", key="lang", value="lang")
         .provide())
    return v, pending


def test_stream_validate_available_now(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    # first drop: 2 files
    src.filter(F.col("doc_id") < 250).repartition(2) \
        .write.mode("append").parquet(in_dir)

    q = validate_stream(spark, in_dir, DOCS_DDL, _builder_fn, out)
    q.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(out, "verdicts")).count()
    assert n1 == 250

    # late arrivals: another file; same checkpoint → only the new file runs
    src.filter(F.col("doc_id") >= 250).repartition(1) \
        .write.mode("append").parquet(in_dir)
    q2 = validate_stream(spark, in_dir, DOCS_DDL, _builder_fn, out)
    q2.awaitTermination(120)
    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 500

    # violations carry batch_id (at-least-once replay dedup key; both sinks
    # use dynamic partition overwrite on it → idempotent per batch)
    viol = spark.read.parquet(os.path.join(out, "violations"))
    assert "batch_id" in viol.columns
    assert {r["batch_id"] for r in viol.select("batch_id").distinct()
            .collect()} <= {0, 1}

    # equals the one-shot batch result
    v, df = _builder_fn(spark, src)
    batch = v.validate(df, persist=False)
    got = sorted((r["doc_id"], r["success"], r["rule_id"])
                 for r in verd.collect())
    want = sorted((r["doc_id"], r["success"], r["rule_id"])
                  for r in batch.verdicts.collect())
    assert got == want
