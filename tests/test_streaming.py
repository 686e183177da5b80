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


def test_windowed_failure_counts_with_watermark(spark, tmp_path):
    """Streaming event-time windowed aggregation equals the batch groupBy
    over the same data (availableNow drain, complete mode)."""
    from sparkcheck.streaming import windowed_failure_counts
    src = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
           .select("doc_id", "lang",
                   (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                    + F.make_interval(mins=(F.col("doc_id") % 300)
                                      .cast("int"))).alias("ts")))
    in_dir = str(tmp_path / "in")
    src.repartition(2).write.parquet(in_dir)

    stream = (spark.readStream
              .schema("doc_id bigint, lang string, ts timestamp")
              .parquet(in_dir))
    agg = windowed_failure_counts(
        stream, "lang NOT IN ('en','es','de','fr')", "ts", window="1 hour",
        watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("winfail")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window"]["start"].isoformat(), r["n_rows"], r["n_failed"])
           for r in spark.sql("SELECT * FROM winfail").collect()}
    want = {(r["w"]["start"].isoformat(), r["n_rows"], r["n_failed"])
            for r in (src.groupBy(F.window("ts", "1 hour").alias("w"))
                      .agg(F.count(F.lit(1)).alias("n_rows"),
                           F.sum(F.expr("lang NOT IN ('en','es','de','fr')")
                                 .cast("long")).alias("n_failed"))
                      .collect())}
    assert got == want and len(got) == 5  # 300 min of events → 5 windows


def test_stateful_unique_across_micro_batches(spark, tmp_path):
    """applyInPandasWithState: a key re-appearing in a LATER micro-batch is
    flagged duplicate from cross-batch state — inexpressible per-batch."""
    from sparkcheck.streaming import stateful_unique_stream
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = (spark.readStream.schema("url string, rid bigint")
                  .parquet(in_dir))
        out = stateful_unique_stream(stream, "url")
        # memory sink can't recover from a checkpoint — foreachBatch parquet
        # append is the recoverable sink (state lives in the checkpoint)
        q = (out.writeStream.foreachBatch(
                lambda b, _bid: b.write.mode("append").parquet(out_dir))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame([("https://a", 1), ("https://b", 2)],
                          "url string, rid bigint") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    first = {(r["key"], r["total_seen"], r["is_duplicate"])
             for r in spark.read.parquet(out_dir).collect()}
    assert first == {("https://a", 1, False), ("https://b", 1, False)}

    # later batch re-delivers key 'a' → duplicate via state persisted in the
    # streaming checkpoint across separate availableNow runs
    spark.createDataFrame([("https://a", 3), ("https://c", 4)],
                          "url string, rid bigint") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    rows = {(r["key"], r["total_seen"], r["is_duplicate"])
            for r in spark.read.parquet(out_dir).collect()}
    assert ("https://a", 2, True) in rows     # cross-batch duplicate
    assert ("https://c", 1, False) in rows
    assert ("https://b", 1, False) in rows    # untouched key not re-emitted twice
    assert len(rows) == 4


def test_stateful_unique_soak_across_restarts(spark, tmp_path):
    """VERDICT r02 item 10 — streaming soak: four micro-batches, each drained
    by a SEPARATE availableNow query restarted from the same checkpoint
    (stop → restart, state-store recovery), with per-restart assertions that
    the per-key running totals keep accumulating across every restart."""
    from sparkcheck.streaming import stateful_unique_stream
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = (spark.readStream.schema("url string, rid bigint")
                  .parquet(in_dir))
        q = (stateful_unique_stream(stream, "url").writeStream
             .foreachBatch(
                 lambda b, _bid: b.write.mode("append").parquet(out_dir))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    def totals():
        rows = spark.read.parquet(out_dir).collect()
        out: dict[str, tuple[int, bool]] = {}
        for r in rows:
            if r["key"] not in out or r["total_seen"] > out[r["key"]][0]:
                out[r["key"]] = (r["total_seen"], r["is_duplicate"])
        return out

    batches = [
        [("https://a", 1), ("https://b", 2)],
        [("https://a", 3), ("https://c", 4)],
        [("https://a", 5), ("https://b", 6), ("https://d", 7)],
        [("https://d", 8)],
    ]
    expected = [
        {"https://a": (1, False), "https://b": (1, False)},
        {"https://a": (2, True), "https://b": (1, False),
         "https://c": (1, False)},
        {"https://a": (3, True), "https://b": (2, True),
         "https://c": (1, False), "https://d": (1, False)},
        {"https://a": (3, True), "https://b": (2, True),
         "https://c": (1, False), "https://d": (2, True)},
    ]
    for batch, want in zip(batches, expected):
        spark.createDataFrame(batch, "url string, rid bigint") \
            .coalesce(1).write.mode("append").parquet(in_dir)
        run_once()
        assert totals() == want


def test_stateful_unique_ttl_evicts_idle_keys(spark, tmp_path):
    """VERDICT r3 item 7: with ttl_ms the state store is bounded — a key
    idle past the TTL is evicted on a later micro-batch (emitting nothing),
    and a subsequent re-appearance counts from 1 again; a key that keeps
    arriving keeps its running total (the timer re-arms on every touch)."""
    import time
    from sparkcheck.streaming import stateful_unique_stream
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = (spark.readStream.schema("url string, rid bigint")
                  .parquet(in_dir))
        q = (stateful_unique_stream(stream, "url", ttl_ms=1).writeStream
             .foreachBatch(
                 lambda b, _bid: b.write.mode("append").parquet(out_dir))
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    def rows():
        return {(r["key"], r["total_seen"], r["is_duplicate"])
                for r in spark.read.parquet(out_dir).collect()}

    spark.createDataFrame([("https://a", 1), ("https://b", 2)],
                          "url string, rid bigint") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    assert rows() == {("https://a", 1, False), ("https://b", 1, False)}

    # both keys idle > 1ms by the next batch; 'c' arrives, 'a'/'b' timers
    # fire → evicted silently (no new rows for them)
    time.sleep(0.05)
    spark.createDataFrame([("https://c", 3)], "url string, rid bigint") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    assert rows() == {("https://a", 1, False), ("https://b", 1, False),
                      ("https://c", 1, False)}

    # 'a' re-appears AFTER eviction → state restarted, NOT a duplicate
    time.sleep(0.05)
    spark.createDataFrame([("https://a", 4)], "url string, rid bigint") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    got = rows()
    assert ("https://a", 2, True) not in got   # old total did NOT survive
    # two identical (a,1,False) rows collapse in the set: assert via counts
    a_rows = [r for r in spark.read.parquet(out_dir).collect()
              if r["key"] == "https://a"]
    assert sorted((r["total_seen"], r["is_duplicate"]) for r in a_rows) \
        == [(1, False), (1, False)]


def test_session_counts_stream_matches_batch(spark, tmp_path):
    """Streaming session_window sessionization over a file backlog equals
    the batch sessionize counts (no exact-gap boundary events in this
    input, where the two conventions differ — see the operator docstring)."""
    from sparkcheck.operators.sessions import sessionize
    from sparkcheck.streaming import session_counts_stream

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for s in range(u):                # user u has u sessions
            base = s * 100_000 + u       # sessions far beyond any gap
            for k in range(3):           # 3 events, 60s apart
                rows.append((eid, base + k * 60, u)); eid += 1
    src = spark.createDataFrame(
        rows, "event_id bigint, t bigint, user_id bigint") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    in_dir = str(tmp_path / "ev_in")
    src.repartition(2).write.parquet(in_dir)

    stream = spark.readStream.schema("event_id bigint, ts timestamp, "
                                     "user_id bigint").parquet(in_dir)
    out = session_counts_stream(stream, gap="30 minutes")
    q = (out.writeStream.format("memory").queryName("sess_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start"]): r["n_events"]
           for r in spark.sql("SELECT * FROM sess_stream").collect()}
    assert len(got) == 6                  # 1 + 2 + 3 sessions
    assert all(n == 3 for n in got.values())

    batch = {(r["user_id"], r["session_seq"]): r["n_events"]
             for r in sessionize(src, gap_s=1800).collect()}
    assert sorted(got.values()) == sorted(batch.values())
    assert len(batch) == 6
