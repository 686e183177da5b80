"""Unit tests for sessionize / asof_join / hash sampling: known-answer
semantics on crafted inputs plus the plan contracts (sessionize = exactly
one exchange; sampling = none)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.operators import sampling
from sparkcheck.operators.asof import asof_join
from sparkcheck.operators.sessions import sessionize


def _events(spark, rows):
    """rows: (event_id, epoch_s, user_id[, value])."""
    if rows and len(rows[0]) == 4:
        df = spark.createDataFrame(
            rows, "event_id bigint, t bigint, user_id bigint, value double")
    else:
        df = spark.createDataFrame(
            rows, "event_id bigint, t bigint, user_id bigint")
    return df.withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")


def test_sessionize_known_answer(spark):
    # user 1: events at 0s,100s then 10000s → two sessions with gap 1800s;
    # user 2: single event
    df = _events(spark, [(1, 0, 1), (2, 100, 1), (3, 10000, 1), (4, 50, 2)])
    out = {(r["user_id"], r["session_seq"]): r.asDict()
           for r in sessionize(df, gap_s=1800).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["start_us"] == 0 and s11["end_us"] == 100_000_000
    assert s11["duration_us"] == 100_000_000
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["duration_us"] == 0


def test_sessionize_boundary_gap_not_new_session(spark):
    # gap EXACTLY equal to gap_s stays in the same session (strict >)
    df = _events(spark, [(1, 0, 1), (2, 1800, 1), (3, 3601, 1)])
    out = sessionize(df, gap_s=1800).collect()
    assert {r["session_seq"] for r in out} == {1, 2}
    assert {r["n_events"] for r in out} == {2, 1}


def test_sessionize_plan_single_exchange(spark, tmp_path):
    """Scale contract: the window partition on user_id already satisfies
    the session-level groupBy clustering — ONE exchange total."""
    p = str(tmp_path / "ev.parquet")
    _events(spark, [(i, i * 30, i % 5) for i in range(200)]) \
        .write.parquet(p)
    plan = sessionize(spark.read.parquet(p)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_known_answer(spark):
    left = _events(spark, [(1, 5, 1), (2, 15, 1), (3, 25, 1), (4, 10, 1)])
    right = _events(spark, [(90, 10, 1, 7.0), (91, 20, 1, 9.0)]) \
        .select("user_id", "ts", F.col("value").alias("asof_value"))
    out = {r["event_id"]: r.asDict() for r in asof_join(
        left, right, on="user_id", ts_col="ts",
        left_cols=["event_id", "user_id"],
        right_cols=["asof_value"]).collect()}
    # event 1 (t=5) precedes every update → dropped (inner as-of)
    assert set(out) == {2, 3, 4}
    assert out[2]["asof_value"] == 7.0
    assert out[3]["asof_value"] == 9.0 and out[3]["asof_ts_us"] == 20_000_000
    # equal timestamps: the simultaneous update IS visible (>= convention)
    assert out[4]["asof_value"] == 7.0


def test_asof_keys_isolated(spark):
    left = _events(spark, [(1, 50, 1), (2, 50, 2)])
    right = _events(spark, [(90, 10, 2, 3.0)]) \
        .select("user_id", "ts", F.col("value").alias("asof_value"))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    left_cols=["event_id", "user_id"],
                    right_cols=["asof_value"]).collect()
    # user 1 has no updates at all → its event is dropped
    assert [(r["event_id"], r["asof_value"]) for r in out] == [(2, 3.0)]


def test_hash_sample_deterministic_and_union_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sampling.hash_sample(df, "doc_id", 0.3)
    ids1 = {r["doc_id"] for r in a.collect()}
    ids2 = {r["doc_id"] for r in a.collect()}
    assert ids1 == ids2  # deterministic across executions
    assert 0.2 < len(ids1) / 2000 < 0.4
    # union-stability: sample(A ∪ B) == sample(A) ∪ sample(B)
    lo, hi = df.filter("doc_id < 1000"), df.filter("doc_id >= 1000")
    part = {r["doc_id"] for r in
            sampling.hash_sample(lo, "doc_id", 0.3).collect()} | \
           {r["doc_id"] for r in
            sampling.hash_sample(hi, "doc_id", 0.3).collect()}
    assert part == ids1


def test_stratified_rates_and_default(spark):
    df = spark.createDataFrame(
        [(i, ["en", "de", "xx"][i % 3]) for i in range(3000)],
        "doc_id bigint, lang string")
    out = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.2}, default_rate=0.0) \
        .groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert got["en"] == 1000        # rate 1.0 keeps every row
    assert 100 < got["de"] < 300    # ~0.2
    assert "xx" not in got          # default 0.0 drops unknown strata


def test_sampling_plan_no_shuffle(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.range(0, 100).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.lit("en")).write.parquet(p)
    plan = sampling.stratified_hash_sample(
        spark.read.parquet(p), "doc_id", "lang", {"en": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure codegen filter


def test_funnel_strict_ordering(spark):
    """A click BEFORE the first view does not advance the funnel; a
    simultaneous one does (>= convention)."""
    from sparkcheck.operators.sessions import funnel
    df = spark.createDataFrame(
        [  # u1: view@10 click@20 purchase@30 — full funnel
           (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "purchase"),
           # u2: click@5 view@10 — click precedes the view → stops at view
           (4, 5, 2, "click"), (5, 10, 2, "view"),
           # u3: view@10 click@10 — simultaneous click counts
           (6, 10, 3, "view"), (7, 10, 3, "click"),
           # u4: purchase only — never enters the funnel
           (8, 10, 4, "purchase")],
        "event_id bigint, t bigint, user_id bigint, event_type string") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    out = {r["path"]: r["n_users"] for r in funnel(df).collect()}
    assert out == {"view": 3, "view>click": 2, "view>click>purchase": 1}


def test_event_rate_anomaly_flags_burst(spark):
    """A bucket with a 10× burst is flagged; quiet buckets are not; a type
    with constant rate (sd = 0) gets z = 0 everywhere."""
    from sparkcheck.operators.sessions import event_rate_anomaly
    rows = []
    eid = 0
    for hr in range(10):               # 'click': 2/bucket, burst in hr 5
        n = 20 if hr == 5 else 2
        for i in range(n):
            rows.append((eid, hr * 3600 + i, 1, "click")); eid += 1
    for hr in range(10):               # 'view': constant 3/bucket → sd 0
        for i in range(3):
            rows.append((eid, hr * 3600 + i, 1, "view")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, t bigint, user_id bigint, event_type string"
        ).withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    out = event_rate_anomaly(df, bucket_s=3600, z=2.0).collect()
    flagged = {(r["event_type"], r["hr"]) for r in out if r["anomaly"]}
    assert flagged == {("click", 5)}
    assert all(r["z4"] == 0.0 for r in out if r["event_type"] == "view")


def test_norm_outliers_tails_only(spark):
    """With 100 distinct norms and a [0.05, 0.95] band, ~5 land on each
    side and every flagged row carries the right side label."""
    from sparkcheck.operators.similarity import norm_outliers
    df = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(100)],
        "vec_id bigint, embedding array<float>")
    out = norm_outliers(df, lo=0.05, hi=0.95).collect()
    assert 8 <= len(out) <= 10
    for r in out:
        assert r["side"] == ("low" if r["norm"] < 50 else "high")
        assert (r["vec_id"] < 5) if r["side"] == "low" else (r["vec_id"] > 93)


def test_sessionize_and_asof_drop_null_keys_and_ts(spark):
    """NULL users/timestamps never match in SQL (the DuckDB oracles join or
    partition them away); the operators must drop them, not group them —
    Spark window ORDER BY also places NULLs first where DuckDB places them
    last, which would silently renumber sessions."""
    from sparkcheck.operators.sessions import sessionize
    df = spark.createDataFrame(
        [(1, 0, 1), (2, None, 1), (3, 100, None), (4, 50, 2)],
        "event_id bigint, t bigint, user_id bigint") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    out = sessionize(df, gap_s=1800).collect()
    assert {(r["user_id"], r["n_events"]) for r in out} == {(1, 1), (2, 1)}

    left = df
    right = spark.createDataFrame(
        [(90, 10, None, 5.0), (91, 20, 2, 7.0)],
        "event_id bigint, t bigint, user_id bigint, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))) \
        .select("user_id", "ts", F.col("value").alias("asof_value"))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    left_cols=["event_id", "user_id"],
                    right_cols=["asof_value"]).collect()
    # only user 2's event matches; the NULL-key update fills nothing and
    # the NULL-key/NULL-ts left rows are dropped
    assert [(r["event_id"], r["asof_value"]) for r in out] == [(4, 7.0)]


def test_asof_duplicate_right_ts_collapses_to_max_payload(spark):
    """Duplicate (key, ts) right rows are deduped to max(payload) BEFORE
    the union — the tie is resolved by construction, not by either
    engine's (unspecified) ASOF tie choice."""
    left = _events(spark, [(1, 100, 7)]) \
        .select("event_id", "user_id", "ts")
    right = spark.createDataFrame(
        [(7, 50, 1.0), (7, 50, 9.0), (7, 50, 4.0)],
        "user_id bigint, t bigint, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))) \
        .select("user_id", "ts", F.col("value").alias("asof_value"))
    out = asof_join(left, right, on="user_id", ts_col="ts",
                    left_cols=["event_id", "user_id"],
                    right_cols=["asof_value"]).collect()
    assert [(r["event_id"], r["asof_value"]) for r in out] == [(1, 9.0)]


def test_norm_outliers_approx_rank_tolerance(spark):
    """The approx=True path (approx_percentile, the 10^12 swap): with rank
    error <= 1/accuracy, the flagged set differs from exact by at most a
    few boundary ranks — mirror of the numeric_quantiles sketch test."""
    from sparkcheck.operators.similarity import norm_outliers
    n = 2000
    df = spark.createDataFrame(
        [(i, [float(i + 1), 0.0]) for i in range(n)],
        "vec_id bigint, embedding array<float>")
    exact = {r["vec_id"] for r in
             norm_outliers(df, lo=0.05, hi=0.95).collect()}
    approx = {r["vec_id"] for r in
              norm_outliers(df, lo=0.05, hi=0.95, approx=True,
                            accuracy=10_000).collect()}
    # rank tolerance: n/accuracy ranks per band edge, 2 edges
    tol = 2 * (n // 10_000 + 1)
    assert len(exact.symmetric_difference(approx)) <= 2 * tol
    # side labels agree on the intersection
    sides_e = {r["vec_id"]: r["side"] for r in
               norm_outliers(df, lo=0.05, hi=0.95).collect()}
    sides_a = {r["vec_id"]: r["side"] for r in
               norm_outliers(df, lo=0.05, hi=0.95, approx=True).collect()}
    for vid in exact & approx:
        assert sides_e[vid] == sides_a[vid]


def test_funnel_plan_no_cartesian_without_broadcast(spark, tmp_path):
    """Scale contract (broadcast disabled, the 100-TB shape): every frontier
    join stays a keyed hash/merge join on the user key — no
    CartesianProduct, no BroadcastNestedLoopJoin, no range-partitioned
    global sort anywhere in the plan."""
    from sparkcheck.operators.sessions import funnel
    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i, i * 10, i % 7, ["view", "click", "purchase"][i % 3])
         for i in range(300)],
        "event_id bigint, t bigint, user_id bigint, event_type string") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t") \
        .write.parquet(p)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = funnel(spark.read.parquet(p)) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
