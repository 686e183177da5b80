"""Scale-behavior tests (SURVEY.md §5.2 item 4 + §4.2):
- skew: hot-key synthetic skew → salted two-phase counts identical to plain
  groupBy counts, and identical across salt_buckets settings
- plan quality: filters are pushed to the parquet scan; dimension joins are
  broadcast; no per-row Python UDF appears in the pure-SQL rule path
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck import suite as S
from sparkcheck.operators.uniqueness import duplicate_keys
from sparkcheck.sources.dims import iso_lang_dim
from sparkcheck.sources.pages import load_pages

from .conftest import SF_SMALL


def test_salted_count_matches_plain_groupby_under_skew(spark):
    # hot key: 50k rows on ONE key + uniform tail
    hot = spark.range(50_000).select(F.lit("https://hot/1").alias("url"))
    tail = spark.range(10_000).select(
        F.concat(F.lit("https://t/"), (F.col("id") % 5000).cast("string"))
        .alias("url"))
    df = hot.unionByName(tail)
    for buckets in (4, 64, 257):
        salted = {(r["url"], r["cnt"]) for r in
                  duplicate_keys(df, "url", salt_buckets=buckets).collect()}
        plain = {(r["url"], r["cnt"]) for r in
                 df.groupBy("url").agg(F.count(F.lit(1)).alias("cnt"))
                   .filter(F.col("cnt") > 1).collect()}
        assert salted == plain, f"buckets={buckets}"
    assert ("https://hot/1", 50_000) in plain


def test_filter_pushdown_reaches_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = docs.filter(F.col("lang") == "en").select("doc_id", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: scan schema must not include untouched text column
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_dimension_join_is_broadcast(spark):
    pages = load_pages(spark, SF_SMALL, replicas=2)
    fr = S.valid_pages(pages, iso_lang_dim(spark))
    plan = fr._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sql_rule_path_has_no_python_udf(spark):
    pages = load_pages(spark, SF_SMALL, replicas=2)
    v, deps = S.pages_validator(spark, with_stats=False, with_drift=False,
                                with_extraction=False)
    deps["baseline_stats"] = spark.createDataFrame(
        [], "col string, bucket string, p double")
    res = v.provide(**deps).validate(pages, persist=False)
    res.verdicts.collect()  # finalize THIS query's AQE plan (count() would
    # execute a different wrapped queryExecution)
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "PythonUDF", "ArrowEvalPython"):
        assert marker not in plan, marker
