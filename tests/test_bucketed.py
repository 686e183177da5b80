"""Bucketed-table plan contracts (sources/bucketed.py): writing the crawl
bucketed by url pays its shuffle once — url-keyed aggregates and
same-bucketing joins must then plan WITHOUT exchanges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck.sources.bucketed import read_bucketed, write_bucketed
from sparkcheck.sources.pages import load_pages

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pages(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    pages = load_pages(spark, SF_SMALL, replicas=2).select(
        "url", "lang", "text", "rid")
    for t in ("pages_b", "pages_b2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        write_bucketed(pages, t, bucket_col="url", buckets=8,
                       path=str(base / t))
    yield read_bucketed(spark, "pages_b"), read_bucketed(spark, "pages_b2")
    for t in ("pages_b", "pages_b2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_groupby_needs_no_exchange(spark, bucketed_pages):
    """groupBy on the bucket column: the scan's output partitioning already
    satisfies the aggregate's distribution — zero shuffle exchanges."""
    b, _ = bucketed_pages
    agg = b.groupBy("url").agg(F.count(F.lit(1)).alias("cnt"))
    agg.collect()
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan
    # sanity: the same aggregate over the unbucketed frame DOES shuffle
    raw = load_pages(spark, SF_SMALL, replicas=2) \
        .groupBy("url").agg(F.count(F.lit(1)).alias("cnt"))
    raw.collect()
    assert "Exchange hashpartitioning" in _plan(raw)


def test_bucketed_self_join_needs_no_exchange(spark, bucketed_pages):
    """Join of two tables bucketed identically on the join key: both sides
    stream from their buckets — no exchange on either side."""
    b, b2 = bucketed_pages
    j = b.select("url", "rid").join(b2.select("url", "lang"), on="url")
    j.collect()
    plan = _plan(j)
    assert "Exchange hashpartitioning" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan)


def test_bucketed_roundtrip_values(spark, bucketed_pages):
    b, _ = bucketed_pages
    raw = load_pages(spark, SF_SMALL, replicas=2)
    assert b.count() == raw.count()
    assert (b.agg(F.sum(F.crc32(F.col("url"))).alias("s")).collect()[0]["s"]
            == raw.agg(F.sum(F.crc32(F.col("url"))).alias("s"))
                  .collect()[0]["s"])


def test_flagship_suite_over_bucketed_table(spark, tmp_path):
    """VERDICT r3 item 6 — the shipped path: the FULL flagship suite runs
    over a url-bucketed table via run_suite_df, produces verdicts identical
    to the plain-parquet path, and its unique-url stage (bucketed scan →
    validity filters → salted two-phase dup aggregate) plans with ZERO
    shuffle exchanges — the write-time shuffle pre-pays the suite's one
    recurring exchange."""
    from sparkcheck import suite as S
    from sparkcheck.operators.uniqueness import duplicate_keys
    from sparkcheck.sources.dims import iso_lang_dim

    pages = load_pages(spark, SF_SMALL, replicas=2)
    spark.sql("DROP TABLE IF EXISTS pages_full_b")
    write_bucketed(pages, "pages_full_b", bucket_col="url", buckets=8,
                   path=str(tmp_path / "pages_full_b"))
    try:
        rb = read_bucketed(spark, "pages_full_b")

        # unique-url stage end-to-end from the bucketed scan: no exchange
        dups = duplicate_keys(S.valid_pages(rb, iso_lang_dim(spark)), "url")
        dups.collect()
        assert "Exchange hashpartitioning" not in _plan(dups)

        # full suite over the bucketed table ≡ the plain path
        res_b = S.run_suite_df(spark, rb, replicas=2, with_stats=False,
                               with_drift=False)
        _, res_p = S.run_suite(spark, SF_SMALL, replicas=2, with_stats=False,
                               with_drift=False)
        got = sorted((r["url"], r["success"], r["rule_id"], r["step"])
                     for r in res_b.verdicts.collect())
        want = sorted((r["url"], r["success"], r["rule_id"], r["step"])
                      for r in res_p.verdicts.collect())
        assert got == want
        res_b.unpersist()
        res_p.unpersist()
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_full_b")
