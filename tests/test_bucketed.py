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
