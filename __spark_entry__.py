"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship suite on sf0.001, returns the verdicts DataFrame.
queries()      — per-operator callables (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB SQL equivalents over the pre-registered `documents`
                 view (the pages table is derived from it by the same
                 dual-dialect SQL template on both sides — sparkcheck/sources/
                 pages.py vs sparkcheck/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcheck import oracle
from sparkcheck import suite as S
from sparkcheck.functions.extraction import extract_text
from sparkcheck.operators.drift import kl_divergence
from sparkcheck.operators.stats import column_stats, length_histogram
from sparkcheck.operators.uniqueness import duplicate_keys
from sparkcheck.sources.dims import iso_lang_dim
from sparkcheck.sources.pages import load_pages

REPLICAS = oracle.REPLICAS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _, res = S.run_suite(spark, "/root/testdata/sf0.001", replicas=REPLICAS,
                         with_stats=False, with_drift=False)
    return res.verdicts.select("url", "success", "rule_id", "step")


# ---------------------------------------------------------------------------
# queries — Spark side
# ---------------------------------------------------------------------------


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_pages(spark, sf_dir, replicas=REPLICAS)


def q_pages_table(spark, sf_dir):
    return _pages(spark, sf_dir).select(
        "url", "warc_epoch", "lang",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        "source", "doc_id", "rid")


def q_verdicts(spark, sf_dir):
    _, res = S.run_suite(spark, sf_dir, replicas=REPLICAS,
                         with_stats=False, with_drift=False)
    return res.verdicts.select("url", "success", "rule_id", "step")


def q_violations(spark, sf_dir):
    _, res = S.run_suite(spark, sf_dir, replicas=REPLICAS,
                         with_stats=False, with_drift=False)
    return res.violations.select("rule_id", "url", "key", "message",
                                 "offending_value")


def q_referential_lang(spark, sf_dir):
    _, res = S.run_suite(spark, sf_dir, replicas=REPLICAS,
                         with_stats=False, with_drift=False)
    return (res.violations.filter(F.col("rule_id") == "lang-iso")
            .select("url", F.col("offending_value").alias("lang")))


def q_unique_url_dups(spark, sf_dir):
    pages = _pages(spark, sf_dir)
    fr = S.valid_pages(pages, iso_lang_dim(spark))
    return duplicate_keys(fr, "url").select("url", "cnt")


def q_column_stats_exact(spark, sf_dir):
    pages = _pages(spark, sf_dir)
    fr = S.frontier_after_unique(pages, iso_lang_dim(spark))
    return column_stats(fr, S.STATS_COLS, exact_distinct=True)


def q_length_histogram(spark, sf_dir):
    pages = _pages(spark, sf_dir)
    fr = S.frontier_after_unique(pages, iso_lang_dim(spark))
    return length_histogram(fr, "text", bin_width=50)


def q_extraction_identity(spark, sf_dir):
    pages = _pages(spark, sf_dir)
    return (pages.filter(F.col("html").isNotNull())
            .select("url", F.sha2(extract_text(F.col("html")), 256)
                    .alias("extracted_sha")))


def q_drift_lang_kl(spark, sf_dir):
    pages = _pages(spark, sf_dir)
    dim = iso_lang_dim(spark)
    fr = S.frontier_after_unique(pages, dim)
    baseline = S.make_baseline(pages, REPLICAS, dim)
    kl = kl_divergence(fr, "lang", F.coalesce(F.col("lang"), F.lit("∅")),
                       baseline)
    return spark.createDataFrame([(round(kl, 4),)], "kl double")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pages_table": q_pages_table,
        "verdicts": q_verdicts,
        "violations": q_violations,
        "referential_lang": q_referential_lang,
        "unique_url_dups": q_unique_url_dups,
        "column_stats_exact": q_column_stats_exact,
        "length_histogram": q_length_histogram,
        "extraction_identity": q_extraction_identity,
        "drift_lang_kl": q_drift_lang_kl,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pages_table": oracle.pages_table(),
        "verdicts": oracle.verdicts(),
        "violations": oracle.violations(),
        "referential_lang": oracle.referential_lang(),
        "unique_url_dups": oracle.unique_url_dups(),
        "column_stats_exact": oracle.column_stats_exact(),
        "length_histogram": oracle.length_histogram(),
        "extraction_identity": oracle.extraction_identity(),
        "drift_lang_kl": oracle.drift_lang_kl(),
    }
