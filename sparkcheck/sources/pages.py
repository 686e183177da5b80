"""Deterministic synthetic Common-Crawl-style pages table.

BASELINE.json input_hint: the engine's input is a table
(url string, warc_ts timestamp, html binary, text string, lang string).
The sandbox derives it *deterministically from the driver's documents.parquet*
(seeded, TESTDATA.md) with pure modular arithmetic — the SAME SQL template
renders for Spark and for the DuckDB oracle, so the driver's side-by-side
correctness check reproduces the identical table from the pre-registered
`documents` view without any external files.

Deliberate data-quality injections (FIXTURES.md §1 knobs):
- duplicate urls       : rid % 17 == 0  → collide onto 50 'dup.example' urls (C3)
- hot-prefix skew      : rid % 5 == 0   → 'https://hot.example/...' (~20% of rows)
- invalid url          : rid % 97 == 3  → 'notaurl:...' fails the url regex (C1)
- out-of-range warc_ts : rid % 101 == 7 → epoch in 1999 (C8 temporal window)
- invalid lang 'xx'    : rid % 41 == 5  (C2 referential)
- empty lang ''        : rid % 43 == 6
- NULL lang            : rid % 47 == 9
- NULL text (and html) : rid % 89 == 11 (null-rate stats)

rid = doc_id * replicas + i is the replica-expanded row id; `replicas`
amplifies the table deterministically for benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Portable core (identical text for Spark SQL and DuckDB): everything except
# the replica generator and the binary encode() call.
_PAGES_CORE = """
SELECT
  CASE
    WHEN rid % 97 = 3  THEN 'notaurl:' || CAST(rid AS STRING)
    WHEN rid % 17 = 0  THEN 'https://dup.example/page' || CAST(doc_id % 50 AS STRING)
    WHEN rid % 5 = 0   THEN 'https://hot.example/' || source || '/p' || CAST(rid AS STRING)
    ELSE 'https://www.example.org/' || source || '/' || CAST(doc_id AS STRING) || '-' || CAST(i AS STRING)
  END AS url,
  CAST(CASE WHEN rid % 101 = 7 THEN 915148800 + (rid % 100) * 3600
            ELSE 1704067200 + (rid % 500) * 3600 END AS BIGINT) AS warc_epoch,
  CASE WHEN rid % 89 = 11 THEN NULL ELSE text END AS text,
  CASE WHEN rid % 41 = 5 THEN 'xx'
       WHEN rid % 43 = 6 THEN ''
       WHEN rid % 47 = 9 THEN NULL
       ELSE lang END AS lang,
  source, doc_id, rid
FROM (
  SELECT d.text, d.lang, d.source, d.doc_id, r.i AS i,
         d.doc_id * {replicas} + r.i AS rid
  FROM documents d CROSS JOIN ({replica_gen}) r
) base
"""

_HTML_TPL = ("'<html><head><title>' || source || '</title></head><body><p>' "
             "|| text || '</p></body></html>'")


def pages_cte(dialect: str, replicas: int = 4) -> str:
    """The `pages` relation as a SQL text for `dialect` in
    {'spark', 'duckdb'} — identical values in both engines."""
    if dialect == "spark":
        replica_gen = (f"SELECT explode(sequence(0, {replicas - 1})) AS i")
        html = f"encode({_HTML_TPL}, 'UTF-8')"
    elif dialect == "duckdb":
        replica_gen = (f"SELECT unnest(range(0, {replicas})) AS i")
        html = f"encode({_HTML_TPL})"
    else:  # pragma: no cover
        raise ValueError(dialect)
    core = _PAGES_CORE.format(replicas=replicas, replica_gen=replica_gen)
    return (f"SELECT url, warc_epoch, text, lang, source, doc_id, rid, "
            f"{html} AS html FROM ({core}) core")


def pages_with_cte(dialect: str, replicas: int = 4) -> str:
    """`WITH pages AS (...)` prefix for oracle queries."""
    return f"WITH pages AS ({pages_cte(dialect, replicas)})"


def load_pages(spark: SparkSession, sf_dir: str, replicas: int = 4,
               partitions: int | None = None) -> DataFrame:
    """Engine-side pages DataFrame: documents.parquet → pages, with a real
    TimestampType warc_ts column (UTC) alongside warc_epoch.

    documents.parquet is a single small file → a single scan partition; the
    ×replicas explode would then amplify rows WITHOUT parallelism (the whole
    per-row stage in one task). Repartition the docs BEFORE the explode —
    shuffling the few thousand pre-amplification rows is ~free and gives the
    amplified stage full parallelism. (On a real multi-file crawl the scan is
    naturally parallel and this is a no-op knob.)"""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(partitions)
    docs.createOrReplaceTempView("documents")
    df = spark.sql(pages_cte("spark", replicas))
    return df.withColumn("warc_ts", df["warc_epoch"].cast("timestamp"))
