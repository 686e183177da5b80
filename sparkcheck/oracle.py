"""DuckDB oracle SQL for the driver's side-by-side correctness check.

Each function returns ANSI/DuckDB SQL over the pre-registered `documents`
view that reproduces — independently, in SQL — what the Spark engine computes:
the same derived pages table (sources/pages.py dual-dialect template), the
same fail-fast verdict cascade (engine.py), the same violation rows, stats,
histograms and KL drift. Constants are imported from suite.py so the two
sides cannot drift apart.
"""

from __future__ import annotations

from .sources.dims import ISO_639_1
from .sources.pages import pages_cte
from . import suite as S

REPLICAS = 4


def _iso_values() -> str:
    rows = ", ".join(f"('{c}')" for c, _ in ISO_639_1)
    return f"(VALUES {rows}) AS iso(code)"


def _prelude() -> str:
    """Shared CTE chain: pages → per-rule failure flags → frontier → dups →
    per-row verdict. Mirrors engine.run_validation's ordering exactly:
    schema(url) → text-not-null → text-length → lang-iso → warc-ts-window →
    unique-url → extract-byte-identity (never fails on this data)."""
    return f"""
WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
f AS (
  SELECT url, rid, lang, text, warc_epoch, html, source, doc_id,
    NOT regexp_matches(url, '{S.URL_RE}') AS f_schema,
    (text IS NULL) AS f0,
    COALESCE(NOT (length(text) BETWEEN {S.TEXT_LEN_MIN} AND {S.TEXT_LEN_MAX}),
             TRUE) AS f1,
    (lang IS NULL OR lang NOT IN (SELECT code FROM {_iso_values()})) AS f2,
    NOT (warc_epoch BETWEEN {S.TS_MIN} AND {S.TS_MAX}) AS f3
  FROM pages),
fr AS (SELECT * FROM f WHERE NOT (f_schema OR f0 OR f1 OR f2 OR f3)),
dups AS (SELECT url, count(*) AS cnt FROM fr GROUP BY url HAVING count(*) > 1),
v AS (
  SELECT f.*, d.cnt AS dup_cnt,
    CASE WHEN f_schema THEN 'schema'
         WHEN f0 OR f1 OR f2 OR f3 OR d.url IS NOT NULL THEN 'rules'
         ELSE NULL END AS step,
    CASE WHEN f_schema THEN NULL
         WHEN f0 THEN 'text-not-null'
         WHEN f1 THEN 'text-length'
         WHEN f2 THEN 'lang-iso'
         WHEN f3 THEN 'warc-ts-window'
         WHEN d.url IS NOT NULL THEN 'unique-url'
         ELSE NULL END AS rule_id
  FROM f LEFT JOIN dups d ON f.url = d.url AND NOT (f_schema OR f0 OR f1 OR f2 OR f3)),
frontier AS (SELECT * FROM v WHERE step IS NULL)
"""


def pages_table() -> str:
    return f"""{_prelude()}
SELECT url, warc_epoch, lang, sha256(text) AS text_sha, source, doc_id, rid
FROM pages"""


def verdicts() -> str:
    return f"""{_prelude()}
SELECT url, (step IS NULL) AS success, rule_id, step FROM v"""


def violations() -> str:
    return f"""{_prelude()}
SELECT rule_id, url,
  CASE WHEN step = 'schema' THEN 'url'
       WHEN rule_id IN ('text-not-null','text-length') THEN 'text'
       WHEN rule_id = 'lang-iso' THEN 'lang'
       WHEN rule_id = 'warc-ts-window' THEN 'warc_ts'
       WHEN rule_id = 'unique-url' THEN 'url' END AS key,
  CASE WHEN step = 'schema' THEN '{S.MSG_URL}'
       WHEN rule_id = 'text-not-null' THEN '{S.MSG_TEXT_NULL}'
       WHEN rule_id = 'text-length' THEN '{S.MSG_TEXT_LEN}'
       WHEN rule_id = 'lang-iso' THEN '{S.MSG_LANG}'
       WHEN rule_id = 'warc-ts-window' THEN '{S.MSG_TS}'
       WHEN rule_id = 'unique-url' THEN
         'Duplicate value for url: ' || url || ' (' || CAST(dup_cnt AS STRING)
         || ' occurrences)' END AS message,
  CASE WHEN step = 'schema' THEN url
       WHEN rule_id = 'text-not-null' THEN NULL
       WHEN rule_id = 'text-length' THEN CAST(length(text) AS STRING)
       WHEN rule_id = 'lang-iso' THEN lang
       WHEN rule_id = 'warc-ts-window' THEN CAST(warc_epoch AS STRING)
       WHEN rule_id = 'unique-url' THEN url END AS offending_value
FROM v WHERE step IS NOT NULL"""


def referential_lang() -> str:
    """Frontier-scoped referential violations (C2)."""
    return f"""{_prelude()}
SELECT url, lang FROM v WHERE rule_id = 'lang-iso'"""


def unique_url_dups() -> str:
    """Salted-count parity: duplicate url groups over the frontier (C3)."""
    return f"""{_prelude()}
SELECT url, cnt FROM dups"""


def column_stats_exact() -> str:
    """Stats over the post-rules frontier, exact distinct (HLL parity is
    tested separately with tolerance in pytest)."""
    cols = S.STATS_COLS
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS col,
  AVG(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END) AS null_rate,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST(MIN({c}) AS STRING) AS min_value,
  CAST(MAX({c}) AS STRING) AS max_value
FROM frontier""")
    union = " UNION ALL ".join(parts)
    return f"{_prelude()}{union}"


def length_histogram() -> str:
    return f"""{_prelude()}
SELECT CAST(FLOOR(length(text) / 50) AS BIGINT) AS bucket, count(*) AS n
FROM frontier WHERE text IS NOT NULL GROUP BY 1"""


def extraction_identity() -> str:
    """Re-derive the extraction in SQL from the html bytes — cross-checks the
    pandas UDF byte-for-byte via sha256."""
    return f"""{_prelude()}
SELECT url, sha256(regexp_extract(decode(html), '<p>(.*)</p>', 1)) AS extracted_sha
FROM pages WHERE html IS NOT NULL"""


def drift_lang_kl(smoothing: float = 1e-9) -> str:
    """KL(current frontier ‖ validated first-replica slice), rounded to 4dp —
    same formula as operators/drift.kl_divergence."""
    return f"""{_prelude()},
base_rows AS (SELECT COALESCE(lang, '∅') AS b FROM fr WHERE rid % {REPLICAS} = 0),
base AS (SELECT b, count(*) AS n FROM base_rows GROUP BY b),
basep AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM base) AS q FROM base),
cur_rows AS (SELECT COALESCE(lang, '∅') AS b FROM frontier),
cur AS (SELECT b, count(*) AS n FROM cur_rows GROUP BY b),
curp AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM cur) AS p FROM cur),
j AS (SELECT COALESCE(curp.p, 0.0) AS p, COALESCE(basep.q, 0.0) AS q
      FROM curp FULL OUTER JOIN basep ON curp.b = basep.b)
SELECT ROUND(SUM((p + {smoothing}) * LN((p + {smoothing}) / (q + {smoothing}))), 4) AS kl
FROM j"""
