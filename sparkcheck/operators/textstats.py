"""Text-analysis operators for training-data pipelines over the `documents`
table: token counting, language-ID heuristic, quality scoring, document
fingerprinting. (Beyond the reference's surface — first-class components per
the build brief; the reference has no text ops at all.)

Every operator is a pure Spark-SQL expression pipeline (whole-stage codegen,
no Python in the hot path) with a DuckDB-portable formulation so each has a
driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword lists for the lang-id heuristic (public knowledge)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "den", "von", "ist", "mit"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def round4(col):
    """Cross-engine-stable 4dp rounding: floor(x·1e4 + 0.5)/1e4 gives
    identical results wherever the input doubles are bit-identical, unlike
    engine round() (HALF_UP vs banker's divergence at boundaries)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000.0


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `tokens` (split on single space — the corpus is space-joined)."""
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace token count; NULL text → 0 tokens."""
    n = F.when(F.col(text_col).isNull(), F.lit(0)) \
         .otherwise(F.size(F.split(F.col(text_col), " ")))
    return df.select("doc_id", n.alias("n_tokens"))


BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  # letter runs | digit runs | punct


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens) — BPE-ish regex token count: letter runs,
    digit runs and individual punctuation marks count separately (the
    pre-tokenization split BPE vocabularies apply before merges), giving a
    closer proxy for LLM token cost than whitespace counting. Pure codegen
    (regexp_count); pattern restricted to classes that match identically in
    Java regex and DuckDB's RE2."""
    n = F.when(F.col(text_col).isNull(), F.lit(0)) \
         .otherwise(F.regexp_count(F.col(text_col), F.lit(BPE_PAT)))
    return df.select("doc_id", n.cast("int").alias("n_bpe_tokens"))


ROLL_B = 131                 # polynomial base
ROLL_M = (1 << 31) - 1       # Mersenne prime modulus — products stay < 2^39,
                             # safe under ANSI bigint (no overflow throw)


def fingerprint_rolling(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, roll_fp) — ORDER-SENSITIVE document fingerprint: polynomial
    rolling hash over the token stream, h = fold((acc·B + md5_31(tok)) mod M).
    Complements `fingerprint` (order-insensitive set hash): reordered or
    trimmed documents get different roll_fp but may share fp. Sequential
    left fold → DuckDB list_reduce reproduces it exactly."""
    toks = F.split(F.col(text_col), " ")
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                   .cast("bigint") % ROLL_M)
    fp = F.aggregate(th, F.lit(0).cast("bigint"),
                     lambda acc, h: (acc * ROLL_B + h) % ROLL_M)
    return (df.filter(F.col(text_col).isNotNull())
              .select("doc_id", fp.alias("roll_fp")))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, quality) — a
    length/stopword composite in [0,1], rounded to 4dp. Deterministic,
    portable arithmetic (doubles)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("double")
    avg_len = (F.length(F.col(text_col)) - (F.size(toks) - 1)) / n
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ratio = hits / n
    quality = round4(
        F.least(n / 100.0, F.lit(1.0)) * 0.5
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.3
        + F.least(ratio * 5.0, F.lit(1.0)) * 0.2)
    return (df.filter(F.col(text_col).isNotNull())
              .select("doc_id",
                      F.size(toks).alias("n_tokens"),
                      round4(avg_len).alias("avg_token_len"),
                      round4(ratio).alias("stopword_ratio"),
                      quality.alias("quality")))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — n-gram/stopword heuristic: most stopword hits
    wins; ties broken lexicographically; zero hits → 'und'."""
    toks = F.split(F.col(text_col), " ")
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max on struct: max by hits then lang — we want max hits,
    # lexicographically SMALLEST lang on tie → compare (hits, negated-rank)
    # instead: sort desc by hits, asc by lang via struct ordering trick
    best = F.array_max(F.array(*[
        F.struct(s["hits"].alias("hits"),
                 # invert lang ordering so array_max picks lexicographically
                 # smallest lang on equal hits
                 F.lit(-i).alias("inv"),
                 s["lang"].alias("lang"))
        for i, s in enumerate(scores)]))
    pred = F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])
    return (df.filter(F.col(text_col).isNotNull())
              .select("doc_id", pred.alias("lang_pred")))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — order-insensitive document fingerprint: md5 of the
    sorted distinct token set. Identical token sets → identical fp."""
    toks = F.split(F.col(text_col), " ")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return (df.filter(F.col(text_col).isNotNull())
              .select("doc_id", fp.alias("fp")))


def token_topk(df: DataFrame, k: int = 50, text_col: str = "text") \
        -> DataFrame:
    """Vocabulary heavy hitters: the k most frequent whitespace tokens over
    the corpus — (token, cnt), count desc then token asc (the tie-break
    makes the cut deterministic cross-engine).

    Scale shape: explode → map-side-combining hash count (vocabulary ≪
    corpus after partials) → orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k merged on the driver, no
    full sort). Empty-string tokens (from split on '' / leading separators)
    are counted like any other token — both engines split identically."""
    toks = (df.filter(F.col(text_col).isNotNull())
              .select(F.explode(F.split(F.col(text_col), " "))
                      .alias("token")))
    return (toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("token")).limit(k))


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text") \
        -> DataFrame:
    """(doc_id, term, rnk, score4) — the k most characteristic terms per
    document by tf·idf (idf = ln(N/df), natural log — both engines' ln
    agrees bit-for-bit on identical doubles, same dependency the KL drift
    oracle already rides). Ties break by term ascending so the cut is
    deterministic cross-engine.

    Scale shape: one explode → map-side-combining (doc, term) count; the
    document-frequency table is a second aggregate over the same frame
    joined back on term (vocabulary-sized — Zipf-bounded, shuffle join);
    per-doc top-k is a row_number window over each doc's distinct terms
    (bounded by doc length, never the corpus). N (the corpus document
    count) stays IN the plan as a 1-row broadcast aggregate crossJoined
    into the score expression — the same pattern as norm_outliers
    (similarity.py) — so construction is lazy and the corpus is scanned
    once per consuming action, not eagerly at build time."""
    from pyspark.sql import Window
    base = (df.filter(F.col(text_col).isNotNull())
              .select("doc_id",
                      F.explode(F.split(F.col(text_col), " "))
                      .alias("term")))
    tf = base.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.count_distinct("doc_id").cast("double").alias("_n_docs"))
    scored = (tf.join(dfreq, "term")
                .crossJoin(F.broadcast(nd))
                .withColumn("score",
                            F.col("tf") * F.log(F.col("_n_docs")
                                                / F.col("df")))
                .drop("_n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("doc_id", "term", "rnk",
                    round4(F.col("score")).alias("score4")))


PPL_SCALE = 1_000_000  # per-token log-probs quantized to micro-nats


def unigram_logppl(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, logppl) — CCNet-style language-model quality
    proxy: mean per-token negative log-probability under the corpus's own
    unigram distribution (documents full of rare tokens score high = bad;
    repetitive common-token documents score low). The full CCNet filter
    uses a KenLM 5-gram; the unigram LM is the SQL-expressible member of
    the same family and ranks documents the same way for hygiene cuts.

    Cross-engine determinism: a per-doc SUM of doubles is order-dependent
    and Spark/DuckDB aggregate in different orders, so each token's
    -ln(c/T) is quantized to integer micro-nats (floor(x*1e6 + 0.5) as
    bigint) BEFORE the sum — integer addition commutes exactly (the
    event_rate_anomaly integer-moment lesson); the mean then divides two
    exact integers in the identical expression shape on both sides.

    Scale shape: explode → map-side-combining token counts (vocabulary is
    Zipf-bounded, ≪ corpus); the corpus total T stays in-plan as a 1-row
    broadcast aggregate (the norm_outliers/tfidf pattern — no eager
    action); tokens join the vocab table on the token string (AQE's call:
    vocab often broadcastable); one per-doc aggregate. Nothing all-pairs,
    no driver-side loops."""
    base = (df.filter(F.col(text_col).isNotNull())
              .select("doc_id",
                      F.explode(F.split(F.col(text_col), " "))
                      .alias("tok")))
    vocab = base.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("_t"))
    q = F.floor(F.log(F.col("_t") / F.col("c")) * PPL_SCALE + F.lit(0.5)) \
         .cast("bigint")
    return (base.join(vocab, "tok")
                .crossJoin(F.broadcast(tot))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_tokens"),
                     F.sum(q).alias("_qsum"))
                .select("doc_id", "n_tokens",
                        (F.floor(F.col("_qsum")
                                 / F.col("n_tokens").cast("double")
                                 / PPL_SCALE * 1e4 + F.lit(0.5)) / 1e4)
                        .alias("logppl")))


def source_mix(df: DataFrame, text_col: str = "text",
               key_col: str = "source") -> DataFrame:
    """(source, n_docs, n_tokens, doc_share, token_share) — the data-mixing
    report a training pipeline reads before choosing sampling rates: how
    much of the corpus (documents and tokens) each source contributes.
    Shares are 4dp-floored on doubles derived from exact integer counts
    (the cross-engine float convention).

    Scale shape: one map-side-combining aggregate keyed by source (source
    cardinality is tiny), totals as a 1-row broadcast aggregate crossJoined
    into the share expressions — lazy construction, one scan per action."""
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(key_col).alias("source"),
                      F.size(F.split(F.col(text_col), " "))
                       .cast("bigint").alias("ntok")))
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"))
    tot = per.agg(F.sum("n_docs").cast("double").alias("_td"),
                  F.sum("n_tokens").cast("double").alias("_tt"))
    return (per.crossJoin(F.broadcast(tot))
               .select("source", "n_docs", "n_tokens",
                       (F.floor(F.col("n_docs") / F.col("_td") * 1e4
                                + F.lit(0.5)) / 1e4).alias("doc_share"),
                       (F.floor(F.col("n_tokens") / F.col("_tt") * 1e4
                                + F.lit(0.5)) / 1e4).alias("token_share")))


def lang_mismatch(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """(doc_id, lang, lang_pred, mismatch) — declared-vs-predicted language
    disagreement, the hygiene signal for mislabeled crawl metadata: runs
    the stopword lang_id heuristic and null-safe-compares it to the
    declared tag. One doc_id equi-join back to the declared column."""
    docs = df.filter(F.col(text_col).isNotNull())
    pred = lang_id(docs, text_col)
    return (docs.select("doc_id", F.col(lang_col).alias("lang"))
                .join(pred, "doc_id")
                .select("doc_id", "lang", "lang_pred",
                        (~F.col("lang").eqNullSafe(F.col("lang_pred")))
                        .alias("mismatch")))
