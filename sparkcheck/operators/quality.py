"""Web-text quality operators for training-data pipelines: Gopher-style
document filters, repetition statistics, PII scanning, and benchmark
decontamination. (Beyond the reference's surface — first-class components
per the build brief; the reference has no text ops at all. The rule
thresholds follow the published Gopher/MassiveText data-quality heuristics,
which are public knowledge.)

Engine/oracle parity strategy mirrors functions/urlnorm.py: pattern
constants and injected-noise builders live HERE and are rendered for both
engines (Spark Column + DuckDB SQL), so the driver oracle reproduces every
byte. All regexes are RE2-safe AND Java-regex-identical (character classes,
bounded repetition, ASCII \\b only — no lookaround, no backrefs).

Scale shapes:
- `gopher_quality` / `pii_scan` are single-pass whole-stage-codegen scans
  (scalar exprs; the only lambdas are one list_filter pass per rule, same
  budget as textstats.lang_id).
- `repetition_stats` explodes 2-grams into a map-side-combining
  (doc_id, ngram) count — the codegen formulation (per BENCH/BASELINE.md's
  minhash addendum, per-element loops in interpreted higher-order lambdas
  cost ~7× an explode + scalar agg); the second (doc_id-only) aggregate
  consumes the already-tiny distinct-gram frame.
- `decontaminate` broadcasts the benchmark n-gram set: benchmark suites are
  MB-bounded by construction while the corpus is the 100-TB side, so the
  unconditional broadcast is safe by design (unlike data-dependent dup
  lists, which go through uniqueness.gate_broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import STOPWORDS, round4

# --- shared regex constants (RE2 ∩ Java regex) -------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"

# driver-query decontamination config, imported by oracle.decontaminate so
# the two sides cannot drift: 3-grams (the synthetic corpus has a ~30-word
# vocabulary — 8-grams collide only on true duplicates) over a modulo-41
# benchmark sample (~2.5% of docs)
DECON_N = 3
DECON_MOD = 41

# C4 cleaning constants (published heuristics: Raffel et al. 2020 §2.2),
# imported by oracle.c4_quality so the two sides cannot drift
C4_TERMINAL_RE = '[.!?"]$'
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


# --- Gopher-style quality filter --------------------------------------------


def gopher_quality(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mwl: float = 3.0, max_mwl: float = 10.0,
                   min_alpha_frac: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """(doc_id, n_words, mean_word_len, alpha_word_frac, stop_hits,
    gopher_pass) — the classic Gopher/MassiveText document-quality gate:
    word count in [min_words, max_words], mean word length in
    [min_mwl, max_mwl], fraction of words containing a letter ≥
    min_alpha_frac, and at least min_stop_hits stopword occurrences.
    Doubles rounded 4dp (cross-engine floor rule)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    nd = n.cast("double")
    # scalar mean-word-length: total chars minus the (n-1) separators, over n
    mwl = (F.length(F.col(text_col)) - (n - 1)) / nd
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nd
    gopher_pass = (
        (n >= min_words) & (n <= max_words)
        & (mwl >= min_mwl) & (mwl <= max_mwl)
        & (alpha >= min_alpha_frac)
        & (stop_hits >= min_stop_hits))
    return (df.filter(F.col(text_col).isNotNull())
              .select("doc_id",
                      n.cast("int").alias("n_words"),
                      round4(mwl).alias("mean_word_len"),
                      round4(alpha).alias("alpha_word_frac"),
                      stop_hits.cast("int").alias("stop_hits"),
                      gopher_pass.alias("gopher_pass")))


# --- repetition statistics ---------------------------------------------------


def _ngram_array(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams of the token array; fewer than n tokens
    → empty array (Spark's sequence(1, 0) would COUNT DOWN to [1, 0] — the
    guard is semantics, not style; DuckDB's range(1, 0) is already [])."""
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731 — inline element picker
        " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)])
    return (F.when(F.size(toks) >= n, F.transform(idx, gram))
             .otherwise(F.array().cast("array<string>")))


def _exploded_ngrams(frame: DataFrame, carry_cols: list, n: int,
                     text_col: str = "text",
                     out_col: str = "gram") -> DataFrame:
    """One row per n-gram: explode gram START POSITIONS and build each gram
    as a codegen'd scalar expression (concat_ws over slice) — produces the
    exact strings of explode(_ngram_array(...)) (docs with < n tokens emit
    nothing) without materializing the gram array through an interpreted
    higher-order lambda (the BENCH/BASELINE.md minhash lesson: per-element
    hot loops belong in codegen'd scalar exprs). `carry_cols` are projected
    through unchanged."""
    toks = F.split(F.col(text_col), " ")
    base = (frame.filter(F.col(text_col).isNotNull())
                 .select(*carry_cols, toks.alias("_tk"))
                 .filter(F.size("_tk") >= n))
    starts = F.sequence(F.lit(1), F.size("_tk") - F.lit(n - 1))
    return (base.select(*carry_cols, F.explode(starts).alias("_i"), "_tk")
                .select(*carry_cols,
                        F.concat_ws(" ", F.slice("_tk", F.col("_i"), n))
                        .alias(out_col)))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_2grams, max_2gram_cnt, top_2gram_frac, dup_token_frac) —
    Gopher-style repetition signals: the fraction of all 2-grams taken by
    the single most frequent one (boilerplate/spam detector) and the
    duplicate-token fraction 1 − distinct/total. Docs with <2 tokens have no
    2-grams and are excluded (explode drops the empty array; the oracle's
    unnest does the same)."""
    toks = F.split(F.col(text_col), " ")
    base = _exploded_ngrams(
        df.filter(F.col(text_col).isNotNull())
          .select("doc_id",
                  F.size(toks).alias("_n_toks"),
                  F.size(F.array_distinct(toks)).alias("_n_dist"),
                  F.col(text_col)),
        ["doc_id", "_n_toks", "_n_dist"], 2, text_col=text_col,
        out_col="ngram")
    per_gram = (base.groupBy("doc_id", "ngram")
                    .agg(F.count(F.lit(1)).alias("cnt"),
                         F.max("_n_toks").alias("_n_toks"),
                         F.max("_n_dist").alias("_n_dist")))
    return (per_gram.groupBy("doc_id")
            .agg(F.sum("cnt").alias("n_2grams"),
                 F.max("cnt").alias("max_2gram_cnt"),
                 F.max("_n_toks").alias("_n_toks"),
                 F.max("_n_dist").alias("_n_dist"))
            .select("doc_id", "n_2grams", "max_2gram_cnt",
                    round4(F.col("max_2gram_cnt")
                           / F.col("n_2grams")).alias("top_2gram_frac"),
                    round4(1 - F.col("_n_dist")
                           / F.col("_n_toks").cast("double"))
                    .alias("dup_token_frac")))


# --- PII scanning ------------------------------------------------------------


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, has_pii) — regex PII detectors
    every web-crawl pipeline runs before training (emails, IPv4 literals,
    US-style 7-digit phone fragments). Pure codegen regexp_count; patterns
    shared with the DuckDB oracle (module constants above)."""
    cnt = lambda pat: F.regexp_count(  # noqa: E731
        F.col(text_col), F.lit(pat)).cast("int")
    e, i, p = cnt(PII_EMAIL_RE), cnt(PII_IPV4_RE), cnt(PII_PHONE_RE)
    return (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("doc_id"),
                      e.alias("n_emails"), i.alias("n_ipv4"),
                      p.alias("n_phones"),
                      ((e + i + p) > 0).alias("has_pii")))


def pii_noise(text_col, id_col) -> Column:
    """Deterministic PII injection for exercising the detectors on the
    synthetic corpus (which contains none): append an email / IPv4 / phone
    by doc-id arithmetic. Rendered identically in SQL by pii_noise_sql."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    d = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(
        t,
        F.when(d % 5 == 0, F.concat(F.lit(" contact user"),
                                    d.cast("string"),
                                    F.lit("@example.com")))
         .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.concat(F.lit(" from 10.0."),
                                    (d % 256).cast("string"), F.lit(".1")))
         .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.concat(F.lit(" call 555-0"),
                                     F.lpad((d % 1000).cast("string"),
                                            3, "0")))
         .otherwise(F.lit("")))


def pii_noise_sql(text_expr: str, id_expr: str) -> str:
    """The identical injection in DuckDB SQL (|| coerces nothing — all casts
    explicit so both engines render the same bytes)."""
    return (
        f"({text_expr}"
        f" || CASE WHEN {id_expr} % 5 = 0 THEN ' contact user' ||"
        f" CAST({id_expr} AS VARCHAR) || '@example.com' ELSE '' END"
        f" || CASE WHEN {id_expr} % 7 = 0 THEN ' from 10.0.' ||"
        f" CAST({id_expr} % 256 AS VARCHAR) || '.1' ELSE '' END"
        f" || CASE WHEN {id_expr} % 11 = 0 THEN ' call 555-0' ||"
        f" lpad(CAST({id_expr} % 1000 AS VARCHAR), 3, '0') ELSE '' END)")


# --- deterministic line structuring (test-input synthesis) -------------------


def lines_noise(text_col, id_col, chunk: int = 8) -> Column:
    """Deterministic multi-line structuring of the single-line synthetic
    corpus, for exercising the line-granularity operators (c4_quality,
    dedup.line_dedup) — the real operators consume newline-separated web
    text; the testdata documents are one space-joined line. Chunks of
    `chunk` tokens become lines; a terminal '.' lands on lines where
    (i + id) % 3 == 0, the token ' javascript' (C4's line killer) on
    (i + 7*id) % 13 == 0, and doc-level 'lorem ipsum' / brace-code lines by
    id modulo 97 / 89. Rendered identically in SQL by lines_noise_sql (the
    pii_noise pattern). Interpreted-lambda cost is irrelevant here: this is
    input synthesis, not an operator."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    d = F.col(id_col) if isinstance(id_col, str) else id_col
    toks = F.split(t, " ")
    nchunks = F.ceil(F.size(toks) / F.lit(float(chunk))).cast("int")

    def line(i):
        base = F.concat_ws(" ", F.slice(toks, i * chunk + 1, chunk))
        js = (F.when((i + d * 7) % 13 == 0, F.lit(" javascript"))
               .otherwise(F.lit("")))
        dot = F.when((i + d) % 3 == 0, F.lit(".")).otherwise(F.lit(""))
        return F.concat(base, js, dot)

    lines = F.transform(F.sequence(F.lit(0), nchunks - 1), line)
    return F.concat(
        F.array_join(lines, "\n"),
        F.when(d % 97 == 0, F.lit("\nlorem ipsum dolor sit amet."))
         .otherwise(F.lit("")),
        F.when(d % 89 == 0, F.lit("\nfunction() { return 0; }"))
         .otherwise(F.lit("")))


def lines_noise_sql(text_expr: str, id_expr: str, chunk: int = 8) -> str:
    """The identical line structuring in DuckDB SQL (range() is
    end-exclusive ≡ sequence(0, n-1); list slices clip at the end exactly
    like F.slice)."""
    toks = f"string_split({text_expr}, ' ')"
    line = (f"array_to_string({toks}[i*{chunk}+1:i*{chunk}+{chunk}], ' ')"
            f" || CASE WHEN (i + {id_expr} * 7) % 13 = 0"
            f" THEN ' javascript' ELSE '' END"
            f" || CASE WHEN (i + {id_expr}) % 3 = 0 THEN '.' ELSE '' END")
    return (
        f"(array_to_string(list_transform("
        f"range(0, CAST(ceil(len({toks}) / {float(chunk)}) AS INT)), "
        f"i -> {line}), chr(10))"
        f" || CASE WHEN {id_expr} % 97 = 0"
        f" THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END"
        f" || CASE WHEN {id_expr} % 89 = 0"
        f" THEN chr(10) || 'function() {{ return 0; }}' ELSE '' END)")


# --- C4 cleaning heuristics ---------------------------------------------------


def c4_quality(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               min_line_words: int = C4_MIN_LINE_WORDS,
               min_sentences: int = C4_MIN_SENTENCES) -> DataFrame:
    """(doc_id, n_lines, n_kept, has_brace, has_lorem, c4_pass, clean_text)
    — the published C4 cleaning heuristics (Raffel et al. 2020 §2.2) over
    newline-separated text: keep only lines that end in terminal
    punctuation, have ≥ min_line_words words, and don't contain the word
    'javascript'; drop whole documents containing '{' (code) or the
    'lorem ipsum' placeholder, or with fewer than min_sentences surviving
    lines. clean_text is the kept lines rejoined in original order.

    Scale shape: a shuffle-free single-pass map — the per-line predicates
    run as ONE array filter per document. The explode + scalar-agg
    formulation (the minhash lesson) would need a (doc_id) shuffle to
    reassemble clean_text; here the interpreted-lambda tax is a handful of
    scalar ops × line count, far below one exchange over the corpus."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: (l.rlike(C4_TERMINAL_RE)
                   & (F.size(F.split(l, " ")) >= min_line_words)
                   & ~l.contains("javascript")))
    has_brace = t.contains("{")
    has_lorem = t.contains("lorem ipsum")
    c4_pass = ((F.size(kept) >= min_sentences)
               & ~has_brace & ~has_lorem)
    return (df.filter(t.isNotNull())
              .select(F.col(id_col).alias("doc_id"),
                      F.size(lines).cast("int").alias("n_lines"),
                      F.size(kept).cast("int").alias("n_kept"),
                      has_brace.alias("has_brace"),
                      has_lorem.alias("has_lorem"),
                      c4_pass.alias("c4_pass"),
                      F.array_join(kept, "\n").alias("clean_text")))


# --- benchmark decontamination ----------------------------------------------


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  key: str = "string") -> DataFrame:
    """(doc_id, n_shared) — n-gram-overlap decontamination: for every corpus
    document NOT in the benchmark set, the number of distinct word n-grams
    it shares with ANY benchmark document (≥1 ⇒ training/eval leakage; docs
    with zero overlap don't appear). The standard pre-training decontam
    check (C4/GPT-3-style 8+ gram collision; tests use smaller n because the
    synthetic corpus has a ~30-word vocabulary).

    Scale shape: the benchmark side is collapsed to DISTINCT n-grams and
    broadcast (benchmark suites are MB-scale by construction — this is the
    one legitimately unconditional broadcast, unlike data-dependent dup
    lists); the corpus side is a single explode + broadcast-hash semi-join +
    map-side-combining distinct count. key='hash' (the 100-TB option,
    VERDICT r5 item 6) swaps the join/count key for xxhash64(ngram) to
    shrink the broadcast and shuffle bytes — identical counts up to 64-bit
    collisions, equivalence pytest-pinned; key='string' (default) keeps
    byte-parity with the oracle."""
    from .dedup import _keyed

    def grams(frame):
        g = _exploded_ngrams(frame, [F.col(id_col)], n, text_col=text_col)
        # hash AFTER the explode (a generator can't nest inside xxhash64)
        return g.select(F.col(id_col),
                        _keyed(F.col("gram"), key).alias("gram"))

    bench_grams = grams(bench).select("gram").distinct()
    corpus = docs.join(F.broadcast(bench.select(id_col).distinct()),
                       id_col, "left_anti")
    return (grams(corpus)
            .join(F.broadcast(bench_grams), "gram")
            .groupBy(F.col(id_col).alias("doc_id"))
            .agg(F.count_distinct(F.col("gram")).alias("n_shared")))
