"""Unit tests for operators/quality.py on crafted inputs: known-answer
checks for each operator plus plan-shape pins for the decontamination
broadcast (the scale contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.operators import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gopher_quality_known_answer(spark):
    # 60 stopword-rich words → pass; 5 words → fail (min_words);
    # long-token doc → fail (mean word length)
    # mean word length (23+1·6−6)/6·… — letters only: (3+4+5+4+1+6)/6 ≈ 3.83
    good = " ".join(["the", "lion", "rests", "upon", "a", "carpet"] * 10)
    short = "tiny doc of few words"
    longtok = " ".join(["incomprehensibilities"] * 60)
    out = {r["doc_id"]: r.asDict() for r in quality.gopher_quality(
        _docs(spark, [(1, good), (2, short), (3, longtok)])).collect()}
    assert out[1]["gopher_pass"] and out[1]["n_words"] == 60
    assert out[1]["stop_hits"] == 20  # 'the'(10) + 'a'(10)
    assert not out[2]["gopher_pass"] and out[2]["n_words"] == 5
    assert not out[3]["gopher_pass"]
    assert out[3]["mean_word_len"] == 21.0


def test_gopher_quality_alpha_fraction(spark):
    # 3 of 60 words contain a letter → alpha 0.05 → fail on that axis alone
    nums = " ".join((["123"] * 19 + ["abc"]) * 3)
    r = quality.gopher_quality(_docs(spark, [(1, nums)]),
                               min_words=10).collect()[0]
    assert r["alpha_word_frac"] == 0.05
    assert not r["gopher_pass"]


def test_repetition_stats_known_answer(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → n=5, max=3
    r = quality.repetition_stats(_docs(spark, [(1, "a b a b a b")])) \
        .collect()[0]
    assert r["n_2grams"] == 5
    assert r["max_2gram_cnt"] == 3
    assert r["top_2gram_frac"] == 0.6
    # dup_token_frac = 1 - 2/6
    assert r["dup_token_frac"] == 0.6667


def test_repetition_stats_short_doc_excluded(spark):
    # single-token doc has no 2-grams → dropped, matching the oracle's unnest
    out = quality.repetition_stats(
        _docs(spark, [(1, "solo"), (2, "two tokens")])).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_pii_scan_counts(spark):
    rows = [
        (1, "write to alice@example.com or bob.smith@mail.co today"),
        (2, "server 10.0.0.1 and 192.168.1.255 up"),
        (3, "call 555-0199 now"),
        (4, "clean text with no identifiers at all"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in quality.pii_scan(_docs(spark, rows)).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["has_pii"]
    assert out[2]["n_ipv4"] == 2 and out[2]["n_emails"] == 0
    assert out[3]["n_phones"] == 1
    assert not out[4]["has_pii"]
    assert out[4]["n_emails"] == out[4]["n_ipv4"] == out[4]["n_phones"] == 0


def test_decontaminate_overlap_and_exclusion(spark):
    # doc 10 copies a benchmark 3-gram run; doc 11 shares nothing; the
    # benchmark doc itself must not appear on the corpus side
    docs = _docs(spark, [
        (0, "alpha beta gamma delta epsilon"),          # benchmark (id%2==0… selected below)
        (10, "x y alpha beta gamma z"),                  # 1 shared 3-gram
        (11, "p q r s t u v"),                           # no overlap
    ])
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r["n_shared"]
           for r in quality.decontaminate(docs, bench, n=3).collect()}
    assert out == {10: 1}


def test_decontaminate_counts_distinct_grams(spark):
    # repeated shared gram counts once (DISTINCT), two different shared
    # grams count twice
    docs = _docs(spark, [
        (0, "a b c d e"),
        (10, "a b c a b c"),     # shares 'a b c' (twice) → 1 distinct
        (11, "b c d x c d e"),   # shares 'b c d' and 'c d e' → 2
    ])
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r["n_shared"]
           for r in quality.decontaminate(docs, bench, n=3).collect()}
    assert out == {10: 1, 11: 2}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """Scale contract: the benchmark gram set joins as a BROADCAST hash join
    (benchmark is the bounded side; the corpus scan must never shuffle for
    it) and no cartesian product appears."""
    docs = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}")
                         for i in range(20)])
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    plan = quality.decontaminate(docs, bench, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ngram_array_guard_under_n(spark):
    """Docs shorter than n yield [] — Spark's sequence(1, 0) counts DOWN,
    so the guard is load-bearing."""
    df = _docs(spark, [(1, "one"), (2, "one two"), (3, "one two three")])
    toks = F.split(F.col("text"), " ")
    out = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", quality._ngram_array(toks, 3).alias("g")).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]


def test_training_shard_stage_semantics(spark):
    """Composition contract: benchmark docs and later duplicate-text docs
    never reach the shard; a contaminated doc is dropped; rate-1.0 keeps
    every survivor."""
    from sparkcheck.operators import pipeline
    docs = _docs(spark, [
        (0, "alpha beta gamma delta " + "the rest of a long document "*20),  # bench
        (1, "unique text " + "the lion rests upon a carpet "*20),            # clean survivor
        (2, "x alpha beta gamma y " + "the lion rests upon a carpet "*20),   # contaminated
        (3, "unique text " + "the lion rests upon a carpet "*20),            # dup of 1 → dropped
    ]).withColumn("lang", F.lit("en"))
    bench = docs.filter(F.col("doc_id") == 0)
    out = pipeline.training_shard(docs, bench, n=3, rates={"en": 1.0}) \
        .collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_tokens"] > 50


def test_tfidf_top_terms_known_answer(spark):
    """'rare' appears only in doc 1 → its top term; 'common' appears in all
    docs → idf ln(1)=0 → never outranks; k cut respected with term-asc
    tie-break."""
    from sparkcheck.operators import textstats
    docs = _docs(spark, [
        (1, "common rare common"),
        (2, "common zeta common zeta"),
        (3, "common common"),
    ])
    out = {(r["doc_id"], r["rnk"]): r.asDict()
           for r in textstats.tfidf_top_terms(docs, k=2).collect()}
    assert out[(1, 1)]["term"] == "rare"
    assert out[(2, 1)]["term"] == "zeta"
    # common scores 0 everywhere (df == N) but still fills remaining ranks
    assert out[(1, 2)]["term"] == "common"
    assert out[(1, 2)]["score4"] == 0.0
    assert out[(3, 1)]["term"] == "common"


def test_retention_known_answer(spark):
    """Day 0: users {1,2}; day 1: users {1,3}; day 2: {3} → day-0 retention
    1/2, day-1 retention 1/2, day-2 retention 0 (no day 3)."""
    from sparkcheck.operators.sessions import retention
    rows = [(1, 10, 1), (2, 20, 2),                     # day 0
            (3, 86410, 1), (4, 86420, 3),               # day 1
            (5, 2 * 86400 + 10, 3)]                     # day 2
    df = spark.createDataFrame(
        rows, "event_id bigint, t bigint, user_id bigint") \
        .withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    out = {r["day"]: r.asDict() for r in retention(df).collect()}
    assert out[0]["n_users"] == 2 and out[0]["n_retained"] == 1
    assert out[0]["retention4"] == 0.5
    assert out[1]["n_users"] == 2 and out[1]["n_retained"] == 1
    assert out[2]["n_users"] == 1 and out[2]["n_retained"] == 0
    assert out[2]["retention4"] == 0.0


def test_tfidf_construction_is_lazy(spark):
    """N (the corpus doc count) rides IN the plan as a 1-row broadcast
    aggregate: building the operator must launch ZERO Spark jobs (the old
    formulation ran an eager distinct().count() scan at construction)."""
    from sparkcheck.operators import textstats
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a d e"), (3, "f g a")],
        "doc_id bigint, text string")
    sc = spark.sparkContext
    sc.setJobGroup("tfidf_ctor", "construction must be lazy")
    try:
        res = textstats.tfidf_top_terms(docs, k=2)
        ctor_jobs = sc.statusTracker().getJobIdsForGroup("tfidf_ctor")
    finally:
        sc.setJobGroup("tfidf_other", "")
    assert list(ctor_jobs) == [], ctor_jobs
    # and the lazy plan still computes the right N: idf(a) = ln(3/3) = 0
    out = {(r["doc_id"], r["term"]): r["score4"] for r in res.collect()}
    assert all(s == 0.0 for (d, t), s in out.items() if t == "a")


def test_c4_quality_known_answer(spark):
    # line rules: terminal punctuation + >=5 words + no 'javascript';
    # doc rules: brace / lorem ipsum / >=3 kept lines
    good = "\n".join(["one two three four five six."] * 3)
    few_words = "one two three."                      # < 5 words
    no_terminal = "one two three four five six"       # no terminal punct
    js = "one two three javascript five six."         # killed token
    braces = good + "\nfunction() { return 0; }"      # doc-level brace
    lorem = good + "\nlorem ipsum dolor sit amet."    # doc-level lorem
    two_kept = "\n".join(["one two three four five six."] * 2)
    out = {r["doc_id"]: r.asDict() for r in quality.c4_quality(
        _docs(spark, [(1, good), (2, few_words), (3, no_terminal), (4, js),
                      (5, braces), (6, lorem), (7, two_kept)])).collect()}
    assert out[1]["c4_pass"] and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == good
    assert out[2]["n_kept"] == 0 and not out[2]["c4_pass"]
    assert out[3]["n_kept"] == 0
    assert out[4]["n_kept"] == 0
    assert out[5]["has_brace"] and not out[5]["c4_pass"]
    assert out[5]["n_kept"] == 3  # brace line itself also fails line rules
    assert out[6]["has_lorem"] and not out[6]["c4_pass"]
    # the lorem line itself satisfies the LINE rules (5 words, terminal '.')
    assert out[6]["n_kept"] == 4
    assert out[7]["n_kept"] == 2 and not out[7]["c4_pass"]  # < min_sentences


def test_c4_quality_keeps_original_line_order(spark):
    text = "alpha beta gamma delta epsilon one.\nmid line no punct\n" \
           "zeta eta theta iota kappa two."
    r = quality.c4_quality(_docs(spark, [(1, text)])).collect()[0]
    assert r["clean_text"] == ("alpha beta gamma delta epsilon one.\n"
                               "zeta eta theta iota kappa two.")
    assert r["n_lines"] == 3 and r["n_kept"] == 2


def test_unigram_logppl_known_answer(spark):
    """Corpus: 'a' ×6, 'rare' ×1, 'b' ×1 (T=8). Doc 1 = 'a a a' →
    logppl = ln(8/6) ≈ 0.2877; doc 2 = 'rare b' → every token has c=1 →
    logppl = ln(8) ≈ 2.0794. Rare-token docs must score strictly higher."""
    import math
    from sparkcheck.operators import textstats
    docs = _docs(spark, [(1, "a a a"), (2, "rare b"), (3, "a a a")])
    out = {r["doc_id"]: r.asDict()
           for r in textstats.unigram_logppl(docs).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["logppl"] == math.floor(math.log(8 / 6) * 1e4 + 0.5) / 1e4
    assert out[2]["logppl"] == math.floor(math.log(8.0) * 1e4 + 0.5) / 1e4
    assert out[2]["logppl"] > out[1]["logppl"]
    assert out[3]["logppl"] == out[1]["logppl"]


def test_unigram_logppl_construction_is_lazy(spark):
    """The corpus total T must stay in-plan (1-row broadcast aggregate) —
    no job may run at construction time (the tfidf eager-count lesson)."""
    from sparkcheck.operators import textstats
    sc = spark.sparkContext
    docs = _docs(spark, [(1, "x y"), (2, "y z")])
    sc.setJobGroup("ppl_ctor", "construction must be lazy")
    try:
        res = textstats.unigram_logppl(docs)
        ctor_jobs = sc.statusTracker().getJobIdsForGroup("ppl_ctor")
    finally:
        sc.setJobGroup("ppl_other", "")
    assert ctor_jobs == []
    assert res.count() == 2


def test_c4_quality_plan_is_shuffle_free(spark, tmp_path):
    """Scale contract: the per-line predicates run as ONE array filter per
    document — a pure map over the scan, no exchange anywhere."""
    p = str(tmp_path / "docs.parquet")
    _docs(spark, [(i, "one two three four five six.") for i in range(50)]) \
        .write.parquet(p)
    plan = quality.c4_quality(spark.read.parquet(p)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_source_mix_known_answer(spark):
    from sparkcheck.operators.textstats import source_mix
    rows = [(1, "a b c", "web"), (2, "d e", "web"), (3, "f g h i j", "books")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["source"]: r.asDict() for r in source_mix(df).collect()}
    assert out["web"]["n_docs"] == 2 and out["web"]["n_tokens"] == 5
    assert out["books"]["n_docs"] == 1 and out["books"]["n_tokens"] == 5
    assert out["web"]["doc_share"] == 0.6667   # floor(2/3*1e4+.5)/1e4
    assert out["web"]["token_share"] == 0.5
    assert out["books"]["token_share"] == 0.5


def test_lang_mismatch_null_safe(spark):
    from sparkcheck.operators.textstats import lang_mismatch
    en = "the cat and the dog with a hat"     # stopword-rich English
    rows = [(1, en, "en"), (2, en, "fr"), (3, en, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r["doc_id"]: r.asDict() for r in lang_mismatch(df).collect()}
    assert out[1]["lang_pred"] == "en" and not out[1]["mismatch"]
    assert out[2]["mismatch"]
    assert out[3]["mismatch"] and out[3]["lang"] is None
