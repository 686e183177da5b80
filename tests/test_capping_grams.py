"""Per-key contribution cap (operators/sampling.capped_by_key) and
cross-document duplicate n-gram fraction (operators/dedup.cross_doc_gram_frac).

The cap's load-bearing claim is the LOSSLESS PRUNE: the salted two-phase
formulation (local cap inside (key, salt) buckets, then the global window
over the survivors) must equal the naive one-window top-cap row-for-row —
that equivalence is what lets the per-key sort stay bounded at
salt_buckets x cap rows under arbitrary key skew. The DuckDB oracle states
the one-window form; these tests pin the engine-side equivalence directly.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkcheck.operators.dedup import cross_doc_gram_frac
from sparkcheck.operators.sampling import capped_by_key


def _skewed(spark):
    # one hot host with 200 rows, a tail of small hosts incl. below-cap ones
    rows = [(i, "hot.example") for i in range(200)]
    rows += [(1000 + i, f"h{i % 7}.example") for i in range(40)]
    rows += [(2000, "solo.example")]
    return spark.createDataFrame(rows, "rid bigint, host string")


def _naive_cap(df, cap):
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col("rid").cast("string")).asc(), F.col("rid").asc())
    return (df.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= cap))


def test_capped_by_key_equals_single_window(spark):
    df = _skewed(spark)
    got = sorted(capped_by_key(df, "host", "rid", cap=3, key_name="host",
                               salt_buckets=8)
                 .select("rid", "host", "rk").collect())
    want = sorted(_naive_cap(df, 3).select("rid", "host", "rk").collect())
    assert got == want
    # cap respected; below-cap keys kept whole
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.rk)
    assert all(len(v) <= 3 and sorted(v) == list(range(1, len(v) + 1))
               for v in by_host.values())
    assert len(by_host["solo.example"]) == 1


def test_capped_by_key_deterministic_and_salt_invariant(spark):
    df = _skewed(spark)
    a = sorted(capped_by_key(df, "host", "rid", cap=2,
                             salt_buckets=4).select("rid", "rk").collect())
    b = sorted(capped_by_key(df, "host", "rid", cap=2,
                             salt_buckets=32).select("rid", "rk").collect())
    assert a == b  # the kept subset cannot depend on the salt fan-out


def test_capped_by_key_expression_key(spark):
    # key may be an expression (the driver query extracts the url host)
    df = spark.createDataFrame(
        [(i, f"http://h{i % 2}.example/p{i}") for i in range(10)],
        "rid bigint, url string")
    out = capped_by_key(df, F.regexp_extract(F.col("url"),
                                             "https?://([^/]+)", 1),
                        "rid", cap=3, key_name="host")
    got = out.groupBy("host").count().collect()
    assert {r["host"] for r in got} == {"h0.example", "h1.example"}
    assert all(r["count"] == 3 for r in got)


def test_cross_doc_gram_frac_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"),   # grams: "x y z", "y z w"
         (2, "x y z"),     # gram:  "x y z"  (shared with doc 1)
         (3, "q r s t"),   # grams: "q r s", "r s t" (unique)
         (4, "hi"),        # short doc -> whole-text gram
         (5, "hi"),        # duplicate short doc
         (6, None)],       # NULL text dropped
        "doc_id bigint, text string")
    got = {r["id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
           for r in cross_doc_gram_frac(df, "doc_id", n=3).collect()}
    assert got == {1: (2, 1, 0.5),
                   2: (1, 1, 1.0),
                   3: (2, 0, 0.0),
                   4: (1, 1, 1.0),
                   5: (1, 1, 1.0)}


def test_cross_doc_gram_frac_repeated_gram_counted_once(spark):
    # the same gram repeated WITHIN a doc is one distinct gram, and a doc
    # sharing a gram only with itself is not a cross-doc duplicate
    df = spark.createDataFrame([(1, "a b a b a b"), (2, "c d e")],
                               "doc_id bigint, text string")
    got = {r["id"]: (r["n_grams"], r["n_dup_grams"])
           for r in cross_doc_gram_frac(df, "doc_id", n=2).collect()}
    # doc 1 bigrams: "a b" x3, "b a" x2 -> 2 distinct, none cross-doc
    assert got[1] == (2, 0)
    assert got[2] == (2, 0)


def test_line_dedup_first_occurrence_survives(spark):
    from sparkcheck.operators.dedup import line_dedup
    # 'banner' boilerplate appears in all three docs → survives only in
    # doc 1 (its first occurrence); unique lines always survive
    rows = [(1, "banner\nalpha"),
            (2, "banner\nbeta"),
            (3, "gamma\nbanner")]
    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(spark.createDataFrame(
               rows, "doc_id bigint, text string"), "doc_id").collect()}
    assert out[1]["clean_text"] == "banner\nalpha"
    assert out[2]["clean_text"] == "beta" and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "gamma" and out[3]["n_lines"] == 2


def test_line_dedup_within_doc_and_empty_result(spark):
    from sparkcheck.operators.dedup import line_dedup
    # repeated line inside ONE doc keeps only the first position; a doc
    # made entirely of already-seen lines keeps a row with clean_text=''
    rows = [(1, "x\ny\nx"), (2, "x\ny")]
    out = {r["doc_id"]: r.asDict() for r in
           line_dedup(spark.createDataFrame(
               rows, "doc_id bigint, text string"), "doc_id").collect()}
    assert out[1]["clean_text"] == "x\ny" and out[1]["n_kept"] == 2
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""
    assert out[2]["n_lines"] == 2


def test_dup_spans_touching_merge_and_gap(spark):
    from sparkcheck.operators.dedup import dup_spans
    # A and B share "a1..a5" and "b1..b5"; B has an extra token between
    # them. In A the two seeds touch (starts 1 and 6) -> ONE span [1,10];
    # in B they are separated by one non-duplicated token -> TWO spans.
    a = "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"
    b = "a1 a2 a3 a4 a5 x b1 b2 b3 b4 b5"
    out = dup_spans(spark.createDataFrame(
        [(1, a), (2, b)], "doc_id bigint, text string"), "doc_id")
    got = sorted((r["doc_id"], r["span_start"], r["span_end"],
                  r["span_len"]) for r in out.collect())
    assert got == [(1, 1, 10, 10), (2, 1, 5, 5), (2, 7, 11, 5)]


def test_dup_spans_within_doc_repeat_counts(spark):
    from sparkcheck.operators.dedup import dup_spans
    # the same 5-gram twice in ONE document is a duplication too
    # (corpus-wide occurrence count, as in Lee et al.); gap of one token
    # (start 7 > prev_end 5 + 1) keeps the spans separate
    t = "z1 z2 z3 z4 z5 w z1 z2 z3 z4 z5"
    out = dup_spans(spark.createDataFrame(
        [(1, t), (2, "totally unrelated words go here")],
        "doc_id bigint, text string"), "doc_id")
    got = sorted((r["span_start"], r["span_end"]) for r in out.collect())
    assert got == [(1, 5), (7, 11)]
    assert all(r["doc_id"] == 1 for r in out.collect())


def test_cut_dup_spans_removes_only_covered_tokens(spark):
    from sparkcheck.operators.dedup import cut_dup_spans
    # doc 2's unique separator token survives the cut; doc 3 (no dup
    # spans) is untouched; doc 1 is fully covered -> empty clean_text
    rows = [(1, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
            (2, "a1 a2 a3 a4 a5 x b1 b2 b3 b4 b5"),
            (3, "unique words only right here")]
    out = {r["doc_id"]: r.asDict() for r in cut_dup_spans(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        "doc_id").collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_cut"] == 10
    assert out[2]["clean_text"] == "x" and out[2]["n_cut"] == 10
    assert out[3]["n_cut"] == 0
    assert out[3]["clean_text"] == "unique words only right here"
    assert out[2]["n_tokens"] == 11


def test_line_dedup_plan_exchange_budget(spark, tmp_path):
    """Scale contract: line dedup is the three key-partitioned shuffles of
    its docstring (first-occurrence agg, join-back, per-doc reassembly)
    plus the doc-frame join — never a per-line global window or sort."""
    from sparkcheck.operators.dedup import line_dedup
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame([(i, "a\nb\nc") for i in range(50)],
                          "doc_id bigint, text string").write.parquet(p)
    plan = line_dedup(spark.read.parquet(p), "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # no global sort (window partitions would show a range partitioning)
    assert "rangepartitioning" not in plan.lower(), plan
    assert plan.count("Exchange") <= 5, plan


def test_dup_spans_plan_no_global_sort_or_cartesian(spark, tmp_path):
    """Scale contract: seed counting is a hash aggregate, the interval
    merge windows hash-partition on doc_id — no range partitioning (global
    sort) and no cartesian product anywhere."""
    from sparkcheck.operators.dedup import dup_spans
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "a1 a2 a3 a4 a5 b%d" % i) for i in range(60)],
        "doc_id bigint, text string").write.parquet(p)
    plan = dup_spans(spark.read.parquet(p), "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
